"""Edge cases for the text column functions (functions/text.py):
empty strings, sub-n-token documents, hash-lane independence."""

from __future__ import annotations

from pyspark.sql import functions as F

from task_hive_spark.functions import text as T


def _vals(spark, texts):
    return spark.createDataFrame([(t,) for t in texts], "text STRING")


def test_token_count_empty_and_whitespace(spark):
    df = _vals(spark, ["", "   ", "one", "two words", "a  b\t c\nd"])
    rows = df.select(T.ws_token_count(F.col("text")).alias("n")).collect()
    assert [r.n for r in rows] == [0, 0, 1, 2, 4]


def test_shingles_short_docs_yield_whole_text(spark):
    df = _vals(spark, ["", "one", "one two", "one two three", "a b c d"])
    rows = df.select(T.shingles(F.col("text"), 3).alias("g")).collect()
    assert rows[1].g == ["one"]
    assert rows[2].g == ["one two"]  # < 3 tokens -> one truncated shingle
    assert rows[3].g == ["one two three"]
    assert rows[4].g == ["a b c", "b c d"]


def test_quality_score_bounds(spark):
    df = _vals(spark, ["", "x", "!!!???!!!", "the quick brown fox " * 20])
    rows = df.select(T.quality_score(F.col("text")).alias("q")).collect()
    for r in rows:
        assert 0.0 <= r.q <= 1.0


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = _vals(spark, ["Hello   World", "hello world", "  hello\tworld  "])
    rows = df.select(T.fingerprint(F.col("text")).alias("fp")).collect()
    assert rows[0].fp == rows[1].fp == rows[2].fp


def test_portable_hash_lanes_are_independent(spark):
    df = _vals(spark, ["abc", "def", "ghi"])
    rows = df.select(
        T.portable_hash64(F.col("text"), seed="s-", offset=1).alias("lo"),
        T.portable_hash64(F.col("text"), seed="s-", offset=17).alias("hi"),
    ).collect()
    for r in rows:
        assert r.lo != r.hi
        assert 0 <= r.lo < 2**60 and 0 <= r.hi < 2**60


def test_bpe_greedy_merge_fold_semantics(spark):
    """The merge-application fold must be exact greedy left-to-right:
    'aaa' under (a,a) → [aa, a] (not [a, aa]); 'abab' under (a,b) →
    [ab, ab] (both occurrences, where a single non-overlapping string
    replace would merge only the first); merged tokens never cascade
    within the round."""
    from pyspark.sql import functions as F

    from task_hive_spark.operators.textops import _greedy_merge_expr

    df = spark.createDataFrame(
        [("aaa",), ("abab",), ("bab",), ("x",), ("aabb",)], "w string"
    ).select(
        "w",
        F.expr("transform(sequence(1, length(w)), i -> substring(w, i, 1))").alias(
            "syms"
        ),
    )
    out = {
        r["w"]: r["m"]
        for r in df.select(
            "w", F.expr(_greedy_merge_expr("a", "b")).alias("m")
        ).collect()
    }
    assert out["abab"] == ["ab", "ab"]
    assert out["bab"] == ["b", "ab"]
    assert out["x"] == ["x"]
    assert out["aabb"] == ["a", "ab", "b"]
    out_aa = {
        r["w"]: r["m"]
        for r in df.select(
            "w", F.expr(_greedy_merge_expr("a", "a")).alias("m")
        ).collect()
    }
    assert out_aa["aaa"] == ["aa", "a"]


def test_bpe_merges_are_wellformed(spark, sf_dir):
    """Learned merges: BPE_MERGES rounds, counts non-increasing is NOT
    guaranteed (a merged symbol can create a hotter pair), but every
    round's pair must have been the argmax of a positive count, and a
    later round's left/right symbols must be buildable from earlier
    merges or single characters."""
    from task_hive_spark.operators.textops import BPE_MERGES, txt_bpe_merges

    rows = txt_bpe_merges(spark, sf_dir).collect()
    assert len(rows) == BPE_MERGES
    built = set()
    for r in rows:
        assert r.pair_count > 0
        for side in (r.lft, r.rgt):
            assert len(side) == 1 or side in built, side
        built.add(r.lft + r.rgt)


def test_bpe_batched_selection_parity(spark, sf_dir):
    """(r6 verdict task 4) The batched trainer's parity bounds:
    (a) cross-implementation: the Spark fold trainer's BPE_MERGES
        merges equal an independent pure-Python batched-greedy mirror
        merge-for-merge (selection order, symbols, counts);
    (b) BPE_BATCH=1 degenerates to EXACT sequential Sennrich — the
        batched rule at k=1 reproduces the sequential trainer, so
        batching is the ONLY source of divergence;
    (c) the documented bound where k>1 diverges from sequential:
        merges chain (sequential's next pick may use the symbol it
        just created, which a symbol-disjoint batch cannot), so the
        batched PATH differs — but it must still recover most of the
        sequential merge set on the fixture."""
    from collections import Counter

    from task_hive_spark.operators.textops import (
        BPE_BATCH,
        BPE_MERGES,
        _bpe_vocab,
        txt_bpe_merges,
    )

    vocab = {r["w"]: r["freq"] for r in _bpe_vocab(spark, sf_dir).collect()}

    def pair_counts(syms):
        cnt = Counter()
        for w, f in vocab.items():
            s = syms[w]
            for i in range(len(s) - 1):
                cnt[(s[i], s[i + 1])] += f
        return cnt

    def apply_rules(syms, rules):
        d = {(l, r): l + r for l, r, _ in rules}
        for w, s in syms.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) in d:
                    out.append(d[(s[i], s[i + 1])])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = out

    def batched(total, batch):
        syms = {w: list(w) for w in vocab}
        merges = []
        while len(merges) < total:
            cnt = pair_counts(syms)
            if not cnt:
                break
            sel, used = [], set()
            want = min(batch, total - len(merges))
            for (l, r), c in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0])):
                if l in used or r in used or (l + r) in used:
                    continue
                sel.append((l, r, c))
                used |= {l, r, l + r}
                if len(sel) == want:
                    break
            if not sel:
                break
            merges.extend(sel)
            apply_rules(syms, sel)
        return merges

    def sequential(total):
        syms = {w: list(w) for w in vocab}
        merges = []
        for _ in range(total):
            cnt = pair_counts(syms)
            if not cnt:
                break
            (l, r), c = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merges.append((l, r, c))
            apply_rules(syms, [(l, r, c)])
        return merges

    # (a) Spark == python batched mirror
    spark_merges = [
        (r["lft"], r["rgt"], int(r["pair_count"]))
        for r in txt_bpe_merges(spark, sf_dir).collect()
    ]
    assert spark_merges == batched(BPE_MERGES, BPE_BATCH)

    # (b) k=1 == sequential, exactly (16 merges keeps the test cheap)
    assert batched(16, 1) == sequential(16)

    # (c) documented k>1 bound: path diverges, merge-set mostly recovered
    seq = {(l, r) for l, r, _ in sequential(BPE_MERGES)}
    bat = {(l, r) for l, r, _ in spark_merges}
    assert len(seq & bat) >= int(0.6 * BPE_MERGES), (
        f"batched trainer recovered only {len(seq & bat)}/{BPE_MERGES} "
        "of the sequential merge set"
    )
