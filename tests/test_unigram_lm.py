"""Unigram-LM tokenizer trainer (operators/unigram_lm.py).

The oracle gate proves Spark and DuckDB agree; these tests prove the
training is right and cross-engine-stable:

* a pure-Python re-derivation of the ENTIRE two-iteration hard-EM run
  (seed → cost → Viterbi E-step → prune → re-fit → final counts)
  reproduces the Spark vocabulary row-for-row — a third independent
  implementation besides the DataFrame pipeline and the SQL oracle;
* the ln floor-quantization boundary margins are DERIVED-safe at both
  iterations (the test_textops_lm.py method: the worst cross-engine ln
  divergence is ~|x|·2^-52 ≈ 2e-9 micro-units; assert ≥ 1e-3);
* segmentations reassemble their words, and the fertility roll-up is
  comparable against the BPE tokenizer (the Kudo-paper comparison).
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from task_hive_spark.operators import unigram_lm as U


def _words(spark, sf_dir) -> dict[str, int]:
    from task_hive_spark.operators.textops import _bpe_vocab

    return {r["w"]: int(r["freq"]) for r in _bpe_vocab(spark, sf_dir).collect()}


def _py_train(words: dict[str, int]):
    """Pure-Python mirror of unigram_lm._train. Returns (vocab_rows,
    {word: pieces}, [iteration cost inputs for the margin test])."""
    cand: Counter = Counter()
    for w, f in words.items():
        for s in range(len(w)):
            for L in range(1, min(U.MAX_PIECE_LEN, len(w) - s) + 1):
                cand[w[s : s + L]] += f
    singles = {p: c for p, c in cand.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cand.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[: U.SEED_MULTI]
    v0 = dict(singles)
    v0.update(dict(multi))
    cost0 = U._costs_of(sorted(v0.items()))

    c1: Counter = Counter()
    for w, f in words.items():
        for p in U._segment(w, cost0):
            c1[p] += f
    kept = sorted(
        ((p, c) for p, c in c1.items() if len(p) >= 2),
        key=lambda pc: (-pc[1], pc[0]),
    )[: U.KEEP_MULTI]
    v1 = {p: c1.get(p, 0) for p in v0 if len(p) == 1}
    v1.update(dict(kept))
    cost1 = U._costs_of(sorted(v1.items()))

    seg = {w: U._segment(w, cost1) for w in words}
    c2: Counter = Counter()
    for w, f in words.items():
        for p in seg[w]:
            c2[p] += f
    rows = [
        (p, len(p), int(v0.get(p, 0)), int(c2.get(p, 0)), int(cost1[p]))
        for p in sorted(v1)
    ]
    return rows, seg, [dict(v0), dict(v1)]


def test_vocab_matches_pure_python_mirror(spark, sf_dir):
    words = _words(spark, sf_dir)
    rows, _seg, _ = _py_train(words)
    got = [tuple(r) for r in U.txt_unigram_lm_vocab(spark, sf_dir).collect()]
    assert got == rows
    # structural: every single char kept, all costs positive
    chars = {c for w in words for c in w}
    assert chars <= {p for p, ln, *_ in rows if ln == 1}
    assert all(r[4] > 0 for r in rows)


def test_cost_quantization_margins(spark, sf_dir):
    """Both iterations' floor(1e6·-ln((c+1)/T)) sit far from integer
    boundaries: worst plausible cross-engine ln divergence is ~2e-9
    micro-units; require 1e-3 — over 10^5x headroom."""
    _, _, iterations = _py_train(_words(spark, sf_dir))
    for counts in iterations:
        total = sum(c + 1 for c in counts.values())
        for p, c in counts.items():
            x = 1000000 * -math.log((c + 1) / total)
            margin = x - math.floor(x)
            assert min(margin, 1 - margin) > 1e-3, (p, c, x)


def test_segmentations_reassemble_and_fertility_vs_bpe(spark, sf_dir):
    """Every word's pieces concatenate back to the word; the fertility
    roll-up agrees with a direct per-doc recomputation and is in a sane
    band relative to the BPE tokenizer (the paper's comparison axis:
    same corpus, same word table, two trainers)."""
    from task_hive_spark.operators.textops import txt_bpe_tokenize

    words = _words(spark, sf_dir)
    _, seg, _ = _py_train(words)
    assert all("".join(ps) == w for w, ps in seg.items())

    fert = U.txt_unigram_lm_fertility(spark, sf_dir)
    row = fert.agg(
        F.sum("n_pieces").alias("p"), F.sum("n_words").alias("w")
    ).collect()[0]
    ulm_f = row["p"] / row["w"]
    brow = (
        txt_bpe_tokenize(spark, sf_dir)
        .agg(F.sum("n_bpe_tokens").alias("p"), F.sum("n_words").alias("w"))
        .collect()[0]
    )
    bpe_f = brow["p"] / brow["w"]
    assert 1.0 <= ulm_f <= U.MAX_PIECE_LEN * 2
    assert 1.0 <= bpe_f
    # same corpus, comparable vocab budgets — the two tokenizers must
    # land in the same fertility regime, not orders of magnitude apart
    assert ulm_f <= 3 * bpe_f and bpe_f <= 3 * ulm_f
