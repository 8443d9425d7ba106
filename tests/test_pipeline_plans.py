"""Plan-level assertions for the training-pipeline operators' scale
claims: the properties README/COVERAGE promise must be visible in the
executed physical plan, not just asserted in prose.

Checked here:
- txt_decontaminate's benchmark-gram join is a broadcast (the training
  side must never shuffle on gram);
- the SimHash signature build aggregates the gram explosion
  exchange-free on top of the doc_id repartition (exactly ONE Exchange
  below the aggregation);
- dd_ngram_jaccard_pairs scores pairs against broadcast per-doc sizes;
- per-operator invariants of the new text/similarity operators that a
  value-hash oracle can't see (population conservation, bound checks).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _live_plan(df) -> str:
    """Render only the LIVE physical plan: walk the executed-plan tree,
    descending through AQE wrappers and query stages but never into an
    InMemoryTableScan's cached build — toString would re-print each
    cache's OWN build plan (exchanges included), double-counting
    shuffles that only ever ran once, and NESTED caches print their
    Final/Initial Plan sections at indents no line-based stripper can
    bracket."""
    lines: list[str] = []

    def walk(node) -> None:
        name = node.getClass().getSimpleName()
        lines.append(node.simpleString(120))
        if "InMemoryTableScan" in name:
            return  # cached subtree: built once at materialization, not live
        if "AdaptiveSparkPlanExec" in name:
            walk(node.executedPlan())
            return
        if "QueryStage" in name:
            walk(node.plan())
            return
        it = node.children().iterator()
        while it.hasNext():
            walk(it.next())

    walk(df._jdf.queryExecution().executedPlan())
    return "\n".join(lines)


def test_decontaminate_broadcasts_benchmark(spark):
    from task_hive_spark.operators.textops import txt_decontaminate

    plan = _plan(txt_decontaminate(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan


def test_simhash_build_single_exchange_below_agg(spark):
    """The gram explode is pre-partitioned by doc_id, so the 32-bit
    vote aggregation must introduce NO additional exchange: the only
    shuffles in the build plan are the doc_id repartition itself and
    nothing keyed by gram."""
    from task_hive_spark.operators.dedup import _doc_shingles
    from task_hive_spark.functions.text import portable_hash64
    from task_hive_spark.operators.dedup import SIMHASH_BITS

    grams = _doc_shingles(spark, SF_DIR).withColumn(
        "h", portable_hash64(F.col("gram"), seed="sh-")
    )
    agg = grams.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"c{b}")
            for b in range(SIMHASH_BITS)
        ],
    )
    plan = _plan(agg)
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges == 1, f"expected only the doc_id repartition:\n{plan}"


def test_jaccard_sizes_joined_broadcast(spark):
    from task_hive_spark.operators.dedup import dd_ngram_jaccard_pairs

    plan = _plan(dd_ngram_jaccard_pairs(spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2, plan


def test_unigram_logprob_single_live_traversal(spark):
    """The per-doc unigram scores are now themselves a session index
    (round 7: the classifier reads them three ways per run), so the
    registered query's LIVE plan is the cheapest possible: one cached
    scan plus the final sort's range exchange — zero hash exchanges,
    zero joins, zero scalar-total exchanges (the vocab broadcast and
    the total all live in the index build)."""
    from task_hive_spark.operators.textops import txt_unigram_logprob

    lp = _live_plan(txt_unigram_logprob(spark, SF_DIR))
    assert lp.count("Exchange hashpartitioning") == 0, lp
    assert lp.count("Exchange SinglePartition") == 0, lp
    assert lp.count("BroadcastHashJoin") == 0, lp
    assert "InMemoryTableScan" in lp, lp


def test_decontaminate_no_live_hash_exchange(spark):
    """Decontamination over the materialized token_index: both gram
    branches are cache-scan + explode, the benchmark side broadcasts,
    and the per-doc overlap count rides the index's doc_id partitioning
    — ZERO live hash exchanges (tokenize+repartition run once, at index
    build)."""
    from task_hive_spark.operators.textops import txt_decontaminate

    lp = _live_plan(txt_decontaminate(spark, SF_DIR))
    assert lp.count("Exchange hashpartitioning") == 0, lp


def test_pq_codes_exchange_free_aggregations(spark):
    """The codes report reads the materialized _pq_code_index (encoded
    once per session — the DIM×PQ_K fan-out, codebook broadcast and
    vec_id repartition all live in the index build), so the LIVE plan
    is an in-memory scan + an aggregation that rides the index's
    vec_id partitioning: ZERO hash exchanges, zero joins, just the
    output sort."""
    from task_hive_spark.operators.similarity import sim_pq_codes

    lp = _live_plan(sim_pq_codes(spark, SF_DIR))
    assert "InMemoryTableScan" in lp, lp
    assert lp.count("Exchange hashpartitioning") == 0, lp
    assert lp.count("BroadcastHashJoin") == 0, lp
    assert lp.count("Exchange rangepartitioning") == 1, lp


def test_jaccard_pairs_single_live_shuffle(spark):
    """Above the materialized postings/sizes indexes the pair query is
    ONE shuffle (the (doc_a, doc_b) count) plus the output sort — pair
    emission is generators over the cached postings, and both size
    lookups broadcast from the cached sizes index. A second live hash
    exchange would mean the inverted index is being rebuilt or the
    scoring join shuffles the pair stream. The output sort is the
    report sort (one SinglePartition exchange, functions/report.py) —
    a rangepartitioning exchange re-appearing means the range-sampler
    job is back."""
    from task_hive_spark.operators.dedup import dd_ngram_jaccard_pairs

    lp = _live_plan(dd_ngram_jaccard_pairs(spark, SF_DIR))
    assert lp.count("Exchange hashpartitioning") == 1, lp
    assert lp.count("Exchange rangepartitioning") == 0, lp
    assert lp.count("Exchange SinglePartition") == 1, lp
    assert lp.count("BroadcastHashJoin") == 2, lp


def test_kmeans_step_conserves_population(spark):
    """Every vector is assigned to exactly one cell, so per-cell
    populations must sum to the corpus size; drift is a valid
    1-cosine value."""
    from task_hive_spark.operators.similarity import sim_kmeans_step
    from task_hive_spark.sources.fixtures import load_table

    rows = sim_kmeans_step(spark, SF_DIR).collect()
    n_vecs = load_table(spark, SF_DIR, "embeddings").count()
    assert sum(r["n_assigned"] for r in rows) == n_vecs
    assert all(0.0 <= r["drift"] <= 2.0 for r in rows)


def test_repetition_filter_bounds(spark):
    from task_hive_spark.operators.textops import txt_repetition_filter

    rows = txt_repetition_filter(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert 0 < r["distinct_ratio"] <= 1.0
        assert 0 < r["top2_frac"] <= 1.0
    # thresholds must split the corpus non-trivially
    kept = sum(r["keep"] for r in rows)
    assert 0 < kept < len(rows)


def test_chunk_dedup_groups_are_real(spark):
    """Every reported group has >1 copies, and the augmented corpus's
    exact-dup docs guarantee at least one group exists."""
    from task_hive_spark.operators.dedup import dd_chunk_dedup

    rows = dd_chunk_dedup(spark, SF_DIR).collect()
    assert rows
    assert all(r["n_copies"] > 1 for r in rows)


def test_frame_sample_bounded_fanout(spark):
    from task_hive_spark.operators.multimodal import MM_FRAME_COUNT, mm_frame_sample

    df = mm_frame_sample(spark, SF_DIR)
    per_asset = df.groupBy("asset_id").count().agg(F.max("count")).first()[0]
    assert per_asset <= MM_FRAME_COUNT


def test_mix_rebalance_waterfill_invariants(spark):
    """Waterfill semantics the value-hash oracle can't express as
    invariants: every sampling rate ≤ 1, at least one (binding)
    language samples at exactly 1.0, and the sampled mix hits the
    target shares (sampled_tokens ∝ target_share)."""
    from task_hive_spark.operators.textops import MIX_TARGETS, txt_mix_rebalance

    rows = txt_mix_rebalance(spark, SF_DIR).collect()
    assert {r["lang"] for r in rows} == set(MIX_TARGETS)
    assert all(0.0 < r["sample_rate"] <= 1.0 for r in rows)
    assert any(r["sample_rate"] == 1.0 for r in rows)
    total_sampled = sum(r["sampled_tokens"] for r in rows)
    for r in rows:
        achieved = r["sampled_tokens"] / total_sampled
        assert abs(achieved - MIX_TARGETS[r["lang"]]) < 0.01, (r["lang"], achieved)


def test_dup_rate_by_source_conserves_corpus(spark):
    """The per-source rollup must tile the augmented corpus exactly:
    source doc counts sum to the corpus size, near-dup counts never
    exceed them, and rates stay in [0, 1]."""
    from task_hive_spark.operators.dedup import corpus_df, dd_dup_rate_by_source

    rows = dd_dup_rate_by_source(spark, SF_DIR).collect()
    n_corpus = corpus_df(spark, SF_DIR).count()
    assert sum(r["n_docs"] for r in rows) == n_corpus
    for r in rows:
        assert 0 <= r["n_near_dup"] <= r["n_docs"]
        assert 0.0 <= r["dup_rate"] <= 1.0
    # the injected near-dups guarantee a nonzero rate somewhere
    assert any(r["n_near_dup"] > 0 for r in rows)


def test_sequence_pack_distributed_prefix_sum(spark):
    """The corpus-wide token prefix sum must never funnel through a
    single-partition window: every window in the plan carries a
    partitionBy (the range bucket), and bins must tile the corpus —
    token totals conserved, every bin except possibly the last holding
    ≥ SEQ_LEN tokens' worth of starting offset coverage."""
    from task_hive_spark.operators.textops import SEQ_LEN, txt_sequence_pack
    from task_hive_spark.sources.fixtures import load_table
    from task_hive_spark.functions.text import ws_token_count

    df = txt_sequence_pack(spark, SF_DIR)
    plan = _plan(df)
    # an unpartitioned window prints 'windowspecdefinition(<sort-only>'
    # with no partition expressions before the ASC marker — assert via
    # the physical Window nodes instead: each must partition on _bkt
    for ln in plan.splitlines():
        if "Window " in ln and "windowspecdefinition" in ln:
            assert "_bkt" in ln, f"unpartitioned window in plan:\n{ln}"
    rows = df.collect()
    total = (
        load_table(spark, SF_DIR, "documents")
        .where(F.length(F.trim("text")) > 0)
        .select(ws_token_count(F.col("text")).cast("long").alias("n"))
        .agg(F.sum("n"))
        .first()[0]
    )
    assert sum(r["total_tokens"] for r in rows) == total
    assert [r["bin_id"] for r in rows] == sorted(r["bin_id"] for r in rows)
    # bins are dense: 0..max with no gaps (every SEQ_LEN offset stripe
    # that contains at least one doc start appears; doc sizes < SEQ_LEN
    # in the fixtures so no stripe is skipped)
    assert rows[0]["bin_id"] == 0


def test_tpch_completion_plan_shapes(spark):
    """The partsupp-surrogate TPC-H queries keep their scale-safe plan
    shapes: dimensions broadcast, no cartesian products, and the fact
    joins bounded to the expected hash-exchange budget (Q9's composite
    (part,supp) join is the only query allowed two fact shuffles; Q2
    pays the surrogate's distinct plus one window shuffle)."""
    from task_hive_spark.operators.relational import (
        rel_q2_min_cost_supplier,
        rel_q9_product_profit,
        rel_q11_important_stock,
        rel_q21_waiting_suppliers,
    )

    # query -> (max hash exchanges, allowed 1-row-scalar BNLJs, min BHJs)
    # q11's dims broadcast inside the localCheckpoint'd aggregate, so
    # its TOP-LEVEL plan is checkpoint-scan + scalar-threshold filter —
    # no joins left to see.
    budgets = {
        rel_q2_min_cost_supplier: (2, 0, 1),
        rel_q9_product_profit: (3, 0, 1),
        rel_q11_important_stock: (0, 1, 0),  # crossJoin(broadcast(total)): 1-row dim
        rel_q21_waiting_suppliers: (5, 0, 1),
    }
    for fn, (max_ex, max_bnlj, min_bhj) in budgets.items():
        plan = _plan(fn(spark, SF_DIR))
        assert "CartesianProduct" not in plan, fn.__name__
        assert plan.count("BroadcastNestedLoopJoin") <= max_bnlj, fn.__name__
        n = plan.count("Exchange hashpartitioning")
        assert n <= max_ex, f"{fn.__name__}: {n} > {max_ex}\n{plan}"
        assert plan.count("BroadcastHashJoin") >= min_bhj, fn.__name__


def test_bm25_rides_token_index_partitioning(spark):
    """BM25 over the materialized token_index: the tf aggregation and
    the final per-doc score aggregation both key on doc_id (or a
    superset), so they ride the index's doc_id hash partitioning — the
    only live hash exchange is the |terms|-row df aggregate, corpus
    stats pay one single-partition scalar exchange, both join back as
    broadcasts, and the top-k is a TakeOrderedAndProject (per-partition
    heaps), never a global sort."""
    from task_hive_spark.operators.textops import txt_bm25_topk

    df = txt_bm25_topk(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    lp = _live_plan(df)
    assert lp.count("Exchange hashpartitioning") == 1, lp
    assert lp.count("Exchange SinglePartition") == 1, lp
    assert "TakeOrderedAndProject" in lp, lp
    assert "Sort " not in lp.split("TakeOrderedAndProject")[0], lp


def test_snapshot_merge_single_id_shuffle_per_side(spark):
    """The CDC merge is ONE full-outer sort-merge join on id — each
    side pays exactly one id shuffle, the rollup pays one status
    shuffle, and nothing else moves (no cartesian, no repeated snapshot
    traversal)."""
    from task_hive_spark.operators.queries import th_snapshot_merge

    df = th_snapshot_merge(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    lp = _live_plan(df)
    assert lp.count("SortMergeJoin") == 1 and "FullOuter" in lp, lp
    assert lp.count("Exchange hashpartitioning") <= 3, lp
    assert "CartesianProduct" not in lp, lp


def test_pagerank_conserves_rank_mass(spark):
    """Every node has out-degree PR_OUT_DEG (no dangling nodes), so each
    iteration redistributes ALL rank mass: Σ r must stay exactly 1 (to
    double tolerance) after PR_ITERS rounds — the invariant a
    value-hash over the top-k alone can't see. The iterative build must
    also keep its per-round plan O(1): the final rank frame is a
    localCheckpoint scan, not a 5-round join tower."""
    from pyspark.sql import functions as F

    from task_hive_spark.operators import graph

    r = graph._ranks(spark, SF_DIR)
    total = r.agg(F.sum("r").alias("s")).collect()[0]["s"]
    assert abs(total - 1.0) < 1e-9, total
    n = r.count()
    mins = r.agg(F.min("r").alias("m")).collect()[0]["m"]
    assert mins >= (1.0 - graph.PR_D) / n - 1e-12, mins
    assert "localCheckpoint" in r._jdf.queryExecution().logical().toString() or \
        "LogicalRDD" in r._jdf.queryExecution().logical().toString()


def test_importance_sample_partition_invariant(spark):
    """The two-level A-Res reservoir's INTERMEDIATE (per-(lang,pid)
    top-k) depends on physical partitioning; the RESULT must not —
    top-k of per-partition top-ks is the global top-k. Changing the
    shuffle width (which moves spark_partition_id assignments) must not
    change a single sampled row."""
    from task_hive_spark.operators.textops import txt_importance_sample

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
        a = [tuple(r) for r in txt_importance_sample(spark, SF_DIR).collect()]
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = [tuple(r) for r in txt_importance_sample(spark, SF_DIR).collect()]
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
    assert len(a) > 0


def test_headline_plans_free_of_row_python_and_cartesians(spark):
    """Whole-surface guard (fast subset of scripts/plan_audit.py, which
    audits all registered queries): no headline query's executed plan
    may contain a row-at-a-time Python eval or an unbounded cartesian —
    the two anti-patterns that silently survive value-hash oracles.
    Full-audit state at last run: every registered query, zero hard flags (r5)."""
    import __spark_entry__ as entrymod
    from bench import HEADLINE

    qs = entrymod.queries()
    for name in HEADLINE:
        df = qs[name](spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan, name
        assert "CartesianProduct" not in plan, name


def test_pagerank_matches_pure_python_power_iteration(spark):
    """Third-implementation triangulation: the Spark iteration and the
    unrolled-CTE oracle share their derivation strings, so a shared
    conceptual error would pass the hash gate. This model rebuilds the
    graph and runs the power iteration straight from the formula in
    plain Python and must agree on every rounded rank."""
    from task_hive_spark.operators import graph

    n = 500  # sf0.001 documents: doc_id contiguous 0..499
    out = {i: [] for i in range(n)}
    for a, b in graph.PR_LINKS:
        for src in range(n):
            dst = (src * a + b) % n
            if dst == src:
                dst = (dst + 1) % n
            out[src].append(dst)
    r = [1.0 / n] * n
    base = (1.0 - graph.PR_D) / n
    for _ in range(graph.PR_ITERS):
        nxt = [base] * n
        for src in range(n):
            share = graph.PR_D * r[src] / graph.PR_OUT_DEG
            for dst in out[src]:
                nxt[dst] += share
        r = nxt
    expected = sorted(
        ((round(v, 6), i) for i, v in enumerate(r)),
        key=lambda t: (-t[0], t[1]),
    )[: graph.PR_TOP]
    got = [
        (r_["pagerank"], r_["doc_id"])
        for r_ in graph.gr_pagerank(spark, "/root/testdata/sf0.001").collect()
    ]
    assert got == [(v, i) for v, i in expected]


def test_bind_slot_join_is_broadcast_hash(spark):
    """The J1 slots lookup must be an equi-key BroadcastHashJoin (one
    hash probe per task). The only nested-loop join allowed in the plan
    is the single-row n_workers count streaming through the task side —
    folding n_workers into the join predicate instead would drop the
    equi key and evaluate the modulo against every slot row per task."""
    from task_hive_spark.operators.assign import assign, assign_salted

    for df in (assign(spark, SF_DIR), assign_salted(spark, SF_DIR)):
        plan = _plan(df)
        assert plan.count("BroadcastHashJoin") == 1, plan
        assert plan.count("BroadcastNestedLoopJoin") == 1, plan


def test_wav_decoder_parses_a_genuine_riff_container():
    """decode_wav must be a REAL parser: hand it a foreign WAV (stereo,
    rate/width not producible by the synth encoder path) and require
    the header fields and PCM stats to come back exactly — plus the
    encode→decode round trip of the synth geometry, and the
    decode_asset_real dispatch routing wav to the real decoder while
    the other formats stay stubbed."""
    import io
    import struct
    import wave as _wave

    import pytest

    from task_hive_spark.operators.multimodal import (
        _wav_params,
        _wav_sample,
        decode_asset_real,
        decode_wav,
        synth_wav_bytes,
    )

    # foreign container: stereo, 22050 Hz, interleaved frames
    buf = io.BytesIO()
    with _wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(22050)
        w.writeframes(struct.pack("<6h", 100, -200, 300, -400, 500, -600))
    nch, bits, rate, nf, s, lo, hi = decode_wav(buf.getvalue())
    assert (nch, bits, rate, nf) == (2, 16, 22050, 3)
    assert (s, lo, hi) == (100 - 200 + 300 - 400 + 500 - 600, -600, 500)

    # synth round trip: header + every stat matches the ramp formula
    aid = 12346  # % 3 == 1 (audio), % 2 == 0 (wav)
    n, srate = _wav_params(aid)
    samples = [_wav_sample(aid, i) for i in range(n)]
    got = decode_asset_real("audio", synth_wav_bytes(aid), "wav")
    assert got == (1, 16, srate, n, sum(samples), min(samples), max(samples))

    # jpeg remains stubbed in this container (png is now real)
    with pytest.raises(NotImplementedError):
        decode_asset_real("image", b"\xff\xd8\xff", "jpeg")


def test_ppm_decoder_parses_a_genuine_p6_container():
    """decode_ppm must be a REAL parser: hand it a foreign P6 (comment-
    free but with multi-space/newline-mixed header whitespace and dims
    the synth path never produces) and require header fields and channel
    sums to come back exactly — plus the encode→decode round trip of the
    synth geometry, and decode_asset_real routing ppm to the real
    decoder while png/jpeg stay stubbed."""
    import pytest

    from task_hive_spark.operators.multimodal import (
        _ppm_byte,
        _ppm_dims,
        decode_asset_real,
        decode_ppm,
        synth_ppm_bytes,
    )

    # foreign container: 2x2, maxval 200, mixed header whitespace
    payload = bytes(range(12))  # RGB RGB / RGB RGB
    foreign = b"P6 2\n2  200\n" + payload
    w, h, maxval, npix, sr, sg, sb = decode_ppm(foreign)
    assert (w, h, maxval, npix) == (2, 2, 200, 4)
    assert (sr, sg, sb) == (0 + 3 + 6 + 9, 1 + 4 + 7 + 10, 2 + 5 + 8 + 11)

    # synth round trip: header + every channel sum matches the ramp
    aid = 12345  # % 3 == 0 (image)
    wd, ht = _ppm_dims(aid)
    ramp = [_ppm_byte(aid, j) for j in range(3 * wd * ht)]
    got = decode_asset_real("image", synth_ppm_bytes(aid), "ppm")
    assert got == (
        wd, ht, 255, wd * ht, sum(ramp[0::3]), sum(ramp[1::3]), sum(ramp[2::3])
    )

    # truncated payload and wrong magic must fail loudly, not mis-decode
    with pytest.raises(ValueError):
        decode_ppm(synth_ppm_bytes(aid)[:-1])
    with pytest.raises(ValueError):
        decode_ppm(b"P5 2 2 255 " + payload)

    # jpeg remains stubbed in this container; png now routes to the
    # real decoder (a bare signature is a truncated container)
    with pytest.raises(NotImplementedError):
        decode_asset_real("image", b"\xff\xd8\xff", "jpeg")
    with pytest.raises(ValueError):
        decode_asset_real("image", b"\x89PNG", "png")


def test_ppm_decoder_rejects_truncated_header_and_wide_maxval():
    """Review finding r10: a header cut before three tokens must raise
    (not spin at EOF), and maxval > 255 (legal 2-byte-per-sample P6)
    must be rejected loudly rather than mis-sliced as 1-byte samples."""
    import pytest

    from task_hive_spark.operators.multimodal import decode_ppm

    for bad in (b"P6", b"P6\n", b"P6\n4 3\n255", b"P6 4"):
        with pytest.raises(ValueError):
            decode_ppm(bad)
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n65535\n" + bytes(24))
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 2\n0\n" + bytes(12))


def test_y4m_decoder_parses_a_genuine_stream():
    """decode_y4m must be a REAL parser: a foreign C444 stream (dims,
    frame rate, and extra header tags the synth path never produces)
    comes back exactly; the synth round trip matches the ramp formula;
    subsampled colorspaces, bad magic, bad FRAME markers, and truncated
    planes fail loudly; decode_asset_real routes y4m to the real
    decoder."""
    import pytest

    from task_hive_spark.operators.multimodal import (
        _y4m_byte,
        _y4m_geometry,
        decode_asset_real,
        decode_y4m,
        synth_y4m_bytes,
    )

    # foreign stream: 3x2 C444, 30000:1001 fps, interlace/aspect tags,
    # 2 frames with hand-laid plane bytes
    y = bytes(range(6))
    u = bytes(range(10, 16))
    v = bytes(range(20, 26))
    frame = b"FRAME\n" + y + u + v
    foreign = b"YUV4MPEG2 W3 H2 F30000:1001 It A4:3 C444\n" + frame + frame
    assert decode_y4m(foreign) == (
        3, 2, 30000, 1001, 2, 2 * sum(y), 2 * sum(u), 2 * sum(v)
    )

    # synth round trip: header + every plane sum matches the ramp
    aid = 12347  # % 3 == 2 (video)
    w, h, fn, fd, n = _y4m_geometry(aid)
    sums = [
        sum(_y4m_byte(aid, k, p, i) for k in range(n) for i in range(w * h))
        for p in range(3)
    ]
    got = decode_asset_real("video", synth_y4m_bytes(aid), "y4m")
    assert got == (w, h, fn, fd, n, sums[0], sums[1], sums[2])

    for bad in (
        b"JUNK W2 H2 F1:1 C444\n",
        b"YUV4MPEG2 W2 H2 F1:1\n" + b"FRAME\n" + bytes(12),  # default C420 → reject
        b"YUV4MPEG2 W2 H2 F1:1 C420\n" + b"FRAME\n" + bytes(6),
        b"YUV4MPEG2 W2 H2 F1:1 C444\n" + b"XRAME\n" + bytes(12),
        b"YUV4MPEG2 W2 H2 F1:1 C444\n" + b"FRAME\n" + bytes(11),  # truncated
        b"YUV4MPEG2 W2 H2 C444\n" + b"FRAME\n" + bytes(12),  # missing F
        b"YUV4MPEG2 W-2 H3 F1:1 C444\n" + b"FRAME\n" + bytes(12),  # neg width
        b"YUV4MPEG2 W0 H2 F1:1 C444\n" + b"FRAME\n",  # zero width
        b"YUV4MPEG2 W2 H2 F1:1 C444\n" + b"FRAMES\n" + bytes(12),  # corrupt marker
    ):
        with pytest.raises(ValueError):
            decode_y4m(bad)


def test_png_decoder_parses_a_genuine_container():
    """decode_png must be a REAL parser: a foreign PNG the synth path
    never produces (single IDAT, uniform Up filter, an ancillary tEXt
    chunk the walker must skip-but-CRC-check) decodes exactly; the
    synth round trip matches the raw ramp; bad CRC, truncation, foreign
    magic, unsupported profiles, and an unknown filter type fail
    loudly; decode_asset_real routes png to the real decoder."""
    import struct
    import zlib

    import pytest

    from task_hive_spark.operators.multimodal import (
        _png_byte,
        _png_chunk,
        _png_dims,
        decode_asset_real,
        decode_png,
        synth_png_bytes,
        synth_ppm_bytes,
    )

    # foreign container: 2x3 RGB, every row filter 2 (Up), one IDAT,
    # plus a tEXt ancillary chunk between IDAT and IEND
    w, h = 2, 3
    raw = [[(10 * r + x) for x in range(3 * w)] for r in range(h)]
    lines = bytearray()
    prior = [0] * (3 * w)
    for r in range(h):
        lines.append(2)
        lines.extend((raw[r][x] - prior[x]) % 256 for x in range(3 * w))
        prior = raw[r]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    foreign = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines)))
        + _png_chunk(b"tEXt", b"Comment\x00not from the synth path")
        + _png_chunk(b"IEND", b"")
    )
    flat = [v for row in raw for v in row]
    assert decode_png(foreign) == (
        2, 3, 8, 2, 6, sum(flat[0::3]), sum(flat[1::3]), sum(flat[2::3])
    )

    # synth round trip via the dispatcher
    aid = 10**6 + 3
    wd, ht = _png_dims(aid)
    ramp = [_png_byte(aid, j) for j in range(3 * wd * ht)]
    assert decode_asset_real("image", synth_png_bytes(aid), "png") == (
        wd, ht, 8, 2, wd * ht, sum(ramp[0::3]), sum(ramp[1::3]), sum(ramp[2::3])
    )

    # corrupted payload byte -> CRC failure, not a silent mis-decode
    good = synth_png_bytes(aid)
    bad = bytearray(good)
    bad[len(good) // 2] ^= 0x55
    with pytest.raises(ValueError):
        decode_png(bytes(bad))
    for broken in (good[:-1], good[:20], synth_ppm_bytes(aid), b""):
        with pytest.raises(ValueError):
            decode_png(broken)
    # unsupported profile: 16-bit depth
    deep = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 16, 2, 0, 0, 0))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(deep)
    # unknown filter type on a row
    badfilter = (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes([7] + [0] * (3 * w)) * h))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_png(badfilter)


def test_mp4_probe_parses_a_genuine_box_tree():
    """probe_mp4 must be a REAL ISO BMFF walker: a foreign tree the
    synth path never produces (two traks, an unknown 'udta' box to
    skip, mdat split in two) probes exactly; 64-bit largesize boxes
    (size == 1) and truncated/oversized boxes fail loudly."""
    import struct

    import pytest

    from task_hive_spark.operators.multimodal import (
        _box,
        _mp4_geom,
        _mp4_mdat_byte,
        probe_mp4,
        synth_mp4_bytes,
    )

    def tkhd(tid, w, h):
        return _box(
            b"tkhd",
            struct.pack(">IIIIII", 0x7, 0, 0, tid, 0, 500)
            + b"\x00" * 8
            + struct.pack(">hhhh", 0, 0, 0, 0)
            + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + struct.pack(">II", w << 16, h << 16),
        )

    mvhd = _box(
        b"mvhd",
        struct.pack(">IIIII", 0, 0, 0, 90000, 4500)
        + struct.pack(">i", 0x00010000)
        + struct.pack(">h", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 3),
    )
    foreign = (
        _box(b"ftyp", b"mp42" + struct.pack(">I", 1) + b"mp42")
        + _box(b"moov", mvhd + _box(b"trak", tkhd(1, 320, 240))
               + _box(b"trak", tkhd(2, 640, 480))
               + _box(b"udta", b"ignore me"))
        + _box(b"mdat", bytes([5, 6]))
        + _box(b"mdat", bytes([7]))
    )
    got = probe_mp4(foreign)
    # last trak wins the track fields; both counted; mdat accumulates
    assert got == ("mp42", 90000, 4500 * 1000 // 90000, 2, 2, 640, 480, 3, 18)

    # synth round trip
    aid = 54321
    ts, dur, w, h, tid, n = _mp4_geom(aid)
    assert probe_mp4(synth_mp4_bytes(aid)) == (
        "isom", ts, dur * 1000 // ts, 1, tid, w, h, n,
        sum(_mp4_mdat_byte(aid, j) for j in range(n)),
    )

    # largesize (size == 1) is rejected loudly, not mis-framed
    large = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16)
    with pytest.raises(ValueError):
        probe_mp4(_box(b"ftyp", b"isom" + b"\x00" * 8) + large)
    for broken in (synth_mp4_bytes(aid)[:-1], b"", b"\x00\x00\x00\x20ftyp"):
        with pytest.raises(ValueError):
            probe_mp4(broken)
    # short-but-valid-size mvhd/tkhd payloads reject with ValueError
    # (the parser family's loud-failure contract), not struct.error
    short_mvhd = (
        _box(b"ftyp", b"isom" + b"\x00" * 8)
        + _box(b"moov", _box(b"mvhd", b"\x00" * 12))
    )
    with pytest.raises(ValueError):
        probe_mp4(short_mvhd)
    short_tkhd = (
        _box(b"ftyp", b"isom" + b"\x00" * 8)
        + _box(b"moov", mvhd + _box(b"trak", _box(b"tkhd", b"\x00" * 16)))
    )
    with pytest.raises(ValueError):
        probe_mp4(short_tkhd)


def test_jpeg_coeff_decoder_is_a_generic_baseline_decoder():
    """decode_jpeg_coeffs must decode FOREIGN baseline scans, not just the
    synth encoder's: a hand-built grayscale JPEG with NONZERO AC
    coefficients (run/size codes, a ZRL, then EOB) and its own Huffman
    table layout decodes to the right DC sum; malformed streams reject
    loudly."""
    import struct

    import pytest

    from task_hive_spark.operators.multimodal import (
        decode_jpeg_coeffs,
        synth_jpeg_coeff_bytes,
    )

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload

    dqt = seg(0xDB, bytes([0, 4]) + bytes(range(1, 64)))  # DC step 4
    sof0 = seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8)
               + bytes([1, 7, 0x11, 0]))
    # DC table: cat 0 -> "0", cat 3 -> "10"; AC table: EOB "00",
    # (0,1) "01", ZRL "10", (2,1) "11"
    dht = seg(0xC4,
              bytes([0x00, 1, 1] + [0] * 14) + bytes([0, 3])
              + bytes([0x10, 0, 4] + [0] * 14) + bytes([0x00, 0x01, 0xF0, 0x21]))
    sos = seg(0xDA, bytes([1, 7, 0x00, 0, 63, 0]))
    # scan: DC cat3 "10" + 101 (=+5); AC (0,1)"01"+1, ZRL "10",
    # (2,1)"11"+0, EOB "00"; 15 bits -> 1-padded to 0xAB 0xB1
    foreign = (b"\xff\xd8" + dqt + sof0 + dht + sos
               + bytes([0xAB, 0xB1]) + b"\xff\xd9")
    # DC +5 x qstep 4 = 20; ACs: +1 at zigzag 1 (qt[1] = 1), then ZRL
    # (16 zeros) + run 2 put -1 at zigzag 20 (qt[20] = 20) -> 1 - 20
    assert decode_jpeg_coeffs(foreign) == (8, 8, 1, 1, 1, 20, 0, 0, -19, 0, 0, 2)

    good = synth_jpeg_coeff_bytes(42)
    # non-baseline SOF, 16-bit DQT, 2x2 sampling, garbage padding
    with pytest.raises(ValueError):
        decode_jpeg_coeffs(b"\xff\xd8" + seg(0xC1, bytes(8)))
    with pytest.raises(ValueError):
        decode_jpeg_coeffs(b"\xff\xd8" + seg(0xDB, bytes([0x10]) + bytes(128)) + good[2:])
    sof_sub = seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 7, 0x22, 0]))
    with pytest.raises(ValueError):
        decode_jpeg_coeffs(b"\xff\xd8" + dqt + sof_sub + dht + sos
                       + bytes([0xAB, 0xB1]) + b"\xff\xd9")
    # an extra full byte after the last MCU is not padding
    with pytest.raises(ValueError):
        decode_jpeg_coeffs(b"\xff\xd8" + dqt + sof0 + dht + sos
                       + bytes([0xAB, 0xB1, 0xEE]) + b"\xff\xd9")
    # truncated scan exhausts the bit reader loudly
    with pytest.raises(ValueError):
        decode_jpeg_coeffs(b"\xff\xd8" + dqt + sof0 + dht + sos
                       + bytes([0xAB]) + b"\xff\xd9")


def test_jpeg_mp3_webm_probes_parse_genuine_streams():
    """The three remaining probes must be REAL parsers, each pinned on
    a foreign stream its synth path never produces, plus loud failure
    modes: JPEG — FF00 byte stuffing and a COM segment, progressive
    SOF2 rejected; MP3 — padded frames (the +1 byte length case) and a
    mid-stream bitrate change rejected; WebM — a multi-byte varint
    size (the 1-byte-width shortcut would mis-frame it) and a non-webm
    DocType reported, truncation rejected."""
    import struct

    import pytest

    from task_hive_spark.operators.multimodal import (
        _ebml_el,
        probe_jpeg,
        probe_mp3,
        probe_webm,
        synth_jpeg_bytes,
        synth_mp3_bytes,
        synth_webm_bytes,
    )

    # --- JPEG foreign: COM segment + stuffed FF in the entropy stream
    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(payload)) + payload

    foreign = (
        b"\xff\xd8"
        + seg(0xFE, b"comment")
        + seg(0xC0, bytes([12]) + struct.pack(">HH", 10, 20) + bytes([1, 0x11, 0]))
        + seg(0xDA, bytes([1, 1, 0, 0, 63, 0]))
        + bytes([1, 2]) + b"\xff\x00" + bytes([3])
        + b"\xff\xd9"
    )
    # 12-bit precision, 1 component, stuffed FF counts as one 0xFF byte
    assert probe_jpeg(foreign) == (20, 10, 12, 1, 3, 4, 1 + 2 + 0xFF + 3)
    # restart markers (DRI streams) and FF fill bytes are legal inside
    # the entropy stream: RSTn is skipped (not entropy data), a FF fill
    # byte before a marker is consumed (T.81 B.1.1.2)
    restarts = (
        b"\xff\xd8"
        + seg(0xC0, bytes([8]) + struct.pack(">HH", 10, 20) + bytes([1, 0x11, 0]))
        + seg(0xDA, bytes([1, 1, 0, 0, 63, 0]))
        + bytes([1, 2]) + b"\xff\xd0" + bytes([3]) + b"\xff\xd7"
        + bytes([4]) + b"\xff\xff\xd9"
    )
    assert probe_jpeg(restarts) == (20, 10, 8, 1, 2, 4, 1 + 2 + 3 + 4)
    prog = b"\xff\xd8" + seg(0xC2, bytes(8))
    with pytest.raises(ValueError):
        probe_jpeg(prog)
    with pytest.raises(ValueError):
        probe_jpeg(synth_jpeg_bytes(7)[:-1])
    with pytest.raises(ValueError):
        probe_jpeg(b"\x89PNG")

    # --- MP3 foreign: padding bit set -> frame_len + 1
    hdr_pad = bytes([0xFF, 0b11111011, (9 << 4) | (0 << 2) | 0b10, 0])
    flen = 144 * 128000 // 44100 + 1
    frame = hdr_pad + bytes([7] * (flen - 4))
    assert probe_mp3(frame * 2) == (
        128, 44100, 2, 2 * 1152 * 1000 // 44100, 2 * (flen - 4), 2 * 7 * (flen - 4)
    )
    hdr_other = bytes([0xFF, 0b11111011, (10 << 4) | (0 << 2) | 0b00, 0])
    flen2 = 144 * 160000 // 44100
    with pytest.raises(ValueError):
        probe_mp3(frame + hdr_other + bytes([0] * (flen2 - 4)))
    with pytest.raises(ValueError):
        probe_mp3(synth_mp3_bytes(3)[:-1])
    with pytest.raises(ValueError):
        probe_mp3(b"ID3\x04")

    # --- WebM foreign: matroska DocType + a 2-byte varint size
    big_name = b"x" * 200  # forces a 2-byte size varint on the element
    ebml = _ebml_el(
        b"\x1a\x45\xdf\xa3",
        _ebml_el(b"\x42\x82", b"matroska") + _ebml_el(b"\x42\x85", big_name),
    )
    seg_el = _ebml_el(
        b"\x18\x53\x80\x67",
        _ebml_el(
            b"\x15\x49\xa9\x66",
            _ebml_el(b"\x2a\xd7\xb1", (1000000).to_bytes(3, "big"))
            + _ebml_el(b"\x44\x89", struct.pack(">d", 2500.0)),
        )
        + _ebml_el(
            b"\x16\x54\xae\x6b",
            _ebml_el(
                b"\xae",
                _ebml_el(b"\xd7", bytes([2]))
                + _ebml_el(b"\x83", bytes([17]))  # subtitle track type
                + _ebml_el(
                    b"\xe0",
                    _ebml_el(b"\xb0", (1920).to_bytes(2, "big"))
                    + _ebml_el(b"\xba", (1080).to_bytes(2, "big")),
                ),
            ),
        ),
    )
    assert probe_webm(ebml + seg_el) == (
        "matroska", 1000000, 2500, 2, 17, 1920, 1080
    )
    with pytest.raises(ValueError):
        probe_webm(synth_webm_bytes(9)[:-1])
    with pytest.raises(ValueError):
        probe_webm(b"\x00\x00\x00\x00")
