"""Round-14 OPTIMIZATION plan-shape and guard pins.

Same discipline as tests/test_round13_opt.py: each r14 optimization
restructured an operator's internals while keeping its answer
oracle-hash-identical; these tests pin the structural property (or the
safety guard) each one bought. Value equality stays covered by the
oracle gate."""

from __future__ import annotations

import contextlib


def _plan(df) -> str:
    """Analyzed + physical plan text of an UNEXECUTED frame."""
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "extended"
        )
    )


@contextlib.contextmanager
def _bpe_cache_snapshot(spark, sf_dir):
    """Snapshot/restore the BPE merge memo around a test that calls a
    trainer path directly: the trainers write _BPE_MERGE_CACHE for the
    session unconditionally, which would otherwise overwrite (without
    unpersisting) a vocab checkpoint cached by an earlier test and
    leave the test-created frame cached for later ones (r13 ADVICE)."""
    from task_hive_spark.materialize import _unpersist_value
    from task_hive_spark.operators.textops import _BPE_MERGE_CACHE

    key = (spark.sparkContext.applicationId, sf_dir)
    saved = _BPE_MERGE_CACHE.pop(key, None)
    try:
        yield key
    finally:
        created = _BPE_MERGE_CACHE.pop(key, None)
        if created is not None and created is not saved:
            _unpersist_value(created)
        if saved is not None:
            _BPE_MERGE_CACHE[key] = saved


def test_bpe_over_budget_vocab_takes_distributed_path(spark, sf_dir, monkeypatch):
    """r13 verdict item 8: when the driver-heap budget cannot hold the
    vocabulary, _learn_merges must fall through to the distributed
    trainer (never the local collect). Forced here by shrinking the
    budgeted limit to 1 row; the local trainer is poisoned so any
    dispatch regression fails loudly. Result parity between the two
    paths is pinned by test_bpe_local_and_distributed_trainers_agree."""
    from task_hive_spark.operators import textops as T

    monkeypatch.setattr(T, "_bpe_local_limit", lambda _spark: 1)

    def _boom(_rows):
        raise AssertionError("local trainer ran despite an over-budget vocab")

    monkeypatch.setattr(T, "_learn_merges_local", _boom)
    with _bpe_cache_snapshot(spark, sf_dir):
        merges, v = T._learn_merges(spark, sf_dir)
        assert merges and merges[0][0] == 1  # distributed path produced merges
        assert v.count() > 1


def test_bpe_local_limit_tracks_driver_memory():
    """The budgeted limit parses spark.driver.memory units and caps at
    BPE_LOCAL_VOCAB_LIMIT."""
    from task_hive_spark.operators import textops as T

    class _Conf:
        def __init__(self, mem):
            self._mem = mem

        def get(self, _key):
            if self._mem is None:
                raise Exception("unset")
            return self._mem

    class _Stub:
        def __init__(self, mem):
            self.conf = _Conf(mem)

    budget = T._BPE_DRIVER_HEADROOM / T._BPE_ROW_EST_BYTES
    assert T._bpe_local_limit(_Stub("64g")) == T.BPE_LOCAL_VOCAB_LIMIT
    assert T._bpe_local_limit(_Stub("1g")) == int(1024**3 * budget)
    assert T._bpe_local_limit(_Stub("256m")) == int(256 * 1024**2 * budget)
    assert T._bpe_local_limit(_Stub(None)) == int(1024**3 * budget)  # unset → 1g default
    assert T._bpe_local_limit(_Stub("garbage")) == int(1024**3 * budget)
    assert T._bpe_local_limit(_Stub("0")) == 1  # floor


def test_ann_pruned_serve_routing_is_a_values_literal(spark, sf_dir):
    """r14 serve shape: the routed probe_cells side of the ADC join is
    a local relation (VALUES literal — not the r13 extra checkpoint),
    and the fused candidate+code join scans the kept cellcodes files
    exactly ONCE (the r13 shape scanned them twice: a .distinct()
    assignment projection plus the code fetch). The checkpointed index
    constants (probes/centroids/codebook) legitimately remain RDD
    scans."""
    from task_hive_spark.operators.similarity import sim_topk_pq_served_pruned

    df = sim_topk_pq_served_pruned(spark, sf_dir)
    plan = _plan(df)
    assert "LocalRelation" in plan, plan  # the VALUES routing side
    formatted = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    n_cc_scans = formatted.count("cellcodes/part-")
    assert n_cc_scans == 1, f"{n_cc_scans} cellcodes scans (want the fused single scan)"


def test_dedup_pruned_serve_sigs_are_a_values_literal(spark, sf_dir):
    """r14 serve shape: the probe signatures re-enter the pruned dedup
    serve as a VALUES literal (its two broadcast builds are local), and
    the plan still reads index artifacts only."""
    from task_hive_spark.operators.dedup import dd_dedup_served_pruned

    df = dd_dedup_served_pruned(spark, sf_dir)
    plan = _plan(df)
    assert "Scan ExistingRDD" not in plan
    assert "LocalRelation" in plan or "LocalTableScan" in plan, plan
    assert all("ddcidx_" in f for f in df.inputFiles()), df.inputFiles()


def test_no_fat_parquet_subtrees_under_unions(spark, sf_dir):
    """r13 verdict item 5 — the union-over-persisted-plan rule as a
    tripwire. Spark 4.1's CacheManager can MISS a persisted plan
    referenced under a Union, silently re-planning the index build from
    raw parquet once per branch (txt_clean_corpus_stats regressed to
    866 scans this way in r13); the rule is that any session index
    consumed under a Union must use checkpoint=True (a LogicalRDD leaf
    is immune to cache-plan matching). This walks the cache-substituted
    plan of every non-streaming registered query and bounds the parquet
    relations under any single Union: the legitimate maximum today is 6
    (th_assign_strategies / rel_set_ops / dd_split_leakage — unions of
    genuinely different scans), while the miss pattern explodes to
    hundreds. Deliberately reverting _pipe_corpus's checkpoint=True
    makes this fail on txt_clean_corpus_stats (measured: that single
    reverted flag already re-plans 9 parquet relations under the stats
    union at sf0.001; reverting all four pipe indexes re-plans
    hundreds)."""
    import __spark_entry__ as em

    cap = 7  # legitimate maximum today is 6; one reverted flag shows 9

    def children(n):
        ch = n.children()
        return [ch.apply(i) for i in range(ch.size())]

    def count_parquet(root):
        c, stack = 0, [root]
        while stack:
            x = stack.pop()
            if (
                x.getClass().getSimpleName() == "LogicalRelation"
                and "parquet" in x.simpleString(120).lower()
            ):
                c += 1
            stack.extend(children(x))
        return c

    def max_under_union(df):
        best, stack = 0, [df._jdf.queryExecution().withCachedData()]
        while stack:
            n = stack.pop()
            if n.getClass().getSimpleName() == "Union":
                best = max(best, count_parquet(n))
            stack.extend(children(n))
        return best

    offenders = {}
    for name, fn in em.queries().items():
        if name.startswith("st_"):  # drain-backed; their plans read state parquet
            continue
        n = max_under_union(fn(spark, sf_dir))
        if n > cap:
            offenders[name] = n
    assert not offenders, (
        "parquet-relation blowup under a Union — a persisted session "
        f"index is likely being consumed under a Union without "
        f"checkpoint=True (see materialize.session_index): {offenders}"
    )
