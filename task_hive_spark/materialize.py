"""Session-scoped materialization of derived indexes.

Dedup/similarity pipelines share expensive derived tables: the MinHash
signature matrix, the SimHash signature column, the LSH band buckets.
Each is O(|docs|) fixed-width rows — an *index*, not a data expansion —
so persisting it is scale-safe (a production pipeline materializes
signatures once, then runs every consumer against them; reference
behavior recomputes per query only because it streams one query at a
time). Keyed by (applicationId, sf_dir, name) so a new session or a
different dataset rebuilds instead of serving stale frames.

The gram/shingle EXPLOSION is deliberately never cached: at corpus
scale it is a multi-PB intermediate and recomputing it per consumer is
cheaper than spilling it to storage.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple[str, str, str], DataFrame] = {}

# Auxiliary session caches owned by other modules (e.g. textops'
# _BPE_MERGE_CACHE). Contract: keys are tuples whose FIRST element is
# the applicationId; values are a DataFrame or a tuple that may contain
# DataFrames. Registering here gives them the same two lifecycle paths
# as _CACHE — dead-session eviction and clear_indexes teardown — so no
# module-level cache can pin executor blocks past its session.
_AUX_CACHES: list[dict] = []


def register_aux_cache(cache: dict) -> None:
    _AUX_CACHES.append(cache)


def _release_checkpoint(df: DataFrame) -> None:
    """Explicitly free a localCheckpoint's RDD blocks. ``df.unpersist()``
    clears only the CacheManager layer; a checkpoint RDD underneath
    (plan = LogicalRDD) is otherwise released by the ContextCleaner only
    after the Python reference is GC'd — so a dropped-and-rebuilt index
    (bench.py re-times builders this way) would transiently hold two
    copies of its checkpoint storage. Unpersisting a never-persisted RDD
    is a no-op, so probing every dropped frame is safe."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass  # session stopped / non-JVM frame — nothing to release


def _unpersist_value(val: object) -> None:
    items = val if isinstance(val, (list, tuple)) else (val,)
    for item in items:
        if isinstance(item, DataFrame):
            try:
                item.unpersist()
            except Exception:
                pass  # session already stopped — nothing to unpersist
            _release_checkpoint(item)


def _evict_dead_sessions() -> None:
    """Drop entries whose SparkContext is gone — a stopped session's
    applicationId would otherwise pin dead DataFrame references for the
    life of the process (long-lived drivers cycling sessions leak)."""
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    live = {sc.applicationId} if sc is not None else set()
    for key in [k for k in _CACHE if k[0] not in live]:
        del _CACHE[key]
    for aux in _AUX_CACHES:
        for key in [k for k in aux if k[0] not in live]:
            del aux[key]


def clear_indexes(spark: SparkSession | None = None) -> None:
    """Unpersist and forget materialized indexes — all of them, or only
    the given session's. Call from session teardown (tests do) or when a
    long-lived session is done with one sf_dir and moving to another.
    Covers registered auxiliary caches too."""
    app = spark.sparkContext.applicationId if spark is not None else None
    for key in list(_CACHE):
        if app is None or key[0] == app:
            df = _CACHE.pop(key)
            try:
                df.unpersist()
            except Exception:
                pass  # session already stopped — nothing to unpersist
            _release_checkpoint(df)
    for aux in _AUX_CACHES:
        for key in list(aux):
            if app is None or key[0] == app:
                _unpersist_value(aux.pop(key))


def drop_index(spark: SparkSession, sf_dir: str, name: str) -> None:
    """Unpersist and forget ONE materialized index so the next consumer
    rebuilds it — bench.py uses this to keep a benched builder query an
    honest measurement when its output is also a shared session index
    (the _BPE_MERGE_CACHE precedent)."""
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _CACHE.pop(key, None)
    if df is not None:
        try:
            df.unpersist()
        except Exception:
            pass  # session already stopped — nothing to unpersist
        _release_checkpoint(df)


def session_index(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    build: Callable[[], DataFrame],
    checkpoint: bool = False,
) -> DataFrame:
    """Return the per-session materialized index `name` for `sf_dir`,
    building and persisting it on first use (MEMORY_AND_DISK, so an
    oversized index spills instead of evicting or OOMing).

    The cache is materialized EAGERLY (one count() job at build): an
    unmaterialized persist under AQE reports UnknownPartitioning
    (isFinalPlan=false), so the first consumer's plan would re-shuffle
    data the index already hash-partitioned; after materialization every
    consumer plan sees the final hashpartitioning and aggregates
    exchange-free on top of it.

    ``checkpoint=True`` materializes via ``localCheckpoint(eager)``
    instead of persist: the frame becomes a LogicalRDD LEAF, so
    consumers reference the stored blocks directly rather than through
    CacheManager plan-matching. NOTE (r13 ADVICE item 3): this trades
    lineage recovery for the leaf — on executor loss the index is gone
    for good (rebuild in a fresh session), and under dynamic
    allocation (spark.dynamicAllocation.enabled) localCheckpoint is
    explicitly unsafe because executors are reclaimed routinely; a
    deployment enabling dynamic allocation must keep such indexes on
    the persist path (the assertion below makes the trade loud). Use it for indexes consumed under a
    Union: Spark 4.1's cache lookup silently misses when the SAME
    cached plan (built here via multi-branch SQL unions + keyed
    repartition) appears in several Union branches — measured on
    txt_clean_corpus_stats as 866 parquet re-scans / 14.5 s for a query
    whose branches each run sub-second against the index (the
    union-of-aggregates replanned every stage pipeline from the raw
    parquet). Storage class is the same MEMORY_AND_DISK family; the
    trade is lineage truncation (no executor-loss recovery for the
    index — rebuild in a fresh session), the trade dd_duplicate_clusters
    already documents for its fixpoint."""
    _evict_dead_sessions()
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _CACHE.get(key)
    if df is None:
        if checkpoint:
            # localCheckpoint under dynamic allocation loses blocks as
            # executors are reclaimed — permanent failure, not a
            # recompute. Warn loudly rather than take the trade
            # silently (r13 ADVICE item 3); local[- and static-executor
            # deployments are unaffected.
            if (
                spark.conf.get("spark.dynamicAllocation.enabled", "false")
                == "true"
            ):
                import warnings

                warnings.warn(
                    f"session_index({name!r}, checkpoint=True) under "
                    "dynamic allocation: localCheckpoint blocks die with "
                    "reclaimed executors; prefer persist for this "
                    "deployment",
                    stacklevel=2,
                )
            df = build().localCheckpoint(eager=True)
        else:
            df = build().persist()
            df.count()
        _CACHE[key] = df
    return df
