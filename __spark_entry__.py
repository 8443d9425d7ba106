"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()`` maps every implemented SURVEY §2 operator to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Round-7 front-50 (policy: scripts/evidence_age.py asserts it — the
# r6-comment-maintained freshness claim drifted, so the front set is
# now EXPLICIT and derived from the CORRECTNESS_r0*.json ledgers):
#   1. the round's never-graded additions (txt_clean_corpus family);
#   2. ALL 16 queries whose latest driver grade is r3 (the stalest
#      evidence in the ledger — r6 verdict task 1);
#   3. the seven r5-graded queries the r6 session-2 rotation demoted
#      (xp_dispatch_results, st_snapshot_merge, rel_q14/q15/q17/q19/q20);
#   4. fillers from the r4-evidence block, code-adjacent first
#      (txt_unigram_logprob reads the refactored _bigram_scores core;
#      cat_* sit on the Derby isolation change), then rel_*/st_*/th_ in
#      name order. The 17 r4-evidence th_* queries that did not fit
#      remain back-set (every back query is still hash-checked at
#      sf0.001 per pytest run and at sf0.01/sf0.1 by verify_local).
# Operators added later in the round displace fillers from the END of
# this list (keeping 2+3 intact): txt_unigram_lm_vocab/_fertility
# displaced st_stream_dedup_bounded and th_assign_banded;
# sim_prototypes_prune displaced st_session_windows.
# _FRONT_R8 core = whatever scripts/evidence_age.py reports stale after
# the r7 grades land (the 17 unfronted r4-evidence th_* queries plus
# the two displaced fillers) — derive it from the script, not this
# comment.
_FRONT_R7 = [
    "txt_clean_corpus",
    "txt_clean_corpus_stats",
    "txt_unigram_lm_vocab",
    "txt_unigram_lm_fertility",
    "sim_prototypes_prune",
    "dd_embedding_cosine_pairs",
    "mm_frame_sample",
    "rel_case_null_logic",
    "rel_correlated_above_avg",
    "rel_pivot_status",
    "rel_scalar_datetime",
    "rel_scalar_math",
    "rel_scalar_string",
    "rel_window_ranks",
    "sim_label_centroids",
    "sim_quantize_int8",
    "txt_chunks",
    "txt_hash_sample",
    "txt_language_id",
    "txt_pii_scrub",
    "txt_token_stats",
    "xp_dispatch_results",
    "st_snapshot_merge",
    "rel_q14_promo_effect",
    "rel_q15_top_supplier",
    "rel_q17_small_qty_revenue",
    "rel_q19_disjunctive_join",
    "rel_q20_excess_stock",
    "txt_unigram_logprob",
    "cat_bucketed_join_stats",
    "cat_pending_by_type",
    "mm_audio_segments",
    "rel_approx_distinct",
    "rel_asof_join",
    "rel_cube_part",
    "rel_distinct_aggs",
    "rel_grouping_sets_events",
    "rel_lag_lead_delta",
    "rel_outer_join_nulls",
    "rel_percentiles",
    "rel_range_join",
    "rel_rollup_orders",
    "rel_self_join_prev_order",
    "rel_semi_anti_join",
    "rel_sessionize",
    "rel_set_ops",
    "rel_topk_per_group",
    "rel_window_frames",
    "rel_window_running",
    "st_dispatch_latency",
]

# The driver's grading window; the front set must fill it exactly so no
# grading slot is wasted and no front query silently falls off the end.
GRADING_WINDOW = 50


def _ensure_session_conf(spark: SparkSession) -> None:
    """Apply runtime-settable confs the engine relies on (the driver may
    hand us a session built without them)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # keep CPU-dense small-byte stages cluster-wide (see session.py)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
    # keep the 128-field MinHash aggregate inside whole-stage codegen
    spark.conf.set("spark.sql.codegen.maxFields", "256")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; fixtures loader still handles it


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: task stats (SURVEY §3.3) on sf0.001."""
    _ensure_session_conf(spark)
    from task_hive_spark.operators.queries import th_stats

    return th_stats(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from task_hive_spark.operators import (
        assign,
        dedup,
        graph,
        multimodal,
        pipeline,
        processors,
        queries as q,
        relational,
        similarity,
        sketches,
        textops,
        unigram_lm,
    )
    from task_hive_spark.plans import catalog
    from task_hive_spark.sources import textfiles
    from task_hive_spark.streaming import (
        cdcmerge,
        dedupstream,
        lifecycle,
        minhashstream,
        stateful,
        timers,
    )

    # Register evidence-first (see _FRONT_R7): queries whose driver
    # evidence is stalest fill the 50 graded slots; the freshly-graded
    # set rotates to the back.
    out: dict[str, Callable] = {}
    out.update(q.QUERIES)
    out.update(assign.QUERIES)
    out.update(processors.QUERIES)
    out.update(multimodal.QUERIES)
    out.update(catalog.QUERIES)
    out.update(relational.QUERIES)
    out.update(textops.QUERIES)
    out.update(similarity.QUERIES)
    out.update(dedup.QUERIES)
    out.update(graph.QUERIES)
    out.update(lifecycle.QUERIES)
    out.update(stateful.QUERIES)
    out.update(timers.QUERIES)
    out.update(dedupstream.QUERIES)
    out.update(cdcmerge.QUERIES)
    out.update(minhashstream.QUERIES)
    out.update(textfiles.QUERIES)
    out.update(pipeline.QUERIES)
    out.update(unigram_lm.QUERIES)
    out.update(sketches.QUERIES)

    missing = [k for k in _FRONT_R7 if k not in out]
    assert not missing, f"front names not registered: {missing}"
    # distinct-count, not list-length: a pasted duplicate would pass a
    # len() check while silently shrinking the graded front below the
    # window (review finding r7)
    assert len(set(_FRONT_R7)) == len(_FRONT_R7) == GRADING_WINDOW, (
        f"front set must fill the driver's grading window exactly: "
        f"{len(set(_FRONT_R7))} distinct != {GRADING_WINDOW} — re-balance _FRONT_R7"
    )
    front = {k: out[k] for k in _FRONT_R7}
    back = {k: v for k, v in out.items() if k not in front}
    ordered = {**front, **back}

    def _wrap(fn):
        def inner(spark, sf_dir):
            _ensure_session_conf(spark)
            return fn(spark, sf_dir)

        return inner

    return {k: _wrap(v) for k, v in ordered.items()}


def oracle_sql() -> dict[str, str]:
    from task_hive_spark.operators import (
        assign,
        dedup,
        graph,
        multimodal,
        pipeline,
        processors,
        queries as q,
        relational,
        similarity,
        sketches,
        textops,
        unigram_lm,
    )
    from task_hive_spark.plans import catalog
    from task_hive_spark.sources import textfiles
    from task_hive_spark.streaming import (
        cdcmerge,
        dedupstream,
        lifecycle,
        minhashstream,
        stateful,
        timers,
    )

    out: dict[str, str] = {}
    out.update(q.ORACLES)
    out.update(assign.ORACLES)
    out.update(processors.ORACLES)
    out.update(multimodal.ORACLES)
    out.update(catalog.ORACLES)
    out.update(relational.ORACLES)
    out.update(textops.ORACLES)
    out.update(similarity.ORACLES)
    out.update(lifecycle.ORACLES)
    out.update(stateful.ORACLES)
    out.update(timers.ORACLES)
    out.update(dedupstream.ORACLES)
    out.update(cdcmerge.ORACLES)
    out.update(minhashstream.ORACLES)
    out.update(dedup.ORACLES)
    out.update(graph.ORACLES)
    out.update(textfiles.ORACLES)
    out.update(pipeline.ORACLES)
    out.update(unigram_lm.ORACLES)
    out.update(sketches.ORACLES)
    return out
