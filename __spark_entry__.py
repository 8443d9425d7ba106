"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()`` maps every implemented SURVEY §2 operator to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Round-8 front-50 (policy: scripts/evidence_age.py derives and asserts
# it from the CORRECTNESS_r0*.json ledgers):
#   1. the 14 never-graded round-8 additions (seven sk_* sketches,
#      st_hll_incremental, st_kmv_incremental, st_cms_incremental,
#      dd_split_leakage, sim_topk_pq_refined, txt_stratified_split,
#      txt_tokenized_dataset);
#   2. ALL 20 queries whose latest driver grade is r4 (age 4, the
#      ledger's stalest: the th_* batch surface + st_session_windows /
#      st_stream_dedup_bounded);
#   3. 16 of the 32 r5-evidence queries, code-adjacent first. The 16
#      left back (the seven untouched-module fillers mm_catalog_stats,
#      mm_decode_features, src_{csv,jsonl,orc}_roundtrip,
#      xp_taskgen_summary, th_stats; plus the nine displaced by
#      late-round additions: txt_importance_sample, txt_sentiment,
#      txt_bm25_topk, th_api_json, th_snapshot_merge,
#      th_unknown_type_failed, th_list_by_status, th_list_all_union,
#      th_point_get — these last nine sit in otherwise-touched modules
#      but their own functions are unchanged) remain hash-checked at
#      sf0.001 on every pytest run and at sf0.01/sf0.1 by verify_local,
#      and form the r9 front core.
# Counts are asserted by scripts/evidence_age.py — derive the r9 front
# from the script, not this comment.
_FRONT_R8 = [
    "sk_kmv_distinct",
    "sk_hll_distinct",
    "sk_hll_daily",
    "sk_hll_union",
    "sk_theta_intersect",
    "sk_cms_heavy_hitters",
    "sk_bloom_semi_join",
    "st_hll_incremental",
    "st_kmv_incremental",
    "st_cms_incremental",
    "dd_split_leakage",
    "sim_topk_pq_refined",
    "txt_stratified_split",
    "txt_tokenized_dataset",
    "st_session_windows",
    "st_stream_dedup_bounded",
    "th_assign_banded",
    "th_assign_least_tasks",
    "th_assign_random",
    "th_assign_round_robin",
    "th_assignment_load",
    "th_backoff_schedule",
    "th_composite_keys",
    "th_eligible_workers",
    "th_id_functions",
    "th_latest_event_per_user",
    "th_least_tasks_worker",
    "th_payload_parse",
    "th_pending_count",
    "th_spider_ingest",
    "th_status_enum_roundtrip",
    "th_top10_pending",
    "th_worker_inbox",
    "th_workers_liveness",
    "dd_minhash_signatures",
    "rel_q2_min_cost_supplier",
    "rel_q4_order_priority",
    "rel_q11_important_stock",
    "rel_q12_late_lines",
    "rel_q13_custdist",
    "rel_q16_supplier_part_count",
    "rel_q18_large_orders",
    "rel_q21_waiting_suppliers",
    "sim_topk_brute",
    "sim_topk_ivf",
    "sim_topk_lsh",
    "st_stream_dedup",
    "st_worker_counter_stateful",
    "txt_decontaminate",
    "txt_sequence_pack",
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
        sketchstream,
        stateful,
        timers,
    )

    # Register evidence-first (see _FRONT_R8): queries whose driver
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
    out.update(sketchstream.QUERIES)

    missing = [k for k in _FRONT_R8 if k not in out]
    assert not missing, f"front names not registered: {missing}"
    # distinct-count, not list-length: a pasted duplicate would pass a
    # len() check while silently shrinking the graded front below the
    # window (review finding r7)
    assert len(set(_FRONT_R8)) == len(_FRONT_R8) == GRADING_WINDOW, (
        f"front set must fill the driver's grading window exactly: "
        f"{len(set(_FRONT_R8))} distinct != {GRADING_WINDOW} — re-balance _FRONT_R8"
    )
    front = {k: out[k] for k in _FRONT_R8}
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
        sketchstream,
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
    out.update(sketchstream.ORACLES)
    return out
