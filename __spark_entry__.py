"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()`` maps every implemented SURVEY §2 operator to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Round-12 front-50 (policy: scripts/evidence_age.py derives and asserts
# it from the CORRECTNESS_r0*.json ledgers):
#   1. ALL 36 queries whose latest driver grade is r8 (age 4, the
#      structural bound — named for the r12 front by the r11 verdict).
#      The r8 cohort was 40; its four th_assign_* members were
#      CONSOLIDATED this round into one parameterized registration
#      (th_assign_strategies — see assign.py and the registry-capacity
#      policy in README), which grades as a new query below.
#   2. the 4 never-graded round-12 additions: th_assign_strategies
#      (the consolidation), mm_decode_jpeg_coeffs (baseline-JPEG
#      entropy decode), dd_dedup_served_pruned and
#      sim_topk_pq_served_pruned (clustered serving indexes with
#      manifest file pruning).
#   3. 10 fillers, code-CHANGED first: cat_{delta,clustered,zorder}_
#      prune (catalog.py gained the UTC-explicit prune_files, the
#      in-place-compaction guard, prune_files_any, and the
#      recluster-debt policy), mm_probe_{jpeg,mp4} (RSTn/fill-byte and
#      truncated-box hardening), dd_dedup_served + sim_topk_pq_served
#      (their serve cores were refactored to share _serve_join / the
#      pruned paths), txt_bigram_lm_score (stage-budgeted this round)
#      and dd_ngram_jaccard_pairs + sk_bloom_semi_join (the r11
#      verdict's drift-recheck set, re-paired in BASELINE_ratio_r12).
#      The 45 age-3 queries left back sit in modules untouched or
#      locally re-verified at both scales every round, and form the
#      r13 front core (they reach the age-4 bound there).
# Counts are asserted by scripts/evidence_age.py — derive the r13 front
# from the script, not this comment.
_FRONT_R12 = [
    # --- age-4 core (last graded r8) ---
    "dd_minhash_signatures",
    "rel_q11_important_stock",
    "rel_q12_late_lines",
    "rel_q13_custdist",
    "rel_q16_supplier_part_count",
    "rel_q18_large_orders",
    "rel_q21_waiting_suppliers",
    "rel_q2_min_cost_supplier",
    "rel_q4_order_priority",
    "sim_topk_brute",
    "sim_topk_ivf",
    "sim_topk_lsh",
    "sim_topk_pq_refined",
    "sk_hll_daily",
    "st_session_windows",
    "st_stream_dedup",
    "st_stream_dedup_bounded",
    "st_worker_counter_stateful",
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
    "txt_decontaminate",
    "txt_sequence_pack",
    "txt_stratified_split",
    "txt_tokenized_dataset",
    # --- never-graded r12 additions ---
    "th_assign_strategies",
    "mm_decode_jpeg_coeffs",
    "dd_dedup_served_pruned",
    "sim_topk_pq_served_pruned",
    # --- code-changed / code-adjacent fillers ---
    "cat_delta_prune",
    "cat_clustered_prune",
    "cat_zorder_prune",
    "mm_probe_jpeg",
    "mm_probe_mp4",
    "dd_dedup_served",
    "sim_topk_pq_served",
    "txt_bigram_lm_score",
    "dd_ngram_jaccard_pairs",
    "sk_bloom_semi_join",
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

    # Register evidence-first (see _FRONT_R12): queries whose driver
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

    missing = [k for k in _FRONT_R12 if k not in out]
    assert not missing, f"front names not registered: {missing}"
    # distinct-count, not list-length: a pasted duplicate would pass a
    # len() check while silently shrinking the graded front below the
    # window (review finding r7)
    assert len(set(_FRONT_R12)) == len(_FRONT_R12) == GRADING_WINDOW, (
        f"front set must fill the driver's grading window exactly: "
        f"{len(set(_FRONT_R12))} distinct != {GRADING_WINDOW} — re-balance _FRONT_R12"
    )
    front = {k: out[k] for k in _FRONT_R12}
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
