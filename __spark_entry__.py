"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()`` maps every implemented SURVEY §2 operator to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Round-10 front-50 (policy: scripts/evidence_age.py derives and asserts
# it from the CORRECTNESS_r0*.json ledgers):
#   1. ALL 22 queries whose latest driver grade is r6 (age 4, the
#      structural bound — named for the r10 front by the r9 verdict);
#   2. the 7 never-graded round-10 additions (dd_dedup_served,
#      dd_max_dup_spans, mm_decode_image_real, mm_decode_video_real,
#      cat_compaction_stats, sk_quantiles_served, sk_hll_daily_served);
#   3. 21 of the 50 r7-evidence queries, code-adjacent first: the two
#      remaining mm_* queries (multimodal.py gained the real PPM
#      decoder), both cat_* queries (catalog.py gained the compaction
#      tier), dd_embedding_cosine_pairs (the dedup family grew the
#      served path), then the window/rollup/join-shape rel_* block, the
#      dispatch-results processor query, and one text staple. The 29
#      left back (txt_pii_scrub, txt_token_stats, txt_language_id,
#      rel_case_null_logic, rel_correlated_above_avg,
#      rel_distinct_aggs, rel_lag_lead_delta, rel_outer_join_nulls,
#      rel_q{14,15,17,19,20}, rel_scalar_{datetime,math,string},
#      rel_self_join_prev_order, sim_{label_centroids,prototypes_prune,
#      quantize_int8}, st_{dispatch_latency,snapshot_merge},
#      txt_{chunks,clean_corpus,clean_corpus_stats,hash_sample,
#      unigram_lm_fertility,unigram_lm_vocab,unigram_logprob}) sit in
#      modules untouched this round, remain hash-checked at sf0.001 on
#      every pytest run and at sf0.01/sf0.1 by verify_local, and form
#      the r11 front core (they reach the age-4 bound there).
# Counts are asserted by scripts/evidence_age.py — derive the r11 front
# from the script, not this comment.
_FRONT_R10 = [
    "gr_pagerank",
    "rel_q1_pricing_summary",
    "rel_q3_shipping_priority",
    "rel_q5_regional_revenue",
    "rel_q6_forecast_revenue",
    "rel_q7_volume",
    "rel_q8_market_share",
    "rel_q9_product_profit",
    "rel_q10_returned_revenue",
    "rel_q22_global_sales_opportunity",
    "rel_unpivot_status",
    "txt_bigram_lm_score",
    "txt_corpus_profile",
    "txt_dsir_sample",
    "txt_filter_pipeline",
    "txt_fingerprints",
    "txt_length_histogram",
    "txt_mix_rebalance",
    "txt_quality_scores",
    "txt_repetition_filter",
    "txt_temperature_mix",
    "txt_tfidf_topterms",
    "dd_dedup_served",
    "dd_max_dup_spans",
    "mm_decode_image_real",
    "cat_compaction_stats",
    "mm_audio_segments",
    "mm_frame_sample",
    "cat_bucketed_join_stats",
    "cat_pending_by_type",
    "dd_embedding_cosine_pairs",
    "xp_dispatch_results",
    "rel_asof_join",
    "rel_range_join",
    "rel_sessionize",
    "rel_topk_per_group",
    "rel_window_frames",
    "rel_window_ranks",
    "rel_window_running",
    "rel_rollup_orders",
    "rel_cube_part",
    "rel_grouping_sets_events",
    "rel_pivot_status",
    "rel_percentiles",
    "rel_approx_distinct",
    "rel_set_ops",
    "rel_semi_anti_join",
    "sk_hll_daily_served",
    "sk_quantiles_served",
    "mm_decode_video_real",
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

    # Register evidence-first (see _FRONT_R10): queries whose driver
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

    missing = [k for k in _FRONT_R10 if k not in out]
    assert not missing, f"front names not registered: {missing}"
    # distinct-count, not list-length: a pasted duplicate would pass a
    # len() check while silently shrinking the graded front below the
    # window (review finding r7)
    assert len(set(_FRONT_R10)) == len(_FRONT_R10) == GRADING_WINDOW, (
        f"front set must fill the driver's grading window exactly: "
        f"{len(set(_FRONT_R10))} distinct != {GRADING_WINDOW} — re-balance _FRONT_R10"
    )
    front = {k: out[k] for k in _FRONT_R10}
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
