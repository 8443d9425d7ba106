"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()`` maps every implemented SURVEY §2 operator to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Round-11 front-50 (policy: scripts/evidence_age.py derives and asserts
# it from the CORRECTNESS_r0*.json ledgers):
#   1. ALL 29 queries whose latest driver grade is r7 (age 4, the
#      structural bound — named for the r11 front by the r10 verdict);
#   2. the 10 never-graded round-11 additions (cat_clustered_prune,
#      mm_decode_png_real, sk_quantiles_stream_served,
#      sk_hll_daily_stream_served, and — in the filler block as late
#      additions — cat_delta_prune, cat_zorder_prune, and the four
#      container probes mm_probe_{mp4,jpeg,mp3,webm});
#   3. 17 fillers, code-CHANGED first: txt_quality_classifier (age 2
#      but re-planned this round — labeled-features index, literal
#      weight table), then the age-3 sketch family (sk_cms_heavy_hitters
#      rebuilt on the digest-slice cells + weighted grid; the other
#      sk_* share sketches.py), the three st_*_incremental folds
#      (store-grain state this round), and dd_split_leakage (dedup.py
#      gained the append invariant + span fusion). The 34 age-3 queries left back sit in
#      modules untouched or locally re-verified at both scales every
#      round, and form the r12 front core (they reach the age-4 bound
#      there): rel_q{2,4,11,12,13,16,18,21}, dd_minhash_signatures,
#      sim_topk_{brute,ivf,lsh,pq_refined},
#      sk_hll_daily, st_{session_windows,stream_dedup,
#      stream_dedup_bounded,worker_counter_stateful}, the 18 th_*
#      staples, txt_{decontaminate,sequence_pack,stratified_split,
#      tokenized_dataset}.
# Counts are asserted by scripts/evidence_age.py — derive the r12 front
# from the script, not this comment.
_FRONT_R11 = [
    # --- age-4 core (last graded r7) ---
    "rel_case_null_logic",
    "rel_correlated_above_avg",
    "rel_distinct_aggs",
    "rel_lag_lead_delta",
    "rel_outer_join_nulls",
    "rel_q14_promo_effect",
    "rel_q15_top_supplier",
    "rel_q17_small_qty_revenue",
    "rel_q19_disjunctive_join",
    "rel_q20_excess_stock",
    "rel_scalar_datetime",
    "rel_scalar_math",
    "rel_scalar_string",
    "rel_self_join_prev_order",
    "sim_label_centroids",
    "sim_prototypes_prune",
    "sim_quantize_int8",
    "st_dispatch_latency",
    "st_snapshot_merge",
    "txt_chunks",
    "txt_clean_corpus",
    "txt_clean_corpus_stats",
    "txt_hash_sample",
    "txt_language_id",
    "txt_pii_scrub",
    "txt_token_stats",
    "txt_unigram_lm_fertility",
    "txt_unigram_lm_vocab",
    "txt_unigram_logprob",
    # --- never-graded r11 additions ---
    "cat_clustered_prune",
    "mm_decode_png_real",
    "sk_quantiles_stream_served",
    "sk_hll_daily_stream_served",
    # --- code-changed / code-adjacent fillers ---
    "txt_quality_classifier",
    "sk_cms_heavy_hitters",
    "sk_bloom_semi_join",
    "sk_hll_distinct",
    "sk_hll_union",
    "sk_kmv_distinct",
    "sk_theta_intersect",
    "st_cms_incremental",
    "st_hll_incremental",
    "st_kmv_incremental",
    "dd_split_leakage",
    "cat_delta_prune",
    "cat_zorder_prune",
    "mm_probe_mp4",
    "mm_probe_jpeg",
    "mm_probe_mp3",
    "mm_probe_webm",
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

    # Register evidence-first (see _FRONT_R11): queries whose driver
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

    missing = [k for k in _FRONT_R11 if k not in out]
    assert not missing, f"front names not registered: {missing}"
    # distinct-count, not list-length: a pasted duplicate would pass a
    # len() check while silently shrinking the graded front below the
    # window (review finding r7)
    assert len(set(_FRONT_R11)) == len(_FRONT_R11) == GRADING_WINDOW, (
        f"front set must fill the driver's grading window exactly: "
        f"{len(set(_FRONT_R11))} distinct != {GRADING_WINDOW} — re-balance _FRONT_R11"
    )
    front = {k: out[k] for k in _FRONT_R11}
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
