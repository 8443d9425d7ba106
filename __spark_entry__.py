"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query on sf0.001;
``queries()`` maps every implemented SURVEY §2 operator to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` gives the
DuckDB-equivalent SQL for the correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# Round-9 front-50 (policy: scripts/evidence_age.py derives and asserts
# it from the CORRECTNESS_r0*.json ledgers):
#   1. the 6 never-graded round-9 additions (sk_quantiles,
#      sk_quantiles_merged, st_quantiles_incremental, sim_topk_pq_served,
#      mm_decode_real, src_xml_roundtrip);
#   2. ALL 16 queries whose latest driver grade is r5 (age 4, the
#      structural bound — named for the r9 front by the r8 verdict);
#   3. 28 of the 50 r6-evidence queries, code-adjacent first: the full
#      dd_* family (dedup.py restructured this round: LSH pair index,
#      split-leakage rewrite), the three sim_* r6 queries
#      (similarity.py refactored: shared ADC/refine kernels), the ten
#      st_* lifecycle-family queries (lifecycle/socketfeed gained the
#      failover + Kafka paths), and four heavy text headliners (BPE
#      pair, quality classifier, training mix). The 22 left back
#      (gr_pagerank; rel_q1_pricing_summary and txt_corpus_profile —
#      both benched every round and hash-checked by verify_local
#      regardless — rel_q{3,5,6,7,8,9,10,22}, rel_unpivot_status,
#      txt_{bigram_lm_score,dsir_sample,filter_pipeline,fingerprints,
#      length_histogram,mix_rebalance,quality_scores,repetition_filter,
#      temperature_mix,tfidf_topterms}) sit in modules untouched this
#      round, remain hash-checked at sf0.001 on every pytest run and at
#      sf0.01/sf0.1 by verify_local, and form the r10 front core (they
#      reach the age-4 bound there).
# Counts are asserted by scripts/evidence_age.py — derive the r10 front
# from the script, not this comment.
_FRONT_R9 = [
    "sk_quantiles",
    "sk_quantiles_merged",
    "st_quantiles_incremental",
    "sim_topk_pq_served",
    "mm_decode_real",
    "src_xml_roundtrip",
    "txt_importance_sample",
    "txt_sentiment",
    "txt_bm25_topk",
    "th_api_json",
    "th_snapshot_merge",
    "th_unknown_type_failed",
    "th_list_by_status",
    "th_list_all_union",
    "th_point_get",
    "mm_catalog_stats",
    "mm_decode_features",
    "src_csv_roundtrip",
    "src_jsonl_roundtrip",
    "src_orc_roundtrip",
    "xp_taskgen_summary",
    "th_stats",
    "dd_chunk_dedup",
    "dd_dup_rate_by_source",
    "dd_duplicate_clusters",
    "dd_duplicate_spans",
    "dd_exact_groups",
    "dd_exact_keep_list",
    "dd_minhash_lsh_pairs",
    "dd_ngram_jaccard_pairs",
    "dd_semdedup",
    "dd_simhash",
    "dd_simhash_near_pairs",
    "sim_kmeans_step",
    "sim_pq_codes",
    "sim_topk_ivf_pq",
    "st_dispatch_assignments",
    "st_final_tasks",
    "st_minhash_incremental",
    "st_requeued_pending",
    "st_retry_backoff",
    "st_status_counts",
    "st_timer_requeue",
    "st_unmatched_submits",
    "st_windowed_throughput",
    "st_worker_state",
    "txt_bpe_merges",
    "txt_bpe_tokenize",
    "txt_quality_classifier",
    "txt_training_mix",
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

    # Register evidence-first (see _FRONT_R9): queries whose driver
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

    missing = [k for k in _FRONT_R9 if k not in out]
    assert not missing, f"front names not registered: {missing}"
    # distinct-count, not list-length: a pasted duplicate would pass a
    # len() check while silently shrinking the graded front below the
    # window (review finding r7)
    assert len(set(_FRONT_R9)) == len(_FRONT_R9) == GRADING_WINDOW, (
        f"front set must fill the driver's grading window exactly: "
        f"{len(set(_FRONT_R9))} distinct != {GRADING_WINDOW} — re-balance _FRONT_R9"
    )
    front = {k: out[k] for k in _FRONT_R9}
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
