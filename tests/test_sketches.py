"""Sketch-operator invariants the oracle hash gate cannot express:
KMV estimation accuracy vs the exact distinct count, CMS one-sided
error, and the Bloom filter's zero-false-negative guarantee."""

from __future__ import annotations

from pyspark.sql import functions as F

from task_hive_spark.operators.sketches import (
    BLOOM_K,
    CMS_D,
    KMV_K,
    bloom_positions,
    cms_cells,
    sk_bloom_semi_join,
    sk_cms_heavy_hitters,
    sk_kmv_distinct,
)
from task_hive_spark.sources.fixtures import load_table


def test_kmv_estimate_tracks_exact(spark, sf_dir):
    est = {
        r["event_type"]: r
        for r in sk_kmv_distinct(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for et, row in est.items():
        if row["n_sketch"] < KMV_K:
            # under-full sketch IS the value set — exact by construction
            assert row["est_distinct"] == exact[et]
            assert row["kth_min_hash"] is None
        else:
            # KMV stderr ≈ 1/sqrt(K-2) ≈ 12.7% at K=64; 3σ bound
            assert abs(row["est_distinct"] - exact[et]) <= 0.4 * exact[et], (
                et,
                row["est_distinct"],
                exact[et],
            )


def test_cms_estimates_never_undercount(spark, sf_dir):
    from task_hive_spark.operators.textops import token_index

    hh = {r["tok"]: r["est_count"] for r in sk_cms_heavy_hitters(spark, sf_dir).collect()}
    assert hh, "fixture corpus has heavy hitters at every sf"
    truth = {
        r["tok"]: r["c"]
        for r in token_index(spark, sf_dir)
        .select(F.explode("toks").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for tok, est in hh.items():
        # CMS error is one-sided: collisions only ever ADD counts
        assert est >= truth[tok], (tok, est, truth[tok])
    # every true heavy hitter is reported (est >= true ≥ threshold)
    total = sum(truth.values())
    for tok, c in truth.items():
        if c * 50 >= total:
            assert tok in hh, f"true heavy hitter {tok} missing"


def test_bloom_no_false_negatives(spark, sf_dir):
    row = sk_bloom_semi_join(spark, sf_dir).collect()[0]
    cust = load_table(spark, sf_dir, "customer")
    bad = cust.where(F.col("c_acctbal") < 0).select("c_custkey")
    true_orders = (
        load_table(spark, sf_dir, "orders")
        .join(bad, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .count()
    )
    # a Bloom filter may pass extra rows, never drop a true match
    assert row["n_true_match"] == true_orders
    assert row["n_false_pos"] == row["n_pass"] - row["n_true_match"]
    assert row["n_false_pos"] >= 0
    assert row["n_bits_set"] <= BLOOM_K * bad.count()


def test_shared_cell_helpers_are_single_source(spark):
    # build and probe must use the same cell/position derivations;
    # the helpers are that single source — pin their shape
    assert len(cms_cells(F.lit("x"))) == CMS_D
    assert len(bloom_positions(F.lit("x"))) == BLOOM_K
