"""approx_count_distinct accuracy: the HLL++ sketch must land within
its documented error envelope of the exact distinct counts (the
rel_approx_distinct gate query asserts the same bound cross-engine)."""

from __future__ import annotations

from pyspark.sql import functions as F

from task_hive_spark.sources.fixtures import load_table


def test_approx_count_distinct_within_bounds(spark, sf_dir):
    l = load_table(spark, sf_dir, "lineitem")
    # rsd=0.02 matches rel_approx_distinct (r14: measured error ≤1.0%
    # at every graded SF — 5x inside the bound — at a quarter of
    # rsd=0.01's per-run register-attribute overhead); the default 5%
    # rsd can exceed the 5% bound on small cardinalities (seen at
    # sf0.001). The margin asserted here is HALF the gate bound, so
    # drift toward the boolean's edge fails tests before the oracle.
    row = l.agg(
        F.countDistinct("l_orderkey").alias("exact_o"),
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx_o"),
        F.countDistinct("l_partkey").alias("exact_p"),
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_p"),
    ).collect()[0]
    assert abs(row.approx_o - row.exact_o) / row.exact_o < 0.025
    assert abs(row.approx_p - row.exact_p) / row.exact_p < 0.025


def test_asof_join_every_purchase_has_row(spark, sf_dir):
    from task_hive_spark.operators.relational import rel_asof_join

    e = load_table(spark, sf_dir, "events")
    n_purchases = e.where(F.col("event_type") == "purchase").count()
    out = rel_asof_join(spark, sf_dir)
    assert out.count() == n_purchases
    # the carried click never post-dates its purchase
    bad = out.where(F.col("last_click_ts") > F.col("purchase_ts")).count()
    assert bad == 0


def test_asof_equal_ts_tiebreak(spark):
    """Ties pinned on synthetic data the fixtures may lack: duplicate
    (user_id, ts) clicks must resolve to the MAX click id in BOTH the
    Spark window form and the oracle's dedup — the exact divergence
    round-1 advice flagged as latent."""
    import duckdb

    from task_hive_spark.operators.relational import asof_core

    rows = [
        # user 1: two clicks at the same ts as the purchase → max id 11
        (1, 10, "click", "2024-01-01 10:00:00"),
        (1, 11, "click", "2024-01-01 10:00:00"),
        (1, 50, "purchase", "2024-01-01 10:00:00"),
        # user 2: tie strictly before the purchase → max id 21
        (2, 21, "click", "2024-01-01 09:00:00"),
        (2, 20, "click", "2024-01-01 09:00:00"),
        (2, 60, "purchase", "2024-01-01 09:30:00"),
        # user 3: no clicks → NULL carry
        (3, 70, "purchase", "2024-01-01 08:00:00"),
    ]
    schema = "user_id long, event_id long, event_type string, ts_s string"
    e = spark.createDataFrame(rows, schema).withColumn(
        "ts", F.to_timestamp("ts_s")
    ).drop("ts_s")
    got = {
        r.purchase_id: r.last_click_id for r in asof_core(e).collect()
    }
    assert got == {50: 11, 60: 21, 70: None}

    # same rows through the oracle's dedup + ASOF JOIN shape
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({u}, {i}, '{t}', TIMESTAMP '{ts}')" for (u, i, t, ts) in rows
        )
        + ") v(user_id, event_id, event_type, ts)"
    )
    oracle = {
        r[0]: r[1]
        for r in con.execute(
            """
            SELECT p.event_id, c.event_id
            FROM (SELECT user_id, event_id, ts FROM events
                  WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (
              SELECT user_id, event_id, ts FROM (
                SELECT user_id, event_id, ts,
                       ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                          ORDER BY event_id DESC) AS rn
                FROM events WHERE event_type = 'click'
              ) d WHERE rn = 1
            ) c ON p.user_id = c.user_id AND c.ts <= p.ts
            """
        ).fetchall()
    }
    assert oracle == got


def test_q1_two_level_sum_equals_single_level(spark, sf_dir):
    """Q1's two-level exact sum (long partials per input partition,
    decimal finals) must be bit-identical to the straightforward
    single-level decimal sum — integer addition is associative, so any
    divergence means a partial overflowed or a measure drifted."""
    from pyspark.sql import functions as F

    from task_hive_spark.operators.relational import (
        _cents,
        _rev_e4,
        rel_q1_pricing_summary,
        _t,
    )

    got = [tuple(r) for r in rel_q1_pricing_summary(spark, sf_dir).collect()]

    l = _t(spark, sf_dir, "lineitem")
    qty_c = _cents("l_quantity").cast("decimal(18,0)")
    price_c = _cents("l_extendedprice").cast("decimal(18,0)")
    charge_e6 = (
        _cents("l_extendedprice")
        * (F.lit(100) - _cents("l_discount"))
        * (F.lit(100) + _cents("l_tax"))
    ).cast("decimal(18,0)")
    cnt = F.count("*")
    single = (
        l.where(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty_c).cast("double") / 100.0, 2).alias("sum_qty"),
            F.round(F.sum(price_c).cast("double") / 100.0, 2).alias("sum_base_price"),
            F.round(F.sum(_rev_e4()).cast("double") / 10000.0, 2).alias("sum_disc_price"),
            F.round(F.sum(charge_e6).cast("double") / 1000000.0, 2).alias("sum_charge"),
            F.round(F.sum(qty_c).cast("double") / (100.0 * cnt), 6).alias("avg_qty"),
            F.round(F.sum(price_c).cast("double") / (100.0 * cnt), 6).alias("avg_price"),
            F.round(
                F.sum(_cents("l_discount").cast("decimal(18,0)")).cast("double")
                / (100.0 * cnt),
                6,
            ).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
    want = [tuple(r) for r in single.collect()]
    assert got == want


def test_money_domains_nonnegative(spark):
    """_cents' arithmetic half-up ((x*100+0.5) truncated toward zero)
    equals ROUND_HALF_UP only for x >= 0 — pin the schema precondition
    it documents: every money/percent column the cents family reads is
    non-negative in the fixtures. A signed-money schema change must
    trip this before it silently rounds a negative cent."""
    from pyspark.sql import functions as F

    from task_hive_spark.sources.fixtures import load_table

    sf = "/root/testdata/sf0.001"
    l = load_table(spark, sf, "lineitem")
    row = l.agg(
        F.min("l_extendedprice"), F.min("l_discount"), F.min("l_tax"), F.min("l_quantity")
    ).collect()[0]
    assert all(v >= 0 for v in row), row
    o = load_table(spark, sf, "orders")
    assert o.agg(F.min("o_totalprice")).collect()[0][0] >= 0
