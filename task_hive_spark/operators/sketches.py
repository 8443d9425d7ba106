"""Distributed data sketches: KMV distinct-count, count-min heavy
hitters, and a Bloom-filter semi-join pre-filter.

At 100 TB, exact answers to "how many distinct", "which keys are hot",
and "which rows could match" are shuffle-bound; the production answer
is a mergeable sketch whose size is independent of the data (the
DataSketches/theta-sketch family the reference-scale OLAP engines
ship). Every sketch here is DETERMINISTIC — built on the repo-wide
portable md5 hash (functions/text.py: portable_hash32/64) — so the
DuckDB oracle computes the identical sketch and the driver's value-hash
gate checks the sketch ARITHMETIC, not just row counts. That rules out
Spark's own approx_count_distinct (HLL++ internals don't reproduce in
DuckDB); the trade is documented per operator.

Scale shapes:
- KMV: per-group bottom-K of distinct hashes via a two-level
  (salted-partial → global) top-K merge — the classic mergeable-sketch
  union. No group's full distinct set ever sits in one task.
- CMS: the update stream folds into a D×W counter grid with map-side
  combine — the shuffle carries at most D·W rows per map partition
  regardless of key cardinality; the finished sketch is
  broadcast-sized.
- Bloom: the bit set of the build side is a broadcast dim; the probe
  is K successive broadcast left-semi joins (no shuffle of the probe
  side) — the app-level form of the runtime row-group bloom filters a
  warehouse pushes into scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window as W

from task_hive_spark.functions.text import portable_hash32, portable_hash64
from task_hive_spark.sources.fixtures import load_table

# --- KMV (K-minimum-values) distinct estimator --------------------------
# Bar-Yossef et al. 2002: keep the K smallest distinct hash values; if
# the K-th smallest is h_K over a domain of size D, the distinct count
# is ≈ (K-1)·D/h_K. Groups with fewer than K distinct hashes report
# exactly (the sketch IS the value set there).
KMV_K = 64
KMV_SALTS = 16  # partial-sketch fan-in for the two-level bottom-K merge
_HASH64_DOMAIN = float(1 << 60)  # portable_hash64 = 15 hex digits


def sk_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via a KMV sketch.

    Shape: one distinct-shuffle on (group, hash) — the same cost any
    exact distinct pays — then two window passes over shrinking data:
    bottom-K per (group, salt) bounds every partition's sort at K·
    (distinct/SALTS), and the global bottom-K merges ≤ K·SALTS
    survivors per group. At 100 TB only the first shuffle sees the
    data; the sketch merge is O(K·SALTS) rows per group."""
    ev = load_table(spark, sf_dir, "events")
    h = (
        ev.select(
            "event_type",
            portable_hash64(F.col("user_id").cast("string"), seed="kmv-").alias("h"),
        )
        .distinct()
    )
    partial = W.partitionBy("event_type", F.pmod("h", F.lit(KMV_SALTS))).orderBy("h")
    merged = W.partitionBy("event_type").orderBy("h")
    sk = (
        h.withColumn("rn", F.row_number().over(partial))
        .where(F.col("rn") <= KMV_K)
        .withColumn("rn", F.row_number().over(merged))
        .where(F.col("rn") <= KMV_K)
    )
    agg = sk.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_sketch"),
        F.max(F.when(F.col("rn") == KMV_K, F.col("h"))).alias("kth_min_hash"),
    )
    est = F.when(F.col("n_sketch") < KMV_K, F.col("n_sketch")).otherwise(
        F.floor(F.lit(float(KMV_K - 1)) * F.lit(_HASH64_DOMAIN) / F.col("kth_min_hash"))
    )
    return agg.select(
        "event_type",
        "n_sketch",
        "kth_min_hash",
        est.cast("bigint").alias("est_distinct"),
    ).orderBy("event_type")


# --- Count-min sketch heavy hitters -------------------------------------
# Cormode & Muthukrishnan 2005: D independent hash rows × W counters;
# point estimate = min over rows (one-sided: never under-counts).
CMS_D = 4
CMS_W = 512
CMS_PHI_INV = 50  # heavy hitter ⇔ est ≥ stream_length / 50 (φ = 2%)


def cms_cells(item: F.Column, width: int = CMS_W) -> list[F.Column]:
    """The D (row, col) cells an item updates — shared by build and
    probe so the two sides can never drift."""
    return [
        F.struct(
            F.lit(d).alias("d"),
            (portable_hash32(item, seed=f"cms{d}-") % width).cast("int").alias("col"),
        )
        for d in range(CMS_D)
    ]


def sk_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter tokens of the corpus token stream via CMS.

    The update stream (every token occurrence × D cells) folds to the
    D×W grid in one groupBy — partial aggregation means each map task
    emits ≤ D·W rows no matter how many tokens it saw, which is the
    entire point: hot-key detection WITHOUT a per-key shuffle. The
    stream length is one sketch row-sum (any row sums to N). Candidates
    here are the distinct tokens (fixture-complete); a production run
    feeds candidates from a dictionary or a sample — the sketch probe
    (broadcast join on D·W rows) is the same either way."""
    from task_hive_spark.operators.textops import token_index

    occ = token_index(spark, sf_dir).select(F.explode("toks").alias("tok"))
    sketch = (
        occ.select(F.explode(F.array(*cms_cells(F.col("tok")))).alias("cell"))
        .groupBy("cell.d", "cell.col")
        .agg(F.count("*").alias("c"))
    )
    total = sketch.where(F.col("d") == 0).agg(F.sum("c").alias("n_stream"))
    probe = (
        occ.distinct()
        .select("tok", F.explode(F.array(*cms_cells(F.col("tok")))).alias("cell"))
        .select("tok", "cell.d", "cell.col")
    )
    est = (
        probe.join(F.broadcast(sketch), ["d", "col"])
        .groupBy("tok")
        .agg(F.min("c").alias("est_count"))
    )
    return (
        est.crossJoin(F.broadcast(total))
        .where(F.col("est_count") * CMS_PHI_INV >= F.col("n_stream"))
        .select("tok", "est_count")
        .orderBy(F.desc("est_count"), "tok")
    )


# --- Bloom-filter semi-join pre-filter ----------------------------------
BLOOM_M = 32768  # bits
BLOOM_K = 3  # hash functions


def bloom_positions(key: F.Column) -> list[F.Column]:
    """The K bit positions a key sets/probes (shared build/probe)."""
    return [
        portable_hash32(key, seed=f"bf{k}-") % BLOOM_M for k in range(BLOOM_K)
    ]


def sk_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-filter orders down to those whose customer COULD be in the
    delinquent set (c_acctbal < 0) using a Bloom filter, then audit the
    filter: zero false negatives by construction, false positives
    counted against ground truth.

    Shape: the build side collapses to ≤ K·|build| distinct bit rows —
    a broadcast dim; the probe is BLOOM_K successive broadcast
    LEFT-SEMI joins, so the fact table is never shuffled. This is the
    app-level form of bloom semi-join pushdown: at 100 TB you ship the
    kilobyte-scale bit set to every scan task and drop non-matching
    rows before the real join's exchange. The audit join (vs the true
    build set) exists to surface the FP rate in the gated output — a
    production filter would go straight to the main join."""
    cust = load_table(spark, sf_dir, "customer")
    bad = cust.where(F.col("c_acctbal") < 0).select("c_custkey")
    bits = (
        bad.select(
            F.explode(
                F.array(*bloom_positions(F.col("c_custkey").cast("string")))
            ).alias("bit")
        )
        .distinct()
    )
    probe = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pos = bloom_positions(F.col("o_custkey").cast("string"))
    hit = probe
    for k in range(BLOOM_K):
        hit = hit.join(
            F.broadcast(bits.select(F.col("bit").alias(f"b{k}"))),
            pos[k] == F.col(f"b{k}"),
            "left_semi",
        )
    audit = hit.join(
        bad.select(F.col("c_custkey").alias("o_custkey"), F.lit(1).alias("is_bad")),
        "o_custkey",
        "left",
    ).agg(
        F.count("*").cast("bigint").alias("n_pass"),
        F.sum(F.coalesce("is_bad", F.lit(0))).cast("bigint").alias("n_true_match"),
    )
    n_orders = probe.agg(F.count("*").cast("bigint").alias("n_orders"))
    n_bits = bits.agg(F.count("*").cast("bigint").alias("n_bits_set"))
    return (
        n_orders.crossJoin(F.broadcast(n_bits))
        .crossJoin(F.broadcast(audit))
        .select(
            "n_orders",
            "n_bits_set",
            "n_pass",
            "n_true_match",
            (F.col("n_pass") - F.col("n_true_match")).alias("n_false_pos"),
        )
    )


QUERIES = {
    "sk_kmv_distinct": sk_kmv_distinct,
    "sk_cms_heavy_hitters": sk_cms_heavy_hitters,
    "sk_bloom_semi_join": sk_bloom_semi_join,
}

# --- DuckDB oracles ------------------------------------------------------
# Hash mirror contract (functions/text.py): portable_hash64 ↔
# CAST(concat('0x', substr(md5(seed || x), 1, 15)) AS BIGINT),
# portable_hash32 ↔ the 8-hex-digit form.

_KMV_HASH = (
    "CAST(concat('0x', substr(md5('kmv-' || CAST(user_id AS VARCHAR)), 1, 15))"
    " AS BIGINT)"
)

_CMS_ARMS = ", ".join(f"({d})" for d in range(CMS_D))


def _cms_hash(item_sql: str) -> str:
    return (
        f"CAST(concat('0x', substr(md5('cms' || CAST(s.d AS VARCHAR) || '-' || "
        f"{item_sql}), 1, 8)) AS BIGINT) % {CMS_W}"
    )


def _bloom_hash(key_sql: str, k: int) -> str:
    return (
        f"CAST(concat('0x', substr(md5('bf{k}-' || {key_sql}), 1, 8)) AS BIGINT)"
        f" % {BLOOM_M}"
    )


ORACLES = {
    "sk_kmv_distinct": f"""
        WITH h AS (
          SELECT DISTINCT event_type, {_KMV_HASH} AS h FROM events
        ),
        r AS (
          SELECT event_type, h,
                 row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
          FROM h
        ),
        s AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sketch,
                 MAX(CASE WHEN rn = {KMV_K} THEN h END) AS kth_min_hash
          FROM r WHERE rn <= {KMV_K} GROUP BY event_type
        )
        SELECT event_type, n_sketch, kth_min_hash,
               CAST(CASE WHEN n_sketch < {KMV_K} THEN n_sketch
                         ELSE FLOOR({float(KMV_K - 1)!r} * {_HASH64_DOMAIN!r}
                                    / kth_min_hash)
                    END AS BIGINT) AS est_distinct
        FROM s ORDER BY event_type
        """,
    "sk_cms_heavy_hitters": f"""
        WITH occ AS (
          SELECT unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS tok
          FROM documents WHERE length(trim(text)) > 0
        ),
        cells AS (
          SELECT s.d, {_cms_hash("tok")} AS col
          FROM occ, (VALUES {_CMS_ARMS}) s(d)
        ),
        sketch AS (SELECT d, col, COUNT(*) AS c FROM cells GROUP BY 1, 2),
        total AS (SELECT SUM(c) AS n_stream FROM sketch WHERE d = 0),
        cand AS (SELECT DISTINCT tok FROM occ),
        probe AS (
          SELECT tok, s.d, {_cms_hash("tok")} AS col
          FROM cand, (VALUES {_CMS_ARMS}) s(d)
        ),
        est AS (
          SELECT tok, MIN(c) AS est_count
          FROM probe JOIN sketch USING (d, col) GROUP BY tok
        )
        SELECT tok, est_count
        FROM est, total
        WHERE est_count * {CMS_PHI_INV} >= n_stream
        ORDER BY est_count DESC, tok
        """,
    "sk_bloom_semi_join": f"""
        WITH bad AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0),
        bits AS (
          SELECT DISTINCT
            CAST(concat('0x', substr(md5('bf' || CAST(s.k AS VARCHAR) || '-'
                 || CAST(c_custkey AS VARCHAR)), 1, 8)) AS BIGINT)
              % {BLOOM_M} AS bit
          FROM bad, (VALUES (0), (1), (2)) s(k)
        ),
        probe AS (SELECT o_orderkey, o_custkey FROM orders),
        hit AS (
          SELECT p.* FROM probe p
          WHERE {_bloom_hash("CAST(p.o_custkey AS VARCHAR)", 0)}
                  IN (SELECT bit FROM bits)
            AND {_bloom_hash("CAST(p.o_custkey AS VARCHAR)", 1)}
                  IN (SELECT bit FROM bits)
            AND {_bloom_hash("CAST(p.o_custkey AS VARCHAR)", 2)}
                  IN (SELECT bit FROM bits)
        )
        SELECT
          (SELECT CAST(COUNT(*) AS BIGINT) FROM probe) AS n_orders,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM bits) AS n_bits_set,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_pass,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM hit h
             JOIN bad b ON h.o_custkey = b.c_custkey) AS n_true_match,
          (SELECT CAST(COUNT(*) AS BIGINT) FROM hit)
            - (SELECT CAST(COUNT(*) AS BIGINT) FROM hit h
                 JOIN bad b ON h.o_custkey = b.c_custkey) AS n_false_pos
        """,
}
