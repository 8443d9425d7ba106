"""Similarity search over the ``embeddings`` table (north-star
requirement: ANN over an embedding column).

Three operators:

- ``sim_topk_brute``: exact cosine top-k per probe — the correctness
  baseline. A broadcast of the (small) probe set against the corpus;
  one shuffle for the per-probe top-k window. At 100 TB this is the
  *verification* path, not the serving path.
- ``sim_topk_lsh``: random-hyperplane LSH (SimHash for cosine space,
  Charikar 2002): P=16 signed hyperplanes → 16-bit signature → 2 bands
  of 8 bits; candidates collide with the probe in ≥1 band, exact cosine
  re-rank inside the candidate set only. The bucket join replaces the
  cross product — the property that scales: each vector lands in
  2 buckets regardless of corpus size, and probe lookups touch only
  colliding buckets. Banding is the same shape as MinHash-LSH
  (dedup.py) and the quarter-pigeonhole (SimHash near-pairs).
- ``sim_label_centroids``: per-cluster centroid + cohesion profile —
  element-wise vector aggregation via posexplode/groupBy, the
  distributed form of a dense mean over array columns.

Float discipline: every dot product casts float32 elements to double
BEFORE multiplying and folds left-to-right in both engines (Spark
``aggregate`` HOF; DuckDB ``list_dot_product`` over double-cast lists)
— measured bit-identical on the fixtures, so 6-dp rounding is stable
cross-engine. Hyperplane components are ±1 derived from md5 at import
time (seeded, no wall clock) and inlined as literals into BOTH the
Spark plan and the oracle SQL.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from task_hive_spark.functions.components import min_label_components
from task_hive_spark.functions.vectors import cosine, dot, norm
from task_hive_spark.materialize import register_aux_cache, session_index
from task_hive_spark.sources.fixtures import load_table

DIM = 64
# 8 bands × 4 bits: for neighbor cosine ≈ 0.7 the per-bit collision
# rate is ~0.75, so a 4-bit band matches with p≈0.31 and ≥1-of-8 bands
# with p≈0.95 — measured ~0.75 recall of the exact top-5 on the
# fixtures (2 bands × 8 bits scored only 0.08). More bands buy recall,
# narrower bands buy candidate sparsity; both knobs stay sub-quadratic.
N_PLANES = 32
N_BANDS = 8
BITS_PER_BAND = N_PLANES // N_BANDS
TOP_K = 5
PROBE_MOD = 100  # probe candidates = vec_id % 100 == 0 ...
K_PROBES = 32  # ... capped to the K smallest ids (O(1) in corpus size)


def _probe_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The probe-id dimension shared by brute/LSH/IVF top-k: every
    PROBE_MOD-th vector, capped to the K_PROBES smallest ids. The
    modulus alone yields a probe set proportional to the corpus, so
    every broadcast built from it would grow O(corpus) at 100 TB; the
    deterministic ORDER BY vec_id LIMIT cap makes the probe set — and
    the recall comparison across the three strategies, which share it —
    a fixed-size dimension. TakeOrdered over a 1-column projection:
    K rows reach the driver regardless of corpus size."""
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.where(F.col("vec_id") % PROBE_MOD == 0)
        .select("vec_id")
        .orderBy("vec_id")
        .limit(K_PROBES)
    )


def _planes() -> list[list[float]]:
    """Seeded ±1 hyperplanes (md5-derived, identical in both engines)."""
    out = []
    for p in range(N_PLANES):
        row = []
        for d in range(DIM):
            h = hashlib.md5(f"plane{p}-{d}".encode()).hexdigest()
            row.append(1.0 if int(h[:2], 16) % 2 == 0 else -1.0)
        out.append(row)
    return out


PLANES = _planes()


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Rebalance past the (few-file) scan so the 32-plane dot products
    # run cluster-wide, not on the handful of input splits. See
    # dedup._doc_shingles for the same-shape rationale.
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    return load_table(spark, sf_dir, "embeddings").repartition(n)


def _probe_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The K_PROBES probe vectors as a pruned scan + broadcast id join —
    deliberately NOT a filter of ``_emb``: that would execute the
    full-corpus round-robin repartition (wide float arrays through an
    Exchange) just to keep K_PROBES rows. Zero exchanges this way."""
    return load_table(spark, sf_dir, "embeddings").join(
        F.broadcast(_probe_ids(spark, sf_dir)), "vec_id"
    )


def _normed(e: DataFrame) -> DataFrame:
    """Embeddings with the vector norm precomputed once per vector, so
    pair scoring is a single dot product instead of three (the norms in
    cosine's denominator don't depend on the pair)."""
    return e.select("vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))


def _band_buckets(df: DataFrame, vec_col: str) -> DataFrame:
    """(key, band, bucket) rows — one per band, bucket = that band's
    bit-string; the first column of ``df`` must be the vector's unique
    key. Narrow by design: every consumer joins candidates on the key
    and re-attaches vectors from the base table itself, so carrying
    embeddings through the banding would only widen the shuffles.

    The 32 plane dots are computed as posexplode × broadcast
    plane-matrix × one grouped aggregation — whole-stage codegen end
    to end. The tempting all-array form (a zip_with/aggregate lambda
    pair per plane) runs interpreted, and with 32 distinct lambda
    shapes the interpreter call sites go megamorphic: C2 sometimes
    never promotes them and the same query oscillates 1.4s ↔ 8s
    between sessions. Products are exact (float32 → double, ±1.0
    coefficients), so the only arithmetic difference vs the sequential
    fold is summation order — immaterial unless a dot lands within
    1e-15 of the sign boundary."""
    key = df.columns[0]
    spark = df.sparkSession
    # VALUES literal, not createDataFrame(list): the plane matrix is a
    # driver-held constant and the Python-RDD frame re-ran its
    # pickle→JVM conversion under the index build (the f3e5f2c
    # pattern; cold path — once per session — but the same shape).
    # Entries are exactly ±1.0, so the D-suffixed literal is exact.
    rows = ", ".join(
        "(" + str(pos) + ", "
        + ", ".join(f"{PLANES[p][pos]!r}D" for p in range(N_PLANES))
        + ")"
        for pos in range(DIM)
    )
    cols = ", ".join(f"c{p}" for p in range(N_PLANES))
    planes = spark.sql(f"SELECT * FROM (VALUES {rows}) AS t(pos, {cols})")
    x = df.select(key, F.posexplode(vec_col).alias("pos", "xv")).select(
        key, "pos", F.col("xv").cast("double").alias("xv")
    )
    dots = (
        x.join(F.broadcast(planes), "pos")
        .groupBy(key)
        .agg(
            *[F.sum(F.col("xv") * F.col(f"c{p}")).alias(f"d{p}") for p in range(N_PLANES)]
        )
    )
    bits = [
        F.when(F.col(f"d{p}") > 0, F.lit("1")).otherwise(F.lit("0"))
        for p in range(N_PLANES)
    ]
    bands = [
        F.concat(*bits[b * BITS_PER_BAND : (b + 1) * BITS_PER_BAND]).alias(f"b{b}")
        for b in range(N_BANDS)
    ]
    stacked = dots.select(key, *bands).select(
        key,
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band"), F.col(f"b{b}").alias("bucket"))
                    for b in range(N_BANDS)
                ]
            )
        ).alias("bb"),
    )
    return stacked.select(
        key, F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def _corpus_banding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (vec_id, band, bucket) LSH index over the FULL embeddings
    corpus, materialized once per (session, sf_dir): sim_topk_lsh and
    dd_embedding_cosine_pairs consume the identical banding, and probe
    buckets are a filter of it (probes ⊂ corpus by construction) — so
    the 32-plane signature pipeline runs once per session, not once per
    query side. N_BANDS rows per vector, fixed width: an index, safe to
    persist at corpus scale. Input is pre-partitioned by vec_id so the
    per-vector signature aggregation underneath runs exchange-free."""

    def build() -> DataFrame:
        n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        e = load_table(spark, sf_dir, "embeddings").repartition(n, "vec_id")
        return _band_buckets(e.select("vec_id", "embedding"), "embedding")

    return session_index(spark, sf_dir, "lsh_banding", build)


def sim_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k per probe. Rank on the 6-dp-rounded score with
    vec_id tie-break so ordering is reproducible cross-engine."""
    e = _emb(spark, sf_dir)
    probes = _probe_emb(spark, sf_dir).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    scored = (
        e.join(F.broadcast(probes), F.col("vec_id") != F.col("probe_id"))
        .select(
            "probe_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(cosine(F.col("pe"), F.col("embedding")), 6).alias("cos_sim"),
        )
    )
    return _topk_ranked(scored, "cos_sim")


def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed top-k: candidates share ≥1 band bucket with the
    probe; exact cosine re-ranks candidates only. Approximate by
    construction (the oracle mirrors the same algorithm, so the gate
    checks the algorithm, not recall)."""
    corpus_b = _corpus_banding(spark, sf_dir)
    # probes ⊂ corpus, so probe buckets are a FILTER of the materialized
    # corpus banding — the former second signature pipeline over the
    # probe subset is gone entirely
    pid = _probe_ids(spark, sf_dir)
    probes_b = corpus_b.join(F.broadcast(pid), "vec_id").select(
        F.col("vec_id").alias("probe_id"), "band", "bucket"
    )
    # candidate ids dedupe on a NARROW row, then embeddings re-attach
    # with precomputed norms so exact cosine runs once per unique pair
    # as a single dot product — see dd_embedding_cosine_pairs
    cands = (
        corpus_b.join(F.broadcast(probes_b), ["band", "bucket"])
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", F.col("vec_id").alias("neighbor_id"))
        .distinct()
    )
    # raw scan, NOT _emb, for the verify side (r14; _probe_emb's
    # rationale): the candidate set is report-sized, and _emb's
    # full-corpus round-robin Exchange shipped every wide float array
    # just to discard all but the candidates — the per-row norm is map
    # work the scan partitions handle (guide §8: keep heavy payloads
    # out of exchanges that only exist to re-attach them)
    en = _normed(load_table(spark, sf_dir, "embeddings"))
    scored = (
        cands.join(
            F.broadcast(
                _normed(_probe_emb(spark, sf_dir)).select(
                    F.col("vec_id").alias("probe_id"),
                    F.col("embedding").alias("pe"),
                    F.col("nrm").alias("pn"),
                )
            ),
            "probe_id",
        )
        .join(
            en.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("ne"),
                F.col("nrm").alias("nn"),
            ),
            "neighbor_id",
        )
        .select(
            "probe_id",
            "neighbor_id",
            F.round(
                dot(F.col("pe"), F.col("ne")) / (F.col("pn") * F.col("nn")), 6
            ).alias("cos_sim"),
        )
    )
    return _topk_ranked(scored, "cos_sim")


def _elementwise_mean(df: DataFrame, key: str) -> DataFrame:
    """Element-wise mean vector per ``key`` over (key, embedding) rows:
    posexplode → (key, pos) groupBy → re-assemble — two shuffles, both
    on small keys. ONE arithmetic serving both the per-label centroids
    (key='label') and the Lloyd cell update (key='cell'), so the
    quantizer's seeding and training paths cannot drift."""
    comp = df.select(key, F.posexplode("embedding").alias("pos", "v"))
    return (
        comp.groupBy(key, "pos")
        .agg(F.avg(F.col("v").cast("double")).alias("c"))
        .groupBy(key)
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "c"))), lambda s: s["c"]
            ).alias("centroid")
        )
    )


def _topk_ranked(scored: DataFrame, score_col: str, *, ascending: bool = False) -> DataFrame:
    """Shared top-k tail of the four ANN strategies: rank per probe on
    the 6-dp-rounded score with neighbor_id tie-break (reproducible
    cross-engine), cut at TOP_K, display order. One definition so a
    tie-break or cutoff tweak cannot silently fork the strategies the
    recall comparison assumes are ranked identically."""
    w = W.partitionBy("probe_id").orderBy(
        F.asc(score_col) if ascending else F.desc(score_col), F.asc("neighbor_id")
    )
    from task_hive_spark.functions.report import report_sort

    return report_sort(
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("probe_id", "rank", "neighbor_id", score_col),
        "probe_id",
        "rank",
    )


def _centroids(e: DataFrame) -> DataFrame:
    """Per-label centroid vectors (see _elementwise_mean)."""
    return _elementwise_mean(e, "label")


def _label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Label centroids as a per-session materialized index (K rows):
    sim_label_centroids, sim_topk_ivf, and sim_kmeans_step all consume
    the same K-row table — and kmeans references it on two join sides,
    which would otherwise execute the posexplode aggregation twice."""
    return session_index(
        spark, sf_dir, "label_centroids", lambda: _centroids(_emb(spark, sf_dir))
    )


def sim_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid norm + mean cosine-to-centroid (cluster
    cohesion)."""
    e = _emb(spark, sf_dir)
    cent = _label_centroids(spark, sf_dir)
    joined = e.join(F.broadcast(cent), "label").select(
        "label",
        cosine(F.col("embedding"), F.col("centroid")).alias("cos_c"),
    )
    return (
        joined.groupBy("label")
        .agg(
            F.count("*").alias("n_vecs"),
            F.round(F.avg("cos_c"), 6).alias("avg_cos_to_centroid"),
            F.round(F.min("cos_c"), 6).alias("min_cos_to_centroid"),
        )
        .orderBy("label")
    )


# IVF cells searched per probe. Measured recall of the exact top-5 on
# the fixtures (trained quantizer, IVF_TRAIN_ITERS Lloyd rounds): see
# COVERAGE.md's pinned recall-vs-nprobe curve — the standard IVF knob:
# recall scales with the corpus fraction scanned.
NPROBE = 3
# Lloyd rounds refining the label-seeded coarse quantizer. Training is
# part of the index build (a session_index), not the query; 2 rounds
# measured enough to rebalance the fixture cells (see COVERAGE).
IVF_TRAIN_ITERS = 3


def _assign_cells(e: DataFrame, cent: DataFrame) -> DataFrame:
    """Rank every vector's cells by rounded cosine (broadcast K-row
    centroid dim, one map stage): rn=1 is the vector's IVF cell,
    rn<=nprobe the probe's search set. Rounding to 6dp before the rank
    keeps the argmax identical cross-engine."""
    cellscore = e.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "embedding",
        "cell",
        F.round(cosine(F.col("embedding"), F.col("centroid")), 6).alias("cos_cell"),
    )
    w_cell = W.partitionBy("vec_id").orderBy(F.desc("cos_cell"), "cell")
    return cellscore.withColumn("rn", F.row_number().over(w_cell))


def _cell_means(assigned: DataFrame) -> DataFrame:
    """The Lloyd update step (see _elementwise_mean)."""
    return _elementwise_mean(assigned, "cell")


def _ivf_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained coarse quantizer as a session index (K rows): label
    centroids seed IVF_TRAIN_ITERS Lloyd rounds (assign by rounded
    cosine, recompute cell means). Training cost is O(iters · N · K)
    map work at INDEX BUILD time — exactly how a production IVF index
    trains (on a sample) before serving; every probe query reuses the
    result. A cell that loses all members drops out of the quantizer
    (standard k-means dead-cell behavior, mirrored by the oracle's
    GROUP BY)."""

    def build() -> DataFrame:
        e = _emb(spark, sf_dir)
        cent = _label_centroids(spark, sf_dir).select(
            F.col("label").alias("cell"), "centroid"
        )
        for _ in range(IVF_TRAIN_ITERS):
            asg = (
                _assign_cells(e, cent)
                .where(F.col("rn") == 1)
                .select("vec_id", "embedding", "cell")
            )
            cent = _cell_means(asg)
        return cent

    return session_index(spark, sf_dir, "ivf_centroids", build)


def _ivf_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INVERTED FILE itself — (vec_id, embedding, cell) with every
    vector in its nearest trained-centroid cell — as a session index:
    this is the table a production IVF index stores, so it materializes
    once per session and both IVF and IVF-PQ probes read it instead of
    re-running the corpus × K assignment scoring (which otherwise
    executed once per consumer: exchange reuse does not dedupe the
    assigned/probe references)."""

    def build() -> DataFrame:
        e = _emb(spark, sf_dir)
        cent = _ivf_centroids(spark, sf_dir)
        return (
            _assign_cells(e, cent)
            .where(F.col("rn") == 1)
            .select("vec_id", "embedding", "cell")
        )

    return session_index(spark, sf_dir, "ivf_assign", build)


def _probe_ranked_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cells ranked by cosine for the PROBE subset only (K_PROBES rows
    × K cells — trivially small): probes need their nprobe nearest
    cells, which never requires ranking the whole corpus."""
    return _assign_cells(_probe_emb(spark, sf_dir), _ivf_centroids(spark, sf_dir))


def sim_topk_ivf(spark: SparkSession, sf_dir: str, nprobe: int = NPROBE) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse quantizer (label-seeded
    k-means, IVF_TRAIN_ITERS Lloyd rounds — _ivf_centroids) assigns
    every vector to its nearest-centroid cell; a probe searches only
    its nprobe nearest cells with exact cosine re-rank (default NPROBE;
    scripts/scale_probe.py --ivf-recall sweeps the knob and pins recall
    per scale factor).

    Scale shape: centroids are a broadcast dim (K rows); assignment is
    one map stage (K dot products per vector); the cell id becomes the
    partition/bucket key, so probe lookups are partition-pruned scans of
    NPROBE cells instead of the full corpus. Candidate count per probe ≈
    NPROBE·N/K regardless of corpus size."""
    assigned = _ivf_assignment(spark, sf_dir)
    probe_cells = _probe_ranked_cells(spark, sf_dir).where(
        F.col("rn") <= nprobe
    ).select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe"), "cell")
    # each corpus vector lives in exactly one cell, so (probe, neighbor)
    # meets at most once — no distinct needed
    cands = assigned.join(F.broadcast(probe_cells), "cell").where(
        F.col("vec_id") != F.col("probe_id")
    )
    scored = cands.select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("pe"), F.col("embedding")), 6).alias("cos_sim"),
    )
    return _topk_ranked(scored, "cos_sim")


def sim_kmeans_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Lloyd's k-means iteration over the embedding corpus — the
    building block of the IVF coarse quantizer (sim_topk_ivf seeds its
    cells from the label centroids; production would iterate THIS step
    to convergence on a sample). Seed centroids = label centroids;
    assign every vector to its nearest cell by cosine (broadcast K
    centroids, one map stage), recompute per-cell means (posexplode +
    (cell, pos) groupBy — two small-key shuffles), report per-cell
    population and centroid drift. Deterministic, so the oracle mirrors
    the full step; iterating is driver-side control flow like
    dd_duplicate_clusters."""
    e = _emb(spark, sf_dir)
    cent = _label_centroids(spark, sf_dir).select(F.col("label").alias("cell"), "centroid")
    # the SAME assignment + mean helpers the IVF trainer iterates — one
    # implementation, so a rounding/tie-break change cannot diverge the
    # standalone step from the training loop
    assigned = (
        _assign_cells(e, cent).where(F.col("rn") == 1).select("vec_id", "embedding", "cell")
    )
    new_cent = _cell_means(assigned).withColumnRenamed("centroid", "new_centroid")
    pop = assigned.groupBy("cell").agg(F.count("*").alias("n_assigned"))
    return (
        pop.join(new_cent, "cell")
        .join(F.broadcast(cent), "cell")
        .select(
            "cell",
            "n_assigned",
            F.round(
                F.lit(1.0) - cosine(F.col("centroid"), F.col("new_centroid")), 6
            ).alias("drift"),
        )
        .orderBy("cell")
    )


NEAR_DUP_COS = 0.35  # fixture embeddings top out at cos≈0.51; 0.35 ≈ p99.9


def dd_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the dedup family's vector
    member): candidate pairs share ≥1 LSH band bucket (never all-pairs
    — each vector lands in exactly N_BANDS buckets regardless of corpus
    size), then exact cosine keeps pairs ≥ NEAR_DUP_COS. Same banding as
    sim_topk_lsh; the i<j guard halves the candidate set."""
    # three-stage shape, each stage minimal: (1) candidate ids from the
    # band self-join over the MATERIALIZED banding index (the 32-plane
    # signature pipeline runs once per session, shared with
    # sim_topk_lsh), deduped NARROW (no arrays in the shuffle — the
    # wide-distinct variant measured 2x the whole query); (2) embeddings
    # + precomputed norms re-attached; (3) one dot product per unique
    # pair. At corpus scale stage 2 is the standard verify join and the
    # vector table is scanned, not re-hashed (unlike the minhash md5
    # pipeline, where re-attachment would recompute signatures).
    stacked = _corpus_banding(spark, sf_dir)
    a, b = stacked.alias("a"), stacked.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .select(F.col("a.vec_id").alias("vec_id"), F.col("b.vec_id").alias("dup_id"))
        .distinct()
    )
    # raw scan for the verify side (r14, same move as sim_topk_lsh):
    # the flagged-pair set is report-sized and _emb's full-corpus
    # round-robin Exchange of wide float arrays was paid twice (both
    # join sides) just to re-attach vectors to it
    en = _normed(load_table(spark, sf_dir, "embeddings"))
    out = (
        cands.join(
            en.select("vec_id", F.col("embedding").alias("ae"), F.col("nrm").alias("na")),
            "vec_id",
        )
        .join(
            en.select(
                F.col("vec_id").alias("dup_id"),
                F.col("embedding").alias("de"),
                F.col("nrm").alias("nd"),
            ),
            "dup_id",
        )
        .select(
            "vec_id",
            "dup_id",
            F.round(dot(F.col("ae"), F.col("de")) / (F.col("na") * F.col("nd")), 6).alias(
                "cos_sim"
            ),
        )
        .where(F.col("cos_sim") >= NEAR_DUP_COS)
    )
    from task_hive_spark.functions.report import report_sort

    # report_sort, not orderBy: flagged pairs are report-sized and the
    # global sort paid a sampling job + wide exchange (guide §2.4)
    return report_sort(out, "vec_id", "dup_id")


# In-cell pair threshold for SemDeDup: lower than the LSH family's
# NEAR_DUP_COS (0.35) because cluster-scoping already pre-filters to
# same-neighborhood vectors — 0.33 yields a non-trivial dup graph on
# the fixtures (tens of pairs) while staying ≈p99.8 of the in-cell
# pair-cosine distribution.
SEMDEDUP_COS = 0.33


def dd_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540 — public paper):
    semantic dedup scoped to k-means clusters. Pairwise cosine runs
    ONLY within each cell of the trained coarse quantizer (the same
    _ivf_assignment index IVF search reads), near-dup pairs (≥
    SEMDEDUP_COS) form a graph, connected components (shared fixpoint:
    functions/components.py) collapse each group to one kept
    representative = the component's min vec_id.

    Scale shape: the all-pairs step is quadratic only WITHIN a cell
    (≈N/K rows), never across the corpus — the quadratic term shrinks
    as K grows with the corpus, which is exactly why the paper clusters
    first; the production knob is capping oversized cells (sampling or
    re-clustering), the same remedy as the LSH hot-bucket cap. The
    self-join keys on cell, so a cell is one shuffle partition —
    bounded by the quantizer's balance, which scripts/scale_probe.py
    tracks per sf.

    Output: (rep_id, vec_id, cell, cluster_size, keep) for every vector
    in a dup group (singletons are not duplicates and don't appear);
    keep marks the representative row.
    """
    asg = _ivf_assignment(spark, sf_dir)
    an = asg.select("cell", "vec_id", "embedding", norm(F.col("embedding")).alias("nrm"))
    a = an.select(
        "cell",
        F.col("vec_id").alias("a_id"),
        F.col("embedding").alias("av"),
        F.col("nrm").alias("na"),
    )
    b = an.select(
        "cell",
        F.col("vec_id").alias("b_id"),
        F.col("embedding").alias("bv"),
        F.col("nrm").alias("nb"),
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id",
            "b_id",
            F.round(dot(F.col("av"), F.col("bv")) / (F.col("na") * F.col("nb")), 6).alias(
                "cos_sim"
            ),
        )
        .where(F.col("cos_sim") >= SEMDEDUP_COS)
    )
    from task_hive_spark.functions.report import report_sort

    comps = min_label_components(pairs.select("a_id", "b_id"))
    sizes = comps.groupBy("component").agg(F.count("*").alias("cluster_size"))
    # report_sort, not orderBy: the output is dup-group members only
    # (report-sized), and the global sort paid a range-sampling job +
    # a second wide exchange per run (guide §2.4; identical total order,
    # order-insensitive oracle hash unchanged)
    return report_sort(
        comps.join(sizes, "component")
        .join(asg.select("vec_id", "cell"), comps.node == F.col("vec_id"))
        .select(
            F.col("component").alias("rep_id"),
            "vec_id",
            "cell",
            "cluster_size",
            (F.col("vec_id") == F.col("component")).alias("keep"),
        ),
        "rep_id",
        "vec_id",
    )


PROTO_PRUNE_FRAC = 0.25  # prune the most-prototypical quarter per cell


def sim_prototypes_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototype data pruning (Sorscher et al. 2022, "Beyond neural
    scaling laws", arXiv:2206.14486 — public paper): score every
    example by its cosine to its cluster prototype (the trained
    quantizer centroid — the SAME _ivf_centroids/_ivf_assignment the
    ANN index and SemDeDup read) and, in the abundant-data regime the
    paper targets, PRUNE the most prototypical (easiest) quarter of
    each cell — keeping the hard examples is what beats power-law
    scaling. Output: (vec_id, cell, cos_proto, proto_rank, keep), rank
    1 = most prototypical; keep = rank past the pruned head.

    Determinism: rank on 6dp-rounded cosine with vec_id tie-break (the
    established quantizer discipline); the prune boundary
    ceil(cell_n · 0.25) is exact in both engines (dyadic fraction,
    integer ceil). Scale shape: one broadcast of the K-row centroid
    table onto the materialized inverted file, one cell-partitioned
    rank window — a map-join plus one bounded shuffle; nothing
    quadratic anywhere (the paper's k-means step is the already-shared
    trained quantizer)."""
    asg = _ivf_assignment(spark, sf_dir)
    cent = _ivf_centroids(spark, sf_dir)
    scored = asg.join(F.broadcast(cent), "cell").select(
        "vec_id",
        "cell",
        F.round(
            dot(F.col("embedding"), F.col("centroid"))
            / (norm(F.col("embedding")) * norm(F.col("centroid"))),
            6,
        ).alias("cos_proto"),
    )
    w = W.partitionBy("cell").orderBy(F.desc("cos_proto"), "vec_id")
    return (
        scored.withColumn("proto_rank", F.row_number().over(w))
        .withColumn("cell_n", F.count("*").over(W.partitionBy("cell")))
        .select(
            "vec_id",
            "cell",
            "cos_proto",
            F.col("proto_rank").cast("int").alias("proto_rank"),
            (
                F.col("proto_rank")
                > F.ceil(F.col("cell_n") * F.lit(PROTO_PRUNE_FRAC)).cast("int")
            ).alias("keep"),
        )
        .orderBy("vec_id")
    )


def sim_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization accounting per embedding — the
    4×-storage-compression pass an ANN serving tier runs over the
    corpus. Per vector: scale = max|x|, q_i = round(x_i/scale · 127).
    Output is integer-exact (sum and L1 of the quantized vector), so
    the cross-engine gate has no float-canonicalization slack.

    Shape: explode → max-window → agg, pre-partitioned by vec_id so
    BOTH the window and the aggregation run exchange-free (one
    |vectors|-row shuffle total) with whole-stage codegen end to end.
    The tempting pure-array form (scale and q as nested higher-order
    lambdas) is O(d²) per row: Catalyst inlines the array_max subtree
    into every lambda element evaluation and HOF lambdas run
    interpreted — measured 4.9s vs 0.25s at sf0.1 for d=64."""
    n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    e = load_table(spark, sf_dir, "embeddings").repartition(n, "vec_id")
    x = e.select(
        "vec_id", F.explode(F.col("embedding")).alias("xf")
    ).select("vec_id", F.col("xf").cast("double").alias("x"))
    w = W.partitionBy("vec_id")
    # scale = 0 ⟺ all-zero embedding: quantize to all-zero instead of
    # dividing by zero (NULL, or an error under ANSI mode)
    q = x.withColumn("scale", F.max(F.abs(F.col("x"))).over(w)).withColumn(
        "q",
        F.when(F.col("scale") == 0, F.lit(0))
        .otherwise(F.round(F.col("x") / F.col("scale") * 127))
        .cast("int"),
    )
    return (
        q.groupBy("vec_id")
        .agg(
            F.round(F.first("scale"), 6).alias("scale"),
            F.sum("q").cast("int").alias("q_sum"),
            F.sum(F.abs("q")).cast("int").alias("q_l1"),
            F.sum((F.abs(F.col("q")) == 127).cast("int")).cast("int").alias("n_saturated"),
        )
        .orderBy("vec_id")
    )


# Product quantization geometry: M subspaces × K codes over DIM dims.
# The codebook is a seeded deterministic stand-in (production trains
# per-subspace k-means on a sample — the assignment pipeline is
# identical); entries are exact multiples of 1/64 so (x − c) is a
# single-rounding double in both engines.
PQ_M = 4
PQ_K = 16
PQ_SUBDIM = DIM // PQ_M


def _pq_codebook() -> list[tuple[int, int, int, float]]:
    rows = []
    for m in range(PQ_M):
        for k in range(PQ_K):
            for d in range(PQ_SUBDIM):
                h = hashlib.md5(f"pq{m}-{k}-{d}".encode()).hexdigest()
                rows.append((m, k, d, (int(h[:4], 16) % 65 - 32) / 64.0))
    return rows


PQ_BOOK = _pq_codebook()


# session-held checkpointed codebook frame — the _ann_index_constants
# treatment for the LITERAL book: a bare createDataFrame(list) plans a
# Python-RDD scan whose pickle conversion re-runs under every consumer
# subtree (broadcast builds included); checkpointing the 1,024 rows
# once per session makes every PQ encode/LUT read a JVM-cached block
_PQ_BOOK_DF: dict[tuple[str], DataFrame] = {}  # 1-tuple keys — eviction contract
register_aux_cache(_PQ_BOOK_DF)


def _pq_book_df(spark: SparkSession) -> DataFrame:
    # key is a 1-TUPLE, not the bare appId string: the aux-cache
    # eviction contract checks key[0] against the live applicationId,
    # and a string key's [0] is its first CHARACTER — the bare key was
    # silently evicted on every session_index call, so every ADC LUT
    # construction rebuilt (and re-checkpointed) the codebook, ~5-8 s
    # of pure driver overhead per sim_topk_ivf_pq/_pq_refined call
    # (measured; memo hit is sub-ms).
    key = (spark.sparkContext.applicationId,)
    if key not in _PQ_BOOK_DF:
        # VALUES literal, not createDataFrame(list): no Python-RDD
        # conversion at build either. Entries are exact multiples of
        # 1/64, so their repr is a terminating decimal and the
        # decimal→double cast is bit-exact.
        rows = ", ".join(
            f"({m}, {k}, {d}, CAST({c!r} AS DOUBLE))" for m, k, d, c in PQ_BOOK
        )
        _PQ_BOOK_DF[key] = spark.sql(
            f"SELECT * FROM (VALUES {rows}) AS t(sub, code, d, c)"
        ).localCheckpoint(eager=True)
    return _PQ_BOOK_DF[key]


def _pq_dist_table(
    spark: SparkSession, e: DataFrame, book: DataFrame | None = None
) -> DataFrame:
    """(vec_id, sub, code, d2): squared L2 from each vector's sub-th
    subvector to every codebook entry — the shared kernel of PQ encode
    (argmin over code per sub, sim_pq_codes) and of ADC lookup tables
    (ALL codes kept, per probe, sim_topk_ivf_pq). posexplode →
    broadcast codebook join (PQ_K-way fan-out per element) → one
    aggregation, exchange-free on top of a vec_id partitioning (the
    groupBy key set contains vec_id). ``book`` lets the serving path
    substitute the PERSISTED codebook (materialize_ann_index) for the
    literal one."""
    x = e.select("vec_id", F.posexplode("embedding").alias("pos", "xf")).select(
        "vec_id",
        (F.col("pos") / PQ_SUBDIM).cast("int").alias("sub"),
        (F.col("pos") % PQ_SUBDIM).cast("int").alias("d"),
        F.col("xf").cast("double").alias("x"),
    )
    if book is None:
        book = _pq_book_df(spark)
    return (
        x.join(F.broadcast(book), ["sub", "d"])
        .groupBy("vec_id", "sub", "code")
        .agg(F.sum((F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))).alias("d2"))
    )


def _pq_code_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stored PQ code index, materialized once per session:
    (vec_id, sub, code, d2r) — argmin codebook entry per subvector plus
    its 6-dp-rounded squared distance. Both the codes report
    (sim_pq_codes) and the ADC scorer (sim_topk_ivf_pq) read this; the
    corpus-wide DIM×PQ_K fan-out runs exactly once per session, the way
    a serving tier encodes the corpus once at index build.

    The argmin ranks on ROUND(d2, 6) with the code tie-break: a raw
    double d2 is a 16-term sum whose last ulp depends on aggregation
    order, so two near-tied codebook entries could flip between engines
    — the same round-before-rank discipline as _assign_cells."""

    def build() -> DataFrame:
        n = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        e = load_table(spark, sf_dir, "embeddings").repartition(n, "vec_id")
        dist = _pq_dist_table(spark, e)
        best = dist.groupBy("vec_id", "sub").agg(
            F.min(F.struct(F.round("d2", 6).alias("d2r"), "code")).alias("b")
        )
        return best.select(
            "vec_id", "sub", F.col("b.code").alias("code"), F.col("b.d2r").alias("d2r")
        )

    return session_index(spark, sf_dir, "pq_codes", build)


def sim_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes per embedding — the M-byte compressed
    representation an IVF-PQ serving tier stores instead of the raw
    vector (Jégou et al. 2011): split each vector into PQ_M subvectors,
    assign each subvector its nearest codebook entry by squared L2, and
    report the code tuple plus the total reconstruction error.

    Reads the materialized _pq_code_index; the reconstruction error
    sums the per-subvector rounded distances in exact 1e-6 integer
    units (order-independent — a double sum of 4 values could flip the
    final 6-dp rounding depending on fold order)."""
    per = _pq_code_index(spark, sf_dir)
    return (
        per.groupBy("vec_id")
        .agg(
            *[
                F.max(F.when(F.col("sub") == m, F.col("code")))
                .cast("int")
                .alias(f"code_{m}")
                for m in range(PQ_M)
            ],
            F.round(
                F.sum((F.col("d2r") * 1000000 + F.lit(0.5)).cast("long"))
                / F.lit(1000000.0),
                6,
            ).alias("recon_err"),
        )
        .orderBy("vec_id")
    )


def _sq8_ranges(spark: SparkSession, sf_dir: str) -> tuple[list, list]:
    """Per-dimension (min, span) of the corpus — the trained scalar
    quantizer. 64 doubles each: an index-build-time constant collected
    to the driver, the IVF-centroid precedent (never row-scale data).
    min/max of exact float32→double values are exact, so precomputing
    span = mx - mn on the driver is bit-identical to computing it
    inline engine-side."""
    rows = (
        _emb(spark, sf_dir)
        .select(F.posexplode("embedding").alias("pos", "x"))
        .select("pos", F.col("x").cast("double").alias("x"))
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("pos")
        .collect()
    )
    assert len(rows) == DIM
    return [r["mn"] for r in rows], [r["mx"] - r["mn"] for r in rows]


def sim_topk_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat SCALAR-QUANTIZED ANN (the FAISS IndexScalarQuantizer
    SQ8 layout) — the third quantization family next to LSH banding
    and IVF-PQ: each dimension is linearly mapped to an 8-bit code
    against trained per-dim min/max, and candidates are scored by
    cosine against the DEQUANTIZED vector, never the raw corpus — a
    4x-compressed full scan (int8 per dim vs float32), the standard
    memory/recall trade below PQ's. Quantize→dequantize runs as ONE
    whole-stage-codegen transform over literal range arrays (no
    explode, no shuffle, no Python); scoring reuses the brute scan's
    broadcast-probe shape and the shared _topk_ranked tail. The
    oracle mirrors the identical affine/floor arithmetic, so the gate
    checks the QUANTIZED scores, not just the ranking.

    The code formula is floor(x*255/span + 0.5) — explicit half-up in
    both engines (the sim_pq_codes rounding discipline)."""
    mn, span = _sq8_ranges(spark, sf_dir)
    mn_arr = F.array(*[F.lit(v) for v in mn])
    span_arr = F.array(*[F.lit(v) for v in span])
    e = _emb(spark, sf_dir).select(
        "vec_id",
        F.transform("embedding", lambda x, i: x.cast("double")).alias("v"),
    )
    recon = F.transform(
        "v",
        lambda x, i: F.when(F.element_at(span_arr, i + 1) == 0.0, F.element_at(mn_arr, i + 1)).otherwise(
            F.element_at(mn_arr, i + 1)
            + F.floor(
                (x - F.element_at(mn_arr, i + 1)) * 255 / F.element_at(span_arr, i + 1)
                + 0.5
            )
            * F.element_at(span_arr, i + 1)
            / 255
        ),
    )
    deq = e.select("vec_id", recon.alias("rv"))
    probes = _probe_emb(spark, sf_dir).select(
        F.col("vec_id").alias("probe_id"),
        F.transform("embedding", lambda x, i: x.cast("double")).alias("pv"),
    )
    scored = deq.join(
        F.broadcast(probes), F.col("vec_id") != F.col("probe_id")
    ).select(
        "probe_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round(cosine(F.col("pv"), F.col("rv")), 6).alias("sq8_sim"),
    )
    return _topk_ranked(scored, "sq8_sim")


def sim_topk_ivf_pq(spark: SparkSession, sf_dir: str, nprobe: int = NPROBE) -> DataFrame:
    """IVF-PQ ANN (Jégou et al. 2011 — the billion-scale serving
    layout): coarse IVF cells bound the search to nprobe cells, and
    candidates inside them are scored by ASYMMETRIC DISTANCE (ADC):
    the probe precomputes an M×K lookup table of exact
    subvector→codeword squared distances, and a candidate's
    approximate distance is the sum of M table lookups on its stored
    PQ codes — the raw corpus vectors are never read after indexing.

    Scale shape: the compressed index is PQ_M narrow int rows per
    vector; probe LUTs are PQ_M·PQ_K rows over the capped probe set —
    a broadcast dim; scoring is one broadcast LUT join plus a groupBy
    that sums exactly PQ_M rows per (probe, candidate). Candidate
    count per probe ≈ NPROBE·N/K regardless of corpus size, and the
    per-candidate cost is M lookups instead of a DIM-length dot
    product. PQ quantizes the vector itself (not the IVF residual) —
    the standard simplification when cells come from the shared
    trained quantizer. Ranks on the 6-dp-rounded distance with
    neighbor_id tie-break so ordering is reproducible cross-engine
    (identical code tuples make exact ADC ties legitimately
    possible)."""
    return _topk_ranked(
        _adc_scored(spark, sf_dir, nprobe), "adc_d2", ascending=True
    )


def _adc_lut_of(dist: DataFrame) -> DataFrame:
    """The ADC lookup table from a probe-subset distance table:
    6-dp-rounded LUT entries — the ADC sum aggregates these in exact
    1e-6 integer units (recon_err discipline); a raw double sum of
    PQ_M terms crossing a shuffle is fold-order dependent and could
    flip the final 6-dp rounding."""
    return dist.select(
        F.col("vec_id").alias("probe_id"),
        "sub",
        "code",
        F.round(F.col("d2"), 6).alias("lut_d2r"),
    )


def _adc_sum_agg(joined: DataFrame) -> DataFrame:
    """The ADC fold itself — exact 1e-6-integer summation of the LUT
    entries per (probe, neighbor) pair. ONE definition shared by every
    scorer join shape (the generic four-frame form below and the fused
    cellcodes form in ann_served_pruned_of), so the arithmetic can
    never drift between serving paths."""
    return joined.groupBy("probe_id", "neighbor_id").agg(
        F.round(
            F.sum((F.col("lut_d2r") * 1000000 + F.lit(0.5)).cast("long"))
            / F.lit(1000000.0),
            6,
        ).alias("adc_d2")
    )


def _adc_score_frames(
    assigned: DataFrame, codes: DataFrame, lut: DataFrame, probe_cells: DataFrame
) -> DataFrame:
    """ADC scoring from its four index frames — ONE arithmetic
    implementation shared by the session-index path (_adc_scored) and
    the on-disk serving path (sim_topk_pq_served), so the two can
    never drift. assigned: (vec_id, cell); codes: (vec_id, sub, code);
    lut: (probe_id, sub, code, lut_d2r); probe_cells: (probe_id, cell)."""
    # one cell per corpus vector × nprobe distinct cells per probe →
    # each (probe, neighbor) pair meets at most once; no distinct needed
    cands = (
        assigned.join(F.broadcast(probe_cells), "cell")
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", F.col("vec_id").alias("neighbor_id"))
    )
    return _adc_sum_agg(
        cands.join(codes, cands.neighbor_id == codes.vec_id)
        .join(F.broadcast(lut), ["probe_id", "sub", "code"])
    )


def _adc_scored(
    spark: SparkSession, sf_dir: str, nprobe: int = NPROBE
) -> DataFrame:
    """The (probe_id, neighbor_id, adc_d2) ADC scoring core of
    sim_topk_ivf_pq, shared with the refine stage."""
    assigned = _ivf_assignment(spark, sf_dir).select("vec_id", "cell")

    # corpus side: the stored M-byte code index, shared with
    # sim_pq_codes via the session materialization — encoded once
    codes = _pq_code_index(spark, sf_dir).select("vec_id", "sub", "code")

    # probe side: the distance table over the probe SUBSET is the ADC
    # lookup table (M·K rows per probe — a broadcast dim). Built from
    # the K_PROBES-row pruned probe scan directly, so the corpus-wide
    # DIM×PQ_K fan-out runs ONCE (for codes), not twice — exchange
    # reuse would not have deduped the two dist references.
    lut = _adc_lut_of(_pq_dist_table(spark, _probe_emb(spark, sf_dir)))
    probe_cells = (
        _probe_ranked_cells(spark, sf_dir)
        .where(F.col("rn") <= nprobe)
        .select(F.col("vec_id").alias("probe_id"), "cell")
    )
    return _adc_score_frames(assigned, codes, lut, probe_cells)


REFINE_R = 32  # ADC shortlist width handed to the exact re-rank


def sim_topk_pq_refined(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ with an exact refine stage — the standard serving recipe
    (FAISS's IndexRefineFlat): the compressed ADC scan produces a
    REFINE_R-deep shortlist per probe, and only those candidates'
    RAW vectors are re-read for exact squared-L2 re-ranking to the
    final top-k. Quantization error then affects recall only through
    shortlist membership, not final ordering.

    Scale shape: the expensive exact math runs on REFINE_R·|probes|
    rows — independent of corpus size; the raw-vector fetch is a
    narrow join against the shortlist (at serving scale, a point-read
    per survivor). Exact d2 is composed from the proven dot-product
    primitive (‖p‖² − 2·p·n + ‖n‖², identical op order both engines)
    and 6-dp-rounded with neighbor_id tie-break."""
    scored = _adc_scored(spark, sf_dir, NPROBE)
    probes = _probe_emb(spark, sf_dir).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    # raw scan, NOT _emb: the refine fetch keeps ~REFINE_R·|probes|
    # rows, and _emb's full-corpus round-robin Exchange (wide float
    # arrays) would be paid just to discard everything but the
    # shortlist (_probe_emb's rationale, same trap)
    neigh = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")
    )
    return _refine_rerank(scored, probes, neigh)


def _refine_rerank(
    scored: DataFrame, probes: DataFrame, neigh: DataFrame
) -> DataFrame:
    """The exact re-rank tail from its three frames — shared by the
    session-index path and the on-disk serving path (no-drift
    discipline). scored: (probe_id, neighbor_id, adc_d2); probes:
    (probe_id, pe); neigh: (neighbor_id, ne)."""
    w = W.partitionBy("probe_id").orderBy("adc_d2", "neighbor_id")
    shortlist = (
        scored.withColumn("rr", F.row_number().over(w))
        .where(F.col("rr") <= REFINE_R)
        .select("probe_id", "neighbor_id")
    )
    pe, ne = F.col("pe"), F.col("ne")
    d2 = F.round(dot(pe, pe) - F.lit(2.0) * dot(pe, ne) + dot(ne, ne), 6)
    refined = (
        shortlist.join(F.broadcast(probes), "probe_id")
        .join(neigh, "neighbor_id")
        .select("probe_id", "neighbor_id", d2.alias("d2"))
    )
    return _topk_ranked(refined, "d2", ascending=True)


# --- ANN index materializer + serving path --------------------------------


def materialize_ann_index(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict:
    """WRITE the IVF-PQ index as parquet artifacts — the serving-tier
    layout (FAISS IndexIVFPQ + IndexRefineFlat, persisted): after this
    runs, queries are answered from the artifacts alone and the source
    embeddings table is never scanned again.

      centroids/  trained coarse quantizer (cell, centroid)   [K rows]
      cells/      the inverted file (vec_id, cell)            [N rows]
      codes/      PQ code index (vec_id, sub, code)           [M·N rows]
      codebook/   PQ codebook (sub, code, d, c)               [M·K·SUBDIM]
      vectors/    flat refine store (vec_id, embedding),
                  sorted by vec_id — the raw-vector point-read
                  side of the refine stage IS part of the index
                  (at cluster scale this store is bucketed by
                  vec_id so shortlist fetches prune to buckets)
      summary.json  row counts per artifact

    The companion of materialize_clean_corpus / the tokenized-dataset
    writer for the similarity tier. Returns the summary dict."""
    import json as _json
    import os as _os

    _ivf_centroids(spark, sf_dir).write.mode("overwrite").parquet(
        _os.path.join(out_dir, "centroids")
    )
    _ivf_assignment(spark, sf_dir).select("vec_id", "cell").write.mode(
        "overwrite"
    ).parquet(_os.path.join(out_dir, "cells"))
    _pq_code_index(spark, sf_dir).select("vec_id", "sub", "code").write.mode(
        "overwrite"
    ).parquet(_os.path.join(out_dir, "codes"))
    _pq_book_df(spark).write.mode("overwrite").parquet(
        _os.path.join(out_dir, "codebook")
    )
    load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).sort("vec_id").write.mode("overwrite").parquet(
        _os.path.join(out_dir, "vectors")
    )
    # summarize the parquet just written (not the logical plans — the
    # materializer-reads-back discipline of the tokenized-dataset writer)
    summary = {
        name: spark.read.parquet(_os.path.join(out_dir, name)).count()
        for name in ("centroids", "cells", "codes", "codebook", "vectors")
    }
    with open(_os.path.join(out_dir, "summary.json"), "w") as f:
        _json.dump(summary, f, indent=2)
    return summary


def update_ann_index(
    spark: SparkSession, index_dir: str, new_vecs: DataFrame
) -> dict:
    """APPEND new vectors to a persisted IVF-PQ index WITHOUT
    retraining — the serving-tier ingestion path (FAISS's add()): route
    each new vector to its nearest EXISTING centroid, PQ-encode it
    against the EXISTING codebook, and append to cells/, codes/ and the
    flat refine store. centroids/ and codebook/ stay frozen — quantizer
    drift is a periodic-rebuild decision, not an ingest-time one — and
    historical artifacts are never rewritten (pure parquet appends, the
    update_dedup_index discipline). ``new_vecs``: (vec_id, embedding).
    Returns the refreshed read-back summary."""
    import json as _json
    import os as _os

    read = lambda name: spark.read.parquet(_os.path.join(index_dir, name))  # noqa: E731
    # one materialization feeds three appends (assign, encode, store)
    vecs = new_vecs.select("vec_id", "embedding").localCheckpoint()
    cells = (
        _assign_cells(vecs, read("centroids"))
        .where(F.col("rn") == 1)
        .select("vec_id", "cell")
    )
    best = _pq_dist_table(spark, vecs, book=read("codebook")).groupBy(
        "vec_id", "sub"
    ).agg(F.min(F.struct(F.round("d2", 6).alias("d2r"), "code")).alias("b"))
    codes = best.select("vec_id", "sub", F.col("b.code").alias("code"))
    cells.write.mode("append").parquet(_os.path.join(index_dir, "cells"))
    codes.write.mode("append").parquet(_os.path.join(index_dir, "codes"))
    vecs.write.mode("append").parquet(_os.path.join(index_dir, "vectors"))
    summary = {
        name: spark.read.parquet(_os.path.join(index_dir, name)).count()
        for name in ("centroids", "cells", "codes", "codebook", "vectors")
    }
    with open(_os.path.join(index_dir, "summary.json"), "w") as f:
        _json.dump(summary, f, indent=2)
    return summary


_ANN_IDX_RAN: dict[tuple[str, str], str] = {}


def _ann_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the on-disk ANN index once per (session, sf_dir)."""
    import tempfile

    from task_hive_spark.streaming.lifecycle import _scratch_root

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ANN_IDX_RAN:
        out = tempfile.mkdtemp(prefix="annidx_", dir=_scratch_root())
        materialize_ann_index(spark, sf_dir, out)
        _ANN_IDX_RAN[key] = out
    return _ANN_IDX_RAN[key]


def sim_topk_pq_served(
    spark: SparkSession, sf_dir: str, index_dir: str | None = None
) -> DataFrame:
    """IVF-PQ + refine answered ENTIRELY from the persisted index
    artifacts (materialize_ann_index): probe vectors come from the flat
    refine store, coarse routing from centroids/, candidates from
    cells/, ADC lookup tables from codebook/, compressed scoring from
    codes/, and the exact re-rank from vectors/ — the embeddings TABLE
    is not in the plan (tests pin inputFiles() to the index dir). Same
    arithmetic kernels as sim_topk_pq_refined (shared _adc_score_frames
    / _refine_rerank), so the answer — and the oracle — are identical.

    Scale shape: identical to the session-index path (broadcast dims,
    sketch-sized LUTs, REFINE_R·|probes| exact math) — the difference
    is operational: build once, serve forever, rebuild only on corpus
    change.

    ``index_dir``: serve from an index the caller already persisted
    with materialize_ann_index (the quickstart's build-once path);
    default (the driver-contract signature) materializes into — and
    reuses — a session-scoped scratch index."""
    import os as _os

    idx = index_dir if index_dir is not None else _ann_index_dir(spark, sf_dir)
    read = lambda name: spark.read.parquet(_os.path.join(idx, name))  # noqa: E731
    vecs = read("vectors")
    cent = read("centroids")
    probe_ids = (
        vecs.where(F.col("vec_id") % PROBE_MOD == 0)
        .select("vec_id")
        .orderBy("vec_id")
        .limit(K_PROBES)
    )
    probes = vecs.join(F.broadcast(probe_ids), "vec_id")
    probe_cells = (
        _assign_cells(probes, cent)
        .where(F.col("rn") <= NPROBE)
        .select(F.col("vec_id").alias("probe_id"), "cell")
    )
    lut = _adc_lut_of(_pq_dist_table(spark, probes, book=read("codebook")))
    scored = _adc_score_frames(
        read("cells"), read("codes"), lut, probe_cells
    )
    return _refine_rerank(
        scored,
        probes.select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")),
        vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")),
    )


# --- clustered serving index: file-pruned probes ---------------------------
# The layout tier applied to the ANN serve path — the TRUE IVF layout:
# in FAISS, PQ codes live INSIDE their cell's inverted list; here that
# is cellcodes/ = (cell, vec_id, sub, code) range-clustered on cell
# (tight disjoint footer ranges, one file per cell at fixture scale).
# A probe intersects its nprobe cells with the footer manifest
# (catalog.prune_files_any) and ADC-scans ONLY those files: the serve
# read is O(nprobe · list size), never O(index) — the property that
# makes a 100 TB vector index answer from a few files.

ANN_CELL_FILES = 16  # ≥ K cells, so range clustering isolates each cell


def materialize_ann_index_clustered(
    spark: SparkSession, sf_dir: str, out_dir: str
) -> dict:
    """materialize_ann_index with the inverted file stored the FAISS
    way: cellcodes/ carries each cell's PQ codes contiguously
    (range-clustered, sorted) so probes prune to their cells' files.
    centroids/codebook/vectors are unchanged (broadcast-sized or
    vec_id-keyed)."""
    import json as _json
    import os as _os

    _ivf_centroids(spark, sf_dir).write.mode("overwrite").parquet(
        _os.path.join(out_dir, "centroids")
    )
    asg = _ivf_assignment(spark, sf_dir).select("vec_id", "cell")
    codes = _pq_code_index(spark, sf_dir).select("vec_id", "sub", "code")
    (
        codes.join(asg, "vec_id")
        .select("cell", "vec_id", "sub", "code")
        .repartitionByRange(ANN_CELL_FILES, "cell")
        .sortWithinPartitions("cell", "vec_id", "sub")
        .write.mode("overwrite")
        .parquet(_os.path.join(out_dir, "cellcodes"))
    )
    _pq_book_df(spark).write.mode("overwrite").parquet(
        _os.path.join(out_dir, "codebook")
    )
    load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).sort("vec_id").write.mode("overwrite").parquet(
        _os.path.join(out_dir, "vectors")
    )
    summary = {
        name: spark.read.parquet(_os.path.join(out_dir, name)).count()
        for name in ("centroids", "cellcodes", "codebook", "vectors")
    }
    with open(_os.path.join(out_dir, "summary.json"), "w") as f:
        _json.dump(summary, f, indent=2)
    return summary


def update_ann_index_clustered(
    spark: SparkSession, index_dir: str, new_vecs: DataFrame
) -> dict:
    """APPEND new vectors to the CLUSTERED IVF-PQ index without
    rewriting a single clustered file — the LSM write path of the
    vector serving tier: route to the FROZEN quantizer, PQ-encode
    against the FROZEN codebook (update_ann_index's add() semantics),
    and land the (cell, vec_id, sub, code) rows as a small UNCLUSTERED
    delta file set inside cellcodes/. The footer manifest keeps delta
    files conservatively, so probes see appended vectors immediately;
    ``ann_index_debt`` + ``recluster_ann_index`` pay the read tax down
    once loose files dominate."""
    import json as _json
    import os as _os

    read = lambda name: spark.read.parquet(_os.path.join(index_dir, name))  # noqa: E731
    vecs = new_vecs.select("vec_id", "embedding").localCheckpoint()
    cells = (
        _assign_cells(vecs, read("centroids"))
        .where(F.col("rn") == 1)
        .select("vec_id", "cell")
    )
    best = _pq_dist_table(spark, vecs, book=read("codebook")).groupBy(
        "vec_id", "sub"
    ).agg(F.min(F.struct(F.round("d2", 6).alias("d2r"), "code")).alias("b"))
    codes = best.select("vec_id", "sub", F.col("b.code").alias("code"))
    # Vectors FIRST, cellcodes second: a crash between the two appends
    # then leaves vectors that no code row routes to (unfindable — safe,
    # no wrong answers). The reverse order would leave code rows whose
    # embeddings are absent, and the refine inner-join would silently
    # drop those candidates from served answers until the skew check
    # below fires on the NEXT update.
    vecs.write.mode("append").parquet(_os.path.join(index_dir, "vectors"))
    (
        codes.join(cells, "vec_id")
        .select("cell", "vec_id", "sub", "code")
        .repartition(2)
        .write.mode("append")
        .parquet(_os.path.join(index_dir, "cellcodes"))
    )
    summary = {
        name: spark.read.parquet(_os.path.join(index_dir, name)).count()
        for name in ("centroids", "cellcodes", "codebook", "vectors")
    }
    if summary["cellcodes"] != PQ_M * summary["vectors"]:
        raise RuntimeError(
            f"clustered ANN index skewed after append: {summary['cellcodes']} "
            f"code rows != {PQ_M} x {summary['vectors']} vectors — a failure "
            f"between the two appends left unroutable vectors; rebuild"
        )
    with open(_os.path.join(index_dir, "summary.json"), "w") as f:
        _json.dump(summary, f, indent=2)
    return summary


ANN_INDEX_DEBT_THRESHOLD = 0.25


def ann_index_debt(stats: list[dict]) -> float:
    """Loose-append share of the cellcodes file set, manifest-only
    (the dedup_index_debt twin over the cell-id domain)."""
    from task_hive_spark.plans.catalog import recluster_debt

    sized = [s for s in stats if s["min"] is not None]
    if not sized:
        return 1.0 if stats else 0.0
    lo = min(s["min"] for s in sized)
    hi = max(s["max"] for s in sized)
    return recluster_debt(stats, lo, hi)


def recluster_ann_index(
    spark: SparkSession, index_dir: str, n_files: int = ANN_CELL_FILES
) -> list[dict]:
    """Rewrite cellcodes/ as one fresh range-clustered level (staged
    rewrite + directory swap — the recluster_dedup_index discipline;
    a crash between the swap renames is self-healed by
    ``recover_staged_swap`` on the next call)."""
    import os as _os
    import shutil as _shutil

    from task_hive_spark.plans.catalog import file_column_stats, recover_staged_swap

    cdir = _os.path.join(index_dir, "cellcodes")
    recover_staged_swap(cdir)
    staged = _os.path.join(index_dir, "cellcodes_reclustering")
    (
        spark.read.parquet(cdir)
        .repartitionByRange(n_files, "cell")
        .sortWithinPartitions("cell", "vec_id", "sub")
        .write.mode("overwrite")
        .parquet(staged)
    )
    old = _os.path.join(index_dir, "cellcodes_retired")
    if _os.path.isdir(old):  # leftover from a crash between the renames
        _shutil.rmtree(old)
    _os.rename(cdir, old)
    _os.rename(staged, cdir)
    _shutil.rmtree(old)
    return file_column_stats(cdir, "cell")


_ANN_CIDX_RAN: dict[tuple[str, str], tuple[str, list[dict]]] = {}
register_aux_cache(_ANN_CIDX_RAN)


def _ann_index_clustered(spark: SparkSession, sf_dir: str) -> tuple[str, list[dict]]:
    import tempfile

    from task_hive_spark.plans.catalog import file_column_stats
    from task_hive_spark.streaming.lifecycle import _scratch_root

    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _ANN_CIDX_RAN:
        import os as _os

        out = tempfile.mkdtemp(prefix="anncidx_", dir=_scratch_root())
        materialize_ann_index_clustered(spark, sf_dir, out)
        stats = file_column_stats(_os.path.join(out, "cellcodes"), "cell")
        _ANN_CIDX_RAN[key] = (out, stats)
    return _ANN_CIDX_RAN[key]


# (session, index_dir) → (centroids, codebook) as localCheckpoint'ed
# single-partition frames: the coarse quantizer and PQ codebook are
# index-BUILD constants a serve tier holds in RAM next to the manifest
# (FAISS keeps both in the index object) — K·DIM + M·K·SUBDIM values,
# never row-scale. Materializing them once per session (guide §4.5's
# heavyweight-init-once, applied to the serve tier) lets every probe's
# routing and LUT subtrees scan JVM-cached blocks instead of re-reading
# and re-joining the index parquet inside each serve call's broadcast
# builds.
_ANN_CONSTS: dict[tuple[str, str], tuple] = {}
register_aux_cache(_ANN_CONSTS)


def _ann_index_constants(spark: SparkSession, index_dir: str) -> tuple:
    """(centroids, codebook) as single-partition localCheckpoint'ed
    frames, once per (session, index_dir). The materialized rows live
    in the JVM block manager, so every serve call's routing and LUT
    subtrees scan cached blocks in one task instead of re-reading and
    re-joining the index parquet (the FAISS in-RAM index posture).

    Measured r13 dead end, kept as a warning: holding collect()ed rows
    and rebuilding them per call with spark.createDataFrame is NOT a
    LocalTableScan in classic PySpark — it parallelizes a Python RDD
    (Scan ExistingRDD, defaultParallelism partitions) whose pickle→JVM
    conversion re-runs as Python worker tasks under EVERY downstream
    subtree; that shape ~doubled the serve wall time at sf0.1."""
    import os as _os

    key = (spark.sparkContext.applicationId, index_dir)
    if key not in _ANN_CONSTS:
        cent = (
            spark.read.parquet(_os.path.join(index_dir, "centroids"))
            .coalesce(1)
            .localCheckpoint()
        )
        book = (
            spark.read.parquet(_os.path.join(index_dir, "codebook"))
            .coalesce(1)
            .localCheckpoint()
        )
        _ANN_CONSTS[key] = (cent, book)
    return _ANN_CONSTS[key]


def ann_served_pruned_of(
    spark: SparkSession,
    index_dir: str,
    stats: list[dict],
    n_probes: int = 1,
) -> tuple[DataFrame, list[str], int]:
    """File-pruned serve core: route the probe(s) through the coarse
    quantizer, intersect the probed cells with the cellcodes manifest,
    ADC-score ONLY the kept files, refine exactly. Returns (result,
    kept, total). The probed-cell collect is ≤ n_probes · NPROBE.

    r13 plan shape (guide §1.2/§2.4 — fewer scheduler rounds, same
    arithmetic): the probe batch is ONE TakeOrdered job materialized to
    a single-partition localCheckpoint (n_probes narrow rows), the
    quantizer/codebook are the session-held checkpointed index
    constants (_ann_index_constants), and routing runs over those
    JVM-cached frames — so the pre-action work is two one-task jobs
    over kilobytes, and the final action's LUT/probe-cell broadcast
    subtrees scan cached blocks instead of re-executing parquet joins.
    Every scoring expression (cosine rank, 6-dp rounds, ADC integer
    fold, exact refine) is unchanged and still evaluates ENGINE-side on
    bit-identical inputs, which the oracle hash gate re-proves per
    scale."""
    import os as _os

    from task_hive_spark.plans.catalog import prune_files_any

    read = lambda name: spark.read.parquet(_os.path.join(index_dir, name))  # noqa: E731
    vecs = read("vectors")
    cent, book = _ann_index_constants(spark, index_dir)
    # job 1: the probe batch — TakeOrdered keeps n_probes rows per scan
    # split, so the materialized frame is request-sized at any corpus
    # size; localCheckpoint (not collect + createDataFrame — see
    # _ann_index_constants) keeps the rows JVM-side for the three
    # consumers (routing, LUT, refine)
    probes = (
        vecs.where(F.col("vec_id") % PROBE_MOD == 0)
        .orderBy("vec_id")
        .limit(n_probes)
        .coalesce(1)
        .localCheckpoint()
    )
    # job 2: coarse routing over the checkpointed frames (n_probes × K
    # rows, one task), collected DIRECTLY — the ≤ n_probes · NPROBE
    # routing rows serve both consumers from one action: the driver's
    # file-pruning list, and the scoring join's probe_cells side as a
    # VALUES literal (all-integer rows — exact; a LocalTableScan whose
    # broadcast build runs driver-side with no extra job). r13's shape
    # checkpointed the routed frame and THEN collected it: one more
    # scheduler round per serve plus a block-manager scan under the
    # broadcast, for rows the driver was about to hold anyway
    # (guide §2.4 — fewer actions; the routing arithmetic is unchanged
    # and still evaluates engine-side on the checkpointed probes).
    routed = (
        _assign_cells(probes, cent)
        .where(F.col("rn") <= NPROBE)
        .select(F.col("vec_id").alias("probe_id"), "cell")
    )
    cell_t = dict(routed.dtypes)["cell"]
    rows = routed.collect()
    probed = sorted({r["cell"] for r in rows})
    if rows:
        vals = ", ".join(
            f"(CAST({r['probe_id']} AS BIGINT), CAST({r['cell']} AS {cell_t}))"
            for r in rows
        )
        probe_cells = spark.sql(
            f"SELECT * FROM (VALUES {vals}) AS t(probe_id, cell)"
        )
    else:  # degenerate empty probe set — keep the join schema
        probe_cells = spark.createDataFrame([], f"probe_id bigint, cell {cell_t}")
    kept, total = prune_files_any(stats, probed)
    if not kept:
        cc = spark.createDataFrame([], "cell long, vec_id long, sub int, code int")
    else:
        cc = spark.read.parquet(*kept)
    lut = _adc_lut_of(_pq_dist_table(spark, probes, book=book))
    # fused candidate+code join (r14, guide §2.4): cellcodes already
    # carries each vector's cell ON its M code rows, so joining cc
    # directly on cell yields exactly the M LUT-addressable rows per
    # (probe, neighbor) pair — the r13 shape re-derived a one-row-per-vec
    # assignment via .distinct() (an exchange over the kept rows) and
    # then joined cc a SECOND time to get the codes back. Same row
    # multiset by construction (cell is functionally dependent on
    # vec_id in this artifact); the fold itself is the shared
    # _adc_sum_agg, so the scoring arithmetic cannot drift.
    scored = _adc_sum_agg(
        cc.join(F.broadcast(probe_cells), "cell")
        .where(F.col("vec_id") != F.col("probe_id"))
        .select("probe_id", F.col("vec_id").alias("neighbor_id"), "sub", "code")
        .join(F.broadcast(lut), ["probe_id", "sub", "code"])
    )
    out = _refine_rerank(
        scored,
        probes.select(F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")),
        vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne")),
    )
    return out, kept, total


def sim_topk_pq_served_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + refine for a SINGLE probe served from the clustered
    index with manifest file pruning — the trickle-serve shape where
    the layout pays: the ADC scan reads only the ≤ NPROBE cell files
    the probe routes to (pinned by test), and the answer is identical
    to the flat serving path for the same probe (the oracle hash is
    the no-false-negative proof).

    Local-bench note: the serve is job-floor-dominated, not data-bound
    — a single-probe call is (1) the coarse-routing collect (the driver
    must know the probed cells to prune files), (2) the ADC LUT
    broadcast build, (3) the pruned ADC + refine action: three
    scheduler rounds over kilobytes of data, ~0.3-0.4 s of fixed stage
    floor each on local[32] at sf0.1 against a DuckDB oracle that
    recomputes the whole chain in-process. At scale the comparison
    inverts: the oracle's recompute grows with the corpus while this
    path's read stays O(nprobe · list) — the property the
    --served-pruned scale probe pins, and the committed sf1 pair now
    records: 0.78x at sf1 (BASELINE_ratio_sf1_r13.json) vs 4.2x at
    sf0.1. The batched form (sim_topk_pq_served_batch) is the benched
    headline serve; this single-probe query stays as the latency
    witness."""
    idx, stats = _ann_index_clustered(spark, sf_dir)
    out, _kept, _total = ann_served_pruned_of(spark, idx, stats, n_probes=1)
    return out


# The production serve shape: requests arrive in batches, and the three
# scheduler rounds a pruned serve cannot avoid (coarse-routing collect →
# LUT broadcast → pruned ADC + refine action) are per-BATCH costs, not
# per-probe — serving BATCH_PROBES probes in one call amortizes the
# fixed floor ~n_probes-fold while the pruned read stays ≤
# n_probes · NPROBE cell files. 16 probes = 80% of the sf0.1 probe
# population (20 ids at PROBE_MOD=100), so the benched number prices a
# realistically loaded serve, not a degenerate all-probes scan.
BATCH_PROBES = 16


def sim_topk_pq_served_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ + refine for a BATCH of probes served from the clustered
    index with manifest file pruning — the headline serve (the
    single-probe ``sim_topk_pq_served_pruned`` stays registered as the
    latency witness). Identical per-probe answers to the flat and
    single-probe paths (the oracle hash is the proof); the ADC scan
    reads only the union of the probes' routed cell files, O(batch),
    never O(index)."""
    idx, stats = _ann_index_clustered(spark, sf_dir)
    out, _kept, _total = ann_served_pruned_of(
        spark, idx, stats, n_probes=BATCH_PROBES
    )
    return out


QUERIES = {
    "sim_topk_brute": sim_topk_brute,
    "sim_topk_lsh": sim_topk_lsh,
    "sim_topk_ivf": sim_topk_ivf,
    "sim_topk_ivf_pq": sim_topk_ivf_pq,
    "sim_topk_pq_refined": sim_topk_pq_refined,
    "sim_topk_pq_served": sim_topk_pq_served,
    "sim_topk_pq_served_pruned": sim_topk_pq_served_pruned,
    "sim_topk_pq_served_batch": sim_topk_pq_served_batch,
    "sim_label_centroids": sim_label_centroids,
    "dd_embedding_cosine_pairs": dd_embedding_cosine_pairs,
    "dd_semdedup": dd_semdedup,
    "sim_prototypes_prune": sim_prototypes_prune,
    "sim_quantize_int8": sim_quantize_int8,
    "sim_kmeans_step": sim_kmeans_step,
    "sim_pq_codes": sim_pq_codes,
}

# --- oracle SQL ----------------------------------------------------------

_DE = "de AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings)"

_COS = (
    "list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def _trained_cent_sql() -> str:
    """CTE chain mirroring _ivf_centroids: label-mean seed (cent0) +
    IVF_TRAIN_ITERS unrolled Lloyd rounds (assign by 6dp-rounded cosine
    with cell tie-break, recompute cell means); the final CTE is named
    ``cent`` so consumers read the trained quantizer. Generated from
    the same IVF_TRAIN_ITERS constant the Spark build loops over, so
    the two sides cannot drift."""
    parts = [
        """comp AS (
          SELECT label, vec_id, de.v[s.pos] AS v, s.pos
          FROM de, LATERAL (SELECT unnest(generate_series(1, len(de.v))) AS pos) s
        ),
        cent0 AS (
          SELECT label AS cell, list(c ORDER BY pos) AS centroid FROM (
            SELECT label, pos, AVG(v) AS c FROM comp GROUP BY label, pos
          ) m GROUP BY label
        )"""
    ]
    prev = "cent0"
    for i in range(1, IVF_TRAIN_ITERS + 1):
        asg = f"asg{i}"
        cent = "cent" if i == IVF_TRAIN_ITERS else f"cent{i}"
        parts.append(
            f""",
        {asg} AS (
          SELECT vec_id, v, cell FROM (
            SELECT d.vec_id, d.v, c.cell,
                   ROW_NUMBER() OVER (PARTITION BY d.vec_id ORDER BY
                     ROUND({_COS.format(a='d.v', b='c.centroid')}, 6) DESC, c.cell) AS rn
            FROM de d CROSS JOIN {prev} c
          ) q WHERE rn = 1
        ),
        {cent} AS (
          SELECT cell, list(c ORDER BY pos) AS centroid FROM (
            SELECT cell, s.pos AS pos, AVG(a.v[s.pos]) AS c
            FROM {asg} a, LATERAL (SELECT unnest(generate_series(1, len(a.v))) AS pos) s
            GROUP BY cell, s.pos
          ) m GROUP BY cell
        )"""
        )
        prev = cent
    return "".join(parts)


_CENT_TRAINED = _trained_cent_sql()


def _plane_sql(plane: list[float]) -> str:
    return "[" + ", ".join(str(x) for x in plane) + "]"


_BITS_SQL = ", ".join(
    f"CASE WHEN list_dot_product(v, {_plane_sql(PLANES[p])}) > 0 THEN '1' ELSE '0' END AS bit{p}"
    for p in range(N_PLANES)
)

_BANDS_SQL = ", ".join(
    "concat({bits}) AS b{b}".format(
        b=b,
        bits=", ".join(f"bit{p}" for p in range(b * BITS_PER_BAND, (b + 1) * BITS_PER_BAND)),
    )
    for b in range(N_BANDS)
)

_STACK_SQL = "\n          UNION ALL ".join(
    f"SELECT vec_id, v, {b} AS band, b{b} AS bucket FROM banded" for b in range(N_BANDS)
)

ORACLES = {
    "sim_topk_brute": f"""
        WITH {_DE},
        probe_ids AS (SELECT vec_id FROM de WHERE vec_id % {PROBE_MOD} = 0
                      ORDER BY vec_id LIMIT {K_PROBES}),
        probes AS (SELECT vec_id AS probe_id, v AS pv FROM de
                   WHERE vec_id IN (SELECT vec_id FROM probe_ids)),
        scored AS (
          SELECT probe_id, d.vec_id AS neighbor_id,
                 ROUND({_COS.format(a='pv', b='d.v')}, 6) AS cos_sim
          FROM probes p JOIN de d ON d.vec_id != p.probe_id
        )
        SELECT probe_id, rank, neighbor_id, cos_sim FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored
        ) r WHERE rank <= {TOP_K} ORDER BY probe_id, rank
        """,
    "sim_topk_lsh": f"""
        WITH {_DE},
        sigs AS (SELECT vec_id, v, {_BITS_SQL} FROM de),
        banded AS (SELECT vec_id, v, {_BANDS_SQL} FROM sigs),
        stacked AS (
          {_STACK_SQL}
        ),
        probe_ids AS (SELECT DISTINCT vec_id FROM stacked WHERE vec_id % {PROBE_MOD} = 0
                      ORDER BY vec_id LIMIT {K_PROBES}),
        probes AS (SELECT vec_id AS probe_id, v AS pv, band, bucket
                   FROM stacked WHERE vec_id IN (SELECT vec_id FROM probe_ids)),
        cands AS (
          SELECT DISTINCT p.probe_id, p.pv, s.vec_id, s.v
          FROM probes p JOIN stacked s USING (band, bucket)
          WHERE s.vec_id != p.probe_id
        ),
        scored AS (
          SELECT probe_id, vec_id AS neighbor_id,
                 ROUND({_COS.format(a='pv', b='v')}, 6) AS cos_sim
          FROM cands
        )
        SELECT probe_id, rank, neighbor_id, cos_sim FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored
        ) r WHERE rank <= {TOP_K} ORDER BY probe_id, rank
        """,
    "dd_embedding_cosine_pairs": f"""
        WITH {_DE},
        sigs AS (SELECT vec_id, v, {_BITS_SQL} FROM de),
        banded AS (SELECT vec_id, v, {_BANDS_SQL} FROM sigs),
        stacked AS (
          {_STACK_SQL}
        ),
        cands AS (
          SELECT DISTINCT a.vec_id, b.vec_id AS dup_id, a.v AS av, b.v AS bv
          FROM stacked a JOIN stacked b USING (band, bucket)
          WHERE a.vec_id < b.vec_id
        )
        SELECT vec_id, dup_id, cos_sim FROM (
          SELECT vec_id, dup_id, ROUND({_COS.format(a='av', b='bv')}, 6) AS cos_sim
          FROM cands
        ) s WHERE cos_sim >= {NEAR_DUP_COS}
        ORDER BY vec_id, dup_id
        """,
    "sim_topk_ivf": f"""
        WITH {_DE},
        {_CENT_TRAINED},
        cellscore AS (
          SELECT d.vec_id, d.v, cent.cell,
                 ROUND({_COS.format(a='d.v', b='cent.centroid')}, 6) AS cos_cell
          FROM de d CROSS JOIN cent
        ),
        ranked_cells AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                    ORDER BY cos_cell DESC, cell) AS rn
          FROM cellscore
        ),
        assigned AS (SELECT vec_id, v, cell FROM ranked_cells WHERE rn = 1),
        probe_ids AS (SELECT vec_id FROM de WHERE vec_id % {PROBE_MOD} = 0
                      ORDER BY vec_id LIMIT {K_PROBES}),
        probe_cells AS (
          SELECT vec_id AS probe_id, v AS pv, cell FROM ranked_cells
          WHERE vec_id IN (SELECT vec_id FROM probe_ids) AND rn <= {NPROBE}
        ),
        scored AS (
          SELECT p.probe_id, a.vec_id AS neighbor_id,
                 ROUND({_COS.format(a='p.pv', b='a.v')}, 6) AS cos_sim
          FROM probe_cells p JOIN assigned a USING (cell)
          WHERE a.vec_id != p.probe_id
        )
        SELECT probe_id, rank, neighbor_id, cos_sim FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rank
          FROM scored
        ) r WHERE rank <= {TOP_K} ORDER BY probe_id, rank
        """,
    "sim_label_centroids": f"""
        WITH {_DE},
        comp AS (
          SELECT label, vec_id, de.v[s.pos] AS v, s.pos
          FROM de, LATERAL (SELECT unnest(generate_series(1, len(de.v))) AS pos) s
        ),
        cent AS (
          SELECT label, list(c ORDER BY pos) AS centroid FROM (
            SELECT label, pos, AVG(v) AS c FROM comp GROUP BY label, pos
          ) m GROUP BY label
        ),
        cohesion AS (
          SELECT d.label, {_COS.format(a='d.v', b='cent.centroid')} AS cos_c
          FROM de d JOIN cent ON d.label = cent.label
        )
        SELECT label, COUNT(*) AS n_vecs,
               ROUND(AVG(cos_c), 6) AS avg_cos_to_centroid,
               ROUND(MIN(cos_c), 6) AS min_cos_to_centroid
        FROM cohesion GROUP BY label ORDER BY label
        """,
    "sim_kmeans_step": f"""
        WITH {_DE},
        comp AS (
          SELECT label, vec_id, de.v[s.pos] AS v, s.pos
          FROM de, LATERAL (SELECT unnest(generate_series(1, len(de.v))) AS pos) s
        ),
        cent AS (
          SELECT label AS cell, list(c ORDER BY pos) AS centroid FROM (
            SELECT label, pos, AVG(v) AS c FROM comp GROUP BY label, pos
          ) m GROUP BY label
        ),
        cellscore AS (
          SELECT d.vec_id, d.v, cent.cell,
                 ROUND({_COS.format(a='d.v', b='cent.centroid')}, 6) AS cos_cell
          FROM de d CROSS JOIN cent
        ),
        assigned AS (
          SELECT vec_id, v, cell FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY cos_cell DESC, cell) AS rn
            FROM cellscore
          ) r WHERE rn = 1
        ),
        acomp AS (
          SELECT cell, a.v[s.pos] AS v, s.pos
          FROM assigned a, LATERAL (SELECT unnest(generate_series(1, len(a.v))) AS pos) s
        ),
        new_cent AS (
          SELECT cell, list(c ORDER BY pos) AS new_centroid FROM (
            SELECT cell, pos, AVG(v) AS c FROM acomp GROUP BY cell, pos
          ) m GROUP BY cell
        ),
        pop AS (SELECT cell, COUNT(*) AS n_assigned FROM assigned GROUP BY cell)
        SELECT pop.cell, pop.n_assigned,
               ROUND(1.0 - ({_COS.format(a='cent.centroid', b='new_cent.new_centroid')}), 6)
                 AS drift
        FROM pop
        JOIN new_cent ON pop.cell = new_cent.cell
        JOIN cent ON pop.cell = cent.cell
        ORDER BY pop.cell
        """,
    "sim_quantize_int8": """
        WITH de AS (
          SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
          FROM embeddings
        ),
        s AS (
          SELECT vec_id, v,
                 list_max(list_transform(v, x -> abs(x))) AS scale
          FROM de
        ),
        q AS (
          SELECT vec_id, scale,
                 list_transform(v, x -> CAST(
                   CASE WHEN scale = 0 THEN 0 ELSE ROUND(x / scale * 127) END
                 AS INT)) AS qv
          FROM s
        )
        SELECT vec_id, ROUND(scale, 6) AS scale,
               CAST(list_sum(qv) AS INT) AS q_sum,
               CAST(list_sum(list_transform(qv, x -> abs(x))) AS INT) AS q_l1,
               CAST(len(list_filter(qv, x -> abs(x) = 127)) AS INT) AS n_saturated
        FROM q ORDER BY vec_id
        """,
}

_PQ_BOOK_VALUES = ",\n          ".join(
    f"({m}, {k}, {d}, {c!r})" for (m, k, d, c) in PQ_BOOK
)

ORACLES["sim_pq_codes"] = f"""
    WITH de AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ),
    x AS (
      SELECT vec_id,
             CAST((i - 1) // {PQ_SUBDIM} AS INT) AS sub,
             CAST((i - 1) % {PQ_SUBDIM} AS INT) AS d,
             v[i] AS x
      FROM de, LATERAL (SELECT unnest(generate_series(1, {DIM})) AS i) s
    ),
    book(sub, code, d, c) AS (VALUES
          {_PQ_BOOK_VALUES}
    ),
    dist AS (
      SELECT vec_id, sub, code, SUM((x - c) * (x - c)) AS d2
      FROM x JOIN book USING (sub, d) GROUP BY 1, 2, 3
    ),
    best AS (
      SELECT vec_id, sub, code, ROUND(d2, 6) AS d2r,
             ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                ORDER BY ROUND(d2, 6), code) AS rn
      FROM dist
    ),
    per AS (SELECT vec_id, sub, code, d2r FROM best WHERE rn = 1)
    SELECT vec_id,
           {', '.join(f'CAST(MAX(CASE WHEN sub = {m} THEN code END) AS INT) AS code_{m}' for m in range(PQ_M))},
           ROUND(SUM(CAST(ROUND(d2r * 1000000) AS BIGINT)) / 1000000.0, 6) AS recon_err
    FROM per GROUP BY vec_id ORDER BY vec_id
    """

# The ADC scoring chain (probe selection → trained cells → PQ encode →
# LUT → scored) as ONE shared CTE body: sim_topk_ivf_pq appends its
# final top-k SELECT, sim_topk_pq_refined appends the shortlist/refine
# CTEs — composition by constant, not string surgery (the HLL-CTE-helper
# discipline; the earlier rindex splice broke on any rewording of the
# parent's final SELECT).
_ADC_CTES = f"""
    WITH {_DE},
    probe_ids AS (SELECT vec_id FROM de WHERE vec_id % {PROBE_MOD} = 0
                  ORDER BY vec_id LIMIT {K_PROBES}),
    {_CENT_TRAINED},
    cellscore AS (
      SELECT d.vec_id, cent.cell,
             ROUND({_COS.format(a='d.v', b='cent.centroid')}, 6) AS cos_cell
      FROM de d CROSS JOIN cent
    ),
    ranked_cells AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY cos_cell DESC, cell) AS rn
      FROM cellscore
    ),
    assigned AS (SELECT vec_id, cell FROM ranked_cells WHERE rn = 1),
    probe_cells AS (
      SELECT vec_id AS probe_id, cell FROM ranked_cells
      WHERE vec_id IN (SELECT vec_id FROM probe_ids) AND rn <= {NPROBE}
    ),
    x AS (
      SELECT vec_id,
             CAST((i - 1) // {PQ_SUBDIM} AS INT) AS sub,
             CAST((i - 1) % {PQ_SUBDIM} AS INT) AS d,
             v[i] AS x
      FROM de, LATERAL (SELECT unnest(generate_series(1, {DIM})) AS i) s
    ),
    book(sub, code, d, c) AS (VALUES
          {_PQ_BOOK_VALUES}
    ),
    dist AS (
      SELECT vec_id, sub, code, SUM((x - c) * (x - c)) AS d2
      FROM x JOIN book USING (sub, d) GROUP BY 1, 2, 3
    ),
    bestrn AS (
      SELECT vec_id, sub, code,
             ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                ORDER BY ROUND(d2, 6), code) AS rn
      FROM dist
    ),
    codes AS (SELECT vec_id, sub, code FROM bestrn WHERE rn = 1),
    lut AS (
      SELECT vec_id AS probe_id, sub, code, ROUND(d2, 6) AS lut_d2r FROM dist
      WHERE vec_id IN (SELECT vec_id FROM probe_ids)
    ),
    cands AS (
      SELECT p.probe_id, a.vec_id AS neighbor_id
      FROM probe_cells p JOIN assigned a USING (cell)
      WHERE a.vec_id != p.probe_id
    ),
    scored AS (
      SELECT c.probe_id, c.neighbor_id,
             ROUND(SUM(CAST(ROUND(l.lut_d2r * 1000000) AS BIGINT)) / 1000000.0, 6)
               AS adc_d2
      FROM cands c
      JOIN codes k ON k.vec_id = c.neighbor_id
      JOIN lut l ON l.probe_id = c.probe_id AND l.sub = k.sub AND l.code = k.code
      -- exact 1e-6 integer-unit sum of 6-dp LUT entries: identical to
      -- the Spark side's fold-order-independent ADC aggregation
      GROUP BY 1, 2
    )"""

ORACLES["sim_topk_ivf_pq"] = f"""
    {_ADC_CTES}
    SELECT probe_id, rank, neighbor_id, adc_d2 FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                ORDER BY adc_d2, neighbor_id) AS rank
      FROM scored
    ) r WHERE rank <= {TOP_K} ORDER BY probe_id, rank
    """

# SemDeDup's oracle leads with WITH RECURSIVE (the component closure
# must be a recursive CTE; DuckDB requires the keyword on the whole
# chain), reusing the trained-quantizer chain verbatim so cells cannot
# drift from the IVF oracles. The recursive member is the transitive
# min-label closure (UNION dedupes, so it terminates) — the same
# fixpoint min_label_components iterates to.
ORACLES["sim_prototypes_prune"] = f"""
    WITH {_DE},
    {_CENT_TRAINED},
    cellscore AS (
      SELECT d.vec_id, d.v, cent.cell,
             ROUND({_COS.format(a='d.v', b='cent.centroid')}, 6) AS cos_cell
      FROM de d CROSS JOIN cent
    ),
    ranked_cells AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY cos_cell DESC, cell) AS rn
      FROM cellscore
    ),
    assigned AS (SELECT vec_id, v, cell FROM ranked_cells WHERE rn = 1),
    scored AS (
      SELECT a.vec_id, a.cell,
             ROUND({_COS.format(a='a.v', b='c.centroid')}, 6) AS cos_proto
      FROM assigned a JOIN cent c USING (cell)
    ),
    r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY cell
                  ORDER BY cos_proto DESC, vec_id) AS proto_rank,
             COUNT(*) OVER (PARTITION BY cell) AS cell_n
      FROM scored
    )
    SELECT vec_id, cell, cos_proto,
           CAST(proto_rank AS INT) AS proto_rank,
           proto_rank > CEIL(cell_n * {PROTO_PRUNE_FRAC}) AS keep
    FROM r ORDER BY vec_id
"""

ORACLES["dd_semdedup"] = f"""
    WITH RECURSIVE {_DE},
    {_CENT_TRAINED},
    cellscore AS (
      SELECT d.vec_id, d.v, cent.cell,
             ROUND({_COS.format(a='d.v', b='cent.centroid')}, 6) AS cos_cell
      FROM de d CROSS JOIN cent
    ),
    ranked_cells AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                ORDER BY cos_cell DESC, cell) AS rn
      FROM cellscore
    ),
    assigned AS (SELECT vec_id, v, cell FROM ranked_cells WHERE rn = 1),
    prs AS (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id
      FROM assigned a JOIN assigned b
        ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE ROUND({_COS.format(a='a.v', b='b.v')}, 6) >= {SEMDEDUP_COS}
    ),
    edges AS (SELECT a_id AS ea, b_id AS eb FROM prs
              UNION ALL SELECT b_id, a_id FROM prs),
    nodes AS (SELECT DISTINCT ea AS vid FROM edges),
    reach AS (
      SELECT vid AS node, vid AS lbl FROM nodes
      UNION
      SELECT e.eb AS node, r.lbl FROM reach r JOIN edges e ON e.ea = r.node
    ),
    cc AS (SELECT node, MIN(lbl) AS rep_id FROM reach GROUP BY node),
    sizes AS (SELECT rep_id, COUNT(*) AS cluster_size FROM cc GROUP BY rep_id)
    SELECT c.rep_id, c.node AS vec_id, a.cell, s.cluster_size,
           (c.node = c.rep_id) AS keep
    FROM cc c JOIN sizes s USING (rep_id)
    JOIN assigned a ON a.vec_id = c.node
    ORDER BY rep_id, vec_id
    """

# refine oracle: the shared ADC CTE chain + shortlist / raw-vector
# re-rank CTEs
ORACLES["sim_topk_pq_refined"] = f"""
{_ADC_CTES},
shortlist AS (
  SELECT probe_id, neighbor_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
              ORDER BY adc_d2, neighbor_id) AS rr
    FROM scored
  ) q WHERE rr <= {REFINE_R}
),
rprobes AS (
  SELECT vec_id AS probe_id, v AS pv FROM de
  WHERE vec_id IN (SELECT vec_id FROM probe_ids)
),
refined AS (
  SELECT s.probe_id, s.neighbor_id,
         ROUND(list_dot_product(p.pv, p.pv)
               - 2.0 * list_dot_product(p.pv, n.v)
               + list_dot_product(n.v, n.v), 6) AS d2
  FROM shortlist s
  JOIN rprobes p ON p.probe_id = s.probe_id
  JOIN de n ON n.vec_id = s.neighbor_id
)
SELECT probe_id, rank, neighbor_id, d2 FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY d2, neighbor_id) AS rank
  FROM refined
) r WHERE rank <= {TOP_K} ORDER BY probe_id, rank
"""

# the served path shares the refine oracle verbatim: same kernels, same
# data — only the storage layer (session indexes vs persisted parquet)
# differs, which SQL cannot observe
ORACLES["sim_topk_pq_served"] = ORACLES["sim_topk_pq_refined"]

# the pruned serve answers the SAME query for the single smallest probe:
# its oracle is the refine oracle with the probe set capped to 1 (the
# only LIMIT {K_PROBES} in the chain is the probe_ids CTE — asserted)
assert ORACLES["sim_topk_pq_refined"].count(f"LIMIT {K_PROBES}") == 1
ORACLES["sim_topk_pq_served_pruned"] = ORACLES["sim_topk_pq_refined"].replace(
    f"LIMIT {K_PROBES}", "LIMIT 1"
)

# the batched serve answers the same query for the BATCH_PROBES smallest
# probes — the same single-substitution oracle derivation
ORACLES["sim_topk_pq_served_batch"] = ORACLES["sim_topk_pq_refined"].replace(
    f"LIMIT {K_PROBES}", f"LIMIT {BATCH_PROBES}"
)


# sim_topk_sq8's oracle — held OUT of ORACLES until its r17 filler
# slot (opened by the r16 consolidation retiring the two quantile
# registrations out of the r17 cohort); the pytest gate runs it
# meanwhile. The affine/floor arithmetic is transcribed identically:
# mn + floor((x - mn) * 255 / span + 0.5) * span / 255.
SIM_SQ8_ORACLE = f"""
        WITH {_DE},
        dims AS (
          SELECT s.pos AS pos, MIN(d.v[s.pos]) AS mn, MAX(d.v[s.pos]) AS mx
          FROM de d,
               LATERAL (SELECT unnest(generate_series(1, {DIM})) AS pos) s
          GROUP BY s.pos
        ),
        ranges AS (
          SELECT list(mn ORDER BY pos) AS mn_arr,
                 list(mx - mn ORDER BY pos) AS span_arr
          FROM dims
        ),
        deq AS (
          SELECT vec_id,
                 list_transform(generate_series(1, {DIM}), i ->
                   CASE WHEN span_arr[i] = 0.0 THEN mn_arr[i]
                        ELSE mn_arr[i]
                             + FLOOR((v[i] - mn_arr[i]) * 255 / span_arr[i]
                                     + 0.5) * span_arr[i] / 255
                   END) AS rv
          FROM de, ranges
        ),
        probe_ids AS (SELECT vec_id FROM de WHERE vec_id % {PROBE_MOD} = 0
                      ORDER BY vec_id LIMIT {K_PROBES}),
        probes AS (SELECT vec_id AS probe_id, v AS pv FROM de
                   WHERE vec_id IN (SELECT vec_id FROM probe_ids)),
        scored AS (
          SELECT probe_id, d.vec_id AS neighbor_id,
                 ROUND({_COS.format(a='pv', b='d.rv')}, 6) AS sq8_sim
          FROM probes p JOIN deq d ON d.vec_id != p.probe_id
        )
        SELECT probe_id, rank, neighbor_id, sq8_sim FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY probe_id
                    ORDER BY sq8_sim DESC, neighbor_id) AS rank
          FROM scored
        ) r WHERE rank <= {TOP_K} ORDER BY probe_id, rank
"""
