"""Ad-hoc perf probe for the round-3 optimization targets.

Times staged sub-plans of dd_simhash / sim_topk_lsh at sf0.1 so the
optimization effort lands where the seconds actually are.

    python scripts/perf_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from task_hive_spark.session import get_spark


def timed(label, fn, n=2):
    best = None
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        dt = time.monotonic() - t0
        best = dt if best is None else min(best, dt)
    print(f"{label:45s} {best:7.2f} s")
    return best


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("perf_probe")

    from task_hive_spark.operators import dedup, similarity
    from task_hive_spark.functions.text import portable_hash64

    # --- dd_simhash decomposition ---
    timed("corpus_df count", lambda: dedup.corpus_df(spark, sf_dir).count())
    grams = lambda: dedup._doc_shingles(spark, sf_dir)
    timed("shingles explode count", lambda: grams().count())
    hashed = lambda: grams().withColumn("h", portable_hash64(F.col("gram"), seed="sh-"))
    timed(
        "shingles+md5 hash agg",
        lambda: hashed().agg(F.sum(F.col("h") % 1000000)).collect(),
    )
    timed("dd_simhash full", lambda: dedup.dd_simhash(spark, sf_dir).count())

    # bit-count variant: SUM((h>>b)&1) + count
    def simhash_cnt():
        g = hashed()
        bs = g.groupBy("doc_id").agg(
            F.count("*").alias("n"),
            *[
                F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1))).alias(f"c{b}")
                for b in range(dedup.SIMHASH_BITS)
            ],
        )
        sim = sum(
            F.when(2 * F.col(f"c{b}") > F.col("n"), F.lit(2**b).cast("bigint")).otherwise(
                F.lit(0).cast("bigint")
            )
            for b in range(dedup.SIMHASH_BITS)
        )
        return bs.select("doc_id", sim.alias("simhash"))

    timed("simhash cnt-form", lambda: simhash_cnt().count())

    # packed accumulators: 8 longs, 4 x 16-bit counters each
    def simhash_packed():
        g = hashed()
        accs = []
        for j in range(8):
            expr = None
            for k in range(4):
                bit = 8 * k + j
                term = F.shiftleft(
                    F.shiftright(F.col("h"), bit).bitwiseAND(F.lit(1)), 16 * k
                )
                expr = term if expr is None else expr + term
            accs.append(F.sum(expr).alias(f"a{j}"))
        bs = g.groupBy("doc_id").agg(F.count("*").alias("n"), *accs)
        mask = (1 << 16) - 1
        sim = None
        for j in range(8):
            for k in range(4):
                bit = 8 * k + j
                cnt = F.shiftright(F.col(f"a{j}"), 16 * k).bitwiseAND(F.lit(mask))
                term = F.when(2 * cnt > F.col("n"), F.lit(2**bit).cast("bigint")).otherwise(
                    F.lit(0).cast("bigint")
                )
                sim = term if sim is None else sim + term
        return bs.select("doc_id", sim.alias("simhash"))

    timed("simhash packed-form", lambda: simhash_packed().count())

    # --- sim_topk_lsh decomposition ---
    e = lambda: similarity._emb(spark, sf_dir)
    timed("embeddings count", lambda: e().count())
    timed(
        "corpus banding",
        lambda: similarity._band_buckets(
            e().select("vec_id", "embedding"), "embedding"
        ).count(),
    )
    timed("sim_topk_lsh full", lambda: similarity.sim_topk_lsh(spark, sf_dir).count())
    timed(
        "dd_embedding_cosine_pairs full",
        lambda: similarity.dd_embedding_cosine_pairs(spark, sf_dir).count(),
    )


if __name__ == "__main__":
    main()
