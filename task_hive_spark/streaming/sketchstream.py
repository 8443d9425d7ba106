"""Incrementally maintained HyperLogLog cardinalities over the event
stream.

The batch sketch (operators/sketches.sk_hll_distinct) counts a corpus
that already exists; the production companion is the ingest-time form —
every arriving micro-batch folds into per-(group, register) MAX state,
and the live cardinality estimate is readable at any instant without
touching historical data. HLL is the textbook case for this: register
state is a bounded-size commutative-idempotent monoid (max), so
incremental folds in ANY batching converge to exactly the whole-corpus
sketch — which is the oracle used here (the batch query's own SQL, the
st_minhash_incremental discipline).

Mechanics mirror streaming/minhashstream.py: the events table arrives
as mtime-ordered parquet chunks; ``foreachBatch`` computes the batch's
sparse registers with the SHARED derivation (sketches.hll_registers —
one implementation, no drift), MAX-merges them with the latest prior
state, and writes the full merged state to a batch-scoped subdir
(replay after a mid-fold crash rewrites the same subdir —
idempotent). State is m·|groups| rows (~1–2k), so the "read latest,
write merged" loop costs O(sketch), not O(history) — at 100 TB of
events per day the state file never grows.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from task_hive_spark.operators.sketches import (
    ORACLES as _SK_ORACLES,
    hll_estimate,
    hll_registers,
)
from task_hive_spark.sources.fixtures import load_table
from task_hive_spark.streaming.lifecycle import _scratch_root

_EVENT_SCHEMA = "event_id BIGINT, user_id BIGINT, event_type STRING"
N_EVENT_CHUNKS = 4

_RAN: dict[tuple[str, str], str] = {}


def _write_event_chunks(
    spark: SparkSession, sf_dir: str, feed_dir: str, n_chunks: int
) -> None:
    """The events table as n event_id-ranged parquet chunks with
    increasing mtimes (ingestion clock). Convergence is
    batching-invariant (max-monoid), so boundaries only need to be
    deterministic, not balanced."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    probs = [i / n_chunks for i in range(1, n_chunks)]
    bounds = ev.stat.approxQuantile("event_id", probs, 0.0) if probs else []
    chunk = F.lit(1)
    for b in bounds:
        chunk = chunk + (F.col("event_id") > b).cast("int")
    ev = ev.withColumn("chunk", chunk)
    os.makedirs(feed_dir, exist_ok=True)
    base = 1_700_000_000
    for i in range(1, n_chunks + 1):
        tmp = tempfile.mkdtemp(prefix="chunk", dir=feed_dir)
        ev.where(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(feed_dir, f"chunk_{i:03d}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (base + i * 10, base + i * 10))


def run_stream(spark: SparkSession, work: str, feed: str) -> str:
    """Drain the feed through the register fold (checkpointed; a later
    call with more files resumes); returns the state root dir."""
    state_root = os.path.join(work, "hll_state")

    def fold(batch_df: DataFrame, bid: int) -> None:
        batch_regs = hll_registers(batch_df)
        subs = [
            d
            for d in (os.listdir(state_root) if os.path.isdir(state_root) else [])
            if d.startswith("batch=") and int(d.split("=", 1)[1]) < bid
        ]
        if subs:
            latest = max(subs, key=lambda d: int(d.split("=", 1)[1]))
            prior = spark.read.parquet(os.path.join(state_root, latest)).select(
                "event_type", "j", "m"
            )
            merged = (
                prior.unionByName(batch_regs)
                .groupBy("event_type", "j")
                .agg(F.max("m").alias("m"))
            )
        else:
            merged = batch_regs
        # full merged state into this batch's subdir: a checkpoint
        # replay rewrites it from the same prior (< bid) — idempotent
        merged.write.mode("overwrite").parquet(
            os.path.join(state_root, f"batch={bid}")
        )

    q = (
        spark.readStream.schema(_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(feed)
        .writeStream.outputMode("append")
        .foreachBatch(fold)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state_root


def latest_state(spark: SparkSession, state_root: str) -> DataFrame:
    subs = [d for d in os.listdir(state_root) if d.startswith("batch=")]
    latest = max(subs, key=lambda d: int(d.split("=", 1)[1]))
    return spark.read.parquet(os.path.join(state_root, latest)).select(
        "event_type", "j", "m"
    )


def run_once(
    spark: SparkSession, sf_dir: str, work: str, n_chunks: int = N_EVENT_CHUNKS
) -> str:
    feed = os.path.join(work, "feed")
    _write_event_chunks(spark, sf_dir, feed, n_chunks)
    return run_stream(spark, work, feed)


def _ensure_run(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _RAN:
        work = tempfile.mkdtemp(prefix="hllstream_", dir=_scratch_root())
        _RAN[key] = run_once(spark, sf_dir, work)
    return _RAN[key]


def st_hll_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The live cardinality estimates after the whole feed has folded —
    converged, the register state (and therefore every output column)
    equals the batch sk_hll_distinct answer exactly (shared oracle)."""
    state_root = _ensure_run(spark, sf_dir)
    return hll_estimate(spark, latest_state(spark, state_root))


# --- incremental count-min over the document token stream ---------------
# CMS state merges by SUM — additive, NOT idempotent like HLL's max, so
# the replay discipline is load-bearing here: a naively re-applied
# micro-batch would double-count its tokens. The batch-scoped
# "read latest prior (< bid), write full merged state into batch=bid"
# layout makes a checkpoint replay REWRITE the same subdir from the
# same prior instead of adding to it — exactly-once folding on an
# at-least-once trigger. Candidates (the probe vocabulary) ride a
# second state frame merged by distinct-union (idempotent).

_DOC_SCHEMA = "doc_id BIGINT, text STRING"
N_DOC_CHUNKS = 4

_CMS_RAN: dict[tuple[str, str], str] = {}


def _write_doc_chunks(
    spark: SparkSession, sf_dir: str, feed_dir: str, n_chunks: int
) -> None:
    """The raw documents table as doc_id-ranged parquet chunks with
    increasing mtimes (same convergence-invariance contract as the
    event chunks)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    probs = [i / n_chunks for i in range(1, n_chunks)]
    bounds = d.stat.approxQuantile("doc_id", probs, 0.0) if probs else []
    chunk = F.lit(1)
    for b in bounds:
        chunk = chunk + (F.col("doc_id") > b).cast("int")
    d = d.withColumn("chunk", chunk)
    os.makedirs(feed_dir, exist_ok=True)
    base = 1_700_000_000
    for i in range(1, n_chunks + 1):
        tmp = tempfile.mkdtemp(prefix="chunk", dir=feed_dir)
        d.where(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(feed_dir, f"chunk_{i:03d}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (base + i * 10, base + i * 10))


def _latest_batch_dir(root: str, below: int | None = None) -> str | None:
    subs = [
        d
        for d in (os.listdir(root) if os.path.isdir(root) else [])
        if d.startswith("batch=")
        and (below is None or int(d.split("=", 1)[1]) < below)
    ]
    if not subs:
        return None
    return os.path.join(root, max(subs, key=lambda d: int(d.split("=", 1)[1])))


def run_cms_stream(spark: SparkSession, work: str, feed: str) -> tuple[str, str]:
    """Drain the document feed through the CMS + vocab folds
    (checkpointed); returns (cms_state_root, vocab_state_root)."""
    from task_hive_spark.functions.text import ws_tokens
    from task_hive_spark.operators.sketches import cms_grid

    cms_root = os.path.join(work, "cms_state")
    vocab_root = os.path.join(work, "vocab_state")

    def fold(batch_df: DataFrame, bid: int) -> None:
        # tokenization pinned to token_index's derivation (lowered
        # whitespace tokens over non-empty docs)
        occ = (
            batch_df.where(F.length(F.trim("text")) > 0)
            .select(F.explode(ws_tokens(F.lower("text"))).alias("tok"))
        )
        grid = cms_grid(occ)
        vocab = occ.distinct()
        prior_cms = _latest_batch_dir(cms_root, below=bid)
        if prior_cms is not None:
            prior = spark.read.parquet(prior_cms).select("d", "col", "c")
            grid = (
                prior.unionByName(grid)
                .groupBy("d", "col")
                .agg(F.sum("c").alias("c"))
            )
        prior_vocab = _latest_batch_dir(vocab_root, below=bid)
        if prior_vocab is not None:
            vocab = (
                spark.read.parquet(prior_vocab)
                .select("tok")
                .unionByName(vocab)
                .distinct()
            )
        grid.write.mode("overwrite").parquet(os.path.join(cms_root, f"batch={bid}"))
        vocab.write.mode("overwrite").parquet(
            os.path.join(vocab_root, f"batch={bid}")
        )

    q = (
        spark.readStream.schema(_DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(feed)
        .writeStream.outputMode("append")
        .foreachBatch(fold)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return cms_root, vocab_root


def run_cms_once(
    spark: SparkSession, sf_dir: str, work: str, n_chunks: int = N_DOC_CHUNKS
) -> tuple[str, str]:
    feed = os.path.join(work, "feed")
    _write_doc_chunks(spark, sf_dir, feed, n_chunks)
    return run_cms_stream(spark, work, feed)


def _ensure_cms_run(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CMS_RAN:
        work = tempfile.mkdtemp(prefix="cmsstream_", dir=_scratch_root())
        _CMS_RAN[key] = run_cms_once(spark, sf_dir, work)[0].rsplit("/", 1)[0]
    return _CMS_RAN[key]


def st_cms_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Live heavy-hitter report after the whole document feed has
    folded — the converged additive state equals the whole-corpus CMS
    grid, so the output (and its oracle) is exactly the batch
    sk_cms_heavy_hitters answer."""
    from task_hive_spark.operators.sketches import cms_heavy_hitters_from

    work = _ensure_cms_run(spark, sf_dir)
    sketch = spark.read.parquet(
        _latest_batch_dir(os.path.join(work, "cms_state"))
    ).select("d", "col", "c")
    vocab = spark.read.parquet(
        _latest_batch_dir(os.path.join(work, "vocab_state"))
    ).select("tok")
    return cms_heavy_hitters_from(sketch, vocab)


QUERIES = {
    "st_hll_incremental": st_hll_incremental,
    "st_cms_incremental": st_cms_incremental,
}

# converged state == the whole-corpus sketch: the batch queries' own
# SQL are the oracles
ORACLES = {
    "st_hll_incremental": _SK_ORACLES["sk_hll_distinct"],
    "st_cms_incremental": _SK_ORACLES["sk_cms_heavy_hitters"],
}
