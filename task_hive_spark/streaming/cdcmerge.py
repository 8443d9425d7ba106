"""Streaming incremental CDC merge: the change batch applied as a
chunked change FEED through ``foreachBatch``, converging to the exact
table the one-shot batch MERGE produces.

This is the Spark-native shape of a continuously-maintained snapshot
(what a Delta/Hudi "streaming upsert" sink does): a file-source stream
delivers change chunks in micro-batches; each trigger MERGEs its chunk
into the persisted snapshot with copy-on-write: the merged table lands
in a fresh ``state_v{n+1}`` directory and the version number IS the
commit pointer (highest _SUCCESS-complete version wins; older versions
are GC'd after the new one lands) — the same read-merge-write cycle a
lakehouse table format runs per commit, minus the manifest layer. A
crash at any point leaves at least one complete snapshot on disk: a
partial v{n+1} has no _SUCCESS marker and recovery reads v{n}; once
_SUCCESS lands the batch is durable even if the GC of v{n} is cut
short. (The earlier rmtree-then-rename swap had a window where NO
snapshot existed while the checkpoint recorded the chunk as applied.)

Why it converges to the batch answer (and is replay-safe): every change
id occurs ONCE across the whole batch and carries ABSOLUTE values, so
chunked application associates, chunk order is irrelevant, and
re-applying a chunk is idempotent (an upsert re-sets the same values; a
re-delete of a missing id is a no-op). The feed deliberately RE-DELIVERS
a deterministic subset of every chunk in a later chunk — the
at-least-once wire — and the converged profile must still hash-match
the one-shot oracle, which proves the merge's idempotence contract the
way dedupstream proves dropDuplicates'.

Scale: each micro-batch pays the same one-full-outer-join cost as the
batch merge, on |snapshot| + |chunk| rows; state lives in parquet (the
table itself), not the state store, so stream state is O(1).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from task_hive_spark.operators.queries import (
    CHANGES_SQL,
    ORACLES as _Q_ORACLES,
    apply_merge,
    merge_profile,
)
from task_hive_spark.operators.taskmodel import tasks_df
from task_hive_spark.streaming.lifecycle import _scratch_root

_CHANGE_SCHEMA = (
    "id STRING, op STRING, new_status STRING, new_priority INT, new_worker_id STRING"
)
N_CHANGE_CHUNKS = 4
REPLAY_MOD = 3  # a deterministic ~third of change rows is delivered twice

_RAN: dict[tuple[str, str], str] = {}


def _write_change_chunks(
    spark: SparkSession, sf_dir: str, feed_dir: str, n_chunks: int
) -> None:
    """Chunk the change batch by id hash (ids are unique and unordered —
    CDC chunking needs determinism, not time order) and re-deliver every
    REPLAY_MOD-th row in the following chunk (wrapping), with strictly
    increasing mtimes so the file source replays delivery order."""
    tasks_df(spark, sf_dir)  # registers the fixture views CHANGES_SQL reads
    c = spark.sql(CHANGES_SQL)
    # pmod, not abs-then-%: abs(Long.MIN_VALUE) is still negative
    # (two's complement), and a negative chunk would match no chunk
    # filter below — the row would silently vanish from the feed.
    # Chunk and replay draws use independently-salted hashes so the
    # replay subset is uniform across chunks for ANY n_chunks.
    chunk = F.pmod(F.xxhash64("id"), F.lit(n_chunks))
    replay = F.pmod(F.xxhash64(F.lit("replay"), F.col("id")), F.lit(REPLAY_MOD)) == 0
    ranked = c.withColumn("chunk", chunk.cast("int"))
    replays = ranked.where(replay).withColumn(
        "chunk", ((F.col("chunk") + 1) % n_chunks).cast("int")
    )
    delivered = ranked.union(replays).cache()
    os.makedirs(feed_dir, exist_ok=True)
    base = 1_700_000_000
    for i in range(n_chunks):
        # flat part-file per chunk (the lifecycle._write_chunks
        # discipline — the file source does not recurse into nested
        # directory-per-chunk layouts)
        tmp = tempfile.mkdtemp(prefix="chunk", dir=feed_dir)
        delivered.where(F.col("chunk") == i).drop("chunk").coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(feed_dir, f"chunk_{i:03d}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (base + i * 10, base + i * 10))
    delivered.unpersist()


def _state_path(work: str, version: int) -> str:
    return os.path.join(work, f"state_v{version}")


def _current_version(work: str) -> int | None:
    """Highest COMPLETE snapshot version (dir carries the _SUCCESS
    marker the parquet committer writes last) — the commit pointer.
    Incomplete leftovers from a crashed write are simply not candidates."""
    versions = []
    for d in os.listdir(work) if os.path.isdir(work) else []:
        if d.startswith("state_v") and d.rsplit("_v", 1)[1].isdigit():
            if os.path.exists(os.path.join(work, d, "_SUCCESS")):
                versions.append(int(d.rsplit("_v", 1)[1]))
    return max(versions) if versions else None


def run_stream(spark: SparkSession, work: str, feed: str) -> str:
    """Drain whatever the feed currently holds through the copy-on-write
    MERGE (checkpointed — a second call with more files resumes exactly
    where the first stopped); returns the current snapshot dir. The
    snapshot must already be seeded (run_once does; a restarted process
    adopts the highest complete version)."""

    def merge_batch(batch_df: DataFrame, _bid: int) -> None:
        v = _current_version(work)
        cur = spark.read.parquet(_state_path(work, v))
        merged = apply_merge(cur, batch_df)
        # materialize v+1 fully (its _SUCCESS is the commit point), THEN
        # drop older versions — at every instant a complete snapshot
        # exists, so a crash + checkpoint replay re-reads a valid table
        # (re-applying the chunk is idempotent by the merge contract)
        merged.write.mode("overwrite").parquet(_state_path(work, v + 1))
        for d in os.listdir(work):
            if d.startswith("state_v") and d != f"state_v{v + 1}":
                shutil.rmtree(os.path.join(work, d), ignore_errors=True)

    src = (
        spark.readStream.schema(_CHANGE_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(feed)
    )
    q = (
        src.writeStream.outputMode("append")
        .foreachBatch(merge_batch)
        .option("checkpointLocation", os.path.join(work, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return _state_path(work, _current_version(work))


def seed_state(spark: SparkSession, sf_dir: str, work: str) -> None:
    """Write the v0 snapshot unless a complete version already exists
    (a crashed run resumes from its highest committed snapshot)."""
    if _current_version(work) is None:
        tasks_df(spark, sf_dir).select(
            "id", "status", "priority", "worker_id"
        ).write.mode("overwrite").parquet(_state_path(work, 0))


def run_once(
    spark: SparkSession, sf_dir: str, work: str, n_chunks: int = N_CHANGE_CHUNKS
) -> str:
    """Seed the snapshot, stream the change chunks through a
    foreachBatch copy-on-write MERGE, return the converged table dir."""
    feed = os.path.join(work, "feed")
    _write_change_chunks(spark, sf_dir, feed, n_chunks)
    seed_state(spark, sf_dir, work)
    return run_stream(spark, work, feed)


def _ensure_run(spark: SparkSession, sf_dir: str) -> str:
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _RAN:
        work = tempfile.mkdtemp(prefix="cdcmerge_", dir=_scratch_root())
        _RAN[key] = run_once(spark, sf_dir, work)
    return _RAN[key]


def st_snapshot_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Converged profile of the incrementally-merged snapshot — same
    oracle as the one-shot batch MERGE (th_snapshot_merge): streaming
    and batch forms must agree bit-for-bit despite chunking AND
    re-delivery."""
    state = _ensure_run(spark, sf_dir)
    return merge_profile(spark.read.parquet(state))


QUERIES = {
    "st_snapshot_merge": st_snapshot_merge,
}

# the converged incremental table IS the one-shot merge, so the oracle
# is literally the batch query's
ORACLES = {
    "st_snapshot_merge": _Q_ORACLES["th_snapshot_merge"],
}
