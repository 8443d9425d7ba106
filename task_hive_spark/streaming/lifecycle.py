"""Task-lifecycle state machine as one Structured Streaming job
(SURVEY §2.9: T1-T12 + S6).

The scripted change-feed (events.py) is written as time-ordered parquet
chunks and consumed with ``readStream`` + ``maxFilesPerTrigger=1`` — a
file change-feed standing in for the etcd watch (S6,
dispatcher.go:305-309). Each micro-batch folds its events into two
state tables via MERGE-style DataFrame joins (``foreachBatch``):

- T1  pending-dispatch stream: every submit is bound to a worker by the
  seeded-hash strategy inside the batch (dispatcher.go:312-328; the
  hash form of J1 keeps the decision independent of batch boundaries).
- T2  delayed-task timer: a failed task carries ``ready_s = fail_s +
  2·2^(rc−1)`` (backoff F7, worker.go:73-79); any batch whose clock
  passes ready_s re-emits it as pending (dispatcher.go:330-385) — the
  engine computes re-entry, the log does NOT contain fire events.
- T4  anti-entropy: the micro-batch trigger IS the periodic sweep
  (dispatcher.go:430-443) — each batch re-evaluates all armed timers.
- T5  worker-failure re-queue: a worker_dead event re-pends that
  worker's in-flight tasks (dispatcher.go:657-708).
- T6  registration + heartbeat upkeep of the workers table
  (dispatcher.go:28-172).
- T7/T9  per-worker execution outcomes (complete/fail) commit terminal
  state + counter decrements (worker.go:136-160).
- T8  retry state machine: retry_count caps at MaxRetries=3
  (constants.go:20); the 4th failure is terminal (worker.go:63-135).
- T10 exactly-once: versioned state dirs make each batch's fold an
  atomic, all-or-nothing transition WITHIN a run, and the recovery unit
  is the whole run (the checkpoint is cleared with the state, so a
  restart redoes the deterministic feed rather than resuming a fold the
  counters can't replay idempotently). Checkpoint RESUME semantics are
  exercised where they are sound: the stream-dedup contract
  (dedupstream.py) and the CDC merge's absolute-value upserts
  (cdcmerge.py, restart test in tests/test_cdcmerge.py).
- T11 graceful drain: Trigger.AvailableNow processes the full feed then
  stops (taskhive.go:214-245).
- T12 startup gate: worker registrations are the first events in the
  log, so dispatch never precedes registry presence
  (dispatcher.go:482-512).
- A5  running per-worker counter: task_count folds ±1 per
  assign/complete/fail (worker.go:168-226).

State is persisted as versioned parquet snapshots per batch (tiny state,
lineage truncated every batch). On a production cluster the same
foreachBatch body targets a Delta/Iceberg table MERGE — the state-fold
logic is identical; only the sink swaps.

Determinism: all within-batch folds use (event_s-ordered) aggregation,
re-entry times are arithmetic (never wall clock), and the converged
state is invariant to how the feed is chunked into batches — asserted
by tests/test_lifecycle.py which re-runs the pipeline with 1, 3 and 5
chunks.
"""

from __future__ import annotations

import os
import shutil
import tempfile
import time

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from task_hive_spark.functions.prefix import bucketed_prefix
from task_hive_spark.streaming.events import events_df, oracle_events_cte

MAX_RETRIES = 3  # common/constants.go:20
BACKOFF_BASE_S = 2  # worker.go:73-79: 2s * 2^(rc-1)
WORKER_CAPACITY = 10  # taskhive.go:53
N_CHUNKS = 5

_TASK_STATE_COLS = [
    "task_id",
    "priority",
    "status",
    "retry_count",
    "retry_delay_ns",
    "worker_id",
    "ready_s",
    "create_s",
    "update_s",
    "result",
    "error",
]


def _as_task_state(df: DataFrame) -> DataFrame:
    """Plan-time guard wiring _TASK_STATE_COLS to every site that
    hand-writes the state projection: a column added to the schema but
    missed in one of the per-column WHEN transforms fails loudly here
    instead of silently dropping from state after the first affected
    batch."""
    assert df.columns == _TASK_STATE_COLS, (
        f"task-state projection drifted: {df.columns} != {_TASK_STATE_COLS}"
    )
    return df


def _empty_task_state(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [],
        "task_id STRING, priority INT, status STRING, retry_count INT,"
        " retry_delay_ns BIGINT, worker_id STRING, ready_s BIGINT,"
        " create_s BIGINT, update_s BIGINT, result STRING, error STRING",
    )


def _empty_worker_state(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [], "worker_id STRING, task_count INT, last_heartbeat_s BIGINT, capacity INT"
    )


def _apply_task_events(state: DataFrame, ev: DataFrame) -> DataFrame:
    """Fold one batch of task events into task state (MERGE semantics).

    Within a batch, per task: the latest event decides status/binding
    (event_s is unique per task), fail events increment retry_count up
    to the cap, the 4th failure is terminal. All joins are on task_id;
    the batch side is aggregated first so the merge is 1:1.
    """
    tev = ev.where(F.col("task_id").isNotNull())
    agg = tev.groupBy("task_id").agg(
        F.max(F.struct("event_s", "op", "worker_id")).alias("last"),
        F.sum(F.when(F.col("op") == "fail", 1).otherwise(0)).cast("int").alias("nf"),
        F.max(F.when(F.col("op") == "submit", F.col("event_s"))).alias("submit_s"),
        F.max(F.when(F.col("op") == "submit", F.col("task_json"))).alias("submit_json"),
    )
    j = state.alias("s").join(agg.alias("b"), "task_id", "full_outer")

    parsed = F.from_json(F.col("b.submit_json"), "priority INT, type STRING")
    rc_old = F.coalesce(F.col("s.retry_count"), F.lit(0))
    nf = F.coalesce(F.col("b.nf"), F.lit(0))
    rc_new = F.least(rc_old + nf, F.lit(MAX_RETRIES))
    last_op = F.col("b.last.op")

    status = (
        F.when(last_op.isNull(), F.col("s.status"))
        .when(last_op == "submit", F.lit("pending"))
        .when(last_op == "assign", F.lit("processing"))
        .when(last_op == "complete", F.lit("completed"))
        .when(
            last_op == "fail",
            F.when(rc_old + nf <= MAX_RETRIES, F.lit("delayed")).otherwise(F.lit("failed")),
        )
    )
    worker = (
        F.when(last_op.isNull(), F.col("s.worker_id"))
        .when(last_op == "assign", F.col("b.last.worker_id"))
        .otherwise(F.lit(None).cast("string"))
    )
    delay_ns = F.when(rc_new == 0, F.lit(0).cast("long")).otherwise(
        (F.lit(BACKOFF_BASE_S * 1_000_000_000) * F.pow(F.lit(2.0), rc_new - 1)).cast("long")
    )
    # timer armed only while delayed: ready = fail time + backoff
    # seconds. A carried task (no events this batch) KEEPS its armed
    # timer — recomputing from b.last here would null it out after one
    # batch and the timer could never fire in a later micro-batch
    # (status can only be 'delayed' via a fail event or a carry, so the
    # two arms below are exhaustive).
    ready = F.when(
        status == "delayed",
        F.when(last_op.isNull(), F.col("s.ready_s")).otherwise(
            F.col("b.last.event_s")
            + (F.lit(BACKOFF_BASE_S) * F.pow(F.lit(2.0), rc_new - 1)).cast("long")
        ),
    ).otherwise(F.lit(None).cast("long"))

    return j.select(
        "task_id",
        F.coalesce(F.col("s.priority"), parsed["priority"]).alias("priority"),
        status.alias("status"),
        rc_new.alias("retry_count"),
        delay_ns.alias("retry_delay_ns"),
        worker.alias("worker_id"),
        ready.alias("ready_s"),
        F.coalesce(F.col("b.submit_s"), F.col("s.create_s")).alias("create_s"),
        # last.event_s IS max(event_s): the struct max orders on the
        # unique-per-task event_s first, so no separate aggregate
        F.greatest(
            F.coalesce(F.col("b.last.event_s"), F.lit(0)),
            F.coalesce(F.col("s.update_s"), F.lit(0)),
        ).alias("update_s"),
        F.when(
            status == "completed",
            F.concat(F.lit("任务 "), F.col("task_id"), F.lit(" 执行结果: ok")),
        )
        .otherwise(F.lit(None).cast("string"))
        .alias("result"),
        F.when(status.isin("delayed", "failed"), F.lit("simulated failure"))
        .otherwise(F.lit(None).cast("string"))
        .alias("error"),
    )


def _apply_worker_events(state: DataFrame, ev: DataFrame) -> DataFrame:
    """Fold worker registrations, heartbeats, counter deltas and deaths."""
    wev = ev.where(F.col("worker_id").isNotNull())
    agg = wev.groupBy("worker_id").agg(
        F.sum(
            F.when(F.col("op") == "assign", 1)
            .when(F.col("op").isin("complete", "fail"), -1)
            .otherwise(0)
        )
        .cast("int")
        .alias("delta"),
        F.max(
            F.when(F.col("op").isin("worker_register", "heartbeat"), F.col("event_s"))
        ).alias("hb_s"),
        F.max(F.when(F.col("op") == "worker_dead", 1).otherwise(0)).alias("died"),
    )
    j = state.alias("s").join(agg.alias("b"), "worker_id", "full_outer")
    merged = j.select(
        "worker_id",
        (
            F.coalesce(F.col("s.task_count"), F.lit(0)) + F.coalesce(F.col("b.delta"), F.lit(0))
        ).alias("task_count"),
        F.greatest(
            F.coalesce(F.col("b.hb_s"), F.lit(0)),
            F.coalesce(F.col("s.last_heartbeat_s"), F.lit(0)),
        ).alias("last_heartbeat_s"),
        F.lit(WORKER_CAPACITY).alias("capacity"),
        F.coalesce(F.col("b.died"), F.lit(0)).alias("died"),
    )
    # lease expiry: the dead worker leaves the registry (dispatcher.go:673)
    return merged.where(F.col("died") == 0).drop("died")


def _requeue_dead(tasks: DataFrame, ev: DataFrame) -> DataFrame:
    """T5: re-pend in-flight tasks of workers that died this batch
    (dispatcher.go:696-700). The death set is tiny → broadcast."""
    # ONE row per dead worker: a batch carrying duplicate worker_dead
    # events for the same worker (replayed feed, re-registered worker
    # dying twice) would otherwise fan every in-flight task row out per
    # death through the left join — duplicated task_ids in state
    dead = (
        ev.where(F.col("op") == "worker_dead")
        .groupBy(F.col("worker_id").alias("dead_worker"))
        .agg(F.max("event_s").alias("death_s"))
    )
    j = tasks.join(
        F.broadcast(dead), tasks["worker_id"] == dead["dead_worker"], "left"
    )
    hit = F.col("dead_worker").isNotNull() & (F.col("status") == "processing")
    return _as_task_state(j.select(
        "task_id",
        "priority",
        F.when(hit, F.lit("pending")).otherwise(F.col("status")).alias("status"),
        "retry_count",
        "retry_delay_ns",
        F.when(hit, F.lit(None).cast("string")).otherwise(F.col("worker_id")).alias("worker_id"),
        "ready_s",
        "create_s",
        F.when(hit, F.greatest("update_s", "death_s")).otherwise(F.col("update_s")).alias(
            "update_s"
        ),
        "result",
        "error",
    ))


def _fire_timers(tasks: DataFrame, clock_s: int) -> DataFrame:
    """T2: delayed tasks whose ready time the batch clock has passed
    re-enter pending (the TTL-lease expiry, dispatcher.go:330-385)."""
    fire = (F.col("status") == "delayed") & (F.col("ready_s") <= F.lit(clock_s))
    return _as_task_state(tasks.select(
        "task_id",
        "priority",
        F.when(fire, F.lit("pending")).otherwise(F.col("status")).alias("status"),
        "retry_count",
        "retry_delay_ns",
        "worker_id",
        F.when(fire, F.lit(None).cast("long")).otherwise(F.col("ready_s")).alias("ready_s"),
        "create_s",
        F.when(fire, F.greatest("update_s", "ready_s")).otherwise(F.col("update_s")).alias(
            "update_s"
        ),
        "result",
        F.when(fire, F.lit(None).cast("string")).otherwise(F.col("error")).alias("error"),
    ))


def _dispatch_assignments(ev: DataFrame) -> DataFrame:
    """T1: the streaming dispatcher binds each submitted task to a
    worker inside the batch that saw the submit. The seeded-hash
    strategy (the J1 'random' form, dispatcher.go:566) makes the
    decision a pure function of task_id — invariant to batching."""
    slot = F.conv(F.substring(F.md5(F.col("task_id")), 1, 2), 16, 10).cast("int") % 4
    return ev.where(F.col("op") == "submit").select(
        "task_id", F.concat(F.lit("lw"), slot.cast("string")).alias("assigned_worker")
    )


# --- runner ---------------------------------------------------------------

_CONVERGED: dict[tuple[str, str], dict[str, str]] = {}
_FEEDS: dict[tuple[str, str, int], str] = {}


def shared_feed(spark: SparkSession, sf_dir: str, n_chunks: int = N_CHUNKS) -> str:
    """One chunked feed per (session, sf_dir, n_chunks) — the feed is a
    read-only input, so every streaming consumer (lifecycle, stateful)
    can share it instead of re-materializing the event log."""
    key = (spark.sparkContext.applicationId, sf_dir, n_chunks)
    if key not in _FEEDS:
        feed = os.path.join(tempfile.mkdtemp(prefix="feed_", dir=_scratch_root()), "feed")
        _write_chunks(spark, sf_dir, feed, n_chunks)
        _FEEDS[key] = feed
    return _FEEDS[key]


def with_chunk(df: DataFrame, n_chunks: int) -> DataFrame:
    """Assign each event a chunk in 1..n_chunks respecting the total
    order (event_s, op, task_id, worker_id), WITHOUT a global
    single-partition window (the ntile-over-unpartitioned-order form
    this replaces funneled the whole feed through one task and spammed
    the bench tail with WindowExec warnings). The global row rank comes
    from the shared distributed prefix sum (functions/prefix.py:
    range-bucket + driver-folded offsets + partitioned window); chunk
    numbering is exact ntile. Converged streaming state is
    chunk-boundary invariant, so split points are free to move."""
    order_cols = ["event_s", "op", "task_id", "worker_id"]
    bucketed, off, n_total = bucketed_prefix(
        df, "event_s", n_buckets=max(n_chunks * 8, 32)
    )
    if n_total == 0:
        return df.withColumn("chunk", F.lit(1))
    rank = off + F.row_number().over(W.partitionBy("_bkt").orderBy(*order_cols))
    # exact ntile numbering: the first (n % k) chunks hold ceil(n/k)
    # rows, the rest floor(n/k) — consecutive chunk ids even when rows
    # < chunks (a rank-stripe formula left gaps there, found by the
    # hypothesis property test)
    q, r = divmod(n_total, n_chunks)
    if q == 0:
        chunk = rank.cast("int")
    else:
        head = r * (q + 1)
        chunk = (
            F.when(rank <= head, ((rank - 1) / F.lit(q + 1)).cast("int") + 1)
            .otherwise(F.lit(r) + ((rank - head - 1) / F.lit(q)).cast("int") + 1)
            .cast("int")
        )
    return bucketed.withColumn("chunk", chunk).drop("_bkt")


def _write_chunks(spark: SparkSession, sf_dir: str, feed_dir: str, n_chunks: int) -> None:
    """Materialize the change-feed as n time-ordered parquet files with
    strictly increasing mtimes so the file source replays history in
    order — the etcd watch's ordered delivery."""
    # cache BEFORE with_chunk: its two driver-folded aggregations (range
    # stats + per-bucket counts) are eager actions that would otherwise
    # re-derive the events SQL twice before the per-chunk writes
    ev = events_df(spark, sf_dir).cache()
    ranked = with_chunk(ev, n_chunks)
    ranked = ranked.cache()
    os.makedirs(feed_dir, exist_ok=True)
    base = 1_700_000_000
    for i in range(1, n_chunks + 1):
        tmp = tempfile.mkdtemp(prefix="chunk", dir=feed_dir)
        (
            ranked.where(F.col("chunk") == i)
            .drop("chunk")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")][0]
        dst = os.path.join(feed_dir, f"chunk_{i:03d}.parquet")
        shutil.move(os.path.join(tmp, part), dst)
        shutil.rmtree(tmp)
        os.utime(dst, (base + i * 10, base + i * 10))
    ranked.unpersist()
    ev.unpersist()


EVENT_SCHEMA = (
    "event_s BIGINT, op STRING, task_id STRING, worker_id STRING, task_json STRING"
)


def start_lifecycle(
    spark: SparkSession,
    work_dir: str,
    feed_dir: str,
    trigger: dict | None = None,
):
    """Start the lifecycle stream against the file feed `feed_dir` —
    the file source picks up new chunk files in mtime order exactly as
    the etcd watch delivers new revisions. See start_lifecycle_stream
    for the returned (query, paths) contract; streaming/socketfeed.py
    plugs a push-based socket source into the same fold."""
    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(feed_dir)
    )
    return start_lifecycle_stream(spark, work_dir, stream, trigger)


def start_lifecycle_stream(
    spark: SparkSession,
    work_dir: str,
    stream: DataFrame,
    trigger: dict | None = None,
):
    """Start the lifecycle fold over ANY streaming DataFrame with the
    EVENT_SCHEMA columns and return (query, paths). `paths` is the LIVE
    pointer dict the fold advances per micro-batch — callers can read
    the current converged-so-far snapshot while the stream runs (the
    pointer swaps only after a version is fully written, the same
    read-validity discipline as the facade's snapshots). Default
    trigger drains what is already in the feed (AvailableNow); pass
    e.g. {"processingTime": "200 milliseconds"} for a LIVE feed a
    producer appends to while the query runs. The converged state is
    batch-boundary invariant (tests re-chunk the same feed), which is
    what makes the file feed and the socket feed interchangeable
    sources for one fold."""
    ckpt_dir = os.path.join(work_dir, "ckpt")
    state_dir = os.path.join(work_dir, "state")
    os.makedirs(state_dir, exist_ok=True)
    # state below resets to v0, so a leftover checkpoint must not let
    # the source skip files the fresh state never saw: this runner's
    # recovery unit is the whole run (redo from the feed), not the
    # micro-batch — the versioned-fold-on-files design can't replay a
    # half-applied batch idempotently, so a partial checkpoint + reset
    # state would silently drop every already-committed chunk
    shutil.rmtree(ckpt_dir, ignore_errors=True)

    version = {"n": 0}
    paths = {
        "tasks": os.path.join(state_dir, "tasks_v0"),
        "workers": os.path.join(state_dir, "workers_v0"),
        "assignments": os.path.join(state_dir, "assignments"),
    }
    _empty_task_state(spark).write.mode("overwrite").parquet(paths["tasks"])
    _empty_worker_state(spark).write.mode("overwrite").parquet(paths["workers"])
    _empty_task_state(spark).select("task_id").withColumn(
        "assigned_worker", F.lit(None).cast("string")
    ).write.mode("overwrite").parquet(paths["assignments"])

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        ev = batch_df.cache()
        clock = ev.agg(F.max("event_s")).collect()[0][0]
        if clock is None:  # empty batch
            ev.unpersist()
            return
        prev_tasks = spark.read.parquet(paths["tasks"])
        prev_workers = spark.read.parquet(paths["workers"])

        tasks = _apply_task_events(prev_tasks, ev)
        tasks = _requeue_dead(tasks, ev)
        tasks = _fire_timers(tasks, clock)
        workers = _apply_worker_events(prev_workers, ev)
        assigns = _dispatch_assignments(ev)

        version["n"] += 1
        n = version["n"]
        new_tasks = os.path.join(state_dir, f"tasks_v{n}")
        new_workers = os.path.join(state_dir, f"workers_v{n}")
        tasks.write.mode("overwrite").parquet(new_tasks)
        workers.write.mode("overwrite").parquet(new_workers)
        assigns.write.mode("append").parquet(paths["assignments"])
        # publish BOTH pointers in one dict.update (atomic under the
        # GIL): a live reader never sees tasks_vN paired with
        # workers_v(N-1). Cross-table consistency for a reader is then
        # one `dict(paths)` snapshot; the assignments log is append-only
        # and rows for batch N become visible slightly before the state
        # swap — readers joining it must tolerate that, as with any log.
        paths.update(tasks=new_tasks, workers=new_workers)
        # GC: keep v and v-1 (a frame handed out just before the swap
        # stays readable one more round — the facade's _write_tasks
        # discipline); without this the live processing-time mode grows
        # two parquet dirs per non-empty batch until the disk fills
        for old in range(n - 1):
            for prefix in ("tasks", "workers"):
                stale = os.path.join(state_dir, f"{prefix}_v{old}")
                if os.path.isdir(stale):
                    shutil.rmtree(stale, ignore_errors=True)
        ev.unpersist()

    q = (
        stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", ckpt_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
    return q, paths


def run_lifecycle(
    spark: SparkSession,
    sf_dir: str,
    work_dir: str,
    n_chunks: int = N_CHUNKS,
    feed_dir: str | None = None,
) -> dict[str, str]:
    """Run the full streaming lifecycle to convergence; returns paths of
    the converged state tables."""
    if feed_dir is None:
        feed_dir = os.path.join(work_dir, "feed")
        _write_chunks(spark, sf_dir, feed_dir, n_chunks)
    q, paths = start_lifecycle(spark, work_dir, feed_dir)
    q.awaitTermination()
    return dict(paths)


def converged_state(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Run (or reuse) the lifecycle pipeline for this session × sf_dir."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key not in _CONVERGED:
        work_dir = tempfile.mkdtemp(prefix="lifecycle_", dir=_scratch_root())
        _CONVERGED[key] = run_lifecycle(
            spark, sf_dir, work_dir, feed_dir=shared_feed(spark, sf_dir)
        )
    return _CONVERGED[key]


_SCRATCH_SWEPT = False
_SCRATCH_TTL_S = 48 * 3600  # stale feed/state dirs from dead sessions;
# generous vs any live session's age (a round is ~6h) because mtimes are
# stamped at creation, not on use — a sweep must never race a running
# stream's feed or checkpoint


def _scratch_root() -> str:
    global _SCRATCH_SWEPT
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".scratch")
    os.makedirs(root, exist_ok=True)
    if not _SCRATCH_SWEPT:
        # one sweep per process: scratch dirs outlive the session that
        # made them (each verify/pytest run leaves feeds, checkpoints,
        # state swaps), accumulating hundreds of MB across rounds. Any
        # entry untouched for _SCRATCH_TTL_S belongs to a long-dead
        # session — a live one re-stamps nothing older than its own run.
        _SCRATCH_SWEPT = True
        now = time.time()
        for name in os.listdir(root):
            p = os.path.join(root, name)
            try:
                if now - os.path.getmtime(p) > _SCRATCH_TTL_S:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass  # concurrent sweep/removal — someone else got it
    return root


# --- converged end-state queries (driver-gradable) ------------------------


def st_final_tasks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Converged per-task state after the full feed (T1-T10 composite)."""
    s = converged_state(spark, sf_dir)
    return (
        spark.read.parquet(s["tasks"])
        .select(
            "task_id",
            "priority",
            "status",
            "retry_count",
            "retry_delay_ns",
            "worker_id",
            "ready_s",
            "create_s",
            "update_s",
            "result",
            "error",
        )
        .orderBy("task_id")
    )


def st_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Converged status histogram — all five statuses reachable."""
    s = converged_state(spark, sf_dir)
    return (
        spark.read.parquet(s["tasks"])
        .groupBy("status")
        .agg(F.count("*").alias("n"))
        .orderBy("status")
    )


def st_worker_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Converged worker registry (T6 + A5): dead workers evicted,
    task_count = in-flight load, heartbeats folded."""
    s = converged_state(spark, sf_dir)
    return (
        spark.read.parquet(s["workers"])
        .select("worker_id", "task_count", "last_heartbeat_s", "capacity")
        .orderBy("worker_id")
    )


def st_retry_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T8/F7: every task that retried, with its capped retry_count and
    the backoff the engine computed."""
    s = converged_state(spark, sf_dir)
    return (
        spark.read.parquet(s["tasks"])
        .where(F.col("retry_count") > 0)
        .select("task_id", "status", "retry_count", "retry_delay_ns", "ready_s")
        .orderBy("task_id")
    )


def st_requeued_pending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: tasks pending at convergence — exactly the dead worker's
    re-queued in-flight set (every other pending path re-assigns)."""
    s = converged_state(spark, sf_dir)
    return (
        spark.read.parquet(s["tasks"])
        .where(F.col("status") == "pending")
        .select("task_id", "retry_count", "update_s")
        .orderBy("task_id")
    )


def st_dispatch_assignments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: the streaming dispatcher's submit→worker bindings."""
    s = converged_state(spark, sf_dir)
    return (
        spark.read.parquet(s["assignments"])
        .where(F.col("task_id").isNotNull())
        .select("task_id", "assigned_worker")
        .orderBy("task_id")
    )


QUERIES = {
    "st_final_tasks": st_final_tasks,
    "st_status_counts": st_status_counts,
    "st_worker_state": st_worker_state,
    "st_retry_backoff": st_retry_backoff,
    "st_requeued_pending": st_requeued_pending,
    "st_dispatch_assignments": st_dispatch_assignments,
}

# --- oracles: re-derive the converged state declaratively -----------------
#
# The oracle folds the same log with window functions: last event per
# task decides status; fails_so_far caps retries; worker deaths inject
# synthetic re-pend rows; timer fires are arithmetic (ready = fail_s +
# 2·2^(rc-1), fired iff ready <= the global max clock).

_FINAL_TASKS_CTE = f"""
tev AS (SELECT * FROM events WHERE task_id IS NOT NULL),
clockmax AS (SELECT MAX(event_s) AS max_s FROM events),
deaths AS (SELECT worker_id AS dw, event_s AS death_s FROM events WHERE op = 'worker_dead'),
repends AS (
  SELECT e.task_id, d.death_s
  FROM deaths d JOIN tev e ON e.event_s < d.death_s
  QUALIFY ROW_NUMBER() OVER (PARTITION BY e.task_id, d.death_s ORDER BY e.event_s DESC) = 1
      AND e.op = 'assign' AND e.worker_id = d.dw
),
aug AS (
  SELECT task_id, event_s, op, worker_id, task_json FROM tev
  UNION ALL
  SELECT task_id, death_s, 'repend', NULL, NULL FROM repends
),
seq AS (
  SELECT *,
         COUNT(*) FILTER (WHERE op = 'fail')
           OVER (PARTITION BY task_id ORDER BY event_s) AS fails_so_far,
         ROW_NUMBER() OVER (PARTITION BY task_id ORDER BY event_s DESC) AS rnd
  FROM aug
),
per_task AS (
  SELECT task_id,
         MAX(CASE WHEN op = 'submit' THEN CAST(task_json->>'priority' AS INT) END) AS priority,
         CAST(LEAST(SUM(CASE WHEN op = 'fail' THEN 1 ELSE 0 END), {MAX_RETRIES}) AS INT) AS rc,
         SUM(CASE WHEN op = 'fail' THEN 1 ELSE 0 END) AS nfails,
         MAX(CASE WHEN op = 'submit' THEN event_s END) AS create_s,
         MAX(event_s) AS update_raw,
         MAX(CASE WHEN op = 'fail' THEN event_s END) AS last_fail_s
  FROM aug GROUP BY task_id
),
lastev AS (
  SELECT task_id, op AS last_op, worker_id AS last_worker, fails_so_far AS last_fails
  FROM seq WHERE rnd = 1
),
final AS (
  SELECT p.task_id, p.priority,
         CASE l.last_op
           WHEN 'submit' THEN 'pending'
           WHEN 'repend' THEN 'pending'
           WHEN 'assign' THEN 'processing'
           WHEN 'complete' THEN 'completed'
           WHEN 'fail' THEN CASE
             WHEN l.last_fails > {MAX_RETRIES} THEN 'failed'
             WHEN p.last_fail_s + CAST({BACKOFF_BASE_S} * POW(2, LEAST(p.nfails, {MAX_RETRIES}) - 1) AS BIGINT)
                  <= (SELECT max_s FROM clockmax) THEN 'pending'
             ELSE 'delayed' END
         END AS status,
         p.rc AS retry_count,
         CASE WHEN p.nfails = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST({BACKOFF_BASE_S}000000000 * POW(2, p.rc - 1) AS BIGINT) END AS retry_delay_ns,
         CASE WHEN l.last_op = 'assign' THEN l.last_worker END AS worker_id,
         p.create_s, p.last_fail_s,
         GREATEST(p.update_raw,
           CASE WHEN l.last_op = 'fail' AND l.last_fails <= {MAX_RETRIES}
                 AND p.last_fail_s + CAST({BACKOFF_BASE_S} * POW(2, LEAST(p.nfails, {MAX_RETRIES}) - 1) AS BIGINT)
                     <= (SELECT max_s FROM clockmax)
                THEN p.last_fail_s + CAST({BACKOFF_BASE_S} * POW(2, LEAST(p.nfails, {MAX_RETRIES}) - 1) AS BIGINT)
                ELSE CAST(0 AS BIGINT) END) AS update_s
  FROM per_task p JOIN lastev l ON p.task_id = l.task_id
),
final2 AS (
  SELECT *,
         CASE WHEN status = 'delayed'
              THEN last_fail_s + CAST({BACKOFF_BASE_S} * POW(2, retry_count - 1) AS BIGINT)
              END AS ready_s,
         CASE WHEN status = 'completed' THEN '任务 ' || task_id || ' 执行结果: ok' END AS result,
         CASE WHEN status IN ('delayed', 'failed') THEN 'simulated failure' END AS error
  FROM final
)
"""


def _final_sql(select_body: str) -> str:
    return oracle_events_cte(f"WITH {_FINAL_TASKS_CTE} {select_body}")


ORACLES = {
    "st_final_tasks": _final_sql(
        """
        SELECT task_id, priority, status, retry_count, retry_delay_ns, worker_id,
               ready_s, create_s, update_s, result, error
        FROM final2 ORDER BY task_id
        """
    ),
    "st_status_counts": _final_sql(
        "SELECT status, COUNT(*) AS n FROM final2 GROUP BY status ORDER BY status"
    ),
    "st_worker_state": oracle_events_cte(
        f"""
        SELECT worker_id,
               CAST(SUM(CASE WHEN op = 'assign' THEN 1
                             WHEN op IN ('complete', 'fail') THEN -1
                             ELSE 0 END) AS INT) AS task_count,
               MAX(CASE WHEN op IN ('worker_register', 'heartbeat') THEN event_s END)
                 AS last_heartbeat_s,
               {WORKER_CAPACITY} AS capacity
        FROM events
        WHERE worker_id IS NOT NULL
          AND worker_id NOT IN (SELECT worker_id FROM events WHERE op = 'worker_dead')
        GROUP BY worker_id ORDER BY worker_id
        """
    ),
    "st_retry_backoff": _final_sql(
        """
        SELECT task_id, status, retry_count, retry_delay_ns, ready_s
        FROM final2 WHERE retry_count > 0 ORDER BY task_id
        """
    ),
    "st_requeued_pending": _final_sql(
        """
        SELECT task_id, retry_count, update_s
        FROM final2 WHERE status = 'pending' ORDER BY task_id
        """
    ),
    "st_dispatch_assignments": oracle_events_cte(
        """
        SELECT task_id,
               'lw' || CAST(CAST(concat('0x', substr(md5(task_id), 1, 2)) AS INT) % 4 AS STRING)
                 AS assigned_worker
        FROM events WHERE op = 'submit' ORDER BY task_id
        """
    ),
}
