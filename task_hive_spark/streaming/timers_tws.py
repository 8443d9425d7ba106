"""T2 delayed-task timers on ``transformWithStateInPandas`` — the
Spark 4 successor API to ``applyInPandasWithState`` (timers.py).

Where timers.py multiplexes every armed lease through the key's single
timeout slot (a min-heap in state + setTimeoutTimestamp of the
earliest), this module arms ONE NAMED TIMER PER LEASE via
``handle.registerTimer`` — the reference's etcd model exactly: each
delayed-trigger key carries its own TTL lease (worker.go:84-103), and
each expiry independently re-submits its task (dispatcher.go:330-385).
State is the (ready_s, retry_n) ledger; ``handleExpiredTimer`` is the
lease-expiry callback.

ENVIRONMENT GATE: the transformWithState state server speaks the
protobuf wire format and ``google.protobuf`` is not usable in this
container (the namespace package exists but ``descriptor`` is absent —
probed, not assumed: the query fails at StreamingPythonRunner init
with ``ImportError: cannot import name 'descriptor'``). Everything
here is therefore gated behind :func:`has_tws_support`;
tests/test_timers.py pins the parity contract — when the gate opens,
the output must equal st_timer_requeue's row-for-row (same oracle).

Scale shape: identical to timers.py — one shuffle on task_id, O(armed
retries) state per key, timers partitioned with the state store.
"""

from __future__ import annotations

import os
import tempfile
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from task_hive_spark.streaming.lifecycle import (
    MAX_RETRIES,
    N_CHUNKS,
    _scratch_root,
    shared_feed,
)
from task_hive_spark.streaming.timers import _EVENT_SCHEMA, _OUT_SCHEMA


def has_tws_support() -> bool:
    """True iff the protobuf runtime the transformWithState state
    server requires is importable (the container ships a broken
    ``google`` namespace without it)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class _TimerLeaseProcessor(StatefulProcessor):
    """One etcd-style TTL lease per armed retry, one timer per lease."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._rc = handle.getValueState("rc", "rc INT")
        self._armed = handle.getListState("armed", "ready_s BIGINT, retry_n INT")
        self._handle = handle

    def handleInputRows(
        self, key: tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (task_id,) = key
        wm_s = timerValues.getCurrentWatermarkInMs() // 1000
        rc = self._rc.get()[0] if self._rc.exists() else 0
        ev = pd.concat(list(rows)).sort_values("event_s")
        fired: list[tuple[int, int]] = []
        for _, r in ev[ev["op"] == "fail"].iterrows():
            if rc < MAX_RETRIES:
                rc += 1
                ready = int(r["event_s"]) + 2 * 2 ** (rc - 1)
                if ready <= wm_s:
                    # the watch would already have fired this lease
                    # before these events arrived (timers.py emits the
                    # same entries in its fold)
                    fired.append((ready, rc))
                else:
                    self._armed.appendValue((ready, rc))
                    self._handle.registerTimer(ready * 1000)
            # 4th+ failure: terminal, no lease (worker.go:113-135)
        self._rc.update((rc,))
        if fired:
            fired.sort()
            yield pd.DataFrame(
                {
                    "task_id": [task_id] * len(fired),
                    "ready_s": [a for a, _ in fired],
                    "retry_n": [n for _, n in fired],
                }
            )

    def handleExpiredTimer(
        self, key: tuple[Any, ...], timerValues, expiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        (task_id,) = key
        expiry_s = expiredTimerInfo.getExpiryTimeInMs() // 1000
        armed = [tuple(r) for r in self._armed.get()] if self._armed.exists() else []
        due = sorted((a, n) for a, n in armed if a <= expiry_s)
        left = [(a, n) for a, n in armed if a > expiry_s]
        self._armed.put(left)
        if due:
            yield pd.DataFrame(
                {
                    "task_id": [task_id] * len(due),
                    "ready_s": [a for a, _ in due],
                    "retry_n": [n for _, n in due],
                }
            )

    def close(self) -> None:
        pass


def run_once_tws(
    spark: SparkSession, sf_dir: str, work: str, n_chunks: int, feed: str | None = None
) -> str:
    """Run the multi-timer stream to completion (AvailableNow); returns
    the fired-re-entries output dir. Raises if the protobuf gate is
    closed — callers check has_tws_support() first."""
    if feed is None:
        from task_hive_spark.streaming.lifecycle import _write_chunks

        feed = os.path.join(work, "feed")
        _write_chunks(spark, sf_dir, feed, n_chunks)
    out = os.path.join(work, "fired")

    src = (
        spark.readStream.schema(_EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(feed)
        .withColumn("ts", F.timestamp_seconds("event_s"))
        .withWatermark("ts", "0 seconds")
        # phrased to reference the event-time column so Catalyst keeps
        # the filter ABOVE EventTimeWatermark and the watermark tracks
        # the full feed, worker-only events included (see timers.py
        # run_once for the pushdown analysis)
        .where(F.when(F.col("task_id").isNotNull(), F.col("ts")).isNotNull())
    )
    fired = src.groupBy("task_id").transformWithStateInPandas(
        _TimerLeaseProcessor(),
        _OUT_SCHEMA,
        "append",
        "eventTime",
    )
    q = (
        fired.writeStream.outputMode("append")
        .foreachBatch(lambda df, _bid: df.write.mode("append").parquet(out))
        .option("checkpointLocation", os.path.join(work, "ckpt_tws"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return out


def st_timer_requeue_tws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """st_timer_requeue's contract on the successor API: every delayed
    re-entry the per-lease timers fired, ordered. Must match
    timers.st_timer_requeue (and its DuckDB oracle) row-for-row."""
    work = tempfile.mkdtemp(prefix="timers_tws_", dir=_scratch_root())
    out = run_once_tws(spark, sf_dir, work, N_CHUNKS, feed=shared_feed(spark, sf_dir))
    return spark.read.schema(_OUT_SCHEMA).parquet(out).orderBy("task_id", "ready_s")
