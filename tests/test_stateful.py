"""applyInPandasWithState counter + watermark window operators.

The converged output of both stateful streams must be invariant to how
the feed is chunked into micro-batches (the state fold is associative;
watermark emission depends only on the global max event time because
chunks are time-ordered).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import Window as W, functions as F

from task_hive_spark.streaming import stateful
from task_hive_spark.streaming.lifecycle import _scratch_root


def _converged_counter(spark, out_dir):
    w = W.partitionBy("worker_id").orderBy(F.desc("n_events"))
    return {
        r["worker_id"]: (r["task_count"], r["n_events"])
        for r in spark.read.parquet(out_dir)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .collect()
    }


def _session_set(spark, out_dir):
    return {
        (r["worker_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.read.parquet(out_dir).collect()
    }


def test_counter_invariant_to_batching(spark, sf_dir):
    counters, sessions, latencies, slas = [], [], [], []
    for n_chunks in (1, 5):
        work = tempfile.mkdtemp(prefix=f"stateful_test{n_chunks}_", dir=_scratch_root())
        out = stateful.run_once(spark, sf_dir, work, n_chunks)
        counters.append(_converged_counter(spark, out["counter"]))
        sessions.append(_session_set(spark, out["sessions"]))
        latencies.append(
            {
                (r["task_id"], r["worker_id"], r["assign_s"], r["latency_s"])
                for r in spark.read.parquet(out["latency"]).collect()
            }
        )
        slas.append(
            {
                (r["task_id"], r["submit_s"], r["worker_id"], r["assign_s"])
                for r in spark.read.parquet(out["sla"]).collect()
            }
        )
    assert counters[0] == counters[1]
    assert len(counters[0]) == 4  # lw0..lw3 all saw assign/complete/fail events
    # session-window state merges across micro-batches: the emitted
    # session set must not depend on where chunk boundaries fell
    assert sessions[0] == sessions[1]
    assert sessions[0]
    # stream-stream join: a submit and its assign can land in different
    # micro-batches; the buffered-state join must still match them
    assert latencies[0] == latencies[1]
    assert latencies[0]
    # left-outer join: null-extended rows emit at state eviction, which
    # depends only on the final watermark, never on chunk boundaries
    assert slas[0] == slas[1]
    assert slas[0]


def test_unmatched_submits_eviction_semantics(spark, sf_dir):
    """The three-way split the outer join must produce: on-time matches
    emit with their assign, proven SLA misses emit null-extended, and
    submits whose window the final watermark never closed (lt-stuck)
    appear in NEITHER branch — they are still in join state."""
    all_rows = stateful.st_unmatched_submits(spark, sf_dir).collect()
    rows = {r["task_id"]: r for r in all_rows}
    # the scripted feed has one submit and at most one within-SLA assign
    # per task — if a fixture change ever emits multiple rows per task,
    # the per-task assertions below would silently check an arbitrary
    # survivor, so pin the 1:1 shape first
    assert len(all_rows) == len(rows)
    # scripted on-time dispatches (assign 1 s after submit)
    assert rows["lt-retry"]["sla_met"] and rows["lt-retry"]["assign_s"] == 101
    assert rows["lt-delayed"]["sla_met"] and rows["lt-delayed"]["worker_id"] == "lw1"
    # bulk submits assign at +5 s — every one is a proven miss
    misses = [r for r in rows.values() if not r["sla_met"]]
    assert misses and all(r["worker_id"] is None and r["assign_s"] is None for r in misses)
    # lt-stuck's window end (8903) is past the final combined watermark
    # (min(max submit 8900, max assign 8910) − 30): undecidable, withheld
    assert "lt-stuck" not in rows


def test_unmatched_submits_watermark_boundary(spark):
    """Pin the eviction comparator the oracle mirrors: a submit whose
    SLA window ends EXACTLY on the final combined watermark is still in
    join state (a boundary assign would not be late), so it must NOT
    emit — the oracle cutoff is a strict <, not <=. Feed: 'bnd' ends at
    103 == min(max submit 133, max assign 500) − 30; 'ctl' ends at
    93 < 103 and must emit as a proven miss."""
    import os
    import tempfile

    rows = [
        (90, "submit", "ctl", None, None),
        (100, "submit", "bnd", None, None),
        (133, "submit", "pad", None, None),
        (500, "assign", "other", "w0", None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_s BIGINT, op STRING, task_id STRING, worker_id STRING, task_json STRING",
    )
    work = tempfile.mkdtemp(prefix="wm_boundary_", dir=_scratch_root())
    feed = os.path.join(work, "feed")
    df.coalesce(1).write.parquet(feed)
    out = stateful.run_once(spark, None, work, 0, feed=feed, only=("sla",))
    got = {r["task_id"]: r for r in spark.read.parquet(out["sla"]).collect()}
    assert "ctl" in got and not got["ctl"]["sla_met"]
    assert "bnd" not in got
    assert "pad" not in got  # its own window end (136) is past the watermark too


def test_counter_is_net_inflight(spark, sf_dir):
    counts = {
        r["worker_id"]: r["task_count"]
        for r in stateful.st_worker_counter_stateful(spark, sf_dir).collect()
    }
    assert all(v >= 0 for v in counts.values())
    # the dead worker lw3 keeps its in-flight count (nobody completes
    # its tasks after worker_dead — script invariant)
    assert counts["lw3"] > 0


def test_windowed_throughput_watermark_cutoff(spark, sf_dir):
    rows = stateful.st_windowed_throughput(spark, sf_dir).collect()
    assert rows, "append-mode sink emitted no closed windows"
    from task_hive_spark.streaming.events import events_df

    max_s = events_df(spark, sf_dir).agg(F.max("event_s")).collect()[0][0]
    cutoff = max_s - stateful.WATERMARK_S
    assert all(r["window_start"] + stateful.WINDOW_S <= cutoff for r in rows)
    assert all(r["n"] > 0 for r in rows)


def test_incremental_minhash_chunk_invariant_and_matches_batch(spark):
    """The online MinHash indexer's converged pair set must equal the
    offline dd_minhash_lsh_pairs answer at ANY chunking of the
    ingestion feed — in-batch duplicates are caught by the self-probe,
    cross-batch ones by the index probe, so the split point can't
    matter."""
    import tempfile

    from task_hive_spark.operators.dedup import dd_minhash_lsh_pairs
    from task_hive_spark.streaming import minhashstream
    from task_hive_spark.streaming.lifecycle import _scratch_root

    sf = "/root/testdata/sf0.001"
    batch = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in dd_minhash_lsh_pairs(spark, sf).collect()
    }
    assert batch
    for n_chunks in (1, 3):
        work = tempfile.mkdtemp(prefix=f"mh_t{n_chunks}_", dir=_scratch_root())
        out = minhashstream.run_once(spark, sf, work, n_chunks=n_chunks)
        got = {
            (r.doc_a, r.doc_b, r.est_jaccard)
            for r in spark.read.parquet(out).collect()
        }
        assert got == batch, n_chunks


def test_incremental_minhash_resumes_from_checkpoint(spark):
    """Restart safety: run the indexer over the first half of the
    ingestion, stop, let the remaining chunks arrive, run a SECOND
    stream on the SAME checkpoint — already-processed batches must not
    re-probe or re-append (batch-scoped overwrite subdirs), and the
    converged pair set must still equal the batch answer."""
    import os
    import shutil
    import tempfile

    from task_hive_spark.operators.dedup import dd_minhash_lsh_pairs
    from task_hive_spark.streaming import minhashstream
    from task_hive_spark.streaming.lifecycle import _scratch_root

    sf = "/root/testdata/sf0.001"
    work = tempfile.mkdtemp(prefix="mh_resume_", dir=_scratch_root())
    staged = os.path.join(work, "staged")
    minhashstream._write_doc_chunks(spark, sf, staged, 4)
    chunks = sorted(os.listdir(staged))
    feed = os.path.join(work, "feed")
    os.makedirs(feed)
    for c in chunks[:2]:
        shutil.copy2(os.path.join(staged, c), os.path.join(feed, c))
    minhashstream.run_stream(spark, work, feed)  # first half
    for c in chunks[2:]:
        shutil.copy2(os.path.join(staged, c), os.path.join(feed, c))
    out = minhashstream.run_stream(spark, work, feed)  # resume
    got = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in spark.read.parquet(out).select("doc_a", "doc_b", "est_jaccard").collect()
    }
    batch = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in dd_minhash_lsh_pairs(spark, sf).collect()
    }
    assert got == batch
    # and no duplicate rows anywhere (replay idempotence)
    df = spark.read.parquet(out).select("doc_a", "doc_b")
    assert df.count() == df.distinct().count()
