"""Round-14 streaming DRAIN probe (r13 verdict item 6): one timed drain
per streaming module, feed build excluded, with total Spark jobs and
jobs per micro-batch.

The st_* queries are never benched (their converged outputs are read
from session-memoized state), so this records what a drain actually
costs: per module, the feed is built (or reused) UNTIMED, then the
drain runs in a FRESH work dir with the wall clock and the global
DAGScheduler job counter around it (job groups are thread-local and
structured streaming executes on its own threads, so the counter —
not a job group — is the honest cross-thread job count).

Usage: python scripts/stream_drain_probe_r14.py [module ...]
Prints one JSON line per drain + a trailing summary.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from task_hive_spark.session import get_spark
    from task_hive_spark.streaming import (
        cdcmerge,
        dedupstream,
        lifecycle,
        minhashstream,
        sketchstream,
        stateful,
        timers,
    )
    from task_hive_spark.streaming.lifecycle import _scratch_root, shared_feed

    spark = get_spark("stream_drain_probe_r14")
    sc = spark.sparkContext

    def scratch(prefix: str) -> str:
        return tempfile.mkdtemp(prefix=prefix, dir=_scratch_root())

    # feeds, built once and untimed
    event_feed = shared_feed(spark, SF_DIR)  # lifecycle/stateful/timers chunks
    replay_work = scratch("drainfeed_replay_")
    replay_feed = os.path.join(replay_work, "feed")
    dedupstream._write_replay_chunks(
        spark, SF_DIR, replay_feed, lifecycle.N_CHUNKS
    )
    change_work = scratch("drainfeed_change_")
    change_feed = os.path.join(change_work, "feed")
    cdcmerge._write_change_chunks(
        spark, SF_DIR, change_feed, cdcmerge.N_CHANGE_CHUNKS
    )
    doc_work = scratch("drainfeed_docs_")
    doc_feed = os.path.join(doc_work, "feed")
    minhashstream._write_doc_chunks(
        spark, SF_DIR, doc_feed, minhashstream.N_DOC_CHUNKS
    )
    sketch_work = scratch("drainfeed_events_")
    sketch_feed = sketchstream._event_feed(
        spark, SF_DIR, sketch_work, sketchstream.N_EVENT_CHUNKS
    )

    def cdc_drain():
        work = scratch("drain_cdc_")
        cdcmerge.seed_state(spark, SF_DIR, work)  # snapshot seed: setup, untimed
        return lambda: cdcmerge.run_stream(spark, work, change_feed)

    drains = {
        "lifecycle": (
            lifecycle.N_CHUNKS,
            lambda: (
                lambda work: lambda: lifecycle.run_lifecycle(
                    spark, SF_DIR, work, feed_dir=event_feed
                )
            )(scratch("drain_lc_")),
        ),
        "stateful": (
            lifecycle.N_CHUNKS,
            lambda: (
                lambda work: lambda: stateful.run_once(
                    spark, SF_DIR, work, lifecycle.N_CHUNKS, feed=event_feed
                )
            )(scratch("drain_st_")),
        ),
        "timers": (
            lifecycle.N_CHUNKS,
            lambda: (
                lambda work: lambda: timers.run_once(
                    spark, SF_DIR, work, lifecycle.N_CHUNKS, feed=event_feed
                )
            )(scratch("drain_tm_")),
        ),
        "dedupstream": (
            lifecycle.N_CHUNKS,
            lambda: (
                lambda work: lambda: dedupstream.run_once(
                    spark, SF_DIR, work, lifecycle.N_CHUNKS, feed=replay_feed
                )
            )(scratch("drain_dd_")),
        ),
        "cdcmerge": (cdcmerge.N_CHANGE_CHUNKS, cdc_drain),
        "minhashstream": (
            minhashstream.N_DOC_CHUNKS,
            lambda: (
                lambda work: lambda: minhashstream.run_stream(spark, work, doc_feed)
            )(scratch("drain_mh_")),
        ),
        "sketch_hll": (
            sketchstream.N_EVENT_CHUNKS,
            lambda: (
                lambda work: lambda: sketchstream.run_stream(spark, work, sketch_feed)
            )(scratch("drain_sk_")),
        ),
        "sketch_kmv": (
            sketchstream.N_EVENT_CHUNKS,
            lambda: (
                lambda work: lambda: sketchstream.run_kmv_stream(
                    spark, work, sketch_feed
                )
            )(scratch("drain_kmv_")),
        ),
        "sketch_cms": (
            sketchstream.N_EVENT_CHUNKS,
            lambda: (
                lambda work: lambda: sketchstream.run_cms_stream(
                    spark, work, sketch_feed
                )
            )(scratch("drain_cms_")),
        ),
        "sketch_qsk": (
            sketchstream.N_EVENT_CHUNKS,
            lambda: (
                lambda work: lambda: sketchstream.run_qsk_stream(
                    spark, work, sketch_feed
                )
            )(scratch("drain_qsk_")),
        ),
    }

    names = sys.argv[1:] or list(drains)
    rows = []
    for name in names:
        n_batches, make = drains[name]
        run = make()  # per-drain setup (fresh work dir, seeds) — untimed
        sc.setJobDescription(f"drain:{name}")
        j0 = sc._jsc.sc().dagScheduler().nextJobId()
        t0 = time.perf_counter()
        run()
        dt = time.perf_counter() - t0
        jobs = sc._jsc.sc().dagScheduler().nextJobId() - j0
        sc.setJobDescription(None)
        r = {
            "module": name,
            "drain_s": round(dt, 3),
            "micro_batches": n_batches,
            "jobs": jobs,
            "jobs_per_batch": round(jobs / n_batches, 2),
        }
        rows.append(r)
        print(json.dumps(r), flush=True)
    print(
        json.dumps(
            {
                "total_drain_s": round(sum(r["drain_s"] for r in rows), 3),
                "n": len(rows),
                "sf_dir": SF_DIR,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
