"""Scripted task-lifecycle event log (FIXTURES.md §4).

One shared SQL text builds the log in BOTH engines — Spark materializes
it as the streaming source, DuckDB re-derives the converged state from
it declaratively — so the foreachBatch state machine in ``lifecycle.py``
is checkable by the driver's ordinary batch oracle gate.

Event ops mirror the reference's etcd transaction sites:
submit `dispatcher.go:187`, assign `dispatcher.go:585-593`, complete
`worker.go:146-150`, fail `worker.go:120-124`, heartbeat
`dispatcher.go:145-149`, worker_register `dispatcher.go:44-45`,
worker_dead `dispatcher.go:673`. Delayed→pending re-entry
(`dispatcher.go:330-385`) is deliberately NOT in the log: the engine
computes it from the backoff formula (T2), and the oracle re-derives
the same fire times arithmetically.

Times are epoch-seconds BIGINTs (``event_s``): deterministic, ordered,
and immune to cross-engine timestamp canonicalization drift.

Script invariants the state machine may rely on (all hold by
construction):
- (task_id, event_s) unique; a task's events are strictly ordered.
- No events for a task after its terminal complete/fail.
- No assigns onto a worker after its worker_dead event.
- Every in-flight task of a dying worker has had no event since its
  assign (so "processing on dead worker" identifies exactly the
  re-queue set, dispatcher.go:696-700).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from task_hive_spark.sources.fixtures import register_fixture_views

# --- scripted corner cases (single source of truth: this list) -----------
# (event_s, op, task_id, worker_id, task_json)
# lt-retry: fails 4x -> retry_count caps at 3 (MaxRetries, constants.go:20),
#   4th failure is terminal (worker.go:113-135). Assigns at +1s after each
#   engine-computed re-entry (fires at fail+2/4/8s backoff, worker.go:73-79).
# lt-delayed: one failure, engine re-enters it at fail+2s, later assign
#   and complete — the delayed-task round trip (dispatcher.go:330-385).
# lt-stuck: fails at the very end of the log; its ready time is past the
#   last batch clock, so it converges as 'delayed' (timer armed, unfired).
SCRIPT: list[tuple[int, str, str | None, str | None, int | None]] = [
    (100, "submit", "lt-retry", None, 5),
    (101, "assign", "lt-retry", "lw0", None),
    (102, "fail", "lt-retry", "lw0", None),  # rc->1, ready 104
    (105, "assign", "lt-retry", "lw0", None),
    (106, "fail", "lt-retry", "lw0", None),  # rc->2, ready 110
    (111, "assign", "lt-retry", "lw0", None),
    (112, "fail", "lt-retry", "lw0", None),  # rc->3, ready 120
    (121, "assign", "lt-retry", "lw0", None),
    (122, "fail", "lt-retry", "lw0", None),  # 4th fail -> terminal 'failed'
    (200, "submit", "lt-delayed", None, 5),
    (201, "assign", "lt-delayed", "lw1", None),
    (202, "fail", "lt-delayed", "lw1", None),  # rc->1, ready 204
    (205, "assign", "lt-delayed", "lw1", None),
    (210, "complete", "lt-delayed", "lw1", None),
    (8900, "submit", "lt-stuck", None, 5),
    (8910, "assign", "lt-stuck", "lw2", None),
    (9100, "fail", "lt-stuck", "lw2", None),  # rc->1, ready 9102 > max clock
]


def _script_values() -> str:
    rows = []
    for s, op, tid, wid, prio in SCRIPT:
        tid_sql = f"'{tid}'" if tid else "CAST(NULL AS STRING)"
        wid_sql = f"'{wid}'" if wid else "CAST(NULL AS STRING)"
        js = (
            f"'{{\"priority\":{prio},\"type\":\"spider\"}}'"
            if prio is not None
            else "CAST(NULL AS STRING)"
        )
        rows.append(f"(CAST({s} AS BIGINT), '{op}', {tid_sql}, {wid_sql}, {js})")
    return ",\n    ".join(rows)


# Bulk events derived from orders (o_orderkey % 4 = 0 → one task each):
# submit → assign → outcome by o_orderkey % 5:
#   0,1,2: complete; 3: fail once (engine re-enters), re-assign, complete;
#   4: stays in flight — if its worker is lw3 it gets re-queued by the
#   worker_dead event at t=8000 (T5), else it converges as 'processing'.
EVENTS_SQL = f"""
WITH lbase AS (
  SELECT o_orderkey AS k,
         CAST(o_orderkey % 10 + 1 AS INT) AS prio,
         CASE WHEN o_orderkey % 16 < 4 THEN 'lw0'
              WHEN o_orderkey % 16 < 8 THEN 'lw1'
              WHEN o_orderkey % 16 < 12 THEN 'lw2'
              ELSE 'lw3' END AS w,
         o_orderkey % 5 AS outcome,
         CAST(10 + (o_orderkey % 997) AS BIGINT) AS t
  FROM orders WHERE o_orderkey % 4 = 0
)
SELECT CAST(i AS BIGINT) AS event_s, 'worker_register' AS op,
       CAST(NULL AS STRING) AS task_id, 'lw' || CAST(i AS STRING) AS worker_id,
       CAST(NULL AS STRING) AS task_json
FROM (VALUES (0), (1), (2), (3)) AS wr(i)
UNION ALL
SELECT t, 'submit', 'lt-' || CAST(k AS STRING), CAST(NULL AS STRING),
       '{{"priority":' || CAST(prio AS STRING) || ',"type":"spider"}}'
FROM lbase
UNION ALL
SELECT t + 5, 'assign', 'lt-' || CAST(k AS STRING), w, CAST(NULL AS STRING) FROM lbase
UNION ALL
SELECT t + 15, 'complete', 'lt-' || CAST(k AS STRING), w, CAST(NULL AS STRING)
FROM lbase WHERE outcome < 3
UNION ALL
SELECT t + 15, 'fail', 'lt-' || CAST(k AS STRING), w, CAST(NULL AS STRING)
FROM lbase WHERE outcome = 3
UNION ALL
SELECT t + 18, 'assign', 'lt-' || CAST(k AS STRING), w, CAST(NULL AS STRING)
FROM lbase WHERE outcome = 3
UNION ALL
SELECT t + 25, 'complete', 'lt-' || CAST(k AS STRING), w, CAST(NULL AS STRING)
FROM lbase WHERE outcome = 3
UNION ALL
SELECT CAST(8000 AS BIGINT), 'worker_dead', CAST(NULL AS STRING), 'lw3', CAST(NULL AS STRING)
UNION ALL
SELECT CAST(9000 + hb.i AS BIGINT), 'heartbeat', CAST(NULL AS STRING),
       'lw' || CAST(hb.i AS STRING), CAST(NULL AS STRING)
FROM (VALUES (0), (1), (2)) AS hb(i)
UNION ALL
SELECT * FROM (VALUES
    {_script_values()}
) AS scripted(event_s, op, task_id, worker_id, task_json)
"""


def oracle_events_cte(body_sql: str) -> str:
    """Wrap an oracle body with the shared event-log CTE."""
    body = body_sql.strip()
    if body[:4].upper() == "WITH":
        return f"WITH events AS ({EVENTS_SQL}),{body[4:]}"
    return f"WITH events AS ({EVENTS_SQL})\n{body}"


def events_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scripted change-feed as a DataFrame, time-ordered."""
    register_fixture_views(spark, sf_dir)
    return spark.sql(EVENTS_SQL).orderBy("event_s", "op", "task_id", "worker_id")
