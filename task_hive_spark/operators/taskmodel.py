"""Deterministic task-hive data model over the driver fixtures.

The reference persists a ``tasks`` table (status-partitioned etcd
prefixes, /root/reference/common/constants.go:5-15) and a ``workers``
registry (tasks/worker.go:21-27). The driver testdata has no such
tables, so we derive them deterministically from ``orders`` and
``supplier`` with SQL text that parses identically in Spark SQL and
DuckDB — the single source of truth for both the engine views and the
oracle CTEs. No randomness, no wall clock (FIXTURES.md determinism
rules): ``NOW_FIXTURE`` is the injected "current time" used by
liveness predicates (tasks/api.go:263).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from task_hive_spark.sources.fixtures import register_fixture_views

NOW_FIXTURE = "TIMESTAMP '2024-06-01 00:00:00'"

# One logical tasks table; status plays the role of the etcd prefix
# (partition column at write time — see write_tasks_table below).
# Column semantics per model/model.go:11-22 and FIXTURES.md §2.
TASKS_SQL = """
SELECT
  'task-' || CAST(o_orderkey AS STRING)                          AS id,
  '{"row_id": ' || CAST(o_orderkey AS STRING) || ', "row_data": ["'
      || o_orderstatus || '", "' || o_orderpriority || '"]}'     AS payload,
  CAST(o_orderkey % 10 + 1 AS INT)                               AS priority,
  CASE CAST(o_orderkey % 10 AS INT)
       WHEN 0 THEN 'pending' WHEN 1 THEN 'pending' WHEN 2 THEN 'pending'
       WHEN 3 THEN 'processing' WHEN 4 THEN 'processing'
       WHEN 5 THEN 'completed' WHEN 6 THEN 'completed' WHEN 7 THEN 'completed'
       WHEN 8 THEN 'failed'
       ELSE 'delayed' END                                        AS status,
  o_orderdate                                                    AS create_time,
  CAST(o_orderkey % 4 AS INT)                                    AS retry_count,
  CASE WHEN o_orderkey % 4 = 0 THEN CAST(0 AS BIGINT)
       ELSE CAST(2000000000 * POW(2, CAST(o_orderkey % 4 AS INT) - 1) AS BIGINT)
       END                                                       AS retry_delay_ns,
  CASE WHEN CAST(o_orderkey % 10 AS INT) IN (5, 6, 7)
       THEN '任务 task-' || CAST(o_orderkey AS STRING) || ' 执行结果: ok'
       ELSE NULL END                                             AS result,
  CASE WHEN CAST(o_orderkey % 10 AS INT) IN (8, 9)
       THEN 'simulated failure' ELSE NULL END                    AS error,
  CASE CAST(o_orderkey % 3 AS INT)
       WHEN 0 THEN 'spider' WHEN 1 THEN 'custom'
       ELSE 'mystery' END                                        AS type,
  CASE WHEN CAST(o_orderkey % 10 AS INT) IN (3, 4)
       THEN 'worker-' || CAST(o_orderkey % 8 AS STRING)
       ELSE NULL END                                             AS worker_id,
  o_orderdate + INTERVAL 1 HOUR                                  AS update_time
FROM orders
"""

# 8 workers (s_suppkey 0..7): liveness both ways vs NOW_FIXTURE
# (7s..56s heartbeat age, threshold 30s per api.go:263), one
# over-capacity (worker-6: 4 > 3), one capacity=0 = unlimited
# (dispatcher.go:542).
WORKERS_SQL = f"""
SELECT
  'worker-' || CAST(s_suppkey AS STRING)                         AS id,
  CAST(7000 + s_suppkey AS BIGINT)                               AS lease_id,
  CASE WHEN s_suppkey = 6 THEN 4
       ELSE CAST(s_suppkey % 5 AS INT) END                       AS task_count,
  {NOW_FIXTURE} - (INTERVAL 7 SECOND) * (s_suppkey + 1)          AS last_heartbeat,
  CASE WHEN s_suppkey = 7 THEN 0
       WHEN s_suppkey = 6 THEN 3
       ELSE 10 END                                               AS capacity
FROM supplier
WHERE s_suppkey < 8
"""


def oracle_cte(body_sql: str) -> str:
    """Wrap an oracle query body with the shared tasks/workers CTEs so
    DuckDB sees exactly the model Spark sees. If the body has its own
    WITH clause, merge it into ours."""
    body = body_sql.strip()
    if body[:4].upper() == "WITH":
        body = "," + body[4:]
        return f"WITH tasks AS ({TASKS_SQL}), workers AS ({WORKERS_SQL}){body}"
    return f"WITH tasks AS ({TASKS_SQL}), workers AS ({WORKERS_SQL})\n{body}"


_TASK_VIEWS_REGISTERED: dict[tuple[str, int], str] = {}


def register_task_views(spark: SparkSession, sf_dir: str) -> None:
    """Register fixture views plus the derived tasks/workers views
    (cached per session while sf_dir is unchanged — keyed by CURRENT
    dir so switching fixture scales re-registers; see
    fixtures._REGISTERED)."""
    # temp views are SESSION-scoped, so the memo key must include the
    # session object (a sibling spark.newSession() shares the
    # applicationId but not the views); applicationId stays in the key
    # so a reused CPython id from a DEAD session in a new application
    # can't serve a stale hit
    key = (spark.sparkContext.applicationId, id(spark))
    if _TASK_VIEWS_REGISTERED.get(key) == sf_dir:
        return
    register_fixture_views(spark, sf_dir)
    spark.sql(TASKS_SQL).createOrReplaceTempView("tasks")
    spark.sql(WORKERS_SQL).createOrReplaceTempView("workers")
    _TASK_VIEWS_REGISTERED[key] = sf_dir


def tasks_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_task_views(spark, sf_dir)
    return spark.table("tasks")


def workers_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_task_views(spark, sf_dir)
    return spark.table("workers")


def write_tasks_table(spark: SparkSession, sf_dir: str, out_dir: str) -> None:
    """Materialize tasks partitioned by status — the Spark analogue of the
    reference's status-prefix keyspace (constants.go:5-15). A
    ``WHERE status = 'pending'`` on the result is served by partition
    pruning, exactly like the reference's prefix scan (SURVEY §4).
    """
    tasks_df(spark, sf_dir).write.mode("overwrite").partitionBy("status").parquet(out_dir)
