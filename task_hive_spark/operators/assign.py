"""Task↔worker assignment — the reference's one join semantics (J1).

The reference greedily binds each pending task to a worker chosen by one
of three load-balancing strategies (dispatcher.go:515-610, strategies
:554-569: least-tasks, round-robin, random). The deterministic batch
form (SURVEY §2.3): rank pending tasks by (priority DESC, id) — the
dispatch order W2 — rank eligible workers per strategy, and equi-join on
``task_rank % worker_count = worker_slot``.

Scale shape: the workers side is tiny (a registry), so the slot join is
a **broadcast hash join** — no shuffle of the task table beyond the
global rank. The global row_number() is the one inherently serial piece
(single-partition window), same as the reference's single dispatcher
loop; for a 100 TB task backlog you'd dispatch per partition-group
(e.g. rank within priority band) — provided here as
``assign_partitioned`` which needs no global window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from task_hive_spark.operators.taskmodel import oracle_cte, register_task_views

STRATEGIES = ("least_tasks", "round_robin", "random")


def _eligible_workers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity gate P2 (dispatcher.go:542-544) + clamp P6."""
    register_task_views(spark, sf_dir)
    w = spark.table("workers").withColumn("task_count", F.greatest("task_count", F.lit(0)))
    return w.where(~((F.col("capacity") > 0) & (F.col("task_count") >= F.col("capacity"))))


def _worker_slots(workers: DataFrame, strategy: str) -> DataFrame:
    """Number eligible workers 0..n-1 in strategy order.

    least_tasks: argmin-by-load order (A3, dispatcher.go:613-633).
    round_robin: id order — the cursor's stable cycle (dispatcher.go:636-644).
    random: portable seeded shuffle via md5(id) (the reference uses
    rand.Intn, dispatcher.go:566; seeded hash keeps the oracle exact).
    """
    if strategy == "least_tasks":
        order = [F.col("task_count").asc(), F.col("id").asc()]
    elif strategy == "round_robin":
        order = [F.col("id").asc()]
    elif strategy == "random":
        order = [F.md5(F.concat(F.lit("seed42-"), "id")).asc(), F.col("id").asc()]
    else:
        raise ValueError(f"unknown strategy: {strategy}")
    w = W.orderBy(*order)
    return workers.select(
        F.col("id").alias("worker_id"),
        (F.row_number().over(w) - 1).alias("slot"),
    )


def assign(spark: SparkSession, sf_dir: str, strategy: str = "least_tasks") -> DataFrame:
    """J1 deterministic batch assignment: pending tasks in dispatch order
    (priority DESC, id — W2) joined onto strategy-ordered worker slots by
    rank modulo. Worker side is broadcast (a handful of rows vs the task
    backlog)."""
    register_task_views(spark, sf_dir)
    tasks = spark.table("tasks").where(F.col("status") == "pending")
    workers = _worker_slots(_eligible_workers(spark, sf_dir), strategy)
    n = F.lit(workers.count())

    rank_w = W.orderBy(F.desc("priority"), F.asc("id"))
    ranked = tasks.select(
        F.col("id").alias("task_id"),
        "priority",
        (F.row_number().over(rank_w) - 1).alias("task_rank"),
    )
    return (
        ranked.withColumn("slot", F.col("task_rank") % n)
        .join(F.broadcast(workers), "slot")
        .select("task_id", "priority", "task_rank", "worker_id")
        .orderBy("task_rank")
    )


def assign_partitioned(spark: SparkSession, sf_dir: str, strategy: str = "round_robin") -> DataFrame:
    """Scale-path variant: rank within each priority band instead of one
    global window, so the window shuffles by priority and parallelizes.
    Slot = hash-free deterministic (priority, rank-in-band) cycle."""
    register_task_views(spark, sf_dir)
    tasks = spark.table("tasks").where(F.col("status") == "pending")
    workers = _worker_slots(_eligible_workers(spark, sf_dir), strategy)
    n = F.lit(workers.count())

    band_w = W.partitionBy("priority").orderBy("id")
    ranked = tasks.select(
        F.col("id").alias("task_id"),
        "priority",
        (F.row_number().over(band_w) - 1).alias("band_rank"),
    )
    return (
        ranked.withColumn("slot", (F.col("band_rank") + F.col("priority")) % n)
        .join(F.broadcast(workers), "slot")
        .select("task_id", "priority", "band_rank", "worker_id")
        .orderBy("priority", "band_rank")
    )


def th_assign_least_tasks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assign(spark, sf_dir, "least_tasks")


def th_assign_round_robin(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assign(spark, sf_dir, "round_robin")


def th_assign_random(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assign(spark, sf_dir, "random")


def th_assign_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    return assign_partitioned(spark, sf_dir, "round_robin")


def th_assignment_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-assignment load distribution — workers' new task counts
    (the CAS counter A5 outcome, worker.go:168-226, as a batch agg)."""
    a = assign(spark, sf_dir, "round_robin")
    return a.groupBy("worker_id").agg(F.count("*").alias("assigned")).orderBy("worker_id")


QUERIES = {
    "th_assign_least_tasks": th_assign_least_tasks,
    "th_assign_round_robin": th_assign_round_robin,
    "th_assign_random": th_assign_random,
    "th_assign_banded": th_assign_banded,
    "th_assignment_load": th_assignment_load,
}

_ELIGIBLE = """
  SELECT id, GREATEST(task_count, 0) AS task_count FROM workers
  WHERE NOT (capacity > 0 AND GREATEST(task_count, 0) >= capacity)
"""


def _assign_sql(worker_order: str) -> str:
    return oracle_cte(
        f"""
        WITH eligible AS ({_ELIGIBLE}),
        slots AS (
          SELECT id AS worker_id,
                 ROW_NUMBER() OVER (ORDER BY {worker_order}) - 1 AS slot
          FROM eligible
        ),
        ranked AS (
          SELECT id AS task_id, priority,
                 ROW_NUMBER() OVER (ORDER BY priority DESC, id) - 1 AS task_rank
          FROM tasks WHERE status = 'pending'
        )
        SELECT task_id, priority, task_rank, worker_id
        FROM ranked JOIN slots
          ON ranked.task_rank % (SELECT COUNT(*) FROM eligible) = slots.slot
        ORDER BY task_rank
        """
    )


ORACLES = {
    "th_assign_least_tasks": _assign_sql("task_count ASC, id ASC"),
    "th_assign_round_robin": _assign_sql("id ASC"),
    "th_assign_random": _assign_sql("md5('seed42-' || id) ASC, id ASC"),
    "th_assign_banded": oracle_cte(
        f"""
        WITH eligible AS ({_ELIGIBLE}),
        slots AS (
          SELECT id AS worker_id, ROW_NUMBER() OVER (ORDER BY id ASC) - 1 AS slot
          FROM eligible
        ),
        ranked AS (
          SELECT id AS task_id, priority,
                 ROW_NUMBER() OVER (PARTITION BY priority ORDER BY id) - 1 AS band_rank
          FROM tasks WHERE status = 'pending'
        )
        SELECT task_id, priority, band_rank, worker_id
        FROM ranked JOIN slots
          ON (ranked.band_rank + ranked.priority) % (SELECT COUNT(*) FROM eligible) = slots.slot
        ORDER BY priority, band_rank
        """
    ),
    "th_assignment_load": oracle_cte(
        f"""
        WITH eligible AS ({_ELIGIBLE}),
        slots AS (
          SELECT id AS worker_id, ROW_NUMBER() OVER (ORDER BY id ASC) - 1 AS slot
          FROM eligible
        ),
        ranked AS (
          SELECT id AS task_id,
                 ROW_NUMBER() OVER (ORDER BY priority DESC, id) - 1 AS task_rank
          FROM tasks WHERE status = 'pending'
        )
        SELECT worker_id, COUNT(*) AS assigned
        FROM ranked JOIN slots
          ON ranked.task_rank % (SELECT COUNT(*) FROM eligible) = slots.slot
        GROUP BY worker_id ORDER BY worker_id
        """
    ),
}
