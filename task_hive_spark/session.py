"""SparkSession factory.

Local testing runs on local[N]; the configs below are chosen so the same
code scales to a multi-executor cluster: AQE for runtime re-planning
(skew joins, partition coalescing), UTC session timezone so results are
comparable against the DuckDB oracle, Arrow for the Python boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(app_name: str = "task_hive_spark", extra_conf: dict | None = None) -> SparkSession:
    """Build (or fetch) the SparkSession.

    At 100 TB scale the same settings apply, except shuffle partitions
    should track total cluster cores (AQE coalesces the excess) and
    ``spark.sql.files.maxPartitionBytes`` bounds scan-task size.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", DEFAULT_SHUFFLE_PARTITIONS)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # CPU-dense stages (md5 hashing, vector math) carry few bytes
        # per row; the 1m default lets AQE coalesce them onto 1-2 cores
        # (measured 3-4x slowdown on the dedup suite). 64k keeps those
        # stages cluster-wide; at real data sizes blocks are >>1m and
        # coalescing behaves identically either way.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # a 90-query session compiles far more than 100 distinct codegen
        # classes; the default cache evicts and hot queries silently
        # recompile (measured: same query 1.5s isolated vs 3.5s at the
        # tail of a long suite)
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # the K=128 MinHash signature aggregate carries 128 buffer
        # fields; the default maxFields=100 silently drops such plans
        # out of whole-stage codegen into interpreted aggregation
        # (measured 13.6s vs 2.0s on the signature build at sf0.1)
        .config("spark.sql.codegen.maxFields", "256")
        # Driver fixtures use parquet TIMESTAMP(NANOS); read as long and
        # convert to micros in sources.fixtures.load_table.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # Persistent catalog (plans/catalog.py): warehouse + derby
        # metastore pinned under the repo so saveAsTable works from any
        # cwd. enableHiveSupport uses pyspark's builtin Hive classes.
        .config("spark.sql.warehouse.dir", "/root/repo/.warehouse")
        .config("spark.driver.extraJavaOptions", "-Dderby.system.home=/root/repo/.derby")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    try:
        spark = builder.enableHiveSupport().getOrCreate()
    except Exception:
        # Hive classes unavailable: the in-memory session catalog still
        # serves partitioned saveAsTable with identical pruning.
        spark = builder.config("spark.sql.catalogImplementation", "in-memory").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
