"""StructTypes for the task-hive data model (SURVEY §1.4).

Reference model: /root/reference/model/model.go:11-22 (Task),
worker record tasks/worker.go:21-27, status enum common/constants.go:37-46.
Status is stored as its string form; the composite processing key
``{workerID}/{taskID}`` (common/constants.go:8) is normalized into a
nullable ``worker_id`` column.
"""

from __future__ import annotations

from pyspark.sql import types as T

# model/model.go:11-22 → columnar task row
TASK_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("payload", T.StringType(), True),
        T.StructField("priority", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("create_time", T.TimestampType(), False),
        T.StructField("retry_count", T.IntegerType(), False),
        T.StructField("retry_delay_ns", T.LongType(), False),
        T.StructField("result", T.StringType(), True),
        T.StructField("error", T.StringType(), True),
        T.StructField("type", T.StringType(), False),
        T.StructField("worker_id", T.StringType(), True),
        T.StructField("update_time", T.TimestampType(), False),
    ]
)

# tasks/worker.go:21-27 → worker registry row
WORKER_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("lease_id", T.LongType(), False),
        T.StructField("task_count", T.IntegerType(), False),
        T.StructField("last_heartbeat", T.TimestampType(), False),
        T.StructField("capacity", T.IntegerType(), False),
    ]
)

# model/model.go:25-29 WechatTask — the nested payload document
WECHAT_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("row_id", T.IntegerType(), True),
        T.StructField("row_data", T.ArrayType(T.StringType()), True),
    ]
)

# Lifecycle event stream (FIXTURES.md §4; txn sites cited there)
TASK_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_time", T.TimestampType(), False),
        T.StructField("op", T.StringType(), False),
        T.StructField("task_id", T.StringType(), True),
        T.StructField("worker_id", T.StringType(), True),
        T.StructField("task_json", T.StringType(), True),
    ]
)

# Status enum, common/constants.go:37-46
TASK_STATUSES = ["pending", "processing", "completed", "failed", "delayed"]

# Multimodal asset column group (binary payload + typed metadata);
# decode stages are stubbed — see operators/multimodal.py.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("format", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)
