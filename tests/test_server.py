"""HTTP serving layer (server.py): start a real TaskHiveServer over a
drained facade instance, hit all five routes with urllib, and diff the
bodies against independently-computed projections of the same facade
state — the reference's api/server.go contract (default limit 100, 400
on empty ids, 404 on a missing task, 500 on an unknown status)."""

from __future__ import annotations

import json
import urllib.error
import urllib.request

import pytest
from pyspark.sql import functions as F

from task_hive_spark.api import TaskHive, TaskHiveConfig
from task_hive_spark.operators.processors import process_custom_task
from task_hive_spark.server import (
    TaskHiveServer,
    _task_obj,
    tasks_body,
    workers_body,
)


def _get(url: str) -> tuple[int, str]:
    try:
        with urllib.request.urlopen(url, timeout=60) as r:
            return r.status, r.read().decode("utf-8")
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode("utf-8")


@pytest.fixture(scope="module")
def served(spark):
    th = TaskHive(spark, TaskHiveConfig(worker_count=2, strategy="round_robin"))
    th.register_task_processor("custom", process_custom_task)
    th.submit_task(
        *[
            {"id": f"srv-{i}", "type": "custom", "payload": "{}", "priority": i % 3}
            for i in range(7)
        ],
        # unknown type → converges failed, so stats cover >1 status
        {"id": "srv-odd", "type": "mystery", "payload": "{}"},
    )
    th.start()
    srv = TaskHiveServer(th)
    base = srv.start()
    yield th, base
    srv.stop()
    th.close()


def test_stats_route_matches_facade(served):
    th, base = served
    code, body = _get(f"{base}/api/stats")
    assert code == 200
    assert body == json.dumps(th.get_task_stats(), separators=(",", ":"))
    parsed = json.loads(body)
    assert parsed["total"] == 8
    assert list(parsed.keys()) == [
        "pending", "processing", "completed", "failed", "delayed", "total",
    ]


def test_list_tasks_route_matches_facade(served):
    th, base = served
    # named status: the pruned list in id order
    code, body = _get(f"{base}/api/tasks?status=completed")
    assert code == 200
    expected = (
        "[" + ",".join(r.obj for r in _task_obj(th.list_tasks("completed", 100)).collect()) + "]"
    )
    assert body == expected
    # every body element is valid JSON with the Go TaskInfo field order
    objs = json.loads(body)
    assert [o["id"] for o in objs] == sorted(o["id"] for o in objs)
    assert list(objs[0].keys()) == [
        "id", "payload", "priority", "status", "worker_id",
        "retry_count", "create_time", "update_time",
    ]
    # all-statuses branch: five lists concatenated status-major, truncated
    code, body = _get(f"{base}/api/tasks?limit=3")
    assert code == 200
    assert body == tasks_body(th, "", 3)
    assert len(json.loads(body)) == 3
    # non-positive / garbage limits fall back to the default 100
    assert _get(f"{base}/api/tasks?limit=-5")[1] == _get(f"{base}/api/tasks")[1]
    assert _get(f"{base}/api/tasks?limit=bogus")[1] == _get(f"{base}/api/tasks")[1]


def test_point_get_route_and_404(served):
    th, base = served
    code, body = _get(f"{base}/api/tasks/srv-3")
    assert code == 200
    row = json.loads(body)
    assert row["id"] == "srv-3" and row["status"] == "completed"
    # body equals the facade projection byte-for-byte
    expected = _task_obj(
        th._tasks().where(F.col("id") == "srv-3")
    ).collect()[0].obj
    assert body == expected
    code, body = _get(f"{base}/api/tasks/no-such-task")
    assert code == 404
    assert body == "任务 no-such-task 不存在\n"


def test_workers_routes(served):
    th, base = served
    code, body = _get(f"{base}/api/workers")
    assert code == 200
    assert body == workers_body(th)
    workers = json.loads(body)
    assert len(workers) == 2
    assert list(workers[0].keys()) == [
        "id", "lease_id", "task_count", "last_heartbeat", "capacity", "is_active",
    ]
    # per-worker inbox: batch drain leaves no in-flight rows at rest
    code, body = _get(f"{base}/api/workers/worker-0")
    assert code == 200
    assert body == "[]"


def test_error_paths(served):
    _, base = served
    code, body = _get(f"{base}/api/tasks?status=bogus")
    assert code == 500
    assert body == "无效的任务状态: bogus\n"
    assert _get(f"{base}/api/nope")[0] == 404


def test_config_api_port_launches_server_on_start(spark):
    """Reference parity: Start() launches the API server alongside the
    dispatcher (taskhive.go:167-173) — api_port in the config does the
    same here (port 0 = free port), and stop() shuts it down."""
    th = TaskHive(
        spark, TaskHiveConfig(worker_count=1, api_port=0)
    )
    th.register_task_processor("custom", process_custom_task)
    th.submit_task({"id": "cfg-1", "type": "custom", "payload": "{}"})
    th.start()
    base = th.serve()  # already running: returns the live address
    code, body = _get(f"{base}/api/stats")
    assert code == 200 and json.loads(body)["total"] == 1
    th.stop()
    with pytest.raises(Exception):
        _get(f"{base}/api/stats")
    th.close()
