from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from task_hive_spark.session import get_spark

    s = get_spark("pytest")
    yield s
    # unpersist the session-materialized indexes (signatures, bandings,
    # vocab) so a long pytest session releases its storage memory — the
    # teardown path materialize.clear_indexes exists for exactly this
    from task_hive_spark.materialize import clear_indexes

    clear_indexes(s)


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR


REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class VictimJVM:
    """Subprocess Spark driver for failover/resume tests: runs ``body``
    (sys.path bootstrapped to the repo) in its OWN process group so
    kill() SIGKILLs the py4j-spawned JVM atomically with the Python
    driver — killing only the driver leaves the JVM finishing an
    in-flight checkpoint or state write asynchronously while the
    takeover is already rewriting the same dirs (review finding r9).
    ONE harness shared by the lifecycle-takeover and sketch-resume
    tests so a fix here cannot diverge between them."""

    def __init__(self, body: str, log_path: str):
        import subprocess

        script = f"import sys; sys.path.insert(0, {REPO_ROOT!r})\n" + body
        self.log = open(log_path, "wb")
        self.proc = subprocess.Popen(
            [sys.executable, "-c", script],
            cwd=REPO_ROOT,
            stdout=self.log,
            stderr=subprocess.STDOUT,
            start_new_session=True,
        )

    def poll_until(self, predicate, desc: str, deadline_s: float = 180.0,
                   interval_s: float = 0.02) -> None:
        """Wait for ``predicate()``; fail fast (with the log path) if
        the victim exits first, fail at the deadline otherwise."""
        import time

        deadline = time.time() + deadline_s
        while time.time() < deadline:
            if predicate():
                return
            if self.proc.poll() is not None:
                raise AssertionError(
                    f"victim exited before {desc} — see {self.log.name}"
                )
            time.sleep(interval_s)
        raise AssertionError(f"victim never reached: {desc}")

    def kill(self) -> None:
        import signal

        try:
            os.killpg(self.proc.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        self.proc.wait()
        self.log.close()
