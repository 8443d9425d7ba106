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
