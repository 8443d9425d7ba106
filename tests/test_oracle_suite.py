"""The whole declared query surface hash-matches the DuckDB oracle at
sf0.001 — the same comparison the driver's correctness gate runs at
sf0.01 (plans/oracle.py mirrors it)."""

from __future__ import annotations

from task_hive_spark.plans.oracle import run_all


def test_all_queries_match_oracle(spark, sf_dir):
    results = run_all(spark, sf_dir)
    assert results, "no queries registered"
    failures = [f"{r.name}: {r.detail}" for r in results if not r.ok]
    assert not failures, "oracle mismatches:\n" + "\n".join(failures)
