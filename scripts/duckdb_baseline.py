"""DuckDB baseline for the bench HEADLINE queries — reproduces the
judge's ratio table (BASELINE.md contract: Spark ≤ 2× DuckDB, same sf)
in-repo so envelope regressions are measurable per round, not just at
judging time.

Times each headline query's ORACLE SQL in a warm DuckDB session
(best-of-N, same methodology bench.py uses for the Spark side) and, if
a bench JSON file is given, prints the per-query ratio table.

    python scripts/duckdb_baseline.py [sf_dir] [bench.json]

Prints one JSON line: {"metric": "duckdb_baseline_seconds", ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_RUNS = 3


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    bench_path = sys.argv[2] if len(sys.argv) > 2 else None

    from bench import HEADLINE
    import __spark_entry__ as entrymod
    from task_hive_spark.plans.oracle import duckdb_conn

    oracles = entrymod.oracle_sql()
    con = duckdb_conn(sf_dir)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        sql = oracles.get(name)
        if sql is None:
            continue
        con.execute(sql).fetchall()  # warm (plans, buffer pool)
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)

    out = {
        "metric": "duckdb_baseline_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf_dir": sf_dir,
    }
    if bench_path:
        with open(bench_path) as f:
            bench = json.load(f)
        spark_q = bench.get("parsed", bench).get("queries", {})
        out["ratios"] = {
            k: round(spark_q[k] / v, 2)
            for k, v in timings.items()
            if k in spark_q and v > 0
        }
        # both sides restricted to the SAME query set — a headline query
        # missing from the bench JSON must drop out of the denominator
        # too, or the ratio understates Spark's true cost
        tot_spark = sum(v for k, v in spark_q.items() if k in timings)
        tot_duck = sum(v for k, v in timings.items() if k in spark_q)
        out["suite_ratio"] = round(tot_spark / max(tot_duck, 1e-9), 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
