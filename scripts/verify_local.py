"""Run the full __spark_entry__ queries() vs oracle_sql() comparison
locally (mimics the driver's CORRECTNESS gate). Usage:

    python scripts/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from task_hive_spark.plans.oracle import run_all
from task_hive_spark.session import get_spark


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:] or None
    spark = get_spark("verify_local")
    results = run_all(spark, sf_dir, only=only)
    bad = 0
    for r in results:
        mark = "PASS" if r.ok else "FAIL"
        extra = f" [{r.detail}]" if r.detail else ""
        print(f"{mark} {r.name}: rows={r.spark_rows}/{r.oracle_rows}{extra}")
        for a, b in r.mismatches:
            print(f"    spark : {a[:200]}")
            print(f"    oracle: {b[:200]}")
        bad += 0 if r.ok else 1
    print(f"\n{len(results) - bad}/{len(results)} queries match")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
