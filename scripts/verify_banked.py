"""Value-check the BANKED query surface (held-out oracles, not yet in
the driver's queries()/oracle_sql() maps) at any fixture scale — the
formalization of the ad-hoc sf1 addendum runs. Usage:

    python scripts/verify_banked.py [sf_dir] [name ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from task_hive_spark.plans.oracle import compare, duckdb_conn
from task_hive_spark.session import get_spark

import __spark_entry__ as entrymod


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    surface = entrymod.banked()
    only = sys.argv[2:] or sorted(surface)
    registered = set(entrymod.queries())
    overlap = registered & set(surface)
    if overlap:
        print(f"WARNING: banked names already registered: {sorted(overlap)}")
    spark = get_spark("verify_banked")
    bad = 0
    for name in only:
        if name not in surface:
            print(f"SKIP {name}: not a banked query")
            continue
        fn, osql = surface[name]
        t0 = time.time()
        r = compare(name, fn(spark, sf_dir), duckdb_conn(sf_dir), osql)
        mark = "PASS" if r.ok else "FAIL"
        extra = f" [{r.detail}]" if r.detail else ""
        print(f"{mark} {name}: rows={r.spark_rows}/{r.oracle_rows}"
              f" {time.time() - t0:.1f}s{extra}")
        bad += 0 if r.ok else 1
    print(f"\n{len(only) - bad}/{len(only)} banked queries match")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
