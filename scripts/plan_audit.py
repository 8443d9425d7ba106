"""Whole-surface physical-plan audit: run EVERY registered batch query
and flag scale anti-patterns in the executed plan.

Flags:
- BatchEvalPython      row-at-a-time Python UDF in the plan (the slow
                       path; only Arrow-batched surfaces are allowed)
- CartesianProduct     an unbounded cross join (broadcast-dim
                       crossJoins compile to BroadcastNestedLoopJoin,
                       which is allowed ONLY when one side is a
                       bounded scalar/stats dim — audited by row count)
- SinglePartition      Exchange SinglePartition feeding a NON-scalar
                       stage (scalar aggregates and final ORDER BY
                       collections are fine; a corpus funneling through
                       one task is not) — reported for eyeballing, not
                       failed, since boundedness needs the row counts

Usage: python scripts/plan_audit.py [query ...]
Prints one JSON line per flagged query and a summary line; exit 1 iff a
hard flag (BatchEvalPython / CartesianProduct) fired.

The streaming (st_*) queries execute through their own driver
(foreachBatch / stateful operators); their batch-visible result frame
is what gets audited here — the streaming plans themselves are covered
by tests/test_lifecycle.py.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

HARD = ("BatchEvalPython", "CartesianProduct")


def audit(spark, name: str, fn) -> dict | None:
    df = fn(spark, SF_DIR)
    df.write.format("noop").mode("overwrite").save()
    plan = df._jdf.queryExecution().executedPlan().toString()
    flags = sorted({p for p in HARD if p in plan})
    n_single = plan.count("Exchange SinglePartition")
    if not flags and n_single == 0:
        return None
    return {
        "query": name,
        "hard_flags": flags,
        "single_partition_exchanges": n_single,
    }


def check_window_bounds(spark) -> list[dict]:
    """Assert the row-bound invariants of the three DOCUMENTED
    single-partition windows (the benign WindowExec warnings in the
    bench tail). Each check measures the ACTUAL frame the operator
    feeds into its global window and compares against the documented
    bound — a refactor that silently unbounds one fails the audit exit
    code, not just a comment.

      1. sketch bottom-K merge  (sketches._bottom_k_hashes): the global
         window input is the salted partial stage's survivors,
         ≤ k·KMV_SALTS per side.
      2. DSIR top-K rank window (textops.txt_dsir_sample): the ACTUAL
         frame feeding the rank window (captured at plan-build time —
         textops._dsir_topk_input), which sits behind a LIMIT DSIR_K
         node; counting the query output instead would stay bounded
         even with the window lifted above the limit.
      3. worker slot window     (assign._worker_slots): spans the
         worker REGISTRY (control-plane sized), never a data table.
    """
    from pyspark.sql import functions as F

    from task_hive_spark.operators import assign, sketches, textops
    from task_hive_spark.sources.fixtures import load_table

    out = []
    ev = load_table(spark, SF_DIR, "events")
    for side in (sketches.THETA_SIDE_A, sketches.THETA_SIDE_B):
        n = sketches._bottom_k_partial(
            sketches._theta_side_hashes(ev, side), sketches.THETA_K
        ).count()
        out.append(
            {
                "window": f"sketches.bottom_k[{side}]",
                "rows": n,
                "bound": sketches.THETA_K * sketches.KMV_SALTS,
            }
        )
    out.append(
        {
            "window": "textops.dsir_rank",
            "rows": textops._dsir_topk_input(spark, SF_DIR).count(),
            "bound": textops.DSIR_K,
        }
    )
    out.append(
        {
            "window": "assign.worker_slots",
            "rows": assign._eligible_workers(spark, SF_DIR).count(),
            "bound": assign.WORKER_REGISTRY_MAX,
        }
    )
    for r in out:
        r["ok"] = r["rows"] <= r["bound"]
    return out


def main() -> int:
    from task_hive_spark.session import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("plan_audit")
    bounds = check_window_bounds(spark)
    for r in bounds:
        print(json.dumps({"window_bound": r}))
    qs = entrymod.queries()
    only = sys.argv[1:] or list(qs)
    bad = 0 if all(r["ok"] for r in bounds) else 1
    singles = 0
    for name in only:
        try:
            r = audit(spark, name, qs[name])
        except Exception as exc:  # surface, don't mask
            print(json.dumps({"query": name, "error": str(exc)[:200]}))
            bad += 1
            continue
        if r:
            print(json.dumps(r))
            if r["hard_flags"]:
                bad += 1
            singles += 1 if r["single_partition_exchanges"] else 0
    print(
        json.dumps(
            {
                "audited": len(only),
                "hard_flagged": bad,
                "with_single_partition_exchange": singles,
            }
        )
    )
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
