#!/usr/bin/env python3
"""Assert driver-evidence freshness across CORRECTNESS_r0*.json ledgers.

The driver grades the first GRADING_WINDOW registered queries per round
(CORRECTNESS_r{N}.json). The rotation policy in ``__spark_entry__.py``
claims no query's latest driver grade is older than MAX_AGE rounds; this
script computes that age from the committed ledgers instead of trusting
the hand-maintained comment (which drifted in round 6 — 16 queries were
three rounds stale while the comment claimed two).

Usage:
    python scripts/evidence_age.py [--max-age 2] [--current-round N]

* ``--current-round`` defaults to (latest ledger round + 1), i.e. "the
  round being built now"; a query graded in the latest ledger has age 1.
* Queries present in ``queries()`` but never graded have age = inf and
  always fail the gate unless they are in the current front set (they
  will be graded this round).

Exit code 0 iff every registered query either (a) has evidence age
<= max-age, or (b) sits in the current front window (so it gets graded
when the driver next runs). Prints a per-age histogram and the offending
queries otherwise.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load_ledgers() -> dict[int, dict]:
    out: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            out[int(m.group(1))] = json.load(f)
    return out


def query_green(rec: dict) -> bool:
    if rec.get("err"):
        return False
    # hash_match may be absent for rows-only (non-SQL-expressible) checks
    checks = [rec.get("rows_match"), rec.get("schema_match"), rec.get("hash_match")]
    present = [c for c in checks if c is not None]
    return bool(present) and all(present)


def latest_grades(ledgers: dict[int, dict]) -> dict[str, tuple[int, bool]]:
    """query -> (latest round graded, green at that grading)."""
    latest: dict[str, tuple[int, bool]] = {}
    for rnd in sorted(ledgers):
        for name, rec in ledgers[rnd].items():
            latest[name] = (rnd, query_green(rec))
    return latest


def main() -> int:
    ap = argparse.ArgumentParser()
    # default: the steady-state bound. A 50-slot window over N queries
    # regrades each query every ceil(N/50) rounds at best, so with 149
    # registered queries "age <= 2" is structurally impossible — the
    # honest invariant is age <= ceil(N/window) with every older query
    # fronted for regrading. Pass --max-age to tighten.
    ap.add_argument("--max-age", type=int, default=None)
    ap.add_argument("--current-round", type=int, default=None)
    args = ap.parse_args()

    ledgers = load_ledgers()
    if not ledgers:
        print("no CORRECTNESS_r*.json ledgers found", file=sys.stderr)
        return 2
    latest_round = max(ledgers)
    current = (
        args.current_round if args.current_round is not None else latest_round + 1
    )

    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    registered = list(entry.queries().keys())
    window = entry.GRADING_WINDOW
    front = set(registered[:window])
    steady = -(-len(registered) // window)  # ceil(N/window)
    if args.max_age is None:
        args.max_age = steady

    grades = latest_grades(ledgers)

    ages: dict[str, float] = {}
    red: list[str] = []
    for name in registered:
        if name in grades:
            rnd, green = grades[name]
            ages[name] = current - rnd
            if not green:
                red.append(name)
        else:
            ages[name] = float("inf")

    hist: dict[float, int] = {}
    for a in ages.values():
        hist[a] = hist.get(a, 0) + 1
    print(f"ledgers: r{min(ledgers):02d}..r{latest_round:02d}; "
          f"current round = r{current:02d}; registered = {len(registered)}; "
          f"front window = {window}; steady-state bound = {steady} "
          f"(gating at max-age {args.max_age})")
    for a in sorted(hist):
        label = "never-graded" if a == float("inf") else f"age {int(a)}"
        print(f"  {label}: {hist[a]}")

    failures = []
    for name in registered:
        if ages[name] > args.max_age and name not in front:
            failures.append((name, ages[name]))
    if red:
        print(f"\nRED at latest grading ({len(red)}): {sorted(red)}")
    if failures:
        print(f"\nSTALE and not fronted (age > {args.max_age}, "
              f"{len(failures)} queries):")
        for name, a in sorted(failures, key=lambda t: (-t[1], t[0])):
            label = "never" if a == float("inf") else f"r{current - int(a):02d}"
            print(f"  {name}  (last graded: {label})")
        return 1
    stale_fronted = sorted(
        n for n in front if ages[n] > args.max_age
    )
    if stale_fronted:
        print(f"\nstale-but-fronted (will regrade this round): "
              f"{len(stale_fronted)}")
    if red:
        print(f"\nFAIL: {len(red)} queries red at their latest grading")
        return 1
    print(f"\nOK: every query is fresh (age <= {args.max_age})"
          " or fronted for regrading")
    return 0


if __name__ == "__main__":
    sys.exit(main())
