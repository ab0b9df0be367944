#!/usr/bin/env python3
"""Derive the next round's driver-window composition mechanically.

Each round spends session time re-deriving the same arithmetic by
hand: which cohort sits at the freshness horizon (mandatory head),
which names have never been driver-verified (must be in-window or a
documented deferral), how many slots remain for refreshes, and which
refresh candidates are heaviest. Every one of those answers is a pure
function of the committed CORRECTNESS_r*.json artifacts, the live
registry, and the bench history -- so this tool computes them and
prints a PRIORITY-ready plan. The session's job shrinks to choosing
what to do with the FREE slots (and writing the tests that pin the
choice), not recomputing what is forced.

No SparkSession is needed: the registry import only registers plan
callables.

Usage: python tools/rotation_plan.py [--cap N] [--window 50]
  --cap N   consider artifacts from rounds <= N (default: the highest
            round present -- i.e. plan the round AFTER the last one on
            disk). When planning at mid-round (the driver's artifact
            not yet written), pass the committed round explicitly.
"""

from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_green_rounds(cap: int | None) -> tuple[dict[str, int], int]:
    latest: dict[str, int] = {}
    max_round = 0
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)", os.path.basename(path)).group(1))
        if cap is not None and rnd > cap:
            continue
        rows = json.load(open(path))
        if rows:
            max_round = max(max_round, rnd)
        for name, row in rows.items():
            # only a GREEN row counts as a verification: a recorded
            # failure (err set, or rows/hash explicitly False) must
            # leave the query in its previous cohort so the rotation
            # re-schedules it rather than silently marking it fresh.
            # rows-only checks (no oracle) record hash_match=None --
            # those still count when err is empty and rows_match holds.
            # Non-dict rows (legacy/malformed artifacts) are treated as
            # green-by-name, mirroring tests/test_entry.py's
            # _latest_green_rounds -- the two implementations of the
            # green-row convention must stay behaviorally identical
            # (ADVICE r13) -- but LOUDLY (ADVICE r14): a corrupted row
            # marking a query freshly verified should be visible in the
            # plan output, not silently deferred a full cycle.
            if not isinstance(row, dict):
                print(
                    f"rotation_plan: WARNING non-dict row for {name!r} in "
                    f"{os.path.basename(path)} counted green-by-name",
                    file=sys.stderr,
                )
            if isinstance(row, dict):
                if row.get("err"):
                    continue
                if (
                    row.get("rows_match") is False
                    or row.get("hash_match") is False
                ):
                    continue
            latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round


def refresh_candidates(
    cohorts: dict[int, list[str]],
    next_horizon: int,
    free: int,
    secs: dict[str, float],
) -> list[str]:
    """Pick `free` refresh names, oldest cohort first, heavier-first
    within a cohort. The cohort exactly AT the next horizon is the
    oldest LEGAL refresh target (it goes stale one round later), so it
    heads the candidates -- `>=`, not `>`. When free slots exceed one
    cohort's size the remainder spills into the following cohort."""

    def heavier_first(names):
        return sorted(names, key=lambda n: (-secs.get(n, 0.0), n))

    candidates: list[str] = []
    for rnd in sorted(r for r in cohorts if r >= next_horizon):
        if len(candidates) >= free:
            break
        candidates += heavier_first(cohorts[rnd])[: free - len(candidates)]
    return candidates


def mean_bench_seconds() -> dict[str, float]:
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import bench_band

    hist = bench_band.collect_history(subject_path="__none__")
    return {n: sum(v) / len(v) for n, v in hist.items() if v}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cap", type=int, default=None)
    ap.add_argument("--window", type=int, default=50)
    args = ap.parse_args()

    sys.path.insert(0, REPO)
    from clueso_spark.plans.catalog import all_queries

    registry = list(all_queries())
    latest, max_round = latest_green_rounds(args.cap)
    cycle = math.ceil(len(registry) / args.window)
    horizon = max_round - (cycle - 1)
    planning_round = max_round + 1

    cohorts: dict[int, list[str]] = {}
    for n in registry:
        cohorts.setdefault(latest.get(n, 0), []).append(n)
    never = sorted(cohorts.pop(0, []))
    secs = mean_bench_seconds()

    # mandatory: every cohort strictly BELOW the next round's horizon
    # (a green exactly AT the horizon is still legal outside the
    # window -- tests/test_entry.py's freshness invariant is
    # `latest < horizon` -> stale). After the planned round lands,
    # max_round advances by one, so the horizon does too.
    next_horizon = planning_round - (cycle - 1)
    mandatory: list[str] = []
    for rnd in sorted(cohorts):
        if rnd < next_horizon:
            mandatory += sorted(cohorts[rnd])
    plan: dict[str, object] = {
        "planning_round": planning_round,
        "registry": len(registry),
        "window": args.window,
        "cycle_rounds": cycle,
        "current_horizon": horizon,
        "next_horizon": next_horizon,
        "cohort_sizes": {f"r{r}": len(v) for r, v in sorted(cohorts.items())},
        "mandatory_head": mandatory,
        "never_verified": never,
        # the cohort sitting exactly AT the next horizon: legal to
        # defer this round, but it becomes the FOLLOWING round's
        # mandatory head -- i.e. the ROTATION_LEFTOVERS block that
        # PRIORITY pre-orders immediately after the window boundary.
        # Emitting it here makes the round-opening edit fully
        # mechanical (no hand-derivation of the post-boundary list).
        "following_round_head": sorted(cohorts.get(next_horizon, [])),
    }
    used = len(mandatory) + len(never)
    free = args.window - used
    plan["slots_after_mandatory_and_never_verified"] = free
    if free < 0:
        # the window cannot fit its obligations: the never-verified
        # overflow must defer (cheapest-first precedent) with a pinned
        # next-round-headship obligation
        overflow = sorted(never, key=lambda n: (secs.get(n, 0.0), n))[
            : -free
        ]
        plan["defer_cheapest_never_verified"] = overflow
        plan["note"] = (
            "window over-subscribed: defer the listed never-verified "
            "names (cheapest-first) and pin their next-round headship "
            "in tests/test_entry.py"
        )
    elif free > 0:
        plan["refresh_candidates_heavier_first"] = refresh_candidates(
            cohorts, next_horizon, free, secs
        )
    print(json.dumps(plan, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
