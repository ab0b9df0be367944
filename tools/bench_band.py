#!/usr/bin/env python3
"""Mechanical per-query bench band check.

Every round's verdict asks the same question of a handful of flagged
queries: "is this reading inside the band of everything we've measured
before, or a real regression?" -- and every round answers it by hand,
from memory, against whichever artifacts happen to be open. This tool
makes the ritual mechanical: it collects every committed per-query
reading (BENCH_HISTORY/DETAIL_*.json full runs and targeted --only
re-measures, plus the driver's BENCH_r*.json artifacts, which carry
either a full ``queries`` map or the truncated ``queries_top``),
computes each query's historical band, and grades the subject run
(default: the canonical BENCH_DETAIL.json) against it.

Verdicts per query:
  IN    inside [min, max] padded by max(--pad-abs, --pad-frac * max)
  HIGH  above the padded band -- the regression candidates, the only
        rows that need a human (isolated re-measure, then diagnose or
        re-band)
  LOW   below the padded band -- wins (or measurement drift); listed
        for the record, never actionable
  NEW   no committed history -- first reading becomes the band

Padding exists because single readings are noisy (SCALE.md documents
±30% run-to-run on this box); the band is evidence, not a tripwire.
Exit code: 0 always (this is a report, not a gate -- HIGH rows feed
the round notes, they do not fail CI).

Usage: python tools/bench_band.py [--subject BENCH_DETAIL.json]
         [--pad-frac 0.3] [--pad-abs 0.25] [--all]
(default prints HIGH/NEW rows + a JSON summary line; --all prints
every row)
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _readings_from(payload: dict) -> dict[str, float]:
    """Per-query seconds from any bench artifact shape: a detail file
    (``queries``), a driver artifact (``parsed.queries`` or the
    truncated ``parsed.queries_top``), or a bare stdout-line dict."""
    if "parsed" in payload and isinstance(payload["parsed"], dict):
        payload = payload["parsed"]
    for key in ("queries", "queries_top"):
        q = payload.get(key)
        if isinstance(q, dict) and q:
            return {n: float(v) for n, v in q.items()}
    return {}


def collect_history(subject_path: str) -> dict[str, list[float]]:
    """Every committed reading per query, across BENCH_HISTORY details
    (full runs AND --only re-measures) and driver BENCH_r*.json
    artifacts. The subject file itself is excluded -- a run must not
    band-check against itself."""
    hist: dict[str, list[float]] = {}
    paths = sorted(glob.glob(os.path.join(REPO, "BENCH_HISTORY", "*.json")))
    paths += sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    subject_real = os.path.realpath(subject_path)
    for p in paths:
        if os.path.realpath(p) == subject_real:
            continue
        try:
            payload = json.load(open(p))
        except (json.JSONDecodeError, OSError):
            continue
        for name, v in _readings_from(payload).items():
            hist.setdefault(name, []).append(v)
    return hist


def grade(
    subject: dict[str, float],
    hist: dict[str, list[float]],
    pad_frac: float,
    pad_abs: float,
) -> dict[str, dict]:
    out = {}
    for name, v in sorted(subject.items()):
        past = hist.get(name)
        if not past:
            out[name] = {"value": v, "verdict": "NEW"}
            continue
        lo, hi = min(past), max(past)
        pad = max(pad_abs, pad_frac * hi)
        if v > hi + pad:
            verdict = "HIGH"
        elif v < lo - pad:
            verdict = "LOW"
        else:
            verdict = "IN"
        out[name] = {
            "value": v,
            "band": [round(lo, 3), round(hi, 3)],
            "n_readings": len(past),
            "verdict": verdict,
        }
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--subject", default=os.path.join(REPO, "BENCH_DETAIL.json")
    )
    ap.add_argument("--pad-frac", type=float, default=0.3)
    ap.add_argument("--pad-abs", type=float, default=0.25)
    ap.add_argument("--all", action="store_true")
    args = ap.parse_args()

    payload = json.load(open(args.subject))
    subject = _readings_from(payload)
    if not subject:
        print("bench_band: subject has no per-query readings", file=sys.stderr)
        return 2
    # provenance passthrough (round 15): the subject's own host-load
    # stamp and re-measured names, so a HIGH verdict is readable next
    # to the conditions that produced it without opening the artifact
    if "parsed" in payload and isinstance(payload["parsed"], dict):
        payload = payload["parsed"]
    load = payload.get("load") or {}
    remeasured = payload.get("remeasured") or []
    hist = collect_history(args.subject)
    graded = grade(subject, hist, args.pad_frac, args.pad_abs)

    counts: dict[str, int] = {}
    for name, g in graded.items():
        counts[g["verdict"]] = counts.get(g["verdict"], 0) + 1
        if args.all or g["verdict"] in ("HIGH", "NEW"):
            band = g.get("band")
            band_s = f"band [{band[0]}, {band[1]}] n={g['n_readings']}" if band else "no history"
            print(f"{g['verdict']:4s} {name:34s} {g['value']:7.2f}  {band_s}")
    print(
        json.dumps(
            {
                "metric": "bench_band",
                "subject": os.path.basename(args.subject),
                "counts": counts,
                "high": sorted(
                    n for n, g in graded.items() if g["verdict"] == "HIGH"
                ),
                "load": load,
                "remeasured": remeasured,
            },
            separators=(",", ":"),
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
