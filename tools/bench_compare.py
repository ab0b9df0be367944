#!/usr/bin/env python3
"""Round-over-round bench artifact diff.

Usage:
  python tools/bench_compare.py OLD.json NEW.json [--threshold 1.5]
      [--metric best|cold]

Reads two bench artifacts (BENCH_r{N}.json driver lines,
BENCH_DETAIL.json, or BENCH_HISTORY/DETAIL_*.json archives -- all
carry a "queries" map; detail/archive files also carry "stddev",
"noisy" and per-query first-attempt "cold" times) and prints per-query
deltas. --metric cold diffs the first-attempt times instead of
best-of-N (methodology/warm-up changes move the two differently; only
detail-file artifacts carry cold). Flags only changes that clear BOTH
gates:

  * ratio gate: new/old (or old/new) >= --threshold (default 1.5x);
  * noise gate: |new - old| > 3 * max(stddev_old, stddev_new) when
    stddevs are available -- a delta inside the run's own noise floor
    is reported but not flagged.

Queries named in either artifact's "noisy" list are annotated: their
numbers are gate-capped minimums the σ/mean gate could not stabilize
(see bench.py), so their deltas are environment, not plan, until a
clean run says otherwise.

Exit code: 0 always (this is a reading aid, not a CI gate -- the plan
budgets in tests/plan_budgets.json are the enforced regression check).
"""

from __future__ import annotations

import argparse
import json
import sys


def _load(path: str) -> dict:
    with open(path) as fh:
        text = fh.read()
    # three accepted shapes: BENCH_DETAIL.json (the payload itself), the
    # driver's BENCH_r{N}.json wrapper ({"parsed": <payload>, "tail":
    # <raw stdout>, ...}), or raw stdout with the payload as a line
    try:
        d = json.loads(text)
        if isinstance(d, dict):
            if "queries" in d or "queries_top" in d:
                return d
            p = d.get("parsed")
            if isinstance(p, dict) and ("queries" in p or "queries_top" in p):
                return p
            text = d.get("tail", "")
    except json.JSONDecodeError:
        pass
    for line in reversed([ln for ln in text.splitlines() if ln.strip()]):
        try:
            d = json.loads(line)
            if isinstance(d, dict) and ("queries" in d or "queries_top" in d):
                return d
        except json.JSONDecodeError:
            continue
    raise SystemExit(f"{path}: no bench JSON found")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--metric", choices=("best", "cold"), default="best")
    args = ap.parse_args()

    old, new = _load(args.old), _load(args.new)
    if args.metric == "cold":
        qo, qn = old.get("cold") or {}, new.get("cold") or {}
        if not qo or not qn:
            raise SystemExit(
                "--metric cold needs detail-file artifacts that carry a "
                "'cold' map (BENCH_DETAIL.json / BENCH_HISTORY archives "
                "from round 10 on)"
            )
        # cold times are SINGLE samples -- the best-of-3 stddev maps
        # describe a different (warm) distribution and would mis-gate;
        # cold deltas run ungated and the output says so
        so, sn = {}, {}
        print(
            "note: cold deltas are single-sample, ungated by the warm "
            "stddev noise floor -- expect JVM/page-cache jitter"
        )
    else:
        qo = old.get("queries") or old.get("queries_top") or {}
        qn = new.get("queries") or new.get("queries_top") or {}
        so, sn = old.get("stddev", {}), new.get("stddev", {})
    noisy = set(old.get("noisy", [])) | set(new.get("noisy", []))

    common = sorted(set(qo) & set(qn))
    flagged, moved = [], []
    for name in common:
        a, b = qo[name], qn[name]
        if a <= 0 or b <= 0:
            continue
        ratio = b / a
        sigma = max(so.get(name, 0.0), sn.get(name, 0.0))
        beyond_noise = abs(b - a) > 3 * sigma if sigma else True
        if max(ratio, 1 / ratio) >= args.threshold and beyond_noise:
            flagged.append((name, a, b, ratio))
        elif max(ratio, 1 / ratio) >= args.threshold:
            moved.append((name, a, b, ratio, sigma))

    to = sum(qo[n] for n in common)
    tn = sum(qn[n] for n in common)
    print(
        f"common queries: {len(common)}  "
        f"total {to:.1f}s -> {tn:.1f}s ({(tn - to) / to:+.0%} vs old)"
        if to
        else "no common queries"
    )
    print(
        f"only-old: {sorted(set(qo) - set(qn))or '-'}  "
        f"only-new: {sorted(set(qn) - set(qo)) or '-'}"
    )
    if flagged:
        print(f"\nflagged (>= {args.threshold}x beyond 3-sigma noise):")
        for name, a, b, r in sorted(flagged, key=lambda x: -x[3]):
            mark = " [NOISY]" if name in noisy else ""
            print(f"  {name:36s} {a:8.2f} -> {b:8.2f}  ({r:.2f}x){mark}")
    else:
        print("\nno deltas clear both gates")
    if moved:
        print("\nwithin-noise movements (>= threshold but inside 3-sigma):")
        for name, a, b, r, s in sorted(moved, key=lambda x: -x[3]):
            print(f"  {name:36s} {a:8.2f} -> {b:8.2f}  ({r:.2f}x, sigma {s:.2f})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
