"""tools/rotation_plan.py must reproduce the committed round-12
derivation from the artifacts alone (cap 11), and its arithmetic must
stay consistent with the live registry as it grows -- assertions pin
the FORMULAS against the live constants, not snapshot values that a
future promotion would invalidate."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _plan(cap: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "rotation_plan.py"), "--cap", str(cap)],
        capture_output=True,
        text=True,
        check=True,
        timeout=120,
    )
    return json.loads(out.stdout)


def test_reproduces_round12_derivation():
    """With artifacts capped at round 11, the tool must derive exactly
    what round 12 committed: the 28-name r7 cohort mandatory, every
    never-registered... never-driver-verified name accounted, and the
    over-subscription forcing cheapest-first deferrals."""
    import __spark_entry__ as entrymod

    from tests.test_entry import _latest_green_rounds

    plan = _plan(cap=11)
    latest, max_round = _latest_green_rounds(cap=11)
    assert max_round == 11
    assert plan["planning_round"] == 12
    r7 = sorted(n for n, r in latest.items() if r == 7)
    assert plan["mandatory_head"] == r7
    names = set(entrymod.queries())
    never = sorted(names - set(latest))
    assert plan["never_verified"] == never
    assert plan["registry"] == len(names)
    # the arithmetic, not a snapshot: slots = window - forced names
    assert plan["slots_after_mandatory_and_never_verified"] == (
        plan["window"] - len(r7) - len(never)
    )
    if plan["slots_after_mandatory_and_never_verified"] < 0:
        k = -plan["slots_after_mandatory_and_never_verified"]
        assert len(plan["defer_cheapest_never_verified"]) == k
        assert set(plan["defer_cheapest_never_verified"]) <= set(never)


def test_horizon_is_strict():
    """A cohort exactly AT the next horizon is legal outside the
    window (the freshness invariant is latest < horizon): with cap 11
    and cycle 5, planning round 12 has next_horizon 8, and the
    41-name r8 cohort must NOT be mandatory."""
    from tests.test_entry import _latest_green_rounds

    plan = _plan(cap=11)
    assert plan["next_horizon"] == 8
    latest, _ = _latest_green_rounds(cap=11)
    r8 = {n for n, r in latest.items() if r == 8}
    assert not r8 & set(plan["mandatory_head"])


def test_following_round_head_matches_committed_leftovers():
    """round 15's addition: the plan emits the cohort sitting exactly
    AT the next horizon as `following_round_head` -- the block
    PRIORITY pre-orders after the window boundary. Against the
    committed round-15 frame (cap 14) it must reproduce the 49-name
    r11 ROTATION_LEFTOVERS verbatim, and it must equal the at-horizon
    cohort derived independently from the artifacts."""
    from tests.test_entry import ROTATION_LEFTOVERS, _latest_green_rounds

    plan = _plan(cap=14)
    assert plan["following_round_head"] == sorted(ROTATION_LEFTOVERS)
    latest, _ = _latest_green_rounds(cap=14)
    at_horizon = sorted(
        n for n, r in latest.items() if r == plan["next_horizon"]
    )
    assert plan["following_round_head"] == at_horizon


def _rotation_plan_module():
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import rotation_plan

    return rotation_plan


def test_at_horizon_cohort_heads_refresh_candidates():
    """The cohort exactly AT the next horizon is the oldest LEGAL
    refresh target (it goes stale one round later): candidate
    selection must start there (`>=`, not `>`), or the planner
    manufactures next-round over-subscription by refreshing younger
    cohorts while the at-horizon cohort ages out."""
    rp = _rotation_plan_module()
    cohorts = {9: ["a", "b", "c"], 10: ["d"], 11: ["e"]}
    secs = {"a": 1.0, "b": 3.0, "c": 2.0, "d": 9.0, "e": 9.0}
    got = rp.refresh_candidates(cohorts, next_horizon=9, free=2, secs=secs)
    # from the r9 cohort, heavier-first -- NOT the heavier r10/r11 names
    assert got == ["b", "c"]


def test_refresh_candidates_spill_across_cohorts():
    """When free slots exceed the at-horizon cohort's size the
    remainder spills into the following cohort (oldest-first),
    heavier-first within each."""
    rp = _rotation_plan_module()
    cohorts = {9: ["a"], 10: ["b", "c"], 11: ["d"]}
    secs = {"a": 0.1, "b": 1.0, "c": 2.0, "d": 9.0}
    got = rp.refresh_candidates(cohorts, next_horizon=9, free=3, secs=secs)
    assert got == ["a", "c", "b"]


def test_non_green_rows_do_not_refresh_cohort(tmp_path, monkeypatch):
    """A recorded FAILURE row must not count as a verification: the
    query stays in its previous cohort so the rotation re-schedules
    it. Applies to both the tool and the test_entry helper (shared
    convention)."""
    rp = _rotation_plan_module()
    (tmp_path / "CORRECTNESS_r01.json").write_text(
        json.dumps(
            {
                "ok_q": {"rows_match": True, "hash_match": True, "err": None},
                "bad_q": {"rows_match": True, "hash_match": True, "err": None},
            }
        )
    )
    (tmp_path / "CORRECTNESS_r02.json").write_text(
        json.dumps(
            {
                "bad_hash": {
                    "rows_match": True,
                    "hash_match": False,
                    "err": None,
                },
                "bad_q": {"rows_match": True, "hash_match": None, "err": "boom"},
                "rows_only": {
                    "rows_match": True,
                    "hash_match": None,
                    "err": None,
                },
            }
        )
    )
    monkeypatch.setattr(rp, "REPO", str(tmp_path))
    latest, max_round = rp.latest_green_rounds(cap=None)
    assert max_round == 2
    # failures don't refresh: bad_q stays at its r1 green, bad_hash is
    # never green; the rows-only (no-oracle) green DOES count
    assert latest == {"ok_q": 1, "bad_q": 1, "rows_only": 2}

    from tests.test_entry import _latest_green_rounds

    latest2, max2 = _latest_green_rounds(repo=str(tmp_path), cap=99)
    assert (latest2, max2) == (latest, max_round)
