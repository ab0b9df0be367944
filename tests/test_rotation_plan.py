"""tools/rotation_plan.py must reproduce the committed round-12
derivation from the artifacts alone (cap 11), and its arithmetic must
stay consistent with the live registry as it grows -- assertions pin
the FORMULAS against the live constants, not snapshot values that a
future promotion would invalidate."""

from __future__ import annotations

import json
import subprocess
import sys


def _plan(cap: int) -> dict:
    out = subprocess.run(
        [sys.executable, "/root/repo/tools/rotation_plan.py", "--cap", str(cap)],
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
