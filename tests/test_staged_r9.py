"""Parity gate for the round-8 STAGED operators (plans/staged_r9.py).

Runs the exact driver comparison -- row count + schema + order-
insensitive value hash against the DuckDB oracle -- at sf0.001 and
sf0.01, so each staged query is proven green BEFORE round 9 promotes it
into the registry and the driver's verification window (the same
life-cycle staged_r6 ran through rounds 5 -> 6 and staged_r8 through
rounds 7 -> 8).
"""

from __future__ import annotations

import pytest

from clueso_spark.plans.parity import compare, duckdb_connect
from clueso_spark.plans.staged_r9 import STAGED, promote

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_parity(spark, name, sf_dir):
    cq = STAGED[name]
    df = cq.spark(spark, sf_dir)
    if cq.oracle_valid is not None and not cq.oracle_valid(sf_dir):
        assert df.count() >= 0
        return
    con = duckdb_connect(sf_dir)
    res = compare(name, df, cq.oracle, con)
    assert res.ok, (name, res.detail)


def test_staged_rows_nonempty(spark):
    """Every staged query returns at least one row at sf0.01 (the
    driver's smoke bar for registered queries)."""
    for name, cq in sorted(STAGED.items()):
        assert cq.spark(spark, SF_DIRS[1]).count() > 0, name


def test_staged_plan_shapes(spark):
    """No staged plan contains a CartesianProduct, and the only
    BroadcastNestedLoopJoins are the sanctioned 1-row scalar
    broadcasts (BM25's corpus totals)."""
    sanctioned_bnlj = {
        "txt_bm25_topk",  # 1-row totals broadcast x2
        # 20x20 source-pair inequality join (both sides ~|sources| rows;
        # the corpus-sized signature joins are broadcast equi-joins)
        "sim_source_jaccard_bottomk",
    }
    for name, cq in sorted(STAGED.items()):
        plan = cq.spark(spark, SF_DIRS[1])._jdf.queryExecution().toString()
        assert "CartesianProduct" not in plan, (name, plan)
        if name not in sanctioned_bnlj:
            assert "BroadcastNestedLoopJoin" not in plan, (name, plan)


def test_streaks_windows_are_user_partitioned(spark):
    """ev_activity_streaks' gaps-and-islands row_number must be
    partitioned by user_id -- a global window here would serialize the
    whole corpus through one task at 100 TB."""
    plan = (
        STAGED["ev_activity_streaks"]
        .spark(spark, SF_DIRS[1])
        ._jdf.queryExecution()
        .toString()
    )
    assert "row_number" in plan
    import re

    for frag in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert "user_id" in frag, frag


def test_staging_is_not_live():
    """Honesty guard: no staged name is registered until round 9
    executes the promotion -- __spark_entry__.queries() must stay a
    list of driver-verifiable claims. promote() itself is exercised
    against the live registry and rolled back."""
    from clueso_spark.plans.catalog import REGISTRY, all_queries

    live = all_queries()
    overlap = sorted(set(STAGED) & set(live))
    assert overlap == [], overlap
    try:
        promote()
        assert set(STAGED) <= set(REGISTRY)
    finally:
        for name in STAGED:
            REGISTRY.pop(name, None)
    assert not set(STAGED) & set(REGISTRY)
