"""AQE skew-join engagement pin (SCALE.md hot-key suite follow-up).

Round-4's skew harness measured only a modest win from
``spark.sql.adaptive.skewJoin`` and could not confirm the split engaged.
These tests pin the WHY, empirically, on this Spark version (4.1.x):

* the split DOES engage -- ``SortMergeJoin(skew=true)`` with
  ``AQEShuffleRead skewed`` readers -- when the skewed SMJ is
  stage-final, i.e. its output feeds the result stage directly with no
  further Exchange above it in the same stage;
* it does NOT engage when a fused consumer puts another Exchange above
  the join (partial aggregate -> exchange, or an explicit repartition),
  even with ``spark.sql.adaptive.forceOptimizeSkewedJoin`` -- which is
  exactly the harness's join->groupBy shape, and why the measured
  ranking there (reshape > manual hot-key split > salting > AQE) holds.

The finalized adaptive plan is only inspectable on the DataFrame's own
QueryExecution, so the tests materialize via collect() (the result is
kept tiny with a non-pushable both-sides filter / a global count).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

#: small enough for test speed; the skew threshold is scaled to match so
#: the hot partition (50% of rows on one key) still qualifies
N_ROWS = 2_000_000
N_KEYS = 50_000

SKEW_CONFS = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1m",
}


@pytest.fixture()
def skew_conf(spark):
    saved = {}
    for k, v in SKEW_CONFS.items():
        try:
            saved[k] = spark.conf.get(k)
        except Exception:
            saved[k] = None
        spark.conf.set(k, v)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    yield
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")


def _skewed_relations(spark):
    ev = spark.range(N_ROWS).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.pmod(F.col("id"), N_KEYS))
        .alias("user_id"),
        F.col("id").alias("event_id"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("user_id"), F.pmod("id", F.lit(10)).alias("seg")
    )
    return ev, dim


def _finalized_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    return plan.split("== Initial Plan ==")[0]


def test_skew_join_split_engages_on_stage_final_join(spark, skew_conf):
    """One hot key owning 50% of the fact side must trigger the AQE
    skew split when the SMJ is stage-final: the finalized plan carries
    SortMergeJoin(skew=true) over an 'AQEShuffleRead skewed' reader."""
    ev, dim = _skewed_relations(spark)
    # both-sides filter: stays ABOVE the join (not pushable into either
    # input), keeps the collected result empty, adds no Exchange
    j = ev.join(dim.hint("merge"), "user_id").where(
        F.col("event_id") + F.col("seg") < 0
    )
    plan = _finalized_plan(j)
    assert "skew=true" in plan, plan
    assert "AQEShuffleRead skewed" in plan, plan


def test_skew_join_split_skipped_under_fused_aggregate(spark, skew_conf):
    """The documented negative: the same skewed join under a fused
    partial aggregate (join -> groupBy on another key) is NOT split on
    this Spark version -- the stage ends in another Exchange and AQE
    declines the skew read. Pinned so a Spark upgrade that lifts the
    restriction shows up as a failing test (and a free win: drop the
    manual hot-key split in favor of AQE)."""
    ev, dim = _skewed_relations(spark)
    j = (
        ev.join(dim.hint("merge"), "user_id")
        .groupBy("seg")
        .agg(F.count("*").alias("n"))
    )
    plan = _finalized_plan(j)
    assert "skew=true" not in plan, (
        "AQE now splits skewed joins under fused aggregates -- "
        "re-measure the SCALE.md hot-key suite; the manual hot-key "
        "split may no longer be needed"
    )
