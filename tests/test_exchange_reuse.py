"""Exchange reuse: diamond-shaped plans pay each shuffle once.

When a query references the same shuffled relation twice (self-join of
an aggregate, union of two readings of one groupBy), Catalyst plans a
single Exchange and a ReusedExchange marker for the second consumer --
the free deduplication that makes "aggregate once, compare against
itself" patterns (week-over-week joins, share-of-total divisions)
affordable at 100 TB without manual caching. These tests pin that the
reuse actually engages on this Spark version, and that persist_swap
remains the right tool only for relations REBUILT across separate
actions (reuse is per-plan; caching is cross-plan).
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _daily(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    return ev.groupBy(
        F.expr(
            "unix_micros(cast(ts as timestamp)) div 86400000000"
        ).alias("day"),
        "event_type",
    ).agg(F.count("*").alias("n"))


def test_band_split_of_aggregate_reuses_exchange(spark):
    """Two filtered consumers of ONE aggregate (band split): the
    post-aggregate filters stay above the shuffle, so both branches'
    scan+partial-agg+Exchange subtrees canonicalize identical and the
    second consumer becomes a ReusedExchange -- the aggregate is
    computed once."""
    daily = _daily(spark)
    both = daily.where(F.col("n") > 5).unionAll(
        daily.where(F.col("n") <= 5)
    )
    both.collect()
    plan = both._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in plan, plan


def test_shifted_key_self_join_does_not_reuse(spark):
    """The NEGATIVE pin that explains the repo's persist_swap habit:
    a week-over-week self-join on a SHIFTED key (prev.day + 1 ==
    cur.day) pushes `isnotnull(day + 1)` into only one branch, the
    subtrees stop canonicalizing equal, and ReuseExchange does NOT
    engage -- the aggregate runs twice. For that shape, persist the
    aggregate once (persist_swap) instead of relying on plan-level
    reuse."""
    daily = _daily(spark)
    prev = daily.select(
        (F.col("day") + 1).alias("day"),
        F.col("event_type"),
        F.col("n").alias("n_prev"),
    )
    wow = daily.join(prev, ["day", "event_type"]).select(
        "day", "event_type", "n", "n_prev"
    )
    wow.collect()
    plan = wow._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" not in plan, plan
    # both branches really did scan + aggregate independently
    assert plan.count("FileScan parquet") == 2, plan


def test_share_of_total_reuses_exchange(spark):
    """Share-of-total shape: a grouped aggregate joined to its own
    global rollup; the grouped shuffle must be planned once."""
    ev = spark.read.parquet(f"{SF}/events.parquet")
    by_type = ev.groupBy("event_type").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents")
    )
    total = by_type.agg(F.sum("cents").alias("total_cents"))
    share = by_type.crossJoin(F.broadcast(total)).select(
        "event_type",
        "cents",
        (F.expr("10000 * cents") / F.col("total_cents")).alias(
            "share_x10000"
        ),
    )
    share.collect()
    plan = share._jdf.queryExecution().executedPlan().toString()
    plan = plan.split("== Initial Plan ==")[0]
    assert "ReusedExchange" in plan, plan
