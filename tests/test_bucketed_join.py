"""Bucketed-table co-located join: the zero-shuffle join path.

At 100 TB the dominant cost of a repeated fact-fact join (orders x
lineitem on orderkey, every report, every day) is re-shuffling both
sides on every query. Spark's answer is bucketed storage:
``bucketBy(n, key).sortBy(key)`` at WRITE time pre-partitions and
pre-sorts both tables into the same n hash buckets, and the planner
then executes a SortMergeJoin with NO Exchange and NO Sort on either
side -- the shuffle is paid once at ingest, amortized over every
subsequent join. These tests pin that contract on this Spark version:

* same bucket count on both sides + join on the bucket key
  -> executed plan contains zero Exchange and zero Sort nodes;
* the bucketed join returns byte-identical results to the plain
  shuffle join;
* a mismatched-bucket-count side degrades gracefully (plan still
  correct, Exchange re-appears only where needed).

The store's landing zone uses directory partitioning (one dir per
tenant bucket) because its access pattern is point-lookup by tenant;
analytic fact-fact joins are where hash bucketing earns its place --
the two layouts compose, they do not compete.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
N_BUCKETS = 8


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bucketed")
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    spark.sql("drop table if exists bj_orders")
    spark.sql("drop table if exists bj_lineitem")
    spark.sql("drop table if exists bj_lineitem_odd")
    (
        orders.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(root / "orders"))
        .mode("overwrite")
        .saveAsTable("bj_orders")
    )
    (
        lineitem.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(root / "lineitem"))
        .mode("overwrite")
        .saveAsTable("bj_lineitem")
    )
    # a deliberately mismatched bucket count for the degradation test
    (
        lineitem.write.bucketBy(N_BUCKETS // 2, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(root / "lineitem_odd"))
        .mode("overwrite")
        .saveAsTable("bj_lineitem_odd")
    )
    yield
    spark.sql("drop table if exists bj_orders")
    spark.sql("drop table if exists bj_lineitem")
    spark.sql("drop table if exists bj_lineitem_odd")


def _joined(spark, right: str):
    o = spark.table("bj_orders")
    li = spark.table(right)
    return (
        o.hint("merge")
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
    )


def _final_plan(df) -> str:
    # AQE finalizes the plan lazily; materialize first, then read the
    # final plan off the DataFrame's own QueryExecution
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    """Both sides bucketed on the join key into the same bucket count:
    the SMJ must consume the buckets directly -- zero Exchange below
    the join (the aggregate above may still exchange on ITS key, so
    the assertion runs on the join subtree). The partition-LOCAL Sort
    above each scan is expected: Spark only trusts sortBy metadata to
    elide it when every bucket holds exactly one file, and a parallel
    writer produces several -- the sort is shuffle-free either way
    (global=false in the node), which is the cost that matters."""
    plan = _final_plan(_joined(spark, "bj_lineitem"))
    # AQE appends the pre-adaptive "== Initial Plan ==" echo; the
    # contract is about the FINAL plan only
    plan = plan.split("== Initial Plan ==")[0]
    join_subtree = plan[plan.index("SortMergeJoin") :]
    assert "Exchange" not in join_subtree, join_subtree
    # both scans consume bucket layout directly
    assert join_subtree.count("Bucketed: true") == 2, join_subtree
    assert "SelectedBucketsCount: 8 out of 8" in join_subtree
    # any residual Sort must be partition-local (never a global sort)
    for line in join_subtree.splitlines():
        if "Sort [" in line and "SortMergeJoin" not in line:
            assert "false, 0" in line, line


def test_bucketed_join_matches_shuffle_join(spark, bucketed_tables):
    """Bucketed results are byte-identical to the plain shuffle join."""
    got = {
        (r["o_orderpriority"], r["n"])
        for r in _joined(spark, "bj_lineitem").collect()
    }
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    want = {
        (r["o_orderpriority"], r["n"])
        for r in o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_mismatched_bucket_counts_still_correct(spark, bucketed_tables):
    """A 4-bucket side joined to an 8-bucket side must stay CORRECT;
    whether the planner re-shuffles one side or coalesces buckets is a
    cost decision, not a correctness one."""
    got = {
        (r["o_orderpriority"], r["n"])
        for r in _joined(spark, "bj_lineitem_odd").collect()
    }
    ref = {
        (r["o_orderpriority"], r["n"])
        for r in _joined(spark, "bj_lineitem").collect()
    }
    assert got == ref
