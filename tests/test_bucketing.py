"""Bucketed co-located join: the write-once-shuffle-never plan."""

from __future__ import annotations

import pytest

from clueso_spark.sources.bucketed import co_located_join, write_bucketed
from clueso_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    write_bucketed(
        load_table(spark, SF_DIR, "orders"),
        "b_orders",
        str(tmp_path / "b_orders"),
        "o_orderkey",
    )
    write_bucketed(
        load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        "b_lineitem",
        str(tmp_path / "b_lineitem"),
        "o_orderkey",
    )
    yield
    spark.sql("drop table if exists b_orders")
    spark.sql("drop table if exists b_lineitem")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # at sf0.001 AQE would broadcast these tiny tables; force the
    # sort-merge path the bucketing exists for (at real scale SMJ is the
    # natural pick for fact-fact joins)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        _assert_bucketed_join(spark)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _assert_bucketed_join(spark):
    joined = co_located_join(spark, "b_orders", "b_lineitem", "o_orderkey")
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan  # the whole point of bucketing
    assert "SortMergeJoin" in plan, plan
    # and it computes the right thing
    orders = load_table(spark, SF_DIR, "orders")
    lineitem = load_table(spark, SF_DIR, "lineitem")
    expected = orders.join(
        lineitem, orders.o_orderkey == lineitem.l_orderkey
    ).count()
    assert joined.count() == expected


def test_mismatched_bucket_counts_still_correct(spark, tmp_path):
    """A 4-bucket side joined to an 8-bucket side must stay CORRECT;
    whether the planner re-shuffles one side or coalesces buckets is a
    cost decision, not a correctness one."""
    write_bucketed(
        load_table(spark, SF_DIR, "orders"),
        "b_orders_8",
        str(tmp_path / "b_orders_8"),
        "o_orderkey",
        n_buckets=8,
    )
    write_bucketed(
        load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        ),
        "b_lineitem_4",
        str(tmp_path / "b_lineitem_4"),
        "o_orderkey",
        n_buckets=4,
    )
    try:
        joined = co_located_join(
            spark, "b_orders_8", "b_lineitem_4", "o_orderkey"
        )
        orders = load_table(spark, SF_DIR, "orders")
        lineitem = load_table(spark, SF_DIR, "lineitem")
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey
        ).count()
        assert joined.count() == expected
    finally:
        spark.sql("drop table if exists b_orders_8")
        spark.sql("drop table if exists b_lineitem_4")
