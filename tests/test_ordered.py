"""functions/ordered.py vs the global-window oracle it replaces.

Each helper claims exact equality with the single-partition window form
(``over (order by ...)`` with no partitionBy). These tests pin that on
adversarial shapes: duplicates in the value column, negatives, n smaller
than / equal to / not divisible by the partition count and the ntile k.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from clueso_spark.functions.ordered import (
    ntile_from_rank,
    ranged_cumsum,
    ranged_lead,
    ranged_row_number,
)


def _rows(n: int):
    # deterministic pseudo-random values incl. negatives and repeats;
    # id is the unique tie-breaker the helpers require
    return [(i, ((i * 37) % 11) - 5, f"g{i % 3}") for i in range(n)]


@pytest.mark.parametrize("n_rows,n_parts", [(1, 4), (7, 4), (100, 8), (100, 1)])
def test_ranged_cumsum_matches_global_window(spark, n_rows, n_parts):
    df = spark.createDataFrame(_rows(n_rows), "id long, v long, g string")
    got = ranged_cumsum(df, ["v", "id"], "v", "cum", num_partitions=n_parts)
    w = (
        Window.orderBy("v", "id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert sorted(got.collect()) == sorted(want.collect())


@pytest.mark.parametrize("n_rows,n_parts", [(1, 4), (23, 4), (100, 8)])
def test_ranged_row_number_matches_global_window(spark, n_rows, n_parts):
    df = spark.createDataFrame(_rows(n_rows), "id long, v long, g string")
    got = ranged_row_number(df, ["v", "id"], "rn", num_partitions=n_parts)
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy("v", "id")).cast("bigint")
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_ranged_row_number_desc_via_negation(spark):
    """The desc idiom the RFM query uses: negate the axis, rank asc."""
    df = spark.createDataFrame(_rows(50), "id long, v long, g string")
    got = ranged_row_number(
        df.withColumn("neg_v", -F.col("v")),
        ["neg_v", "id"],
        "rn",
        num_partitions=4,
    ).drop("neg_v")
    want = df.withColumn(
        "rn",
        F.row_number()
        .over(Window.orderBy(F.col("v").desc(), "id"))
        .cast("bigint"),
    )
    assert sorted(got.collect()) == sorted(want.collect())


@pytest.mark.parametrize("n_rows,k", [(1, 5), (3, 5), (5, 5), (23, 5), (100, 7)])
def test_ntile_from_rank_matches_sql_ntile(spark, n_rows, k):
    df = spark.createDataFrame(_rows(n_rows), "id long, v long, g string")
    ranked = df.withColumn(
        "rk", F.row_number().over(Window.orderBy("v", "id")).cast("bigint")
    ).crossJoin(
        F.broadcast(df.agg(F.count("*").cast("bigint").alias("n_total")))
    )
    got = ranked.select("id", ntile_from_rank("rk", "n_total", k).alias("q"))
    want = df.select(
        "id", F.ntile(k).over(Window.orderBy("v", "id")).cast("bigint").alias("q")
    )
    assert sorted(got.collect()) == sorted(want.collect())


def _entity_rows(n: int, whale_share: int = 0):
    """(id, user, v): user assignment round-robins over 5 entities;
    whale_share > 0 reassigns every whale_share-th row to user 0 so one
    entity straddles many range partitions. v is non-null by
    construction (a ranged_lead requirement)."""
    rows = []
    for i in range(n):
        user = 0 if (whale_share and i % whale_share == 0) else (i % 5) + 1
        rows.append((i, user, ((i * 41) % 13) * 10))
    return rows


@pytest.mark.parametrize(
    "n_rows,n_parts,whale",
    [
        (1, 4, 0),       # single row: lead is null
        (7, 4, 0),       # fewer rows than partitions
        (100, 8, 0),     # uniform entities
        (100, 8, 2),     # whale owns half, spans every partition
        (100, 1, 2),     # degenerate single partition
        (200, 16, 1),    # ONE entity owns everything
    ],
)
def test_ranged_lead_matches_per_entity_window(spark, n_rows, n_parts, whale):
    df = spark.createDataFrame(
        _entity_rows(n_rows, whale), "id long, user long, v long"
    )
    got = ranged_lead(
        df, ["user"], ["id"], "v", "nxt", num_partitions=n_parts
    )
    w = Window.partitionBy("user").orderBy("id")
    want = df.withColumn("nxt", F.lead("v").over(w))
    assert sorted(
        got.collect(), key=lambda r: (r["user"], r["id"])
    ) == sorted(want.collect(), key=lambda r: (r["user"], r["id"]))


def test_ranged_lead_multi_order_cols(spark):
    """Composite order key (ts-like major + tiebreak minor)."""
    rows = [(i, i % 3, (i * 7) % 5, i, i * 100) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, user long, a long, b long, v long")
    got = ranged_lead(
        df, ["user"], ["a", "b"], "v", "nxt", num_partitions=6
    )
    w = Window.partitionBy("user").orderBy("a", "b")
    want = df.withColumn("nxt", F.lead("v").over(w))
    assert sorted(got.collect()) == sorted(want.collect())


# -- property: ranged_lead is the per-entity window, on ANY corpus --------

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=8, deadline=None)
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=6),   # entity (few -> chunky)
            st.integers(min_value=-50, max_value=50),  # value
        ),
        min_size=1,
        max_size=60,
    ),
    n_parts=st.sampled_from([1, 3, 8]),
)
def test_ranged_lead_property(spark, data, n_parts):
    """For random entity assignments (including all-one-entity and
    singleton corpora) and random partition counts, ranged_lead equals
    the plain per-entity window exactly. id is the unique order key the
    helper requires; values may repeat and be negative."""
    rows = [(i, user, v) for i, (user, v) in enumerate(data)]
    df = spark.createDataFrame(rows, "id long, user long, v long")
    got = ranged_lead(df, ["user"], ["id"], "v", "nxt", num_partitions=n_parts)
    w = Window.partitionBy("user").orderBy("id")
    want = df.withColumn("nxt", F.lead("v").over(w))
    assert sorted(got.collect()) == sorted(want.collect())
