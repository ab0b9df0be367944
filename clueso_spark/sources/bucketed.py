"""Bucketed tables: co-located joins with no shuffle at read time.

At 100 TB the dominant cost of fact⋈fact joins (orders⋈lineitem on
orderkey) is the shuffle of both sides. Writing both tables bucketed by
the join key with the same bucket count pre-co-locates them: Spark's
bucketed scan exposes the hash partitioning to the planner and the
SortMergeJoin runs with ZERO Exchange nodes -- the shuffle was paid once
at write time and amortized over every subsequent join.

This is the engine's answer to "reuse a partitioning across stages": the
landing/staging store co-locates by bucket directory (path pruning);
analytic fact tables co-locate by join key (bucketing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 8,
) -> None:
    """Write ``df`` as an external bucketed+sorted table at ``path``.

    Sorting within buckets lets the join skip its per-task sort too.
    """
    (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def co_located_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key. With
    ``spark.sql.sources.bucketing.enabled`` (default true) and matching
    bucket counts the plan contains no Exchange."""
    return spark.table(left_table).join(spark.table(right_table), on)
