"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in ``clueso_spark.plans``: every operator from
SURVEY.md §2 plus the training-data-pipeline tier registers a
``CatalogQuery`` (Spark callable + DuckDB oracle SQL) in
``clueso_spark.plans.catalog.REGISTRY``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: merge-on-read latest-state search --
    the reference engine's raison d'être (W1 row_number dedup +
    tombstone suppression, ref: MetadataQueryExecutor.scala:160-224)."""
    from clueso_spark.plans.catalog import all_queries

    return all_queries()["ev_latest_no_tombstone"].spark(spark, SF_SMOKE_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased identically in the
    Spark plan and the oracle SQL.
    """
    from clueso_spark.plans.catalog import all_queries

    return {name: cq.spark for name, cq in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query. Queries whose semantics are not
    SQL-expressible cross-engine (HLL sketches, float-sum order
    dependence, streaming state) are omitted -> rows-only check."""
    from clueso_spark.plans.catalog import all_queries

    return {
        name: cq.oracle
        for name, cq in all_queries().items()
        if cq.oracle is not None
    }
