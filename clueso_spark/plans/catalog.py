"""Registry of named queries: Spark plan + DuckDB oracle SQL.

Every operator the engine claims (SURVEY.md §2 inventory + the training-data
pipeline extensions) registers here as a ``CatalogQuery``: a callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, an equivalent
ANSI-SQL string the driver runs on DuckDB over the same parquet tables.

Determinism contract (so value-hashes match across engines):
  * every computed column is aliased identically in both forms;
  * money/qty aggregates go through ``decimal`` so sums are exact and
    order-independent, then cast back to double (identical bits in both
    engines); see :func:`dec`;
  * all orderings are made total with explicit key tie-breakers;
  * no wall-clock, no RNG; any pseudo-randomness derives from md5 of data.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CatalogQuery:
    name: str
    description: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tags: tuple[str, ...] = field(default=())


REGISTRY: dict[str, CatalogQuery] = {}


def register(name: str, description: str, oracle: str | None, *tags: str):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = CatalogQuery(name, description, fn, oracle, tuple(tags))
        return fn

    return wrap


#: every module contributing CatalogQuery registrations
QUERY_MODULES = [
    "clueso_spark.plans.relational",
    "clueso_spark.plans.event_queries",
    "clueso_spark.plans.text_queries",
    "clueso_spark.plans.dedup_queries",
    "clueso_spark.plans.similarity_queries",
    "clueso_spark.plans.multimodal_queries",
    "clueso_spark.plans.streaming_queries",
]


def all_queries() -> dict[str, CatalogQuery]:
    """Import all query modules and return the full registry."""
    import importlib

    # imports are deferred so a SparkSession is never needed at import time
    for mod in QUERY_MODULES:
        importlib.import_module(mod)
    return REGISTRY


def dec(col: str | F.Column, width: int = 12, scale: int = 2) -> F.Column:
    """Exact-arithmetic bridge: cast a 2-decimal double to decimal so sums
    are order-independent and reproducible bit-for-bit across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({width},{scale})")


def as_double(c: F.Column) -> F.Column:
    return c.cast("double")
