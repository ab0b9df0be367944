"""Loaders for the driver-generated TPC-H-ish testdata tables.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings -- one parquet file per table
under an sf directory.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # get_spark() sets this at session build; the guard covers
        # sessions built elsewhere (the round driver passes its own) --
        # without it an INT64 TIMESTAMP(NANOS) column is unreadable.
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        if spark.conf.get(conf_key, "false") != "true":
            spark.conf.set(conf_key, "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        df = _normalize_ts(spark, df, "ts")
    return df


def _normalize_ts(spark: SparkSession, df: DataFrame, *cols: str) -> DataFrame:
    """Normalize events.ts to TIMESTAMP (instant) across testdata
    generations:

    * INT64 TIMESTAMP(NANOS) (older generators): Spark's vectorized
      reader rejects it outright, so it is read as a raw long
      (``spark.sql.legacy.parquet.nanosAsLong``) and truncated to
      microseconds with integer FLOOR division -- plain ``div`` truncates
      toward zero, which for pre-epoch (negative) nano timestamps rounds
      the opposite way from DuckDB/Arrow's floor-style truncation (1 us
      divergence). Double division would additionally lose precision
      above 2^53 ns.
    * ``timestamp[us]`` without timezone (current generator): Spark reads
      it natively as TIMESTAMP_NTZ, which time-instant functions
      (``unix_micros``, watermarks) reject. The wall-clock value IS the
      UTC instant (DuckDB reads the same bytes as its naive TIMESTAMP),
      so cast NTZ -> TIMESTAMP under a UTC session zone -- value-
      preserving, and the downstream catalog keeps its round-2 types.
    """
    from pyspark.sql import functions as F

    for c, dtype in df.dtypes:
        if c not in cols:
            continue
        if dtype == "bigint":
            floor_div = (
                f"({c} div 1000) - (case when {c} % 1000 < 0 then 1 else 0 end)"
            )
            df = df.withColumn(c, F.timestamp_micros(F.expr(floor_div)))
        elif dtype == "timestamp_ntz":
            # the NTZ->instant cast applies the session zone; the whole
            # catalog's date/time parity already assumes UTC, so pin it
            tz_key = "spark.sql.session.timeZone"
            if spark.conf.get(tz_key) != "UTC":
                spark.conf.set(tz_key, "UTC")
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


@lru_cache(maxsize=None)
def table_row_count(sf_dir: str, name: str) -> int:
    """Table cardinality from parquet footer metadata -- a driver-side
    pyarrow read of file stats, NO Spark job. Adaptive sizing decisions
    (LSH plane counts, sketch widths) need N at plan-construction time;
    a ``df.count()`` there launches a full scan job on every catalog
    build / plan inspection. At 100 TB the same number comes from footer
    row-group stats, which is exactly what this reads."""
    import os

    import pyarrow.parquet as pq

    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if os.path.isdir(path):  # partitioned layout: sum per-file footers
        total = 0
        for root, _dirs, files in os.walk(path):
            for f in files:
                if f.endswith(".parquet"):
                    total += pq.ParquetFile(
                        os.path.join(root, f)
                    ).metadata.num_rows
        return total
    return pq.ParquetFile(path).metadata.num_rows


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql access."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
