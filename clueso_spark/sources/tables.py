"""Loaders for the driver-generated TPC-H-ish testdata tables.

Tables (see /root/repo/TESTDATA.md): region nation customer supplier part
orders lineitem events documents embeddings -- one parquet file per table
under an sf directory.
"""

from __future__ import annotations

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
        # without it the INT64 TIMESTAMP(NANOS) column is unreadable.
        conf_key = "spark.sql.legacy.parquet.nanosAsLong"
        if spark.conf.get(conf_key, "false") != "true":
            spark.conf.set(conf_key, "true")
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events":
        df = _fix_nano_timestamps(df, "ts")
    return df


def _fix_nano_timestamps(df: DataFrame, *cols: str) -> DataFrame:
    """events.parquet stores ``ts`` as INT64 TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright. We read it as a raw long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microseconds
    with integer FLOOR division: plain ``div`` truncates toward zero, which
    for pre-epoch (negative) nano timestamps rounds the opposite way from
    DuckDB/Arrow's floor-style truncation (1 us divergence). Double
    division would additionally lose precision above 2^53 ns.
    """
    from pyspark.sql import functions as F

    for c in cols:
        if dict(df.dtypes).get(c) == "bigint":
            floor_div = (
                f"({c} div 1000) - (case when {c} % 1000 < 0 then 1 else 0 end)"
            )
            df = df.withColumn(c, F.timestamp_micros(F.expr(floor_div)))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql access."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
