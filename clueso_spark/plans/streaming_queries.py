"""Structured Streaming queries run through the driver harness.

The reference's streaming surface is stateless ETL + parquet sink
(SURVEY §2.9); here we also exercise *stateful* streaming (windowed
aggregation) the Spark-first way: readStream -> event-time window ->
complete-mode memory sink, drained deterministically with availableNow.

The batch-equivalent oracle works because availableNow processes the
full static input exactly once -- the streaming result is the batch
result by construction (no late data in a replayed file source).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from clueso_spark.plans.catalog import dec, register

#: events.parquet wire schema -- ts is INT64 TIMESTAMP(NANOS), which the
#: streaming reader must take as long (see sources/tables.py).
EVENTS_RAW_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


@register(
    "st_windowed_counts",
    "Structured Streaming windowed aggregation: readStream(parquet) -> "
    "1-hour event-time tumbling window x event_type -> complete-mode "
    "memory sink, drained with availableNow. At scale this runs "
    "continuously with a watermark bounding state; counts/sums are "
    "decimal-exact so the replayed-stream result equals the batch oracle.",
    """
    select strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') as window_start,
           event_type,
           cast(count(*) as bigint) as n_events,
           cast(sum(cast(value as decimal(12,2))) as double) as sum_value
    from events
    group by 1, 2
    """,
    "streaming", "window", "aggregate",
)
def st_windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # the file stream source wants a directory; glob-filter to one table
    stream = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir.rstrip("/"))
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    agg = (
        stream.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_events"),
            F.sum(dec("value")).cast("double").alias("sum_value"),
        )
    )
    sink_name = "st_windowed_counts_sink"
    query = (
        agg.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(sink_name).select(
        F.date_format(F.col("window.start"), "yyyy-MM-dd HH:mm:ss").alias(
            "window_start"
        ),
        "event_type",
        "n_events",
        "sum_value",
    )
