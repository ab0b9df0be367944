"""Streaming ingestion pipeline wiring: source -> parse_events -> landing.

(ref: MetadataIngestionPipeline.scala:143-185.) Stateless per-record ETL:
no watermarks or stateful operators -- out-of-order and duplicate events are
resolved at *read* time by the opIndex merge (operators/merge.py), which is
what makes the pipeline trivially scalable: every micro-batch is
embarrassingly parallel, checkpointing is just Kafka offsets.

The streaming sink and batch readers never fight over ``_spark_metadata``:
readers scan bucket subdirectories (sources/store.py), never the sink root.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from clueso_spark.sources.store import MetadataStore
from clueso_spark.streaming.ingest import parse_events


def kafka_source_options(
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> dict[str, str]:
    """The exact option map the Kafka source is configured with
    (ref: MetadataIngestionPipeline.scala:162-168 sets the same four:
    bootstrap servers, subscribed topic, earliest offsets, tolerate
    retention-expired offsets). Pure so the wiring is unit-testable in
    environments with no broker or connector jar -- the sandbox runs
    every pipeline test through the file-source stand-in, exactly as
    the reference's own tests do (CluesoMergingAndQueryingSpec:34-38)."""
    return {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": "false",
    }


def kafka_event_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topic: str,
    starting_offsets: str = "earliest",
) -> DataFrame:
    """Kafka source (ref: MetadataIngestionPipeline.scala:162-168)."""
    return (
        spark.readStream.format("kafka")
        .options(
            **kafka_source_options(bootstrap_servers, topic, starting_offsets)
        )
        .load()
    )


def file_event_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-based stand-in source (JSON-lines of wire envelopes, one per
    line) so tests and local runs need no Kafka broker. Mirrors how the
    reference's own tests drive the transform with an in-memory DataFrame
    (ref: CluesoMergingAndQueryingSpec.scala:34-38)."""
    return (
        spark.readStream.format("text")
        .option("maxFilesPerTrigger", "16")
        .load(path)
    )


def start_ingestion(
    events: DataFrame,
    store: MetadataStore,
    checkpoint: str,
    *,
    compaction_record_interval: int = 100_000,
    trigger_processing_time: str | None = "10 seconds",
    available_now: bool = False,
    excluded_buckets: tuple[str, ...] = (),
) -> StreamingQuery:
    """Attach the parse transform and start the partitioned parquet sink
    (ref: MetadataIngestionPipeline.scala:173-184). ``excluded_buckets``
    blacklists the store's own bucket against self-ingestion loops."""
    parsed = parse_events(
        events,
        compaction_record_interval=compaction_record_interval,
        excluded_buckets=excluded_buckets,
    )
    writer = (
        parsed.writeStream.format("parquet")
        .option("checkpointLocation", checkpoint)
        .option("path", store.landing)
        .partitionBy("bucket", "maxOpIndex")
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_processing_time:
        writer = writer.trigger(processingTime=trigger_processing_time)
    return writer.start()


def run_file_ingestion(
    spark: SparkSession,
    input_path: str,
    store: MetadataStore,
    checkpoint: str,
    *,
    compaction_record_interval: int = 100_000,
) -> None:
    """Drain all currently-available files through the streaming pipeline
    and stop (availableNow trigger) -- deterministic for tests/backfills."""
    stream = file_event_stream(spark, input_path)
    query = start_ingestion(
        stream,
        store,
        checkpoint,
        compaction_record_interval=compaction_record_interval,
        available_now=True,
    )
    query.awaitTermination()
