"""Streaming ingestion: event parsing transform + pipeline wiring."""

from clueso_spark.streaming.ingest import next_max_op_index, parse_events
from clueso_spark.streaming.pipeline import (
    kafka_event_stream,
    run_file_ingestion,
    start_ingestion,
)

__all__ = [
    "parse_events",
    "next_max_op_index",
    "kafka_event_stream",
    "run_file_ingestion",
    "start_ingestion",
]
