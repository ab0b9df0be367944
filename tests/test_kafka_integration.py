"""Opt-in Kafka round-trip for the one source path the sandbox can't
exercise (ref: MetadataIngestionPipeline.scala:162-168).

Skipped unless ``SPARK_GRAFT_KAFKA_BROKER`` points at a reachable
broker (e.g. ``localhost:9092``) -- every other pipeline behavior is
pinned broker-free through the file-source stand-in
(tests/test_streaming.py), exactly as the reference's own test suite
does. Against a real broker this drives: produce wire envelopes ->
``kafka_event_stream`` -> ``start_ingestion`` (availableNow) ->
``MetadataQueryExecutor`` search over the landed rows.

Requires the spark-sql-kafka connector jar on the session classpath;
the test requests it via ``spark.jars.packages``, so the opt-in run
also needs network access (or a pre-populated ivy cache).
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

BROKER = os.environ.get("SPARK_GRAFT_KAFKA_BROKER")

pytestmark = pytest.mark.skipif(
    not BROKER,
    reason="set SPARK_GRAFT_KAFKA_BROKER=host:port to run the Kafka "
    "round-trip (needs a live broker + the kafka connector jar)",
)


def _produce(topic: str, lines: list[str]) -> None:
    """Produce via kafka-python if present, else confluent_kafka --
    whichever the opt-in environment provides."""
    try:
        from kafka import KafkaProducer  # type: ignore

        p = KafkaProducer(bootstrap_servers=BROKER)
        for line in lines:
            p.send(topic, line.encode())
        p.flush()
        return
    except ImportError:
        pass
    from confluent_kafka import Producer  # type: ignore

    p = Producer({"bootstrap.servers": BROKER})
    for line in lines:
        p.produce(topic, line.encode())
    p.flush()


def test_kafka_ingestion_round_trip(tmp_path):
    from pyspark.sql import SparkSession

    from clueso_spark.operators.query import (
        MetadataQuery,
        MetadataQueryExecutor,
    )
    from clueso_spark.sources.store import MetadataStore
    from clueso_spark.streaming.pipeline import (
        kafka_event_stream,
        start_ingestion,
    )
    from tests.conftest import op, put_doc, wire_event

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("kafka-roundtrip")
        .config(
            "spark.jars.packages",
            "org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2",
        )
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    topic = f"clueso-test-{uuid.uuid4().hex[:8]}"
    lines = [
        wire_event(
            op(i),
            "put",
            "kbkt",
            f"k{i:03d}",
            put_doc(f"k{i:03d}", "kbkt", {"color": "red" if i % 2 else "blue"}),
        )
        for i in range(10)
    ]
    _produce(topic, lines)

    store = MetadataStore(spark, str(tmp_path / "store"))
    events = kafka_event_stream(spark, BROKER, topic)
    # Kafka rows carry (key, value, topic, ...); the parse transform
    # expects the wire envelope in `value` as a string
    events = events.selectExpr("cast(value as string) as value")
    q = start_ingestion(
        events, store, str(tmp_path / "ckpt"), available_now=True
    )
    q.awaitTermination()

    ex = MetadataQueryExecutor(spark, store)
    rows = ex.execute(
        MetadataQuery("kbkt", "userMd.`x-amz-meta-color`='red'", limit=100)
    ).collect()
    assert len(rows) == 5
    payload = json.loads(
        ex.execute_json(MetadataQuery("kbkt", "", limit=100))
    )
    assert len(payload) == 10
