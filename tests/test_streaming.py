"""Structured Streaming ingestion pipeline test (file source stand-in for
Kafka; availableNow trigger for determinism)."""

from __future__ import annotations

from clueso_spark.operators.query import MetadataQuery, MetadataQueryExecutor
from clueso_spark.streaming.pipeline import run_file_ingestion
from tests.conftest import op, put_doc, wire_event

BUCKET = "streambucket"


def test_file_stream_to_landing_and_query(spark, store, tmp_path):
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    lines = [
        wire_event(op(1), "put", BUCKET, "s1", put_doc("s1", BUCKET, user_md={"c": "x"})),
        wire_event(op(2), "put", BUCKET, "s2", put_doc("s2", BUCKET)),
        wire_event(op(3), "delete", BUCKET, "s2", put_doc("s2", BUCKET)),
        wire_event(op(4), "put", "PENSIEVE", "sys", put_doc("sys", "PENSIEVE")),
    ]
    (inbox / "batch1.jsonl").write_text("\n".join(lines))

    run_file_ingestion(
        spark,
        str(inbox),
        store,
        str(tmp_path / "ckpt"),
        compaction_record_interval=10,
    )

    # raw landing rows: system bucket filtered, tombstone retained as a row
    assert store.read_landing(BUCKET).count() == 3
    assert store.buckets("landing") == [BUCKET]

    # merged view applies last-writer-wins + tombstone suppression
    ex = MetadataQueryExecutor(spark, store)
    rows = ex.execute(MetadataQuery(BUCKET)).collect()
    assert [r["key"] for r in rows] == ["s1"]

    # second micro-batch drains incrementally from the same checkpoint
    (inbox / "batch2.jsonl").write_text(
        wire_event(op(5), "put", BUCKET, "s3", put_doc("s3", BUCKET))
    )
    run_file_ingestion(
        spark, str(inbox), store, str(tmp_path / "ckpt"), compaction_record_interval=10
    )
    rows = ex.execute(MetadataQuery(BUCKET)).collect()
    assert [r["key"] for r in rows] == ["s1", "s3"]
