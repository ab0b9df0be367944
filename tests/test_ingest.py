"""Ingestion-transform tests (model: CluesoIngestionPipelineSpec semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from clueso_spark.streaming.ingest import next_max_op_index, parse_events
from tests.conftest import op, put_doc, raw_df, wire_event


def test_user_md_rewrite(spark):
    """x-amz-meta-* fields collapse into userMd; typed fields survive."""
    doc = put_doc("k1", "b1", user_md={"color": "blue", "shape": "round"})
    df = parse_events(raw_df(spark, [wire_event(op(1), "put", "b1", "k1", doc)]))
    row = df.collect()[0]
    assert row["bucket"] == "b1"
    assert row["key"] == "k1"
    assert row["type"] == "put"
    md = row["message"]["userMd"]
    assert md["x-amz-meta-color"] == "blue"
    assert md["x-amz-meta-shape"] == "round"
    assert row["message"]["owner-id"] == "owner1"
    assert row["message"]["content-length"] == 100


def test_location_truncated_to_first_element(spark):
    loc = [
        {"key": "a", "size": 1, "start": 0, "dataStoreName": "d", "dataStoreETag": "e"},
        {"key": "b", "size": 2, "start": 1, "dataStoreName": "d", "dataStoreETag": "e"},
    ]
    doc = put_doc("k1", "b1", location=loc)
    df = parse_events(raw_df(spark, [wire_event(op(1), "put", "b1", "k1", doc)]))
    locations = df.collect()[0]["message"]["location"]
    assert len(locations) == 1
    assert locations[0]["key"] == "a"


def test_max_op_index_interval_math(spark):
    """Round up to next multiple; exact multiples map to themselves."""
    cases = [(1, 10), (9, 10), (10, 10), (11, 20), (100, 100), (0, 0)]
    df = spark.createDataFrame(
        [(op(n),) for n, _ in cases], "opIndex string"
    ).select(next_max_op_index(F.col("opIndex"), 10).alias("m"))
    assert [r["m"] for r in df.collect()] == [want for _, want in cases]


def test_system_buckets_filtered(spark):
    lines = [
        wire_event(op(1), "put", "PENSIEVE", "k", put_doc("k", "PENSIEVE")),
        wire_event(op(2), "put", "users..bucket", "k", put_doc("k", "users..bucket")),
        wire_event(op(3), "put", "__metastore", "k", put_doc("k", "__metastore")),
        wire_event(op(4), "put", "mpuShadowBucketx", "k", put_doc("k", "m")),
        wire_event(op(5), "put", "realbucket", "k", put_doc("k", "realbucket")),
    ]
    df = parse_events(raw_df(spark, lines))
    assert [r["bucket"] for r in df.collect()] == ["realbucket"]


def test_malformed_inner_value_rejected(spark):
    lines = [
        wire_event(op(1), "put", "b", "k", "1"),  # non-object inner value
        wire_event(op(2), "put", "b", "k2", put_doc("k2", "b")),
        "not json at all",
        "{}",
    ]
    df = parse_events(raw_df(spark, lines))
    assert [r["key"] for r in df.collect()] == ["k2"]


def test_null_key_and_bucket_defaults(spark):
    import json

    line = json.dumps(
        {"opIndex": op(1), "type": "put", "bucket": None, "key": None, "value": "{}"}
    )
    df = parse_events(raw_df(spark, [line]))
    row = df.collect()[0]
    assert row["key"] == ""
    assert row["bucket"] == "NOBUCKET"


def test_batch_and_interval_assignment(spark):
    lines = [
        wire_event(op(i), "put", "b", f"k{i}", put_doc(f"k{i}", "b"))
        for i in range(1, 25)
    ]
    df = parse_events(raw_df(spark, lines), compaction_record_interval=10)
    got = {r["key"]: r["maxOpIndex"] for r in df.collect()}
    assert got["k1"] == 10 and got["k10"] == 10 and got["k11"] == 20 and got["k24"] == 30


def test_null_type_discarded_at_ingest(spark):
    """An envelope missing `type` is dropped (ref:
    MetadataIngestionPipeline.scala:116) -- a NULL-typed winning row would
    make the merge's `type != 'delete'` evaluate NULL and hide the key."""
    import json

    good = wire_event(op(1), "put", "b1", "k1", put_doc("k1", "b1"))
    no_type = json.dumps(
        {"opIndex": op(2), "bucket": "b1", "key": "k1",
         "value": json.dumps(put_doc("k1", "b1"))}
    )
    rows = parse_events(raw_df(spark, [good, no_type])).collect()
    assert len(rows) == 1
    assert rows[0]["opIndex"] == op(1)


def test_null_op_index_discarded_at_ingest(spark):
    """An envelope missing `opIndex` is dropped: opIndex orders the
    merge-on-read dedup window and feeds the maxOpIndex partition, so a
    NULL would land in the Hive default partition and break the
    compactor's integer subpartition listing."""
    import json

    good = wire_event(op(1), "put", "b1", "k1", put_doc("k1", "b1"))
    no_op = json.dumps(
        {"type": "put", "bucket": "b1", "key": "k2",
         "value": json.dumps(put_doc("k2", "b1"))}
    )
    rows = parse_events(raw_df(spark, [good, no_op])).collect()
    assert len(rows) == 1
    assert rows[0]["key"] == "k1"


def test_sub_partitions_skip_non_integer_dirs(spark, tmp_path):
    """A stray maxOpIndex=__HIVE_DEFAULT_PARTITION__ dir (pre-fix store)
    must not fail the whole bucket's compaction listing."""
    from clueso_spark.sources.store import MetadataStore

    store = MetadataStore(spark, str(tmp_path / "store"))
    base = tmp_path / "store" / "landing" / "bucket=b1"
    for sub in ("maxOpIndex=100000", "maxOpIndex=__HIVE_DEFAULT_PARTITION__"):
        (base / sub).mkdir(parents=True)
    assert store.sub_partitions("landing", "b1") == [100000]


def test_excluded_buckets_filtered(spark):
    """excluded_buckets mirrors the reference's bucketNameToFilterOut
    (self-ingestion guard, ref: MetadataIngestionPipeline.scala:133)."""
    lines = [
        wire_event(op(1), "put", "selfbucket", "k1", put_doc("k1", "selfbucket")),
        wire_event(op(2), "put", "normal", "k2", put_doc("k2", "normal")),
    ]
    rows = parse_events(
        raw_df(spark, lines), excluded_buckets=("selfbucket",)
    ).collect()
    assert [r["bucket"] for r in rows] == ["normal"]


def test_ingest_drop_counters_observed(spark, tmp_path):
    """The two hardening filters (null type / null opIndex) COUNT what
    they drop: a streaming run surfaces the counters in
    StreamingQueryProgress.observedMetrics['ingest_drops']."""
    import json

    good = wire_event(op(1), "put", "b1", "k1", put_doc("k1", "b1"))
    no_type = json.dumps(
        {"opIndex": op(2), "bucket": "b1", "key": "k1",
         "value": json.dumps(put_doc("k1", "b1"))}
    )
    no_op = json.dumps(
        {"type": "put", "bucket": "b1", "key": "k2",
         "value": json.dumps(put_doc("k2", "b1"))}
    )
    inbox = tmp_path / "inbox"
    inbox.mkdir()
    (inbox / "wire.jsonl").write_text("\n".join([good, no_type, no_op]))
    stream = spark.readStream.format("text").load(str(inbox))
    q = (
        parse_events(stream)
        .writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    metrics = [
        p.observedMetrics["ingest_drops"]
        for p in q.recentProgress
        if "ingest_drops" in (p.observedMetrics or {})
    ]
    assert metrics, "no ingest_drops observation in any progress event"
    assert sum(m["null_type"] for m in metrics) == 1
    assert sum(m["null_op_index"] for m in metrics) == 1
