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


def test_exactly_once_and_full_lifecycle(spark, store, tmp_path):
    """Day-in-the-life E2E: stream -> compact -> stream more -> cached
    query across tiers. Pins exactly-once replay (checkpoint prevents
    re-ingesting drained files) and landing-over-staging shadowing."""
    from clueso_spark.operators.cache import BucketCacheManager
    from clueso_spark.operators.compact import Compactor

    inbox = tmp_path / "inbox"
    inbox.mkdir()
    ckpt = str(tmp_path / "ckpt")
    b = "lifecycle"
    (inbox / "b1.jsonl").write_text(
        "\n".join(
            wire_event(op(i), "put", b, f"k{i}", put_doc(f"k{i}", b))
            for i in (1, 2, 3)
        )
    )
    run_file_ingestion(spark, str(inbox), store, ckpt, compaction_record_interval=10)
    # replay same inbox: checkpoint must prevent duplicate ingestion
    run_file_ingestion(spark, str(inbox), store, ckpt, compaction_record_interval=10)
    assert store.read_landing(b).count() == 3  # exactly once

    Compactor(store).compact_bucket(b, force=True)
    assert store.read_staging(b).count() == 3
    assert store.sub_partitions("landing", b) == []

    # post-compaction stream: update k1, tombstone k2
    (inbox / "b2.jsonl").write_text(
        "\n".join(
            [
                wire_event(op(11), "put", b, "k1", put_doc("k1", b, user_md={"v": "2"})),
                wire_event(op(12), "delete", b, "k2", put_doc("k2", b)),
            ]
        )
    )
    run_file_ingestion(spark, str(inbox), store, ckpt, compaction_record_interval=10)

    ex = MetadataQueryExecutor(spark, store, BucketCacheManager(expiry_s=60))
    rows = ex.execute(MetadataQuery(b)).collect()
    # k1 updated (landing shadows staging), k2 tombstoned, k3 from staging
    assert [r["key"] for r in rows] == ["k1", "k3"]
    # the update is queryable through the userMd predicate surface
    # (result projection itself is the fixed 8 columns, like the reference)
    updated = ex.execute(
        MetadataQuery(b, "userMd.`x-amz-meta-v` = '2'")
    ).collect()
    assert [r["key"] for r in updated] == ["k1"]


def test_kafka_source_options_reference_parity():
    """The Kafka wiring (unexercisable here: no broker/connector in the
    sandbox) is pinned at the option-map level against the reference's
    source config (MetadataIngestionPipeline.scala:162-168): subscribe
    by topic, earliest offsets by default, survive retention-expired
    offsets instead of failing the query."""
    from clueso_spark.streaming.pipeline import kafka_source_options

    opts = kafka_source_options("broker1:9092,broker2:9092", "metadata-topic")
    assert opts == {
        "kafka.bootstrap.servers": "broker1:9092,broker2:9092",
        "subscribe": "metadata-topic",
        "startingOffsets": "earliest",
        "failOnDataLoss": "false",
    }
    assert kafka_source_options("b", "t", "latest")["startingOffsets"] == "latest"


def test_state_sized_runs_never_touch_the_callers_session_conf(spark):
    """The ADVICE r13 race, pinned as an invariant: the input-sized
    state-partition override must be invisible to the caller's
    session. Before the cloned-session fix, every stateful catalog
    query set-then-restored spark.sql.shuffle.partitions on the
    SHARED session -- a concurrent query could bind its shuffles (or
    its own streaming state) to the temporary value. Run the whole
    changed tier and assert the caller's conf never moves."""
    from clueso_spark.plans.catalog import REGISTRY, all_queries

    all_queries()
    key = "spark.sql.shuffle.partitions"
    before = spark.conf.get(key)
    sf = "/root/testdata/sf0.001"
    for name in (
        "st_stream_stream_join",
        "st_stream_stream_outer_join",
        "st_dedup_replay",
        "st_windowed_counts",
        "st_session_windows",
        "st_windowed_topk",
    ):
        assert REGISTRY[name].spark(spark, sf).count() >= 0, name
        assert spark.conf.get(key) == before, name


def test_state_sized_reruns_drop_the_previous_sink(spark):
    """ADVICE r14 memory hygiene, pinned: each run_on_state_sized_session
    call drains a full result into a memory-sink temp table on a fresh
    cloned session; without cleanup a best-of-N bench sweep accumulates
    one drained table per run. Contract: re-invoking the SAME query
    drops the previous invocation's sink (persist_swap semantics --
    consume the result before re-running), so at most one clone per
    (caller session, sink name) stays registered."""
    from clueso_spark.plans.catalog import REGISTRY, all_queries
    from clueso_spark.plans.streaming_queries import _STATE_SINKS

    all_queries()
    sf = "/root/testdata/sf0.001"
    name = "st_windowed_counts"
    first_rows = REGISTRY[name].spark(spark, sf).count()
    sinks = _STATE_SINKS[spark]
    assert len(sinks) >= 1
    sink_name, first_clone = next(
        (k, v) for k, v in sinks.items() if "windowed_counts" in k
    )
    # rerun: the registry must still hold exactly one clone for this
    # sink name, and it must be a NEW clone with the OLD view dropped
    second_rows = REGISTRY[name].spark(spark, sf).count()
    assert second_rows == first_rows > 0
    second_clone = _STATE_SINKS[spark][sink_name]
    assert second_clone is not first_clone
    assert not any(
        t.name == sink_name for t in first_clone.catalog.listTables()
    ), "previous invocation's memory sink was not dropped"
