"""Event-parsing transform: Kafka wire bytes -> stored-event rows.

Re-expresses the reference's ``filterAndParseEvents``
(ref: MetadataIngestionPipeline.scala:101-141) and its two UDFs as *native*
column expressions -- no Python in the hot path:

  * ``msg_rewrite`` (ref: MetadataIngestionPipeline.scala:15-70, a Jackson
    UDF): re-parse the double-encoded ``value`` string; collapse every
    dynamic ``x-amz-meta-*`` field into one ``userMd map<string,string>``;
    truncate ``location`` to its first element; tolerate malformed input.
    Here: two ``from_json`` passes (map-typed pass feeds ``map_filter`` for
    userMd; struct-typed pass gives typed fields) + ``Column.withField`` +
    ``slice``. Malformed rows yield NULL from ``from_json`` and are filtered,
    matching the reference's ""-on-error + length filter
    (ref: MetadataIngestionPipeline.scala:108-110).
  * ``find_next_max_op_index`` (ref: MetadataIngestionPipeline.scala:77-86):
    pure integer column math, see :func:`next_max_op_index`.

Because everything is Column expressions, the same transform runs identically
under batch and Structured Streaming, stays inside whole-stage codegen, and
needs no Arrow transfer. This is the single biggest Spark-first win over the
reference design: at 100 TB of Kafka backlog the rewrite UDF would dominate
ingest CPU; here it is JVM-vectorized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from clueso_spark.schemas import (
    EVENT_SCHEMA,
    MESSAGE_SCHEMA,
    SYSTEM_BUCKET_PREFIXES,
    SYSTEM_BUCKETS,
)

# Versioned keys legally contain \x00 inside JSON strings; the reference
# enables ALLOW_UNQUOTED_CONTROL_CHARS for this
# (ref: MetadataIngestionPipeline.scala:17-18).
_JSON_OPTIONS = {"allowUnquotedControlChars": "true"}


def next_max_op_index(op_index: Column, interval: int) -> Column:
    """Round the 12-digit record number of ``op_index`` up to the next
    multiple of ``interval``; exact multiples map to themselves.

    (ref: MetadataIngestionPipeline.scala:77-86, UDF
    ``find_next_max_op_index``; pinned by CluesoIngestionPipelineSpec:42-53.)
    Integer-only math => stays in codegen, no UDF.
    """
    recno = F.substring(op_index, 1, 12).cast("long")
    return ((recno + F.lit(interval - 1)) / interval).cast("long") * interval


def is_system_bucket(
    bucket: Column, excluded_buckets: tuple[str, ...] = ()
) -> Column:
    """Blacklist predicate for internal buckets
    (ref: MetadataIngestionPipeline.scala:132-138; pinned by
    CluesoIngestionPipelineSpec:56-76).

    ``excluded_buckets`` mirrors the reference's configurable
    ``bucketNameToFilterOut`` (the metadata store's own bucket, filtered to
    avoid self-ingestion loops, ref: MetadataIngestionPipeline.scala:133 +
    CluesoConfig.scala bucketName).
    """
    cond = F.lit(False)
    for name in (*SYSTEM_BUCKETS, *excluded_buckets):
        cond = cond | bucket.eqNullSafe(F.lit(name))
    for prefix in SYSTEM_BUCKET_PREFIXES:
        cond = cond | bucket.startswith(prefix)
    return cond


def parse_events(
    raw: DataFrame,
    compaction_record_interval: int = 100_000,
    excluded_buckets: tuple[str, ...] = (),
) -> DataFrame:
    """Parse raw Kafka-wire records into stored-event rows.

    ``raw`` needs one column ``value`` (binary or string): the JSON envelope
    ``{opIndex, type, bucket, key, value}`` whose inner ``value`` is a
    string-encoded JSON metadata document. Returns a DataFrame with the
    stored-event columns ``(bucket, key, opIndex, maxOpIndex, type, message)``
    (ref: MetadataIngestionPipeline.scala:101-141). Works on both batch and
    streaming DataFrames.
    """
    content = F.col("value").cast("string")

    parsed = (
        raw.select(content.alias("content"))
        # garbage filter (ref: MetadataIngestionPipeline.scala:108-110)
        .filter(F.col("content").isNotNull() & (F.length("content") > 3))
        .select(F.from_json("content", EVENT_SCHEMA, _JSON_OPTIONS).alias("event"))
        .filter(F.col("event").isNotNull())
        # observable drop counters for the two hardening filters below:
        # batch runs read them via a QueryExecutionListener, streaming runs
        # via StreamingQueryProgress.observedMetrics["ingest_drops"] -- so
        # discarded envelopes are COUNTED, never silent
        .observe(
            "ingest_drops",
            F.count(F.when(F.col("event.type").isNull(), 1)).alias(
                "null_type"
            ),
            F.count(
                F.when(
                    F.col("event.type").isNotNull()
                    & F.col("event.opIndex").isNull(),
                    1,
                )
            ).alias("null_op_index"),
        )
        # a well-formed envelope missing `type` must be discarded at ingest,
        # not carried as type=NULL -- a NULL-typed winning row would make the
        # merge's `type != 'delete'` evaluate NULL and wrongly hide the key
        # (ref: MetadataIngestionPipeline.scala:116 event.type filter)
        .filter(F.col("event.type").isNotNull())
        # likewise `opIndex`: it is the merge-on-read ordering key AND the
        # maxOpIndex partition source. INTENTIONAL DIVERGENCE from the
        # reference (MetadataIngestionPipeline.scala:115-129 passes
        # null-opIndex rows through): here a NULL would land in the Hive
        # default partition, un-orderable by the dedup window and unreadable
        # by the compactor's integer subpartition listing, so such rows are
        # dropped -- and surfaced in the ingest_drops observation above
        .filter(F.col("event.opIndex").isNotNull())
        # two-pass inner parse of the double-encoded document:
        #   map pass -> dynamic x-amz-meta-* capture; struct pass -> typed cols
        .withColumn(
            "_doc_map",
            F.from_json(
                "event.value", "map<string,string>", _JSON_OPTIONS
            ),
        )
        .withColumn(
            "_doc", F.from_json("event.value", MESSAGE_SCHEMA, _JSON_OPTIONS)
        )
        # reject rows whose inner value is not a JSON object, matching the
        # reference's ""-on-error tolerance (pinned by
        # CluesoIngestionPipelineSpec:78-82)
        .filter(F.col("_doc_map").isNotNull())
    )

    user_md = F.map_filter(
        F.col("_doc_map"), lambda k, _: k.startswith("x-amz-meta-")
    )
    message = (
        F.col("_doc")
        .withField("userMd", user_md)
        # keep only the first chunk location
        # (ref: MetadataIngestionPipeline.scala:47-52; pinned by
        # CluesoIngestionPipelineSpec:28-40)
        .withField("location", F.slice("_doc.location", 1, 1))
    )

    out = (
        parsed.withColumn("message", message)
        # conditional defaulting (ref: MetadataIngestionPipeline.scala:116-130)
        .withColumn(
            "key",
            F.when(F.col("event.key").isNotNull(), F.col("event.key")).otherwise(
                F.lit("")
            ),
        )
        .withColumn(
            "bucket",
            F.when(
                F.col("event.bucket").isNotNull(), F.col("event.bucket")
            ).otherwise(F.lit("NOBUCKET")),
        )
        .withColumn("type", F.col("event.type"))
        .withColumn("opIndex", F.col("event.opIndex"))
        .withColumn(
            "maxOpIndex",
            next_max_op_index(F.col("opIndex"), compaction_record_interval),
        )
        .filter(~is_system_bucket(F.col("bucket"), excluded_buckets))
        .select("bucket", "key", "opIndex", "maxOpIndex", "type", "message")
    )
    return out
