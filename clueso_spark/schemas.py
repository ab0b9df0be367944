"""Schemas for the object-metadata event log.

PySpark re-declaration of the reference's schema constants
(ref: src/main/scala/com/scality/clueso/CluesoConstants.scala:9-79).
Three representations of the same logical row:

  * ``EVENT_SCHEMA``        -- Kafka-wire envelope; its ``value`` field is a
    *string-encoded* JSON document (double-encoded JSON,
    ref: MetadataIngestionPipeline.scala:25-28).
  * ``STORED_EVENT_SCHEMA`` -- landing/staging Parquet rows
    (ref: CluesoConstants.scala:63-69); ``bucket`` and ``maxOpIndex`` double
    as Hive-style partition columns on disk.
  * ``RESULT_COLS``         -- the 8 fixed search-result columns
    (ref: CluesoConstants.scala:71-79).

Everything is declared explicitly: readers always pass ``.schema(...)`` so no
job ever depends on parquet footer inference (scale: schema inference on a
100 TB landing zone would list and read footers of every file).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# message sub-structures (ref: CluesoConstants.scala:9-37)
# ---------------------------------------------------------------------------

ACL_SCHEMA = StructType(
    [
        StructField("Canned", StringType()),
        StructField("FULL_CONTROL", ArrayType(StringType())),
        StructField("WRITE_ACP", ArrayType(StringType())),
        StructField("READ", ArrayType(StringType())),
        StructField("READ_ACP", ArrayType(StringType())),
    ]
)

LOCATION_SCHEMA = StructType(
    [
        StructField("key", StringType()),
        StructField("size", LongType()),
        StructField("start", LongType()),
        StructField("dataStoreName", StringType()),
        StructField("dataStoreETag", StringType()),
    ]
)

REPLICATION_INFO_SCHEMA = StructType(
    [
        StructField("status", StringType()),
        StructField("content", ArrayType(StringType())),
        StructField("destination", StringType()),
        StructField("storageClass", StringType()),
        StructField("role", StringType()),
    ]
)

# ---------------------------------------------------------------------------
# message struct: the normalized object-metadata document
# (ref: CluesoConstants.scala:30-53 "eventValueSchema")
# ---------------------------------------------------------------------------

MESSAGE_SCHEMA = StructType(
    [
        StructField("userMd", MapType(StringType(), StringType())),
        StructField("bucket", StringType()),
        StructField("key", StringType()),
        StructField("acl", ACL_SCHEMA),
        StructField("location", ArrayType(LOCATION_SCHEMA)),
        StructField("tags", MapType(StringType(), StringType())),
        StructField("replicationInfo", REPLICATION_INFO_SCHEMA),
        StructField("md-model-version", IntegerType()),
        StructField("owner-display-name", StringType()),
        StructField("owner-id", StringType()),
        StructField("content-length", IntegerType()),
        StructField("content-type", StringType()),
        StructField("last-modified", TimestampType()),
        StructField("content-md5", StringType()),
        StructField("x-amz-server-version-id", StringType()),
        StructField("dataStoreName", StringType()),
        StructField("x-amz-storage-class", StringType()),
        StructField("x-amz-server-side-encryption", StringType()),
        StructField("x-amz-server-side-encryption-aws-kms-key-id", StringType()),
        StructField("x-amz-server-side-encryption-customer-algorithm", StringType()),
        StructField("x-amz-website-redirect-location", StringType()),
        StructField("isDeleteMarker", BooleanType()),
        StructField("x-amz-version-id", StringType()),
    ]
)

# Kafka-wire envelope (ref: CluesoConstants.scala:56-61 "eventSchema").
# NB: the envelope's `value` is a STRING carrying escaped JSON -- parsed in a
# second from_json pass by the ingestion transform.
EVENT_SCHEMA = StructType(
    [
        StructField("opIndex", StringType()),
        StructField("type", StringType()),
        StructField("bucket", StringType()),
        StructField("key", StringType()),
        StructField("value", StringType()),
    ]
)

# Landing/staging stored rows (ref: CluesoConstants.scala:63-69
# "storedEventSchema").
STORED_EVENT_SCHEMA = StructType(
    [
        StructField("bucket", StringType()),
        StructField("key", StringType(), nullable=False),
        StructField("opIndex", StringType(), nullable=False),
        StructField("maxOpIndex", LongType(), nullable=False),
        StructField("type", StringType(), nullable=False),
        StructField("message", MESSAGE_SCHEMA),
    ]
)

# Search-result projection (ref: CluesoConstants.scala:71-79 "resultCols").
RESULT_COLS = [
    "key",
    "last-modified",
    "content-md5",
    "owner-id",
    "owner-display-name",
    "content-length",
    "x-amz-storage-class",
    "bucket",
]

# Version keys embed a NUL between key and version id; the default
# (master-only) listing filters them out
# (ref: MetadataQueryExecutor.scala:82-84).
VERSION_KEY_CHAR = "\x00"

# System buckets excluded from ingestion
# (ref: MetadataIngestionPipeline.scala:132-138).
SYSTEM_BUCKETS = ("users..bucket", "__metastore", "PENSIEVE")
SYSTEM_BUCKET_PREFIXES = ("mpuShadowBucket",)
