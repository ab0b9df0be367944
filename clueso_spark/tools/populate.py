"""Synthetic landing-zone populator (S10).

Re-expression of LandingMetadataPopulatorTool
(ref: tools/LandingMetadataPopulatorTool.scala:50-99): write N put-events
across M parquet files into one bucket's landing partition, with random
``x-amz-meta-food`` / ``x-amz-meta-random`` user metadata.

Spark-first: the reference builds rows in a driver-seeded RDD
``mapPartitions``; we declare the same rows with ``spark.range(n)`` +
Column expressions -- fully distributed, no Python in the loop, any scale.
Pseudo-randomness derives from md5 of the record id (deterministic under a
seed, still uniform), which also makes populated data reproducible.
"""

from __future__ import annotations

import argparse

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clueso_spark.schemas import MESSAGE_SCHEMA
from clueso_spark.sources.store import MetadataStore
from clueso_spark.streaming.ingest import next_max_op_index


def generate_events(
    spark: SparkSession,
    bucket: str,
    num_records: int,
    num_files: int,
    *,
    compaction_record_interval: int = 100_000,
    seed: str = "clueso",
) -> DataFrame:
    """N stored-event rows shaped per storedEventSchema, in ``num_files``
    partitions (1 parquet file each on write)."""
    rnd = F.md5(F.concat(F.lit(seed), F.col("id").cast("string")))
    # uniform nibble in [0, 15] from the md5 hex -- deterministic "random"
    nib = F.expr("instr('0123456789abcdef', substring(rnd, 1, 1)) - 1")
    op_index = F.concat(
        F.lpad((F.col("id") + 1).cast("string"), 12, "0"),
        F.lit("_"),
        (nib % 10).cast("string"),
    )
    empty_message = F.from_json(F.lit("{}"), MESSAGE_SCHEMA)
    message = (
        empty_message.withField(
            "userMd",
            F.map_from_arrays(
                F.array(F.lit("x-amz-meta-food"), F.lit("x-amz-meta-random")),
                F.array(
                    F.when(nib % 2 == 0, "pizza").otherwise("pasta"),
                    (nib % 10).cast("string"),
                ),
            ),
        )
        .withField("`content-length`", (nib * 13 % 200).cast("int"))
        .withField("`content-md5`", F.lit("4b02d12ad7f063d67aec9dc2116a57a2"))
        .withField("`last-modified`", F.current_timestamp())
        .withField("isDeleteMarker", F.lit(False))
        .withField("`md-model-version`", F.lit(1))
    )
    return (
        spark.range(num_records)
        .repartition(num_files)
        .withColumn("rnd", rnd)
        .select(
            F.lit(bucket).alias("bucket"),
            F.concat(
                F.substring("rnd", 1, 4), F.lit("_"), F.col("id").cast("string")
            ).alias("key"),
            op_index.alias("opIndex"),
            F.lit("put").alias("type"),
            message.alias("message"),
        )
        .withColumn(
            "maxOpIndex",
            next_max_op_index(F.col("opIndex"), compaction_record_interval),
        )
        .select("bucket", "key", "opIndex", "maxOpIndex", "type", "message")
    )


def populate(
    spark: SparkSession,
    store: MetadataStore,
    bucket: str,
    num_records: int,
    num_files: int,
    *,
    compaction_record_interval: int = 100_000,
    overwrite: bool = True,
) -> int:
    """Generate and write; returns records written. Deletes the bucket's
    landing partition first, like the reference tool (ref: :40-45)."""
    landing_bucket = f"{store.landing}/bucket={bucket}"
    if overwrite and store.exists(landing_bucket):
        store.delete(landing_bucket)
    df = generate_events(
        spark,
        bucket,
        num_records,
        num_files,
        compaction_record_interval=compaction_record_interval,
    )
    store.write_landing(df)
    return num_records


def main() -> int:
    ap = argparse.ArgumentParser(
        description="Populate a bucket's landing zone with synthetic events"
    )
    ap.add_argument("store_root")
    ap.add_argument("bucket")
    ap.add_argument("num_records", type=int)
    ap.add_argument("num_files", type=int)
    ap.add_argument("--interval", type=int, default=100_000)
    args = ap.parse_args()

    from clueso_spark.session import get_spark

    spark = get_spark("clueso-populator")
    store = MetadataStore(spark, args.store_root)
    n = populate(
        spark,
        store,
        args.bucket,
        args.num_records,
        args.num_files,
        compaction_record_interval=args.interval,
    )
    print(f"populated {n} records into {store.landing}/bucket={args.bucket}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
