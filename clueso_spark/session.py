"""Tuned SparkSession builder.

The reference tunes its sessions via spark-defaults
(ref: docker/images/clueso-docker-livy/conf/spark-defaults.conf:1-12 --
spark.sql.shuffle.partitions=800, Kryo, s3a fast upload at
SparkUtils.scala:40-55).  On Spark 3/4 most of that hand-tuning is subsumed
by AQE; we enable it and keep the rest as config, not code.

Scale stance: shuffle-partition count here is the *local* default; on a real
cluster AQE coalescing makes the initial number mostly irrelevant as long as
it is high enough (set spark.sql.shuffle.partitions ~ 2-3x total cores via
spark-submit conf; AQE merges small post-shuffle partitions at runtime).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "clueso-spark", **extra_conf: str) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Honors ``SPARK_GRAFT_CPUS`` for local master sizing. Any ``extra_conf``
    key/values are applied last and win.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # explicit schemas everywhere; never pay footer-inference listing cost
        .config("spark.sql.parquet.mergeSchema", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_UI", "false"))
    )
    if not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in extra_conf.items():
        builder = builder.config(k.replace("__", "."), v)
    return builder.getOrCreate()
