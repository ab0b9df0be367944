"""Dynamic Partition Pruning: runtime scan reduction on partitioned facts.

The second scan-reduction lever at 100 TB (bucketing kills the join
shuffle; DPP kills the fact SCAN): when a partitioned fact table joins
a filtered dimension on the partition column, Catalyst injects the
dim's filtered key set into the fact scan's PartitionFilters as a
runtime (`dynamicpruning`) subquery -- with reuseBroadcastOnly (the
default), it reuses the join's own broadcast, so the pruning is free.
The store's landing zone does the STATIC version of this (explicit
bucket-path reads); DPP is what the same layout buys for ad-hoc joins
the store didn't anticipate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_dpp_prunes_partitioned_fact_scan(spark, tmp_path):
    fact_path = str(tmp_path / "events_by_type")
    events = spark.read.parquet(f"{SF}/events.parquet")
    events.write.partitionBy("event_type").mode("overwrite").parquet(
        fact_path
    )
    fact = spark.read.parquet(fact_path)
    # dim filtered by a NON-join predicate: only the two 5-char types
    # survive, so the fact scan should touch 2 of 5 partitions
    dim = (
        events.select(F.col("event_type").alias("d_type"))
        .distinct()
        .where(F.length("d_type") == 5)
    )
    joined = (
        fact.join(dim, fact.event_type == dim.d_type)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    rows = {r["event_type"]: r["n"] for r in joined.collect()}
    want = {
        r["event_type"]: r["n"]
        for r in events.where(F.length("event_type") == 5)
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert rows == want
    assert set(rows) == {"click", "error"}
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, plan


def test_dpp_disabled_scans_statically(spark, tmp_path):
    """Control: with DPP off the same join carries no dynamicpruning
    subquery -- pins that the assertion above is measuring DPP, not an
    incidental plan string."""
    fact_path = str(tmp_path / "events_by_type")
    events = spark.read.parquet(f"{SF}/events.parquet")
    events.write.partitionBy("event_type").mode("overwrite").parquet(
        fact_path
    )
    prev = spark.conf.get(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled"
    )
    spark.conf.set(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled", "false"
    )
    try:
        fact = spark.read.parquet(fact_path)
        dim = (
            events.select(F.col("event_type").alias("d_type"))
            .distinct()
            .where(F.length("d_type") == 5)
        )
        joined = fact.join(dim, fact.event_type == dim.d_type)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "dynamicpruning" not in plan, plan
    finally:
        spark.conf.set(
            "spark.sql.optimizer.dynamicPartitionPruning.enabled", prev
        )
