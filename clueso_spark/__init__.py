"""clueso_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of scality/clueso, re-expressed Spark-first.

The reference (read-only at /root/reference/) is an S3 object-metadata search
engine: a Kafka->Parquet streaming ingest pipeline, an LSM-style two-tier
(landing/staging) Parquet store with merge-on-read latest-state semantics, a
periodic compactor, and a SQL-WHERE search API with keyset pagination.

This package rebuilds those capabilities on modern PySpark (DataFrame / SQL /
Catalyst / Structured Streaming) and extends them with the relational operator
surface and large-scale training-data pipeline operators (dedup, similarity
search, text analysis) described in SURVEY.md §2 and §7.

Layout:
    schemas        -- event/stored/result schemas (ref: CluesoConstants.scala)
    session        -- tuned SparkSession builder for local + cluster use
    sources/       -- landing/staging parquet store, testdata table loaders
    streaming/     -- ingestion transform + streaming pipeline wiring
    operators/     -- merge-on-read, compaction, search, pagination, joins,
                      dedup, similarity
    functions/     -- column function libraries (text, vectors, multimodal)
    plans/         -- named query catalog (Spark plan + DuckDB oracle per
                      operator) and the local parity checker
    tools/         -- populator / compactor / storage-info CLIs
    config         -- deployment configuration + engine composition root
    metrics        -- per-bucket search counters/timings
"""

__version__ = "0.1.0"
