"""Relational/dataflow operators: merge-on-read, search, compaction, cache,
pagination, dedup, similarity."""

from clueso_spark.operators.merge import flatten_message, merged_latest_state
from clueso_spark.operators.query import MetadataQuery, MetadataQueryExecutor
from clueso_spark.operators.compact import Compactor
from clueso_spark.operators.cache import BucketCacheManager

__all__ = [
    "merged_latest_state",
    "flatten_message",
    "MetadataQuery",
    "MetadataQueryExecutor",
    "Compactor",
    "BucketCacheManager",
]
