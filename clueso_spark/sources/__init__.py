"""Sources/sinks: two-tier parquet metadata store + testdata table loaders."""

from clueso_spark.sources.store import MetadataStore
from clueso_spark.sources.tables import TABLE_NAMES, load_table, register_views

__all__ = ["MetadataStore", "TABLE_NAMES", "load_table", "register_views"]
