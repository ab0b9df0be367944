"""Query catalog: named, tested DataFrame plans + their ANSI-SQL oracles."""

from clueso_spark.plans.catalog import CatalogQuery, REGISTRY, register, all_queries

__all__ = ["CatalogQuery", "REGISTRY", "register", "all_queries"]
