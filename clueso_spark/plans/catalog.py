"""Registry of named queries: Spark plan + DuckDB oracle SQL.

Every operator the engine claims (SURVEY.md §2 inventory + the training-data
pipeline extensions) registers here as a ``CatalogQuery``: a callable
``(spark, sf_dir) -> DataFrame`` and, where SQL-expressible, an equivalent
ANSI-SQL string the driver runs on DuckDB over the same parquet tables.

Determinism contract (so value-hashes match across engines):
  * every computed column is aliased identically in both forms;
  * money/qty aggregates go through ``decimal`` so sums are exact and
    order-independent, then cast back to double (identical bits in both
    engines); see :func:`dec`;
  * all orderings are made total with explicit key tie-breakers;
  * no wall-clock, no RNG; any pseudo-randomness derives from md5 of data.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class CatalogQuery:
    name: str
    description: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> driver does rows-only check
    tags: tuple[str, ...] = field(default=())
    #: optional domain guard for the oracle: some oracles replicate an
    #: adaptive algorithm at its small-corpus floor (e.g. the fixed
    #: hyperplane count in dedup_embedding_cosine) and are only valid
    #: while the Spark side's adaptive parameter sits on that floor.
    #: The parity harness calls this with sf_dir and falls back to a
    #: rows-only check when it returns False. The driver's gate runs at
    #: sf0.01, inside every registered oracle's domain.
    oracle_valid: Callable[[str], bool] | None = None


REGISTRY: dict[str, CatalogQuery] = {}


def register(
    name: str,
    description: str,
    oracle: str | None,
    *tags: str,
    oracle_valid: Callable[[str], bool] | None = None,
):
    """Decorator: register a (spark, sf_dir) -> DataFrame callable."""

    def wrap(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = CatalogQuery(
            name, description, fn, oracle, tuple(tags), oracle_valid
        )
        return fn

    return wrap


#: every module contributing CatalogQuery registrations
QUERY_MODULES = [
    "clueso_spark.plans.relational",
    "clueso_spark.plans.event_queries",
    "clueso_spark.plans.text_queries",
    "clueso_spark.plans.dedup_queries",
    "clueso_spark.plans.similarity_queries",
    "clueso_spark.plans.multimodal_queries",
    "clueso_spark.plans.streaming_queries",
    # round 6: the formerly-staged tier is promoted -- the module calls
    # staged_r6.promote() at import, landing all 18 in REGISTRY
    "clueso_spark.plans.staged_r6",
    # round 8: the round-7 staged tier is promoted the same way (13
    # queries, each pytest-proven against its DuckDB oracle at sf0.001 +
    # sf0.01 before registration; they head the round-8 driver window)
    "clueso_spark.plans.staged_r8",
]

#: Explicit verification priority. The driver's CORRECTNESS gate covers a
#: bounded prefix of the registry (50 queries per round), so ordering is
#: part of the contract. Round-8 rotation, executing the standing policy
#: ("promote (a) never-driver-verified names, (b) anything whose code
#: changed, then (c) the entries whose last driver row is OLDEST,
#: demoting the freshest greens"):
#: (1) the 13 promoted staged_r8 queries -- registered this round, so
#: never driver-verified; pytest-proven against their DuckDB oracles at
#: sf0.001 + sf0.01 (tests/test_staged_r8.py) but the driver row is the
#: claim that counts;
#: (2) the one query whose CODE changed this round:
#: pipeline_pretraining_funnel (exact-dedup fingerprint folded into the
#: base projection so raw text never enters the persist -- the r7
#: driver-bench blowup fix; the oracle is unchanged);
#: (3) the 7 round-7 rotation leftovers (latest green r4 -- the oldest
#: rows anywhere);
#: (4) 29 of the 49 queries whose latest green is r5. The 20 deferred
#: r5 names (tests/test_entry.py ROTATION_LEFTOVERS: trivial, stable,
#: multiply-green relational/scalar/setop/window shapes) head round 9's
#: refresh cohort.
#: Window math: 13 + 1 + 7 + 29 = 50; with 165 registered queries and a
#: 50-slot window the full-registry refresh cycle is ceil(165/50) = 4
#: rounds, so the out-of-window freshness invariant is now "no green
#: older than cycle-1 = 3 rounds behind the newest committed artifact"
#: (tests/test_entry.py asserts exactly that; the former two-round
#: horizon is arithmetically impossible at this registry size).
PRIORITY = [
    # (1) promoted this round -- never driver-verified, head the window
    "pipeline_domain_caps",
    "join_bloom_pruned_revenue",
    "graph_assoc_rules",
    "pipeline_epoch_shuffle_shards",
    "ev_rollup_incremental_merge",
    "txt_cooccurrence_pmi",
    "dedup_threshold_curve",
    "ev_decile_lift",
    "agg_poisson_bootstrap",
    "st_foreach_batch_upsert",
    "mm_shard_manifest",
    "txt_rake_keywords",
    "pipeline_incremental_corpus_diff",
    # (2) changed code this round -- re-verify
    "pipeline_pretraining_funnel",
    # (3) the 7 round-7 leftovers: latest green r4, oldest anywhere
    "q4_priority_check",
    "q15_top_supplier",
    "q22_global_sales_opportunity",
    "agg_exact_median",
    "txt_fingerprints",
    "txt_regex_token_count",
    "ev_anomaly_zscore",
    # (4) r5 greens: next-oldest cohort (29 of 49; the heavier /
    # engine-semantics shapes refresh first, trivial relational shapes
    # defer to round 9 as documented leftovers)
    "dedup_connected_components",
    "dedup_minhash_lsh",
    "txt_perplexity_proxy",
    "txt_tfidf_topk_similar",
    "pipeline_quality_audit",
    "ev_hourly_rollup",
    "ev_json_props",
    "ev_keyset_page",
    "ev_latest_dense_rank",
    "ev_latest_no_tombstone",
    "ev_pivot_user_activity",
    "ev_predicate_search",
    "ev_range_join_attribution",
    "agg_cube_flag_status",
    "agg_distinct_counts",
    "agg_grouping_sets",
    "agg_price_histogram",
    "agg_rollup_priority_status",
    "unpivot_lineitem_measures",
    "window_rolling_spend",
    "join_left_order_counts",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q7_nation_volume_shipping",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    # --- window boundary (50) ----------------------------------------
    # round-9 head: the 20 deferred r5 greens (oldest rows after this
    # round's refresh), then the remainder in registration order
    "scalar_date_functions",
    "scalar_function_showcase",
    "scalar_null_semantics",
    "setop_except_urgent_only",
    "setop_intersect_all_multiset",
    "setop_intersect_buyers",
    "setop_union_schema_aligned",
    "subquery_above_avg",
    "subquery_exists_not_exists",
    "join_anti_no_urgent_orders",
    "join_full_outer_nation_profile",
    "join_inner_big_orders",
    "join_semi_urgent_customers",
    "window_lag_reorder_gap",
    "window_ntile_quartiles",
    "window_rank_top_balances",
    "q6_forecast_revenue",
    "q12_priority_shipmode",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    # r6/r7 greens: freshest, rotate last (remainder keeps registration
    # order after this block -- nothing is dropped)
]


def all_queries() -> dict[str, CatalogQuery]:
    """Import all query modules and return the registry in verification
    priority order (see PRIORITY) -- prioritized names first, then the
    remainder in registration order."""
    import importlib

    # imports are deferred so a SparkSession is never needed at import time
    for mod in QUERY_MODULES:
        importlib.import_module(mod)
    ordered = {n: REGISTRY[n] for n in PRIORITY if n in REGISTRY}
    ordered.update({n: cq for n, cq in REGISTRY.items() if n not in ordered})
    return ordered


#: per-session registry of persisted intermediate DataFrames, keyed
#: (SparkSession, slot): the next call on the SAME session+slot
#: unpersists the previous one, so repeated runs (bench best-of-N, the
#: parity gate) never accumulate cache entries -- while two interleaved
#: SparkSessions cannot unpersist each other's intermediates. WeakKey: a
#: garbage-collected session drops its entries (its cache died with it).
#: Lives here (not in a query module) so every plan module can share it
#: without inter-module import cycles.
_PERSISTED: "weakref.WeakKeyDictionary[SparkSession, dict[str, DataFrame]]" = (
    weakref.WeakKeyDictionary()
)


def persist_swap(spark: SparkSession, slot: str, df: DataFrame) -> DataFrame:
    """Persist ``df`` (MEMORY_AND_DISK: at 100 TB intermediates spill
    rather than OOM, and recomputation -- a full corpus re-scan -- is
    the costlier alternative), releasing whatever the previous call on
    this session's ``slot`` pinned."""
    slots = _PERSISTED.setdefault(spark, {})
    prev = slots.pop(slot, None)
    if prev is not None:
        prev.unpersist()
    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    slots[slot] = df
    return df


def release_persisted(spark: SparkSession) -> None:
    """Unpersist every slot this session pinned, across BOTH slot
    registries (this one and functions/ordered's mirror). Bench/parity
    hygiene: in a long multi-query session the accumulated slots of
    prior queries compete with the current query's working set for
    unified storage memory, turning cache eviction churn into measured
    query time (the r7 driver-bench funnel blowup's suspected
    mechanism). Queries re-persist what they need on the next call, so
    releasing between queries costs nothing but the recompute each
    query already pays on its own first run."""
    from clueso_spark.functions import ordered

    for registry in (_PERSISTED, ordered._PERSISTED):
        slots = registry.get(spark)
        if slots:
            for df in slots.values():
                df.unpersist()
            slots.clear()


def dec(col: str | F.Column, width: int = 12, scale: int = 2) -> F.Column:
    """Exact-arithmetic bridge: cast a 2-decimal double to decimal so sums
    are order-independent and reproducible bit-for-bit across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({width},{scale})")


def as_double(c: F.Column) -> F.Column:
    return c.cast("double")
