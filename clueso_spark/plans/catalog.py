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
]

#: Explicit verification priority. The driver's CORRECTNESS gate covers a
#: bounded prefix of the registry (50 queries per round), so ordering is
#: part of the contract. Round-5 rotation, executing the round-4 policy
#: as written ("promote (a) anything new/changed, then (b) the entries
#: whose last driver row is OLDEST, demoting the freshest greens"):
#: (1) the five queries whose code changed this round -- the vocab
#: broadcasts un-forced (txt_perplexity_proxy, txt_tfidf_topk_similar,
#: pipeline_pretraining_funnel), the minhash core refactored to accept a
#: shared token relation (dedup_minhash_lsh), and the connected-
#: components byte-guard/dtype changes (dedup_connected_components);
#: (2) 45 of the 47 queries whose only green row is from r2 (the
#: relational/setop/scalar/window/subquery tier), refreshing the oldest
#: rows in the union. The two r2 leftovers (profile_lineitem,
#: sort_limit_top_orders -- the two most trivial plans, untouched since
#: r2) sit first past the boundary for round-6 promotion, followed by
#: the r3 greens (next-oldest, round-6's refresh cohort) and the
#: freshest r4 greens last. Union stays 134/134 with no row older than
#: two rounds; tests/test_entry.py pins both invariants mechanically.
#: Round-6 note: EIGHTEEN staged operators (plans/staged_r6.py, pytest
#: parity-gated at two SFs) await promotion -- call staged_r6.promote()
#: and list them HERE at the top of the window (staged_r6.ROUND6_WINDOW
#: is the precomputed 50-name list). Concrete round-6 window math
#: (50 slots): 18 staged (never driver-verified, must enter) + the
#: 2 r2 leftovers (profile_lineitem, sort_limit_top_orders) + 30 of the
#: 37 r3-only greens = 50. Defer the 7 most trivial/stable r3 rows
#: (staged_r6.ROUND6_LEFTOVERS: ev_message_flatten,
#: ev_result_projection, ev_version_filter, ev_isin_subpartitions,
#: dedup_exact_summary, agg_approx_count_distinct, agg_approx_percentile
#: -- fixed-projection / isin / single-agg shapes untouched since
#: r2-r3): round 6 copies that list into tests/test_entry.py
#: ROTATION_LEFTOVERS (the stale-green invariant exempts only documented
#: leftovers) and they head round 7's refresh cohort. At 152 registered
#: queries the 50-slot window with a two-round horizon covers 150, so a
#: standing ~7-name leftover debt is the honest steady state (the
#: rehearsal test simulates and pins exactly this arithmetic).
PRIORITY = [
    # (1) changed this round -- re-verify first
    "txt_perplexity_proxy",
    "txt_tfidf_topk_similar",
    "pipeline_pretraining_funnel",
    "dedup_minhash_lsh",
    "dedup_connected_components",
    # (2) oldest greens: only driver row is r2 -- refresh 45 of 47
    "ev_latest_no_tombstone",
    "ev_latest_dense_rank",
    "ev_predicate_search",
    "ev_keyset_page",
    "ev_json_props",
    "ev_hourly_rollup",
    "ev_pivot_user_activity",
    "ev_range_join_attribution",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_forecast_revenue",
    "q7_nation_volume_shipping",
    "q10_returned_items",
    "q12_priority_shipmode",
    "q13_order_count_distribution",
    "q14_promo_revenue",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    "join_inner_big_orders",
    "join_left_order_counts",
    "join_semi_urgent_customers",
    "join_anti_no_urgent_orders",
    "join_full_outer_nation_profile",
    "agg_cube_flag_status",
    "agg_rollup_priority_status",
    "agg_grouping_sets",
    "agg_distinct_counts",
    "agg_price_histogram",
    "window_rank_top_balances",
    "window_ntile_quartiles",
    "window_lag_reorder_gap",
    "window_rolling_spend",
    "setop_union_schema_aligned",
    "setop_intersect_buyers",
    "setop_intersect_all_multiset",
    "setop_except_urgent_only",
    "subquery_above_avg",
    "subquery_exists_not_exists",
    "scalar_function_showcase",
    "scalar_date_functions",
    "scalar_null_semantics",
    "unpivot_lineitem_measures",
    "pipeline_quality_audit",
    # --- window boundary (50) ----------------------------------------
    # r2 leftovers: first in line for round 6
    "profile_lineitem",
    "sort_limit_top_orders",
    # r3 greens: next-oldest, round-6 refresh cohort
    "sim_ivf_cells",
    "sim_kmeans_lloyd",
    "sim_pq_codes",
    "sim_residual_norms",
    "sim_ann_recall_at_k",
    "sim_ivf_kmeans_ann",
    "txt_tf_df_top_terms",
    "txt_token_stats",
    "txt_lang_stats",
    "txt_top_bigrams",
    "txt_quality_score",
    "txt_langid_heuristic",
    "pipeline_train_test_split",
    "pipeline_doc_chunking",
    "pipeline_sequence_packing",
    "dedup_exact_summary",
    "st_dedup_replay",
    "st_session_windows",
    "st_stream_stream_join",
    "st_windowed_counts",
    "ev_latest_state",
    "ev_funnel_conversion",
    "ev_retention_cohorts",
    "ev_skew_salted_agg",
    "ev_sessionize",
    "ev_asof_last_purchase",
    "ev_gap_fill_forward",
    "ev_version_filter",
    "ev_message_flatten",
    "ev_result_projection",
    "ev_isin_subpartitions",
    "window_time_range_frame",
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    "mm_frame_sample",
    "mm_fixed_shape_features",
    # r4 greens: freshest, rotate last (remainder keeps registration
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


def dec(col: str | F.Column, width: int = 12, scale: int = 2) -> F.Column:
    """Exact-arithmetic bridge: cast a 2-decimal double to decimal so sums
    are order-independent and reproducible bit-for-bit across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({width},{scale})")


def as_double(c: F.Column) -> F.Column:
    return c.cast("double")
