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
    # round 9: the round-8 staged tier is promoted the same way (17
    # queries; they head the round-9 driver window)
    "clueso_spark.plans.staged_r9",
]

#: Explicit verification priority. The driver's CORRECTNESS gate covers a
#: bounded prefix of the registry (50 queries per round), so ordering is
#: part of the contract. Round-9 rotation, executing the standing policy
#: ("promote (a) never-driver-verified names, (b) anything whose code
#: changed, then (c) the entries whose last driver row is OLDEST,
#: demoting the freshest greens"):
#: (1) the 17 promoted staged_r9 queries -- registered this round, so
#: never driver-verified; pytest-proven against their DuckDB oracles at
#: sf0.001 + sf0.01 (tests/test_staged_r9.py) but the driver row is the
#: claim that counts;
#: (2) the 8 queries whose CODE changed this round: the scan-reuse
#: pinning pass (ROUND8_NOTES item 3) -- sim_ivfpq_ann /
#: sim_ivfpq_rerank / sim_ivf_nprobe_curve (pinned training frames +
#: shared exact-baseline corpus frame; rerank 11 -> 4 FileScans),
#: pipeline_quality_audit (rewritten: 7 scans -> 2, per-key pre-agg +
#: one full-outer join), mm_payload_dedup (5 scans -> 2, all metrics
#: off two pinned histogram-sized aggregates), sim_bruteforce_topk
#: (body moved into _brute_topk_from -- analyzed plan verified
#: IDENTICAL, in the window out of caution) -- plus the empty-corpus
#: robustness sweep's two fixes: agg_approx_count_distinct and
#: agg_hll_partial_merge (the within_5pct ratio rewritten
#: cross-multiplied so an empty corpus cannot raise ANSI
#: DIVIDE_BY_ZERO; identical boolean on any non-empty corpus);
#: (3) the 20 round-8 rotation leftovers (latest green r5 -- the oldest
#: rows anywhere, and at 4 rounds behind they are OUTSIDE the 3-round
#: freshness horizon: mandatory this round);
#: (4) 5 of the 46 queries whose latest green is r6 (heavier /
#: engine-semantics shapes first, per the standing precedent;
#: st_windowed_topk and ev_gap_fill_forward were displaced by the two
#: changed-code robustness fixes -- both re-measured healthy in this
#: round's bench runs and both join the leftover cohort). The 41
#: deferred r6 names (tests/test_entry.py ROTATION_LEFTOVERS) are
#: exactly 3 rounds behind at r9 -- inside the horizon -- and head
#: round 10's refresh cohort.
#: Window math: 17 + 8 + 20 + 5 = 50; with 182 registered queries and a
#: 50-slot window the full-registry refresh cycle stays
#: ceil(182/50) = 4 rounds (tests/test_entry.py pins the arithmetic).
PRIORITY = [
    # (1) promoted this round -- never driver-verified, head the window
    "ev_scd2_intervals",
    "ev_window_funnel",
    "txt_bm25_topk",
    "agg_ols_trend",
    "pipeline_importance_sample",
    "ev_activity_streaks",
    "agg_exact_moments",
    "window_cume_percent_rank",
    "ev_dau_wau_stickiness",
    "agg_gini_concentration",
    "sim_source_jaccard_bottomk",
    "ev_time_weighted_value",
    "agg_weighted_median",
    "ev_cusum_changepoint",
    "agg_exact_quantiles",
    "st_static_enrichment",
    "graph_khop_reach",
    # (2) changed code this round -- re-verify
    "sim_ivfpq_ann",
    "sim_ivfpq_rerank",
    "sim_ivf_nprobe_curve",
    "sim_bruteforce_topk",
    "pipeline_quality_audit",
    "mm_payload_dedup",
    "agg_approx_count_distinct",
    "agg_hll_partial_merge",
    # (3) the 20 round-8 leftovers: latest green r5, oldest anywhere,
    # outside the freshness horizon at r9 -- mandatory
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
    # (4) r6 greens: next-oldest cohort (5 of 46; heavier /
    # engine-semantics shapes first; the 41 deferred names head round 10)
    "sim_knn_join",
    "sim_range_search",
    "dedup_containment",
    "dedup_incremental_minhash",
    "ev_latest_state",
    # --- window boundary (50) ----------------------------------------
    # round-10 head: the 41 deferred r6 greens (oldest rows after this
    # round's refresh), then the remainder in registration order
    "st_windowed_topk",
    "ev_gap_fill_forward",
    "ev_asof_last_purchase",
    "ev_funnel_conversion",
    "ev_retention_cohorts",
    "ev_sessionize",
    "ev_skew_salted_agg",
    "graph_node_similarity",
    "mm_fixed_shape_features",
    "mm_frame_sample",
    "pipeline_ccnet_buckets",
    "pipeline_dedup_cluster_stats",
    "pipeline_dedup_keep_best",
    "pipeline_doc_chunking",
    "pipeline_length_filter_curve",
    "pipeline_token_budget_mix",
    "pipeline_train_test_split",
    "profile_lineitem",
    "sim_ann_recall_at_k",
    "sim_ivf_cells",
    "sim_ivf_kmeans_ann",
    "sim_kmeans_lloyd",
    "sim_pq_codes",
    "sim_residual_norms",
    "sort_limit_top_orders",
    "st_dedup_replay",
    "st_session_windows",
    "st_stream_stream_join",
    "st_windowed_counts",
    "txt_bigram_perplexity",
    "txt_char_entropy",
    "txt_gopher_quality_rules",
    "txt_lang_stats",
    "txt_langid_heuristic",
    "txt_lexical_diversity",
    "txt_quality_classifier_proxy",
    "txt_quality_score",
    "txt_tf_df_top_terms",
    "txt_token_stats",
    "txt_top_bigrams",
    "txt_zipf_slope",
    # r7/r8 greens: freshest, rotate last (remainder keeps registration
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
