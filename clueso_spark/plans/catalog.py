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
    # round 10: the round-9 staged tier is promoted the same way (15
    # queries, each pytest-proven against its DuckDB oracle at sf0.001 +
    # sf0.01 before registration; they head the round-10 driver window)
    "clueso_spark.plans.staged_r10",
]

#: Explicit verification priority. The driver's CORRECTNESS gate covers a
#: bounded prefix of the registry (50 queries per round), so ordering is
#: part of the contract. Round-10 rotation, executing the standing policy
#: ("promote (a) never-driver-verified names, (b) anything whose code
#: changed, then (c) the entries whose last driver row is OLDEST,
#: demoting the freshest greens"):
#: (1) the 15 promoted staged_r10 queries -- registered this round, so
#: never driver-verified; pytest-proven against their DuckDB oracles at
#: sf0.001 + sf0.01 (tests/test_staged_r10.py) but the driver row is the
#: claim that counts;
#: (2) the 4 non-r6-cohort queries whose CODE changed this round:
#: agg_approx_count_distinct + agg_hll_partial_merge (the within_5pct
#: invariant now treats exact==0 with a zero estimate as a perfect
#: match -- ADVICE r9; identical boolean on any non-empty corpus) and
#: q15_top_supplier + q22_global_sales_opportunity (the r8 scan-reuse
#: queue closed: shared subaggregate pinned, 3 scans -> 2 each);
#: (3) 31 of the 41 queries whose latest green is r6 -- the oldest rows
#: anywhere, sitting exactly AT the freshness horizon (they become
#: violations at r11, so they are this round's mandatory head cohort).
#: ev_gap_fill_forward leads them: it ALSO changed code this round (the
#: 90-day grid-bound fix, r8 verdict item 4). The 10 deferred r6 names
#: (the lightest txt_* shapes, per the standing heavier-first
#: precedent) are enumerated in tests/test_entry.py ROTATION_LEFTOVERS
#: and are the mandatory head of round 11's window.
#: Window math: 15 + 4 + 31 = 50; with 197 registered queries and a
#: 50-slot window the full-registry refresh cycle stays
#: ceil(197/50) = 4 rounds (tests/test_entry.py pins the arithmetic).
PRIORITY = [
    # (1) promoted this round -- never driver-verified, head the window
    "join_lateral_top2_per_order",
    "subquery_correlated_scalar",
    "agg_mode_exact",
    "window_nth_value_frames",
    "setop_except_all_multiset",
    "agg_welch_ttest",
    "ev_funnel_time_percentiles",
    "ev_lorenz_power_users",
    "ev_bounce_rate_sessions",
    "ev_inter_event_histogram",
    "graph_label_propagation",
    "graph_katz_centrality",
    "agg_ks_two_sample",
    "agg_chi2_independence",
    "mm_phash_hamming_dedup",
    # (2) changed code this round -- re-verify
    "agg_approx_count_distinct",
    "agg_hll_partial_merge",
    "q15_top_supplier",
    "q22_global_sales_opportunity",
    # (3) the r6 cohort: latest green r6, oldest anywhere, AT the
    # freshness horizon -- 31 of 41 fit; ev_gap_fill_forward first
    # (changed code: the 90-day grid bound)
    "ev_gap_fill_forward",
    "st_windowed_topk",
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
    "txt_gopher_quality_rules",
    "txt_quality_classifier_proxy",
    # --- window boundary (50) ----------------------------------------
    # round-11 head: the 10 deferred r6 greens (the lightest txt_*
    # shapes; oldest rows after this round's refresh), then the r7
    # cohort, then the remainder in registration order
    "txt_bigram_perplexity",
    "txt_char_entropy",
    "txt_lang_stats",
    "txt_langid_heuristic",
    "txt_lexical_diversity",
    "txt_quality_score",
    "txt_tf_df_top_terms",
    "txt_token_stats",
    "txt_top_bigrams",
    "txt_zipf_slope",
    # r7/r8/r9 greens: freshest, rotate last (remainder keeps
    # registration order after this block -- nothing is dropped)
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
