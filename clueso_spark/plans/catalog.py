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
    # round 11: the round-10 staged tier is promoted the same way (15
    # queries; registry 197 -> 212, refresh cycle ceil(212/50) = 5)
    "clueso_spark.plans.staged_r11",
    # round 12: the round-11 staged tier is promoted the same way (26
    # queries; registry 212 -> 238, refresh cycle stays ceil(238/50) =
    # 5). 21 sit in the round-12 window; the five cheapest defer to
    # head round 13 (tests/test_entry.py DEFERRED_PROMOTIONS).
    "clueso_spark.plans.staged_r12",
]

#: Explicit verification priority. The driver's CORRECTNESS gate covers a
#: bounded prefix of the registry (50 queries per round), so ordering is
#: part of the contract. Round-12 rotation, executing the standing policy
#: ("promote (a) never-driver-verified names, (b) anything whose code
#: changed, then (c) the entries whose last driver row is OLDEST,
#: demoting the freshest greens"):
#: (1) the 28 r7-green queries round 11 documented as
#: ROTATION_LEFTOVERS -- they sit exactly AT the freshness horizon and
#: are this round's MANDATORY head (tests/test_entry.py enforced it);
#: (2) 21 of the 26 promoted staged_r12 queries -- registered this
#: round, so never driver-verified; pytest-proven against their DuckDB
#: oracles at sf0.001 + sf0.01 (tests/test_staged_r12.py) but the
#: driver row is the claim that counts -- heavier-first by the
#: pre-promotion best-of-2 sf0.1 timing run RECORDED IN ROUND12_NOTES
#: ("Pre-promotion staged-op timing run"); later full-bench runs
#: reorder neighbors within noise, the recorded run is the contract;
#: (3) the 1 query whose CODE changed this round:
#:     - dedup_edit_distance: second (suffix, length-bucket) blocking
#:       family added -- the r11 verdict's leading-edit recall finding;
#:       candidate pairs (and potentially output rows) change;
#: Window math: 28 + 21 + 1 = 50 -- zero pure-refresh slots, so the
#: FIVE cheapest-to-verify promotions (0.40-0.61 s each in the same
#: recorded timing run: ev_interval_union_length,
#: pipeline_dataset_card, ev_asof_tolerance_join, join_salted_skew,
#: window_max_drawdown)
#: defer to HEAD round 13's window, enumerated in tests/test_entry.py
#: DEFERRED_PROMOTIONS with the obligation asserted mechanically NOW
#: (they hold PRIORITY slots 50-54, immediately after the boundary).
#: With 238 registered queries the full-registry refresh cycle stays
#: ceil(238/50) = 5 rounds (tests/test_entry.py re-derives the
#: constant from the live registry).
PRIORITY = [
    # (1) round-11 leftovers at the freshness horizon -- mandatory head
    "agg_approx_percentile",
    "dedup_exact_summary",
    "dedup_simhash",
    "ev_asof_attribution",
    "ev_engine_latest",
    "ev_isin_subpartitions",
    "ev_markov_transitions",
    "ev_message_flatten",
    "ev_range_interval_join",
    "ev_version_filter",
    "mm_binary_featurize",
    "mm_modality_stats",
    "mm_resize_fixed",
    "pipeline_domain_blocklist",
    "pipeline_mixture_reweight",
    "pipeline_sequence_packing",
    "pipeline_stratified_sample",
    "q21_waiting_supplier",
    "q8_market_share",
    "sim_lsh_ann",
    "sim_matryoshka_recall",
    "sim_mmr_rerank",
    "st_asof_attribution",
    "st_dedup_within_watermark",
    "st_sliding_counts",
    "txt_pii_redaction",
    "txt_repetition_signals",
    "window_time_range_frame",
    # (2) promoted this round -- never driver-verified; heavier-first
    # by measured sf0.1 time (best-of-2, quiet box)
    "graph_kcore_decomposition",
    "dedup_lsh_relative_recall",
    "dedup_minhash_index_delta",
    "graph_adamic_adar_linkpred",
    "graph_modularity_communities",
    "graph_local_clustering",
    "txt_textrank_keywords",
    "txt_ngram_novelty",
    "graph_hits_authority",
    "agg_hdr_quantile_merge",
    "agg_cms_partial_merge",
    "st_kmv_distinct_sketch",
    "agg_theta_sketch_setops",
    "agg_kl_divergence_drift",
    "mm_chunk_gc_accounting",
    "sim_dbscan_grid",
    "ev_bitmap_retention",
    "txt_boilerplate_chunks",
    "ev_seasonal_dow_deviation",
    "join_range_bucketed_global",
    "window_rolling_regression",
    # (3) changed code this round -- re-verify
    "dedup_edit_distance",
    # --- window boundary (50) ----------------------------------------
    # round-13 head, FIRST the five deferred never-verified promotions
    # (tests/test_entry.py DEFERRED_PROMOTIONS pins these slots) ...
    "ev_asof_tolerance_join",
    "ev_interval_union_length",
    "window_max_drawdown",
    "join_salted_skew",
    "pipeline_dataset_card",
    # ... then the 41 r8 greens (the cohort AT the horizon next round),
    # then the remainder in registration order
    "agg_cube_flag_status",
    "agg_distinct_counts",
    "agg_exact_median",
    "agg_grouping_sets",
    "agg_poisson_bootstrap",
    "agg_price_histogram",
    "agg_rollup_priority_status",
    "ev_anomaly_zscore",
    "ev_decile_lift",
    "ev_hourly_rollup",
    "ev_json_props",
    "ev_keyset_page",
    "ev_latest_dense_rank",
    "ev_latest_no_tombstone",
    "ev_pivot_user_activity",
    "ev_predicate_search",
    "ev_range_join_attribution",
    "ev_rollup_incremental_merge",
    "graph_assoc_rules",
    "join_bloom_pruned_revenue",
    "join_left_order_counts",
    "mm_shard_manifest",
    "pipeline_domain_caps",
    "pipeline_epoch_shuffle_shards",
    "pipeline_incremental_corpus_diff",
    "q10_returned_items",
    "q17_small_quantity_revenue",
    "q18_large_volume_orders",
    "q19_disjunctive_revenue",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q4_priority_check",
    "q5_local_supplier_volume",
    "q7_nation_volume_shipping",
    "st_foreach_batch_upsert",
    "txt_fingerprints",
    "txt_perplexity_proxy",
    "txt_regex_token_count",
    "txt_tfidf_topk_similar",
    "unpivot_lineitem_measures",
    "window_rolling_spend",
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
