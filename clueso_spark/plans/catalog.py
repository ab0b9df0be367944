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
]

#: Explicit verification priority. The driver's CORRECTNESS gate covers a
#: bounded prefix of the registry (50 queries per round), so ordering is
#: part of the contract. Round-11 rotation, executing the standing policy
#: ("promote (a) never-driver-verified names, (b) anything whose code
#: changed, then (c) the entries whose last driver row is OLDEST,
#: demoting the freshest greens"):
#: (1) the 10 r6-green txt_* queries round 10 documented as
#: ROTATION_LEFTOVERS -- they sat exactly AT the freshness horizon and
#: are this round's MANDATORY head (tests/test_entry.py enforced it);
#: (2) the 15 promoted staged_r11 queries -- registered this round, so
#: never driver-verified; pytest-proven against their DuckDB oracles at
#: sf0.001 + sf0.01 (tests/test_staged_r11.py) but the driver row is
#: the claim that counts;
#: (3) the 16 queries whose CODE changed this round:
#:     - graph_pagerank_copurchase / graph_label_propagation /
#:       graph_katz_centrality: supplier-node offset migrated 1e6 ->
#:       1e12 (output node ids change -- the r10 verdict's
#:       wrong-at-scale defect, closed);
#:     - the 11 dup-detection consumers of _bucket_pairs, which now
#:       pass the degenerate-bucket star cap (results identical at
#:       oracle SFs, re-verified, but the candidate expression
#:       changed): dedup_minhash_lsh, dedup_connected_components,
#:       pipeline_curated_corpus, dedup_threshold_curve,
#:       pipeline_dedup_cluster_stats, pipeline_pretraining_funnel,
#:       dedup_ngram_jaccard, dedup_ngram_jaccard_pairs,
#:       dedup_embedding_cosine, dedup_containment,
#:       mm_phash_hamming_dedup;
#:     - txt_cooccurrence_pmi / txt_rake_keywords: vocabulary top-k now
#:       precedes the rank window (TakeOrderedAndProject, the katz
#:       pattern);
#: (4) 9 of the 37 remaining r7-green queries (oldest rows after this
#: round's head cohorts), heavier-first by recorded bench time. The 28
#: deferred r7 names are enumerated in tests/test_entry.py
#: ROTATION_LEFTOVERS and head round 12's window.
#: Window math: 10 + 15 + 16 + 9 = 50 (five of the changed-code names
#: are themselves r7 greens, so the r7 cohort refreshes 14 of 42 this
#: round). With 212 registered queries the full-registry refresh cycle
#: becomes ceil(212/50) = 5 rounds (tests/test_entry.py re-derives the
#: constant from the live registry).
PRIORITY = [
    # (1) round-10 leftovers at the freshness horizon -- mandatory head
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
    # (2) promoted this round -- never driver-verified
    "agg_pivot_shipmode",
    "window_rolling_median",
    "ev_cumulative_distinct_users",
    "ev_top_paths",
    "agg_equidepth_histogram",
    "ev_sweepline_active_intervals",
    "ev_ewma_smoothed",
    "agg_mann_whitney",
    "graph_shortest_paths",
    "dedup_edit_distance",
    "agg_kmv_distinct",
    "ev_user_value_anomalies",
    "dedup_winnowing",
    "mm_cdc_chunking",
    "mm_cdc_dedup",
    # (3) changed code this round -- re-verify
    "graph_pagerank_copurchase",
    "graph_label_propagation",
    "graph_katz_centrality",
    "dedup_minhash_lsh",
    "dedup_connected_components",
    "pipeline_curated_corpus",
    "dedup_threshold_curve",
    "pipeline_dedup_cluster_stats",
    "pipeline_pretraining_funnel",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_pairs",
    "dedup_embedding_cosine",
    "dedup_containment",
    "mm_phash_hamming_dedup",
    "txt_cooccurrence_pmi",
    "txt_rake_keywords",
    # (4) r7 cohort refreshes, heavier-first by recorded bench time
    "graph_triangle_count",
    "st_stateful_latest",
    "dedup_semantic",
    "dedup_exact_substring",
    "ev_rfm_segmentation",
    "txt_cms_heavy_hitters",
    "pipeline_contamination_check",
    "ev_result_projection",
    "sim_sq_int8_ann",
    # --- window boundary (50) ----------------------------------------
    # round-12 head: the 28 deferred r7 greens (oldest rows after this
    # round's refresh), then the remainder in registration order
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
