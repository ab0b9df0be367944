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
#: part of the contract. Round-4 rotation, per the round-3 policy:
#: (1) the 16 queries NEW this round (as-of/range joins, SemDeDup,
#: exact-substring, sampling/blocklist/PII, streaming as-of, CMS,
#: PageRank, the TPC-H completion tier) come first; (2) the six r3
#: stragglers that have never carried a driver row; (3) everything
#: refactored this round (shared helpers, hierarchical assign);
#: (4) one-per-family representatives fill the window; the freshest
#: r3 greens rotate past the boundary -- nothing is dropped, unlisted
#: queries keep registration order after the block.
#:
#: ROTATION POLICY for the next round: once round 4's rows land, every
#: registered query has carried a driver-verified row at least once
#: (r2 u r3 = 98 distinct greens; the 35 never-verified -- 29 new in
#: round 4 plus the 6 r3 stragglers -- all sit inside this window,
#: pinned by tests/test_entry.py::
#: test_every_never_verified_query_is_inside_driver_window).
#: From round 5 on, promote (a) anything new/changed, then (b) the
#: entries whose last driver row is OLDEST, demoting the freshest greens.
PRIORITY = [
    # NEW this session: LM-perplexity scoring, sparse TF-IDF top-k,
    # triangle counting, int8 SQ ANN, matryoshka recall, payload dedup,
    # HLL partial/merge, watermarked streaming dedup
    "txt_perplexity_proxy",
    "txt_tfidf_topk_similar",
    "graph_triangle_count",
    "sim_sq_int8_ann",
    "sim_matryoshka_recall",
    "mm_payload_dedup",
    "agg_hll_partial_merge",
    "st_dedup_within_watermark",
    "sim_ivf_nprobe_curve",
    "ev_markov_transitions",
    "mm_resize_fixed",
    "sim_mmr_rerank",
    "pipeline_pretraining_funnel",
    # NEW this round: two-relation as-of join, interval range join,
    # SemDeDup, exact-substring span dedup, stratified sampling,
    # blocklist filtering, PII redaction
    "ev_asof_attribution",
    "ev_range_interval_join",
    "dedup_semantic",
    "dedup_exact_substring",
    "pipeline_stratified_sample",
    "pipeline_domain_blocklist",
    "txt_pii_redaction",
    "st_asof_attribution",
    "txt_cms_heavy_hitters",
    "graph_pagerank_copurchase",
    # NEW this round: TPC-H completion tier (the remaining queries the
    # trimmed schema can express)
    "q4_priority_check",
    "q8_market_share",
    "q15_top_supplier",
    "q21_waiting_supplier",
    "q22_global_sales_opportunity",
    # never driver-verified (registered past r3's window) + new/changed
    "sim_ivfpq_rerank",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_pairs",
    "sim_ivfpq_ann",
    "st_sliding_counts",
    # streaming_queries.py took timezone-pin + epoch-window parity fixes
    # this round -- re-verify the flagship stateful path alongside them
    "st_stateful_latest",
    "ev_anomaly_zscore",
    "agg_exact_median",
    "txt_fingerprints",
    "txt_regex_token_count",
    # refactored this round (shared bucket-pair/persist helpers, footer
    # sizing, ingest drop-metrics) -- re-verify
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_connected_components",
    "pipeline_curated_corpus",
    "ev_engine_latest",
    # similarity tier
    "sim_lsh_ann",
    "sim_bruteforce_topk",
    # text / pipeline tier
    "txt_repetition_signals",
    "pipeline_contamination_check",
    "pipeline_mixture_reweight",
    # multimodal tier
    "mm_binary_featurize",
    "mm_frame_sample",
    "mm_modality_stats",
    "mm_fixed_shape_features",
    # streaming tier representatives
    "st_windowed_counts",
    "st_stream_stream_join",
    # --- window boundary (~50) ---------------------------------------
    # green in r3 (fresh) or double-green r2+r3 with unchanged code:
    # rotate past the window
    "sim_ivf_cells",
    "txt_tf_df_top_terms",
    "sim_kmeans_lloyd",
    "sim_pq_codes",
    "sim_residual_norms",
    "sim_ann_recall_at_k",
    "sim_ivf_kmeans_ann",
    "pipeline_train_test_split",
    "pipeline_doc_chunking",
    "pipeline_sequence_packing",
    "dedup_exact_summary",
    "txt_token_stats",
    "txt_lang_stats",
    "txt_top_bigrams",
    "txt_quality_score",
    "txt_langid_heuristic",
    "st_dedup_replay",
    "st_session_windows",
    "ev_latest_state",
    "ev_funnel_conversion",
    "ev_retention_cohorts",
    "ev_skew_salted_agg",
    "ev_sessionize",
    "ev_asof_last_purchase",
    "window_time_range_frame",
    "ev_gap_fill_forward",
    "ev_version_filter",
    "ev_message_flatten",
    "ev_result_projection",
    "ev_isin_subpartitions",
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "ev_keyset_page",
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


def dec(col: str | F.Column, width: int = 12, scale: int = 2) -> F.Column:
    """Exact-arithmetic bridge: cast a 2-decimal double to decimal so sums
    are order-independent and reproducible bit-for-bit across engines."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({width},{scale})")


def as_double(c: F.Column) -> F.Column:
    return c.cast("double")
