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
]

#: Explicit verification priority. The driver's CORRECTNESS gate covers a
#: bounded prefix of the registry (50 queries per round), so ordering is
#: part of the contract. Round-6 rotation, executing the standing policy
#: ("promote (a) anything new/changed, then (b) the entries whose last
#: driver row is OLDEST, demoting the freshest greens"):
#: (1) the four queries whose CODE changed this round -- the
#: sim_mmr_rerank greedy-loop fusion (9 eager jobs -> 2), the
#: pipeline_sequence_packing de-globalized cumsum (range-partitioned
#: prefix sums instead of a single-partition window), the
#: ev_rfm_segmentation de-globalized ntiles (same idiom), and the
#: pipeline_pretraining_funnel cold-start persist sizing;
#: (2) the 17 remaining staged operators (plans/staged_r6.py,
#: never driver-verified -- the rotation invariant REQUIRES them in the
#: window the round they register);
#: (3) the 2 r2 leftovers (profile_lineitem, sort_limit_top_orders --
#: oldest greens anywhere, documented leftovers since round 5);
#: (4) 27 of the 37 r3-only greens (next-oldest cohort).
#: Window math: 4 + 17 + 2 + 27 = 50. The leftover debt grows to 9
#: (round-5's seven + mm_modality_stats + window_time_range_frame, the
#: two most trivial/stable r3 rows bumped to make room for the changed
#: cohort); tests/test_entry.py ROTATION_LEFTOVERS documents all nine
#: and they head round 7's refresh cohort. At 152 registered queries a
#: 50-slot window with a two-round freshness horizon leaves a standing
#: ~9-name leftover debt -- the honest steady state, rolled forward
#: explicitly each round rather than hidden by a looser horizon.
PRIORITY = [
    # (1) changed this round -- re-verify first
    "sim_mmr_rerank",
    "pipeline_sequence_packing",
    "ev_rfm_segmentation",
    "pipeline_pretraining_funnel",
    # (2) the promoted staged tier: never driver-verified, must enter
    "txt_gopher_quality_rules",
    "pipeline_ccnet_buckets",
    "sim_knn_join",
    "pipeline_token_budget_mix",
    "txt_zipf_slope",
    "pipeline_length_filter_curve",
    "txt_quality_classifier_proxy",
    "dedup_containment",
    "txt_char_entropy",
    "txt_lexical_diversity",
    "pipeline_dedup_keep_best",
    "sim_range_search",
    "st_windowed_topk",
    "graph_node_similarity",
    "dedup_incremental_minhash",
    "txt_bigram_perplexity",
    "pipeline_dedup_cluster_stats",
    # (3) r2 leftovers: oldest greens anywhere
    "profile_lineitem",
    "sort_limit_top_orders",
    # (4) r3 greens: next-oldest refresh cohort (27 of 37)
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
    "mm_frame_sample",
    "mm_fixed_shape_features",
    # --- window boundary (50) ----------------------------------------
    # round-7 head: the 9 documented leftovers (oldest rows after this
    # round's refresh), then the r4/r5 greens in registration order
    "ev_message_flatten",
    "ev_result_projection",
    "ev_version_filter",
    "ev_isin_subpartitions",
    "dedup_exact_summary",
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    "mm_modality_stats",
    "window_time_range_frame",
    # r4/r5 greens: freshest, rotate last (remainder keeps registration
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
