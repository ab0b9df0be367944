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
#: part of the contract. Round-7 rotation, executing the standing policy
#: ("promote (a) anything whose code changed, then (b) the entries whose
#: last driver row is OLDEST, demoting the freshest greens"):
#: (1) the four queries whose CODE actually changed this round, each
#: verifiable in the round-7 git diff: sim_mmr_rerank (greedy loop moved
#: into one applyInPandas over probe groups -- the fix round 6 claimed
#: but never made), ev_rfm_segmentation (global ntile windows replaced
#: by functions/ordered ranged ranks -- likewise claimed-but-absent in
#: round 6), pipeline_sequence_packing (ranged_cumsum now freezes its
#: pid-annotated relation via lazy localCheckpoint so both prefix-sum
#: branches share one materialization), and pipeline_pretraining_funnel
#: (cold-start persist trim). History note: round 6's cohort listed
#: these same four but only pipeline_sequence_packing had really
#: changed -- the round-6 comment here overstated the diff, recorded in
#: VERDICT.md (r6) and corrected now.
#: Late round-7 note: functions/vectors.lsh_bucket moved its
#: md5-nibble weight computation driver-side (numeric literals in the
#: plan instead of instr(md5(..)) sub-trees). Bucket ids are
#: BIT-IDENTICAL by construction and pinned by
#: tests/test_third_opinion.py::test_lsh_literal_weights_equal_sql_md5_form,
#: so standing greens of out-of-window lsh consumers (sim_knn_join,
#: sim_range_search, dedup_semantic) remain truthful; the in-window
#: lsh consumers (dedup_embedding_cosine, sim_lsh_ann, sim_ivfpq_*)
#: re-verify the change with driver rows this round.
#: (2) all 9 round-6 rotation leftovers (latest green r3 -- the oldest
#: rows anywhere);
#: (3) 37 of the 44 queries whose latest green is r4. The 7 deferred
#: r4 names (tests/test_entry.py ROTATION_LEFTOVERS: trivial, stable,
#: twice-green relational/scalar shapes) head round 8's refresh cohort.
#: Window math: 4 + 9 + 37 = 50; leftover debt shrinks 9 -> 7. Every
#: query outside the window then carries an r5/r6 green -- within the
#: two-round freshness horizon by construction.
PRIORITY = [
    # (1) changed this round -- re-verify first
    "sim_mmr_rerank",
    "ev_rfm_segmentation",
    "pipeline_sequence_packing",
    "pipeline_pretraining_funnel",
    # (2) the 9 round-6 leftovers: latest green r3, oldest anywhere
    "ev_message_flatten",
    "ev_result_projection",
    "ev_version_filter",
    "ev_isin_subpartitions",
    "dedup_exact_summary",
    "agg_approx_count_distinct",
    "agg_approx_percentile",
    "mm_modality_stats",
    "window_time_range_frame",
    # (3) r4 greens: next-oldest cohort (37 of 44)
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_pairs",
    "pipeline_curated_corpus",
    "dedup_embedding_cosine",
    "sim_bruteforce_topk",
    "sim_lsh_ann",
    "sim_ivfpq_ann",
    "sim_ivfpq_rerank",
    "sim_sq_int8_ann",
    "sim_matryoshka_recall",
    "sim_ivf_nprobe_curve",
    "dedup_semantic",
    "dedup_exact_substring",
    "q8_market_share",
    "q21_waiting_supplier",
    "graph_pagerank_copurchase",
    "graph_triangle_count",
    "agg_hll_partial_merge",
    "ev_engine_latest",
    "ev_asof_attribution",
    "ev_range_interval_join",
    "ev_markov_transitions",
    "txt_repetition_signals",
    "pipeline_contamination_check",
    "pipeline_mixture_reweight",
    "pipeline_stratified_sample",
    "pipeline_domain_blocklist",
    "txt_pii_redaction",
    "txt_cms_heavy_hitters",
    "mm_binary_featurize",
    "mm_payload_dedup",
    "mm_resize_fixed",
    "st_stateful_latest",
    "st_sliding_counts",
    "st_asof_attribution",
    "st_dedup_within_watermark",
    # --- window boundary (50) ----------------------------------------
    # round-8 head: the 7 deferred r4 greens (oldest rows after this
    # round's refresh), then the r5/r6 greens in registration order
    "q4_priority_check",
    "q15_top_supplier",
    "q22_global_sales_opportunity",
    "agg_exact_median",
    "txt_fingerprints",
    "txt_regex_token_count",
    "ev_anomaly_zscore",
    # r5/r6 greens: freshest, rotate last (remainder keeps registration
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
