"""Driver-contract guard: __spark_entry__ must keep its exact shape.

The round driver smoke-runs entry(spark), then runs every queries()
entry at sf0.01 against oracle_sql() via DuckDB. These tests pin the
contract so refactors can't silently break the scoring surface.
"""

from __future__ import annotations

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"


def test_entry_returns_rows_with_stable_schema(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "event_id",
        "user_id",
        "event_type",
        "value",
        "ts_str",
    }


def test_queries_and_oracles_are_consistent(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 90
    # round 3: EVERY query carries an oracle -- the former rows-only set
    # (HLL sketch, float-mean IVF/residual paths) now verifies through
    # invariants or decimal-exact means
    assert set(oracles) == set(qs)
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "select" in sql.lower(), name


#: round-11 rotation: queries whose CODE changed this round -- every
#: name here must appear in the round-11 git diff:
#: the three co-purchase graph ops (supplier-node offset migrated
#: 1e6 -> 1e12; output node ids change), the 11 dup-detection
#: consumers of _bucket_pairs (degenerate-bucket star cap; identical
#: results at oracle SFs, re-verified, but the candidate expression
#: changed), and txt_cooccurrence_pmi / txt_rake_keywords (vocabulary
#: top-k now precedes the rank window).
CHANGED_THIS_ROUND = (
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
)

#: round-11 promotions: the former plans/staged_r11.py tier, registered
#: this round and therefore never driver-verified -- all 15 sit in the
#: driver window right after the 10 mandatory r6 leftovers
#: (test_every_never_verified_query_is_inside_driver_window asserts the
#: window membership mechanically; this tuple makes the intent
#: reviewable)
PROMOTED_THIS_ROUND = (
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
)

#: The round the repo's rotation window was COMMITTED against: the
#: invariants below describe the artifact set r1..COMMITTED_ROUND. The
#: driver writes CORRECTNESS_r{COMMITTED_ROUND+1}.json AFTER this code
#: is frozen (and the judge runs pytest after that), so newer artifacts
#: must not shift the frame of reference -- round 5's versions of these
#: tests computed max_round from the live filesystem and therefore
#: failed by construction the moment the driver ran. Bump this when
#: flipping the window each round.
COMMITTED_ROUND = 10

#: The driver verifies this many queries per round (a prefix of
#: catalog.PRIORITY order).
WINDOW = 50

#: Full-registry refresh cycle length in rounds. With 212 registered
#: queries and a 50-slot window, every query can be re-verified at most
#: once per ceil(212/50) = 5 rounds, so the freshness invariant below
#: allows an out-of-window green to be up to REFRESH_CYCLE_ROUNDS - 1
#: rounds behind the newest committed artifact.
#: test_refresh_cycle_matches_registry_size re-derives this from the
#: live registry size rather than trusting the comment.
REFRESH_CYCLE_ROUNDS = 5

#: the 28 r7 greens the 50-slot window cannot fit this round: after the
#: 10 mandatory r6 leftovers, the 15 never-verified promotions, and the
#: 16 changed-code names (5 of which are themselves r7 greens), 9 of
#: the remaining 37 r7 names fit -- heavier-first by recorded bench
#: time, per the standing precedent. The r7 cohort is 3 rounds behind
#: at commit time (horizon is REFRESH_CYCLE_ROUNDS - 1 = 4), so
#: deferring is legal this round; these 28 head round 12's window.
ROTATION_LEFTOVERS = (
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
)


def _latest_green_rounds(
    repo: str | None = None, cap: int = COMMITTED_ROUND
) -> tuple[dict[str, int], int]:
    """(query -> most recent CORRECTNESS round with a row, max round),
    considering only artifacts from rounds <= cap (the committed set)."""
    import glob
    import json
    import os
    import re

    if repo is None:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    max_round = 0
    paths = glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    assert paths, "no CORRECTNESS_r*.json artifacts found in repo root"
    for path in paths:
        rnd = int(re.search(r"_r(\d+)", os.path.basename(path)).group(1))
        if rnd > cap:
            continue
        rows = json.load(open(path))
        if rows:
            max_round = max(max_round, rnd)
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round


def test_refresh_cycle_matches_registry_size(spark):
    """REFRESH_CYCLE_ROUNDS must be derived from the live registry, not
    asserted by hand: the cycle is exactly ceil(registry / WINDOW)
    rounds, and growing the registry without updating the constant (or
    shrinking promotion cadence) must fail loudly here rather than
    silently aging out-of-window greens past the documented horizon."""
    import math

    n = len(entrymod.queries())
    assert REFRESH_CYCLE_ROUNDS == math.ceil(n / WINDOW), (
        f"registry={n}, window={WINDOW}: cycle should be "
        f"{math.ceil(n / WINDOW)} rounds, constant says "
        f"{REFRESH_CYCLE_ROUNDS}"
    )


def test_round11_rotation_window(spark):
    """The driver's CORRECTNESS gate covers a bounded prefix (WINDOW
    per round). Round-11 contract, asserted mechanically and
    COMPLETELY: every never-verified promotion and every changed-code
    query is in the window; the OLDEST cohort (the 10 r6 txt_* greens
    round 10 documented as its leftovers -- this round's MANDATORY
    head) is entirely inside the window; and the SECOND-oldest cohort
    (r7), which is larger than the remaining slots (42 names vs
    50 - 10 - 15 - 16 = 9 pure-refresh slots + 5 changed-code
    overlaps), is partitioned EXACTLY between the window and the
    documented leftovers: no name unaccounted, no leftover listed that
    is actually in the window, every leftover really from that cohort.
    Deferring r7 names is legal only because they sit 3 rounds behind
    with a 4-round horizon (test_no_query_outside_window_has_stale_green
    is the mechanical guard); the leftovers are round 12's head."""
    names = list(entrymod.queries())[:WINDOW]
    for must in PROMOTED_THIS_ROUND + CHANGED_THIS_ROUND:
        assert must in names, f"promoted/changed query {must} not in window"
    latest, _ = _latest_green_rounds()
    rounds = sorted(set(latest.values()))
    oldest = {q for q, r in latest.items() if r == rounds[0]}
    # round 10's documented leftovers ARE the oldest cohort; every one
    # of them must occupy a window slot this round
    missing_head = sorted(oldest - set(names))
    assert not missing_head, (
        f"r{rounds[0]}-green mandatory head names not in the window: "
        f"{missing_head}"
    )
    # the r7 cohort partitions exactly between window and leftovers
    second = {q for q, r in latest.items() if r == rounds[1]}
    unaccounted = sorted(second - set(names) - set(ROTATION_LEFTOVERS))
    assert not unaccounted, (
        f"r{rounds[1]}-green queries neither in the window nor "
        f"documented leftovers: {unaccounted}"
    )
    misfiled = sorted(set(ROTATION_LEFTOVERS) - second)
    assert not misfiled, (
        f"ROTATION_LEFTOVERS entries not in the r{rounds[1]} "
        f"cohort: {misfiled}"
    )
    in_window_leftovers = sorted(set(ROTATION_LEFTOVERS) & set(names))
    assert not in_window_leftovers, (
        f"ROTATION_LEFTOVERS entries that are actually in the "
        f"window: {in_window_leftovers}"
    )
    # nothing fresher (r8+) may occupy a slot while r7 names are
    # deferred, except the changed-code re-verifications (promotions
    # have no artifact rows, so they never appear in `latest`)
    fresher = {q for q, r in latest.items() if r > rounds[1]}
    displaced = sorted((fresher & set(names)) - set(CHANGED_THIS_ROUND))
    assert not displaced, (
        f"post-r{rounds[1]} greens occupy window slots while "
        f"r{rounds[1]} names are deferred: {displaced}"
    )


def test_no_query_outside_window_has_stale_green(spark):
    """Mechanical freshness invariant: every registered query OUTSIDE
    the driver window must carry a green row from within the refresh
    cycle -- no more than REFRESH_CYCLE_ROUNDS - 1 rounds behind the
    newest committed artifact (the honest bound for a registry of this
    size; see REFRESH_CYCLE_ROUNDS). Anything older must be in the
    window being refreshed."""
    latest, max_round = _latest_green_rounds()
    names = list(entrymod.queries())
    window = set(names[:WINDOW])
    horizon = max_round - (REFRESH_CYCLE_ROUNDS - 1)
    stale_outside = [
        n
        for n in names
        if n not in window and latest.get(n, 0) < horizon
    ]
    assert not stale_outside, (
        f"queries outside the window with greens older than r{horizon}: "
        f"{stale_outside}"
    )


def test_rotation_invariants_survive_future_driver_artifacts(tmp_path):
    """Round 5's lesson, pinned: the driver writes the NEXT round's
    CORRECTNESS file after the repo is frozen, so the invariants must be
    computed against the committed artifact set only. Simulate a repo
    where the driver has already dropped r{COMMITTED_ROUND+1} and a far-
    future r99: the capped reader must ignore both, keeping max_round
    and the per-query latest map exactly as committed."""
    import glob
    import json
    import os
    import shutil

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        shutil.copy(p, tmp_path / os.path.basename(p))
    base_latest, base_max = _latest_green_rounds(repo=str(tmp_path))
    fake = {"some_future_query": {"match": True}}
    for rnd in (COMMITTED_ROUND + 1, 99):
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps(fake)
        )
    latest, max_round = _latest_green_rounds(repo=str(tmp_path))
    assert max_round == base_max == COMMITTED_ROUND
    assert latest == base_latest
    assert "some_future_query" not in latest


def test_streaming_queries_rerun_in_same_session(spark):
    """The driver (and bench's best-of-2) invoke each streaming query
    repeatedly in one session; memory-sink query names must be reusable
    after termination, for every streaming entry."""
    qs = entrymod.queries()
    for name in (
        "st_windowed_counts",
        "st_dedup_replay",
        "st_stateful_latest",
        "st_session_windows",
        "st_stream_stream_join",
    ):
        first = qs[name](spark, SF_DIR).count()
        second = qs[name](spark, SF_DIR).count()
        assert first == second > 0, name


def test_catalog_survives_non_utc_session(spark):
    """The round driver builds its own SparkSession, which need not run
    in UTC. Timestamp parity relies on the events loader pinning the
    session zone at load time, so a catalog run started under a hostile
    zone must still match its oracles."""
    from clueso_spark.plans.parity import run_catalog

    tz_key = "spark.sql.session.timeZone"
    original = spark.conf.get(tz_key)
    spark.conf.set(tz_key, "America/New_York")
    try:
        results = run_catalog(
            spark,
            "/root/testdata/sf0.001",
            ["ev_sessionize", "ev_hourly_rollup", "scalar_date_functions"],
        )
        assert all(r.ok for r in results), [
            (r.name, r.detail) for r in results if not r.ok
        ]
    finally:
        spark.conf.set(tz_key, original)


def test_every_never_verified_query_is_inside_driver_window(spark):
    """Rotation-policy invariant, mechanically: any catalog query that
    has NO row in any recorded CORRECTNESS_r*.json must sit inside the
    driver's 50-slot verification window, so the union of driver rounds
    converges to full-catalog coverage instead of silently stranding
    new registrations past the boundary."""
    latest, _ = _latest_green_rounds()
    verified = set(latest)
    names = list(entrymod.queries())
    window = set(names[:50])
    stranded = [n for n in names if n not in verified and n not in window]
    assert not stranded, (
        f"{len(stranded)} never-driver-verified queries outside the "
        f"window: {stranded}"
    )


def test_priority_names_are_registered_and_unique(spark):
    """catalog.PRIORITY is the driver-window contract; a typo'd or
    stale name would be SILENTLY dropped by all_queries() and shift
    every subsequent window slot. Pin: every PRIORITY entry resolves,
    none repeats."""
    from clueso_spark.plans.catalog import PRIORITY

    qs = entrymod.queries()
    missing = [n for n in PRIORITY if n not in qs]
    assert missing == [], f"PRIORITY names not in the registry: {missing}"
    dupes = sorted({n for n in PRIORITY if PRIORITY.count(n) > 1})
    assert dupes == [], f"duplicate PRIORITY entries: {dupes}"
