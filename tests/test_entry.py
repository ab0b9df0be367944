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


#: round-10 rotation: queries whose CODE changed this round -- every
#: name here must appear in the round-10 git diff:
#: agg_approx_count_distinct / agg_hll_partial_merge (within_5pct now
#: treats exact==0 with a zero estimate as a perfect match, ADVICE r9),
#: q15 / q22 (shared subaggregate pinned, 3 scans -> 2 each), and
#: ev_gap_fill_forward (dense grid bounded to the 90-day trailing
#: horizon -- ALSO an r6-cohort member, counted there in the window
#: arithmetic).
CHANGED_THIS_ROUND = (
    "agg_approx_count_distinct",
    "agg_hll_partial_merge",
    "q15_top_supplier",
    "q22_global_sales_opportunity",
    "ev_gap_fill_forward",
    # round-10 review fix: top-k BEFORE rank (TakeOrdered, no
    # vertex-set single-partition window) + w1/w2 walk-frame pins.
    # Already in the window via PROMOTED_THIS_ROUND.
    "graph_katz_centrality",
)

#: round-10 promotions: the former plans/staged_r10.py tier, registered
#: this round and therefore never driver-verified -- all 15 must head
#: the driver window (test_every_never_verified_query_is_inside_driver_window
#: asserts this mechanically from the artifact set, this tuple makes
#: the intent reviewable)
PROMOTED_THIS_ROUND = (
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
)

#: The round the repo's rotation window was COMMITTED against: the
#: invariants below describe the artifact set r1..COMMITTED_ROUND. The
#: driver writes CORRECTNESS_r{COMMITTED_ROUND+1}.json AFTER this code
#: is frozen (and the judge runs pytest after that), so newer artifacts
#: must not shift the frame of reference -- round 5's versions of these
#: tests computed max_round from the live filesystem and therefore
#: failed by construction the moment the driver ran. Bump this when
#: flipping the window each round.
COMMITTED_ROUND = 9

#: The driver verifies this many queries per round (a prefix of
#: catalog.PRIORITY order).
WINDOW = 50

#: Full-registry refresh cycle length in rounds. With 197 registered
#: queries and a 50-slot window, every query can be re-verified at most
#: once per ceil(197/50) = 4 rounds, so the freshness invariant below
#: allows an out-of-window green to be up to REFRESH_CYCLE_ROUNDS - 1
#: rounds behind the newest committed artifact. Round 7's two-round
#: horizon became arithmetically impossible the moment the registry
#: crossed 100 (2 x WINDOW) names; this constant states the honest
#: bound and test_refresh_cycle_matches_registry_size pins it to the
#: live registry size rather than trusting the comment.
REFRESH_CYCLE_ROUNDS = 4

#: the 10 r6 green rows the 50-slot window cannot fit this round: after
#: the 15 never-verified promotions and the 4 non-r6 changed-code
#: queries, 31 of the 41 r6 greens fit (heavier / engine-semantics
#: shapes first, per the standing precedent; the deferred ten are the
#: lightest txt_* shapes). The r6 cohort sits exactly AT the freshness
#: horizon at round 10 (3 = REFRESH_CYCLE_ROUNDS - 1 rounds behind), so
#: deferring is legal this round but these 10 become violations at
#: round 11 -- they are round 11's MANDATORY head cohort.
ROTATION_LEFTOVERS = (
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


def test_round10_rotation_window(spark):
    """The driver's CORRECTNESS gate covers a bounded prefix (WINDOW
    per round). Round-10 contract, asserted mechanically and COMPLETELY
    (round 6's weakened ">= min(2, ...)" form let a claimed refresh go
    unchecked -- ADVICE r6): every never-verified promotion and every
    changed-code query is in the window, and the OLDEST cohort -- which
    this round is larger than the remaining slots (41 r6 names vs
    50 - 15 - 4 = 31) -- is partitioned EXACTLY between the window and
    the documented leftovers: no name unaccounted, no leftover listed
    that is actually in the window, every leftover really from that
    cohort. Deferring is legal only because the oldest cohort sits AT
    the horizon (test_no_query_outside_window_has_stale_green is the
    mechanical guard); the leftovers are round 11's mandatory head."""
    names = list(entrymod.queries())[:WINDOW]
    for must in PROMOTED_THIS_ROUND + CHANGED_THIS_ROUND:
        assert must in names, f"promoted/changed query {must} not in window"
    latest, _ = _latest_green_rounds()
    rounds = sorted(set(latest.values()))
    oldest = {q for q, r in latest.items() if r == rounds[0]}
    unaccounted = sorted(oldest - set(names) - set(ROTATION_LEFTOVERS))
    assert not unaccounted, (
        f"r{rounds[0]}-green queries neither in the window nor "
        f"documented leftovers: {unaccounted}"
    )
    # leftovers must be real deferrals from exactly the oldest cohort
    misfiled = sorted(set(ROTATION_LEFTOVERS) - oldest)
    assert not misfiled, (
        f"ROTATION_LEFTOVERS entries not in the r{rounds[0]} "
        f"cohort: {misfiled}"
    )
    in_window_leftovers = sorted(set(ROTATION_LEFTOVERS) & set(names))
    assert not in_window_leftovers, (
        f"ROTATION_LEFTOVERS entries that are actually in the "
        f"window: {in_window_leftovers}"
    )
    if len(rounds) > 1:
        # the next-oldest cohort (r7) is strictly inside the horizon at
        # round 10; nothing from it may displace an oldest-cohort name
        next_oldest = {q for q, r in latest.items() if r == rounds[1]}
        displaced = sorted(
            (next_oldest & set(names)) - set(CHANGED_THIS_ROUND)
        )
        assert not displaced, (
            f"r{rounds[1]}-green queries occupy window slots while "
            f"r{rounds[0]} names are deferred: {displaced}"
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
