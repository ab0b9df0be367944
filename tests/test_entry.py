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


#: round-8 rotation: queries whose CODE changed this round -- every
#: name here must appear in the round-8 git diff:
#: pipeline_pretraining_funnel folded the exact-dedup fingerprint into
#: its base projection so raw text never enters the persist (the r7
#: driver-bench blowup fix; ranged_cumsum itself is unchanged this
#: round -- it freezes its pid relation via persist(), see
#: functions/ordered.py:73-86, after localCheckpoint was tried and
#: rejected)
CHANGED_THIS_ROUND = ("pipeline_pretraining_funnel",)

#: round-8 promotions: the former plans/staged_r8.py tier, registered
#: this round and therefore never driver-verified -- all 13 must head
#: the driver window (test_every_never_verified_query_is_inside_driver_window
#: asserts this mechanically from the artifact set, this tuple makes
#: the intent reviewable)
PROMOTED_THIS_ROUND = (
    "pipeline_domain_caps",
    "join_bloom_pruned_revenue",
    "graph_assoc_rules",
    "pipeline_epoch_shuffle_shards",
    "ev_rollup_incremental_merge",
    "txt_cooccurrence_pmi",
    "dedup_threshold_curve",
    "ev_decile_lift",
    "agg_poisson_bootstrap",
    "st_foreach_batch_upsert",
    "mm_shard_manifest",
    "txt_rake_keywords",
    "pipeline_incremental_corpus_diff",
)

#: The round the repo's rotation window was COMMITTED against: the
#: invariants below describe the artifact set r1..COMMITTED_ROUND. The
#: driver writes CORRECTNESS_r{COMMITTED_ROUND+1}.json AFTER this code
#: is frozen (and the judge runs pytest after that), so newer artifacts
#: must not shift the frame of reference -- round 5's versions of these
#: tests computed max_round from the live filesystem and therefore
#: failed by construction the moment the driver ran. Bump this when
#: flipping the window each round.
COMMITTED_ROUND = 7

#: The driver verifies this many queries per round (a prefix of
#: catalog.PRIORITY order).
WINDOW = 50

#: Full-registry refresh cycle length in rounds. With 165 registered
#: queries and a 50-slot window, every query can be re-verified at most
#: once per ceil(165/50) = 4 rounds, so the freshness invariant below
#: allows an out-of-window green to be up to REFRESH_CYCLE_ROUNDS - 1
#: rounds behind the newest committed artifact. Round 7's two-round
#: horizon became arithmetically impossible the moment the registry
#: crossed 100 (2 x WINDOW) names; this constant states the honest
#: bound and test_refresh_cycle_matches_registry_size pins it to the
#: live registry size rather than trusting the comment.
REFRESH_CYCLE_ROUNDS = 4

#: the 20 green rows the 50-slot window cannot fit this round: after
#: the 13 never-verified promotions, the 1 changed-code query, the 7
#: r4-green leftovers, and 29 of the 49 r5 greens, these 20 r5 names
#: (trivial, stable, multiply-green relational/scalar/setop/window
#: shapes) defer to round 9, where they head the refresh cohort
ROTATION_LEFTOVERS = (
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


def test_round8_rotation_window(spark):
    """The driver's CORRECTNESS gate covers a bounded prefix (WINDOW
    per round). Round-8 contract, asserted mechanically and COMPLETELY
    (round 6's weakened ">= min(2, ...)" form let a claimed refresh go
    unchecked -- ADVICE r6): every never-verified promotion and every
    changed-code query is in the window, EVERY query whose latest
    committed green is the oldest round is in the window, and the
    next-oldest cohort is partitioned EXACTLY between the window and
    the documented leftovers -- no name unaccounted, no leftover listed
    that actually fits."""
    names = list(entrymod.queries())[:WINDOW]
    for must in PROMOTED_THIS_ROUND + CHANGED_THIS_ROUND:
        assert must in names, f"promoted/changed query {must} not in window"
    latest, _ = _latest_green_rounds()
    rounds = sorted(set(latest.values()))
    oldest = [q for q, r in latest.items() if r == rounds[0]]
    missing_oldest = [q for q in oldest if q not in names]
    assert not missing_oldest, (
        f"oldest-green queries (r{rounds[0]}) outside the window: "
        f"{missing_oldest}"
    )
    if len(rounds) > 1:
        next_oldest = {q for q, r in latest.items() if r == rounds[1]}
        unaccounted = sorted(
            next_oldest - set(names) - set(ROTATION_LEFTOVERS)
        )
        assert not unaccounted, (
            f"r{rounds[1]}-green queries neither in the window nor "
            f"documented leftovers: {unaccounted}"
        )
        # leftovers must be real deferrals from exactly that cohort
        misfiled = sorted(set(ROTATION_LEFTOVERS) - next_oldest)
        assert not misfiled, (
            f"ROTATION_LEFTOVERS entries not in the r{rounds[1]} "
            f"cohort: {misfiled}"
        )
        in_window_leftovers = sorted(set(ROTATION_LEFTOVERS) & set(names))
        assert not in_window_leftovers, (
            f"ROTATION_LEFTOVERS entries that are actually in the "
            f"window: {in_window_leftovers}"
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
