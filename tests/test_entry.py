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


#: round-5 rotation: queries whose CODE changed this round (vocab
#: broadcasts un-forced, minhash core refactor, connected-components
#: byte guard) -- must re-verify inside the driver window
CHANGED_THIS_ROUND = (
    "txt_perplexity_proxy",
    "txt_tfidf_topk_similar",
    "pipeline_pretraining_funnel",
    "dedup_minhash_lsh",
    "dedup_connected_components",
)

#: the <=2 oldest-green queries the 50-slot window cannot fit this
#: round; first in line next round (trivial, untouched-since-r2 plans)
ROTATION_LEFTOVERS = ("profile_lineitem", "sort_limit_top_orders")


def _latest_green_rounds() -> tuple[dict[str, int], int]:
    """(query -> most recent CORRECTNESS round with a row, max round)."""
    import glob
    import json
    import os
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    latest: dict[str, int] = {}
    max_round = 0
    paths = glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
    assert paths, "no CORRECTNESS_r*.json artifacts found in repo root"
    for path in paths:
        rnd = int(re.search(r"_r(\d+)", os.path.basename(path)).group(1))
        rows = json.load(open(path))
        if rows:
            max_round = max(max_round, rnd)
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)
    return latest, max_round


def test_round5_rotation_window(spark):
    """The driver's CORRECTNESS gate covers a bounded prefix (50 per
    round). Round-5 contract: everything whose code changed this round
    re-verifies inside the window, and the window's remaining slots go
    to the queries whose last driver row is OLDEST (>= 45 of the
    r2-only set), so no green row in the union ever ages past two
    rounds."""
    names = list(entrymod.queries())[:50]
    for must in CHANGED_THIS_ROUND:
        assert must in names, f"changed query {must} missing from window"
    latest, max_round = _latest_green_rounds()
    oldest = min(latest.values())
    stale = [q for q, r in latest.items() if r == oldest]
    refreshed = sum(1 for q in stale if q in names)
    assert refreshed >= min(45, len(stale)), (
        f"only {refreshed} of the {len(stale)} oldest-green queries are "
        "inside the driver window"
    )


def test_no_query_outside_window_has_stale_green(spark):
    """Mechanical form of the 'no row older than two rounds' rotation
    invariant: every registered query OUTSIDE the 50-slot window must
    carry a green row from one of the two most recent recorded driver
    rounds -- anything older must be in the window being refreshed (or
    be a documented leftover)."""
    latest, max_round = _latest_green_rounds()
    names = list(entrymod.queries())
    window = set(names[:50])
    stale_outside = [
        n
        for n in names
        if n not in window
        and n not in ROTATION_LEFTOVERS
        and latest.get(n, 0) < max_round - 1
    ]
    assert not stale_outside, (
        f"queries outside the window with rows older than two rounds: "
        f"{stale_outside}"
    )


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
