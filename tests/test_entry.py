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


def test_never_driver_verified_tier_registers_first(spark):
    """The driver's CORRECTNESS gate covers a bounded prefix (50 per
    round); the round-4 rotation contract: the six queries that had never
    carried a driver row, everything added or semantically changed this
    round, and every refactored query must all land inside the first 50
    registration slots, with every family represented."""
    names = list(entrymod.queries())[:50]
    for family in ("dedup_", "sim_", "txt_", "mm_", "st_", "pipeline_"):
        n = sum(1 for q in names if q.startswith(family))
        assert n >= 3, f"{family} underrepresented in driver window: {n}"
    for must in (
        # round-3 stragglers: first-ever driver rows
        "sim_ivfpq_ann",
        "st_sliding_counts",
        "ev_anomaly_zscore",
        "agg_exact_median",
        "txt_fingerprints",
        "txt_regex_token_count",
        # new or semantically changed this round
        "sim_ivfpq_rerank",
        "dedup_ngram_jaccard",
        "dedup_ngram_jaccard_pairs",
        # refactored paths re-verifying
        "dedup_minhash_lsh",
        "dedup_connected_components",
        "dedup_embedding_cosine",
        "pipeline_curated_corpus",
        "ev_engine_latest",
    ):
        assert must in names, f"{must} missing from driver window"


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
    import glob
    import json

    verified: set[str] = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        verified |= set(json.load(open(path)))
    names = list(entrymod.queries())
    window = set(names[:50])
    stranded = [n for n in names if n not in verified and n not in window]
    assert not stranded, (
        f"{len(stranded)} never-driver-verified queries outside the "
        f"window: {stranded}"
    )
