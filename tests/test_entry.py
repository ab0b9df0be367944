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


#: round-15 rotation: queries whose CODE changed this round AND occupy
#: a window slot. None beyond cohort membership -- the round-15 code
#: changes (the ADVICE fixes to run_on_state_sized_session /
#: stream_state_partitions) touch only the five stateful streaming
#: queries, all of which ALREADY sit in this round's mandatory r10
#: refresh head, so the driver re-verifies the changed code in-window
#: without extra slots (the clean case the round-14 handoff named).
CHANGED_THIS_ROUND: tuple[str, ...] = ()

#: round-15 changed-code obligation: EMPTY -- the round-14 obligation
#: (the five stateful queries changed without a slot) is DISCHARGED by
#: this window: all five sit in the mandatory r10 refresh head above,
#: so CORRECTNESS_r15 carries their post-change driver rows. The
#: mechanism (a changed-without-slot name must sit in the next round's
#: mandatory cohort) stays pinned by
#: test_changed_code_sits_in_next_round_mandatory_head for any future
#: entry.
CHANGED_AWAITING_REFRESH: tuple[str, ...] = ()

#: round-15 promotions: the former plans/staged_r15.py tier, registered
#: this round and therefore never driver-verified. The tier was sized
#: (4 ops) to the round-15 window's free capacity, so ALL of them fit:
#: zero new deferral debt.
PROMOTED_THIS_ROUND = (
    "graph_randomwalk_corpus",
    "txt_bpe_merge_steps",
    "txt_vocab_coverage_oov",
    "ev_lateness_audit",
)

#: round-14 carried no deferrals into round 15 (its window discharged
#: everything), so nothing heads this window by prior obligation.
FORMER_DEFERRED: tuple[str, ...] = ()

#: round-15 deferral obligation: EMPTY. Window math 46 (r10 leftovers)
#: + 4 (promotions) = 50 exactly; full-catalog driver coverage
#: (reached in round 13) is preserved.
DEFERRED_PROMOTIONS: tuple[str, ...] = ()

#: The round the repo's rotation window was COMMITTED against: the
#: invariants below describe the artifact set r1..COMMITTED_ROUND. The
#: driver writes CORRECTNESS_r{COMMITTED_ROUND+1}.json AFTER this code
#: is frozen (and the judge runs pytest after that), so newer artifacts
#: must not shift the frame of reference -- round 5's versions of these
#: tests computed max_round from the live filesystem and therefore
#: failed by construction the moment the driver ran. Bump this when
#: flipping the window each round.
COMMITTED_ROUND = 14

#: The driver verifies this many queries per round (a prefix of
#: catalog.PRIORITY order).
WINDOW = 50

#: Full-registry refresh cycle length in rounds. With 249 registered
#: queries and a 50-slot window, every query can be re-verified at most
#: once per ceil(249/50) = 5 rounds, so the freshness invariant below
#: allows an out-of-window green to be up to REFRESH_CYCLE_ROUNDS - 1
#: rounds behind the newest committed artifact.
#: test_refresh_cycle_matches_registry_size re-derives this from the
#: live registry size rather than trusting the comment.
REFRESH_CYCLE_ROUNDS = 5

#: the 49 r11 greens: with 46 mandatory r10 leftovers + 4 promotions,
#: round 15 has ZERO pure-refresh slots, so the entire r11 cohort
#: stays out. Legal: it is 3 rounds behind at commit time (horizon is
#: REFRESH_CYCLE_ROUNDS - 1 = 4). These 49 head round 16's window
#: (its 50 slots leave 1 free -- exactly the staged_r16 tier's size;
#: PRIORITY pre-orders them after the boundary).
ROTATION_LEFTOVERS = (
    "agg_equidepth_histogram",
    "agg_kmv_distinct",
    "agg_mann_whitney",
    "agg_pivot_shipmode",
    "dedup_connected_components",
    "dedup_containment",
    "dedup_embedding_cosine",
    "dedup_exact_substring",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_ngram_jaccard_pairs",
    "dedup_semantic",
    "dedup_threshold_curve",
    "dedup_winnowing",
    "ev_cumulative_distinct_users",
    "ev_ewma_smoothed",
    "ev_result_projection",
    "ev_rfm_segmentation",
    "ev_sweepline_active_intervals",
    "ev_top_paths",
    "ev_user_value_anomalies",
    "graph_katz_centrality",
    "graph_label_propagation",
    "graph_pagerank_copurchase",
    "graph_shortest_paths",
    "graph_triangle_count",
    "mm_cdc_chunking",
    "mm_cdc_dedup",
    "mm_phash_hamming_dedup",
    "pipeline_contamination_check",
    "pipeline_curated_corpus",
    "pipeline_dedup_cluster_stats",
    "pipeline_pretraining_funnel",
    "sim_sq_int8_ann",
    "st_stateful_latest",
    "txt_bigram_perplexity",
    "txt_char_entropy",
    "txt_cms_heavy_hitters",
    "txt_cooccurrence_pmi",
    "txt_lang_stats",
    "txt_langid_heuristic",
    "txt_lexical_diversity",
    "txt_quality_score",
    "txt_rake_keywords",
    "txt_tf_df_top_terms",
    "txt_token_stats",
    "txt_top_bigrams",
    "txt_zipf_slope",
    "window_rolling_median",
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
        for name, row in rows.items():
            # only GREEN rows count as verifications (same convention
            # as tools/rotation_plan.py): a recorded failure must not
            # silently refresh a query's cohort. The sole non-green
            # row ever committed is r2's `no_oracle` placeholder for
            # agg_approx_count_distinct (green from r3 onward).
            # Non-dict rows stay green-by-name for behavioral parity
            # with tools/rotation_plan.py, but warn (ADVICE r14): a
            # corrupted artifact row must not pass invisibly.
            if not isinstance(row, dict):
                import warnings

                warnings.warn(
                    f"non-dict CORRECTNESS row for {name!r} in "
                    f"{os.path.basename(path)} counted green-by-name",
                    stacklevel=2,
                )
            if isinstance(row, dict):
                if row.get("err"):
                    continue
                if (
                    row.get("rows_match") is False
                    or row.get("hash_match") is False
                ):
                    continue
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


#: Post-250 steady-state policy (decided round 15, lands round 16; see
#: ROUND15_NOTES "Post-250 steady-state policy"): the catalog is
#: COMPLETE-BY-POLICY at 250 = REFRESH_CYCLE_ROUNDS x WINDOW -- the
#: largest registry at which every query still re-verifies within the
#: documented 5-round freshness horizon. From round 17 onward every
#: driver window is one full cohort refresh with ZERO promotion
#: capacity, so any future registration must be a one-out-one-in
#: EXCHANGE: retire a query (preferred candidates: overlapping
#: curve/debug variants, e.g. dedup_ngram_jaccard_pairs as
#: dedup_ngram_jaccard's debug view, sim_ivf_nprobe_curve /
#: dedup_threshold_curve as parameter sweeps of their parent ops)
#: in the SAME commit that registers the replacement, keeping the
#: registry AT the ceiling and the new name inside that round's
#: window. Growing the ceiling itself requires widening the window or
#: lengthening the cycle -- a driver-contract change, not a repo-side
#: decision.
REGISTRY_CEILING = 250


def test_registry_respects_steady_state_ceiling(spark):
    """The pinned encoding of the post-250 policy: registry size never
    exceeds the ceiling (249 now; exactly 250 after the staged_r16
    promotion -- test_tier_is_sized_to_round16_projection pins that
    endpoint), and the ceiling itself is exactly cycle x window, so
    every registered query keeps a re-verification slot within the
    documented horizon. A registration that would cross the ceiling
    must retire a query in the same commit (the exchange rule above)
    or fail here loudly."""
    import math

    n = len(entrymod.queries())
    assert REGISTRY_CEILING == REFRESH_CYCLE_ROUNDS * WINDOW
    assert n <= REGISTRY_CEILING, (
        f"registry {n} exceeds the steady-state ceiling "
        f"{REGISTRY_CEILING}: retire a query in the same commit "
        f"(one-out-one-in) or widen the driver window"
    )
    # the ceiling is the LARGEST size consistent with the freshness
    # horizon: one more query would push the cycle past 5 rounds
    assert math.ceil((REGISTRY_CEILING + 1) / WINDOW) > REFRESH_CYCLE_ROUNDS


def test_round15_rotation_window(spark):
    """The driver's CORRECTNESS gate covers a bounded prefix (WINDOW
    per round). Round-15 contract, asserted mechanically and
    COMPLETELY: the OLDEST cohort (the 46 r10 greens round 14
    documented as its leftovers -- this round's MANDATORY head, now
    exactly AT the freshness horizon; it contains the five stateful
    queries whose round-14 code change re-verifies here, discharging
    CHANGED_AWAITING_REFRESH) is entirely inside the window; the 4
    round-15 promotions fill the rest exactly (46 + 4 = 50, zero
    changed names in-window beyond cohort membership); the
    SECOND-oldest cohort (r11, 49 names -- larger than the ZERO
    remaining refresh slots) is entirely deferred and partitions
    exactly onto the documented ROTATION_LEFTOVERS. Deferring r11
    names is legal only because they sit 3 rounds behind with a
    4-round horizon (test_no_query_outside_window_has_stale_green is
    the mechanical guard); they head round 16's window
    (test_deferred_promotions_head_next_round_window pins the
    pre-order)."""
    names = list(entrymod.queries())[:WINDOW]
    for must in (
        FORMER_DEFERRED + PROMOTED_THIS_ROUND + CHANGED_THIS_ROUND
    ):
        assert must in names, f"promoted/deferred query {must} not in window"
    latest, _ = _latest_green_rounds()
    rounds = sorted(set(latest.values()))
    oldest = {q for q, r in latest.items() if r == rounds[0]}
    # round 14's documented leftovers ARE the oldest cohort; every one
    # of them must occupy a window slot this round
    missing_head = sorted(oldest - set(names))
    assert not missing_head, (
        f"r{rounds[0]}-green mandatory head names not in the window: "
        f"{missing_head}"
    )
    # window arithmetic: 46 oldest + 4 promotions = 50, and the
    # cohorts are disjoint by construction
    assert len(oldest) + len(FORMER_DEFERRED) + len(
        PROMOTED_THIS_ROUND
    ) + len(CHANGED_THIS_ROUND) == WINDOW
    # the r11 cohort partitions exactly onto the documented leftovers
    second = {q for q, r in latest.items() if r == rounds[1]}
    assert second == set(ROTATION_LEFTOVERS), (
        sorted(second ^ set(ROTATION_LEFTOVERS))
    )
    in_window_leftovers = sorted(set(ROTATION_LEFTOVERS) & set(names))
    assert not in_window_leftovers, (
        f"ROTATION_LEFTOVERS entries that are actually in the "
        f"window: {in_window_leftovers}"
    )
    # nothing fresher (r11+) may occupy a slot while r10 names are
    # deferred (new promotions have no artifact rows, so they never
    # appear in `latest`)
    fresher = {q for q, r in latest.items() if r > rounds[1]}
    displaced = sorted((fresher & set(names)) - set(CHANGED_THIS_ROUND))
    assert not displaced, (
        f"post-r{rounds[1]} greens occupy window slots while "
        f"r{rounds[1]} names are deferred: {displaced}"
    )


def test_deferred_promotions_head_next_round_window(spark):
    """Round 15 carries NO deferral debt (DEFERRED_PROMOTIONS is
    empty -- the 4-op staged tier was sized to the window's free
    capacity), so the only next-round obligation is the refresh
    pre-order: PRIORITY slots WINDOW..WINDOW+48 are exactly the 49
    r11-green ROTATION_LEFTOVERS, round 16's mandatory head."""
    names = list(entrymod.queries())
    assert not DEFERRED_PROMOTIONS
    assert not FORMER_DEFERRED
    nxt = names[WINDOW : WINDOW + len(ROTATION_LEFTOVERS)]
    assert sorted(nxt) == sorted(ROTATION_LEFTOVERS), (
        sorted(set(nxt) ^ set(ROTATION_LEFTOVERS))
    )
    # the promotions are real, registered, and never driver-verified
    latest, _ = _latest_green_rounds()
    already = sorted(set(PROMOTED_THIS_ROUND) & set(latest))
    assert not already, (
        f"PROMOTED_THIS_ROUND with driver rows (not promotions): "
        f"{already}"
    )


def test_changed_code_sits_in_next_round_mandatory_head(spark):
    """A registered query whose code changes must normally take a
    window slot (the driver re-verifies changed code the same round).
    A change WITHOUT a slot is sanctioned only under both conditions
    asserted here: (a) the name already sits in the next round's
    mandatory refresh cohort -- driver re-verification lands
    mechanically one round later with no extra slot spent; (b) the
    change is output-preserving, pinned by pytest + the local oracle
    gate. Round 15: the set is EMPTY -- round 14's five-name
    obligation is discharged by this window's mandatory r10 head
    (all five stateful queries re-verify in CORRECTNESS_r15), and
    round 15's own code changes touch only in-window names. The
    mechanism stays pinned for any future entry."""
    for name in CHANGED_AWAITING_REFRESH:
        assert name in ROTATION_LEFTOVERS, (
            f"{name} changed without a window slot AND without a "
            f"next-round mandatory refresh -- that IS a rotation-policy "
            f"violation"
        )
    # disjoint from the in-window sets by construction
    assert not set(CHANGED_AWAITING_REFRESH) & set(
        PROMOTED_THIS_ROUND + CHANGED_THIS_ROUND
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
        if n not in window
        and latest.get(n, 0) < horizon
        # never-verified deferrals have no green to be stale; their
        # invariant is test_deferred_promotions_head_next_round_window
        and n not in DEFERRED_PROMOTIONS
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
        # promoted in round 14: drains through a cloned-session memory
        # sink (run_on_state_sized_session), so reruns get a fresh
        # temp-view namespace each call -- pin that too
        "st_stream_stream_outer_join",
        # the stateful KMV sketch drains through a named memory sink
        # too, so its rerun path needs the same pin
        "st_kmv_distinct_sketch",
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
    new registrations past the boundary. Sole sanctioned exception:
    the enumerated DEFERRED_PROMOTIONS, whose round-13 headship is
    asserted by test_deferred_promotions_head_next_round_window --
    a deferral with a pinned obligation is not a stranding."""
    latest, _ = _latest_green_rounds()
    verified = set(latest)
    names = list(entrymod.queries())
    window = set(names[:50])
    stranded = [
        n
        for n in names
        if n not in verified
        and n not in window
        and n not in DEFERRED_PROMOTIONS
    ]
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
