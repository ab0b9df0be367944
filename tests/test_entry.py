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
    assert len(qs) >= 59
    # every oracle belongs to a query; missing oracles are the documented
    # rows-only set (engine-specific sketches / float-mean paths)
    assert set(oracles) <= set(qs)
    rows_only = set(qs) - set(oracles)
    assert rows_only == {"agg_approx_count_distinct", "sim_ivf_cells",
                         "sim_residual_norms"}
    for name, fn in qs.items():
        assert callable(fn), name
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "select" in sql.lower(), name


def test_streaming_queries_rerun_in_same_session(spark):
    """The driver may invoke a streaming query after other queries in one
    session; memory-sink query names must be reusable after termination."""
    qs = entrymod.queries()
    for name in ("st_windowed_counts", "st_dedup_replay"):
        first = qs[name](spark, SF_DIR).count()
        second = qs[name](spark, SF_DIR).count()
        assert first == second > 0, name
