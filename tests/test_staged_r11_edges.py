"""Edge-corpus tests for the staged round-11 tier: empty tables (the
sweep class that caught the r9 DIVIDE_BY_ZERO pair) and single-row /
degenerate shapes for the ops with frame or seed preconditions."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from clueso_spark.plans.staged_r11 import _EWMA_TAPS, STAGED


@pytest.fixture(scope="module")
def empty_sf(tmp_path_factory):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from empty_sweep import write_empty_corpus

    return write_empty_corpus(str(tmp_path_factory.mktemp("empty_r11")))


@pytest.mark.parametrize("name", sorted(STAGED))
def test_empty_corpus_returns_not_raises(spark, name, empty_sf):
    rows = STAGED[name].spark(spark, empty_sf).collect()
    assert isinstance(rows, list)


def _events_table(tmp_path, rows):
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.timestamp("us")),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        str(tmp_path / "events.parquet"),
    )
    return str(tmp_path)


def _ev(eid, uid, minute, etype, val):
    return {
        "event_id": eid,
        "ts": datetime.datetime(2024, 1, 1)
        + datetime.timedelta(minutes=minute),
        "user_id": uid,
        "event_type": etype,
        "value": val,
        "props": "{}",
    }


def test_rolling_median_single_event_user(spark, tmp_path):
    """n = 1 frame: median_x2 = 2x the lone value."""
    sf = _events_table(tmp_path, [_ev(1, 7, 0, "click", 3.5)])
    rows = STAGED["window_rolling_median"].spark(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0]["n_in_frame"] == 1
    assert rows[0]["median_x2_cents"] == 700


def test_ewma_emits_nothing_below_full_history(spark, tmp_path):
    """A user with taps-1 events produces zero EWMA rows (the FIR never
    renormalizes on partial history)."""
    sf = _events_table(
        tmp_path,
        [_ev(i, 7, i, "click", 1.0) for i in range(_EWMA_TAPS - 1)],
    )
    assert STAGED["ev_ewma_smoothed"].spark(spark, sf).count() == 0


def test_mann_whitney_one_empty_sample(spark, tmp_path):
    """All observations in one group: U2 for the present group is
    n_a*(n_a+1) rank-sum minus itself over an absent opponent -- the
    doubled-U identity still holds with n_b = 0 (both U2s are 0)."""
    sf = _events_table(
        tmp_path, [_ev(i, i, i, "click", float(i)) for i in range(1, 5)]
    )
    row = STAGED["agg_mann_whitney"].spark(spark, sf).collect()[0]
    assert (row["n_a"], row["n_b"]) == (4, 0)
    assert (row["u2_a"], row["u2_b"]) == (0, 0)
    assert row["identity_resid"] == 0


def test_top_paths_short_sessions_keep_partial_paths(spark, tmp_path):
    """A (user, day) with fewer than 3 events contributes its partial
    path -- not dropped, not padded."""
    sf = _events_table(
        tmp_path,
        [
            _ev(1, 1, 0, "signup", 1.0),
            _ev(2, 1, 1, "click", 1.0),
            _ev(3, 2, 0, "view", 1.0),
        ],
    )
    rows = STAGED["ev_top_paths"].spark(spark, sf).collect()
    got = {r["path"]: r["n_sessions"] for r in rows}
    assert got == {"signup>click": 1, "view": 1}
