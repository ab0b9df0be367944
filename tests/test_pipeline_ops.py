"""Scenario tests for the round-4 pipeline operators: two-relation
as-of join, interval range join, SemDeDup, exact-substring span dedup,
stratified sampling, PII redaction.

Crafted inputs pin the EDGE semantics the sf-corpus parity gate can't
isolate: equal-timestamp as-of ties, interval boundary inclusion,
planted duplicate spans, planted semantic duplicates, the actual
match/redact path of every PII pattern.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    """rows: (event_id, ts_offset_sec, user_id, event_type)"""
    return spark.createDataFrame(
        [
            (eid, T0 + dt.timedelta(seconds=off), uid, et, 0.0, "{}")
            for eid, off, uid, et in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )


def _write_events(tmp_path, df):
    df.toPandas().to_parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


# -- as-of join (ev_asof_attribution) -------------------------------------


def test_asof_equal_ts_click_attributes(spark, tmp_path):
    """ASOF '>=' semantics: a click at EXACTLY the purchase timestamp
    wins; a click one microsecond later does not."""
    from clueso_spark.plans.event_queries import ev_asof_attribution

    df = _events(
        spark,
        [
            (1, 0, 7, "click"),  # same instant as purchase 2
            (2, 0, 7, "purchase"),
            (3, 10, 7, "click"),  # after purchase 4's instant? no: before
            (4, 5, 7, "purchase"),  # prior click is event 1 (t=0)
        ],
    )
    sf = _write_events(tmp_path, df)
    out = {
        r["p_event_id"]: r
        for r in ev_asof_attribution(spark, sf).collect()
    }
    assert out[2]["c_event_id"] == 1 and out[2]["gap_us"] == 0
    assert out[4]["c_event_id"] == 1 and out[4]["gap_us"] == 5_000_000


def test_asof_no_prior_click_is_null(spark, tmp_path):
    from clueso_spark.plans.event_queries import ev_asof_attribution

    df = _events(spark, [(1, 0, 7, "purchase"), (2, 10, 7, "click")])
    sf = _write_events(tmp_path, df)
    rows = ev_asof_attribution(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0]["c_event_id"] is None and rows[0]["gap_us"] is None


def test_asof_duplicate_ts_clicks_max_event_id(spark, tmp_path):
    """Two clicks at the same (user, ts): the higher event_id is the
    deterministic winner in both engines."""
    from clueso_spark.plans.event_queries import ev_asof_attribution

    df = _events(
        spark,
        [(1, 0, 7, "click"), (9, 0, 7, "click"), (5, 10, 7, "purchase")],
    )
    sf = _write_events(tmp_path, df)
    rows = ev_asof_attribution(spark, sf).collect()
    assert rows[0]["c_event_id"] == 9


# -- interval range join (ev_range_interval_join) -------------------------


def test_range_interval_boundaries(spark, tmp_path):
    """[start, start+2h): an error AT the signup instant is in, one at
    exactly +2h is out; a signup with no errors survives with count 0."""
    from clueso_spark.plans.event_queries import ev_range_interval_join

    two_h = 7200
    df = _events(
        spark,
        [
            (1, 0, 7, "signup"),
            (2, 0, 7, "error"),  # at start -> in, gap 0
            (3, two_h - 1, 7, "error"),  # in
            (4, two_h, 7, "error"),  # exactly at end -> out
            (5, 0, 8, "signup"),  # no errors for user 8
            (6, 100, 9, "error"),  # other user, never joins
        ],
    )
    sf = _write_events(tmp_path, df)
    out = {
        r["s_event_id"]: r
        for r in ev_range_interval_join(spark, sf).collect()
    }
    assert out[1]["n_errors"] == 2 and out[1]["first_gap_us"] == 0
    assert out[5]["n_errors"] == 0 and out[5]["first_gap_us"] is None


# -- exact-substring span dedup -------------------------------------------


def _write_docs(tmp_path, texts):
    rows = [
        {
            "doc_id": i,
            "text": t,
            "lang": "en",
            "source": f"src{i}",
            "n_chars": len(t),
        }
        for i, t in enumerate(texts)
    ]
    pq.write_table(pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_exact_substring_planted_span(spark, tmp_path):
    """An 8-word span pasted into two docs is detected in both; a doc
    sharing nothing reports zero duplicated windows."""
    from clueso_spark.plans.dedup_queries import dedup_exact_substring

    span = "alpha beta gamma delta epsilon zeta eta theta"
    texts = [
        f"one two three {span} four five six",
        f"seven eight {span} nine ten eleven twelve",
        "completely different words with no shared span at all here okay",
    ]
    sf = _write_docs(tmp_path, texts)
    out = {r["doc_id"]: r for r in dedup_exact_substring(spark, sf).collect()}
    # the planted span contributes exactly one duplicated 8-gram per doc
    assert out[0]["dup_windows"] == 1
    assert out[1]["dup_windows"] == 1
    assert out[2]["dup_windows"] == 0
    assert 0 < out[0]["dup_frac"] < 1


# -- SemDeDup -------------------------------------------------------------


def test_semantic_dedup_planted_duplicates(spark, tmp_path):
    """Near-parallel vectors land in the same k-means cluster and are
    flagged as semantic dups of the lower-id anchor; orthogonal vectors
    are not flagged."""
    from clueso_spark.plans.dedup_queries import dedup_semantic

    vecs = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 0.0, 0.0],
        [0.0, 0.0, 1.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
        [0.9, 0.01, 0.0, 0.0],  # dup of 0
        [0.0, 1.1, 0.011, 0.0],  # dup of 1
    ]
    rows = [
        {"vec_id": i, "embedding": v, "label": 0} for i, v in enumerate(vecs)
    ]
    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(rows, schema=schema),
        str(tmp_path / "embeddings.parquet"),
    )
    out = {
        r["vec_id"]: r["dup_of"]
        for r in dedup_semantic(spark, str(tmp_path)).collect()
    }
    assert out == {4: 0, 5: 1}


# -- stratified sampling --------------------------------------------------


def test_stratified_sample_equalizes(spark):
    from clueso_spark.plans.text_queries import pipeline_stratified_sample

    rows = {r["lang"]: r for r in pipeline_stratified_sample(spark, SF_DIR).collect()}
    smallest = min(rows.values(), key=lambda r: r["n_total"])
    # the smallest stratum keeps everything (rate = 10000 bp)
    assert smallest["rate_bp"] == 10000
    assert smallest["n_sampled"] == smallest["n_total"]
    for r in rows.values():
        assert 0 <= r["n_sampled"] <= r["n_total"]
        assert r["rate_bp"] <= 10000


# -- PII redaction --------------------------------------------------------


def test_pii_fixture_rows_match_and_redact(spark):
    """The unioned fixture rows force every pattern through the
    match/redact path: 4 emails, 2 phones, 1 IP, nonzero chars removed;
    the synthetic corpus rows stay clean."""
    from clueso_spark.plans.text_queries import txt_pii_redaction

    rows = {r["source"]: r for r in txt_pii_redaction(spark, SF_DIR).collect()}
    fx = rows["fixture"]
    assert fx["n_emails"] == 4
    assert fx["n_phones"] == 2
    assert fx["n_ips"] == 1
    assert fx["chars_removed"] > 0
    clean = [r for s, r in rows.items() if s != "fixture"]
    assert all(
        r["n_emails"] == 0 and r["n_phones"] == 0 and r["n_ips"] == 0
        for r in clean
    )


def test_pii_redaction_replaces_all_occurrences(spark):
    """Direct check of the redaction expression on a crafted row."""
    from clueso_spark.plans.text_queries import PII_EMAIL, PII_IP, PII_PHONE

    txt = "a@b.io then 555-123-4567 then 10.0.0.1 then c@d.org"
    red = (
        spark.range(1)
        .select(
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace(
                        F.lit(txt), F.lit(PII_EMAIL), F.lit("<PII>")
                    ),
                    F.lit(PII_PHONE),
                    F.lit("<PII>"),
                ),
                F.lit(PII_IP),
                F.lit("<PII>"),
            ).alias("r")
        )
        .collect()[0]["r"]
    )
    assert red == "<PII> then <PII> then <PII> then <PII>"


def test_streaming_asof_matches_batch(spark, tmp_path):
    """The stateful streaming as-of (applyInPandasWithState) must agree
    with the batch union-merge twin on ties, duplicates, and
    no-prior-click edges."""
    from clueso_spark.plans.event_queries import ev_asof_attribution
    from clueso_spark.plans.streaming_queries import st_asof_attribution

    df = _events(
        spark,
        [
            (1, 0, 7, "click"),
            (9, 0, 7, "click"),  # same-ts duplicate, max id wins
            (2, 0, 7, "purchase"),  # tie with clicks -> attributed
            (4, 5, 7, "purchase"),
            (5, 0, 8, "purchase"),  # user 8 has no clicks -> nulls
            (6, 3, 8, "click"),
            (7, 9, 8, "purchase"),
        ],
    )
    sf = _write_events(tmp_path, df)
    batch = {tuple(r) for r in ev_asof_attribution(spark, sf).collect()}
    stream = {tuple(r) for r in st_asof_attribution(spark, sf).collect()}
    assert stream == batch
    assert len(stream) == 4
