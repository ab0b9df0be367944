"""Scenario tests for the round-4 extension operators: triangle
counting, int8 scalar quantization, matryoshka recall, two-stage
payload dedup, LM-perplexity scoring, the IVF nprobe curve.

Crafted inputs pin the semantics the sf-corpus parity gate can't
isolate: a planted triangle with a support-filtered edge, an exact
duplicate payload among length-colliders, prefix-only embedding signal
(truncation must lose nothing), rare-vs-common token surprisal, and the
candidate-set-nesting monotonicity of the nprobe sweep.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq

SF_DIR = "/root/testdata/sf0.001"

DIM = 64


def _write_lineitem(tmp_path, rows):
    """rows: (l_orderkey, l_partkey)"""
    pq.write_table(
        pa.Table.from_pylist(
            [{"l_orderkey": o, "l_partkey": p} for o, p in rows]
        ),
        str(tmp_path / "lineitem.parquet"),
    )
    return str(tmp_path)


def _write_embeddings(tmp_path, vecs):
    rows = [
        {"vec_id": i, "embedding": v, "label": i % 4}
        for i, v in enumerate(vecs)
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
    return str(tmp_path)


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
    pq.write_table(
        pa.Table.from_pylist(rows), str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


# -- triangle counting ----------------------------------------------------


def test_triangle_planted_with_support_filter(spark, tmp_path):
    """Parts 1-2-3 co-occur pairwise in >= 2 orders -> one triangle,
    clustering coefficient 1.0. Part 4 touches part 1 in only ONE order:
    below the support threshold, so it joins neither edges nor wedges."""
    from clueso_spark.plans.relational import graph_triangle_count

    orders = [
        (100, 1), (100, 2), (100, 3),  # order 100: all three pairs once
        (101, 1), (101, 2),            # (1,2) support 2
        (102, 1), (102, 3),            # (1,3) support 2
        (103, 2), (103, 3),            # (2,3) support 2
        (104, 1), (104, 4),            # (1,4) support 1 -> filtered
    ]
    sf = _write_lineitem(tmp_path, orders)
    row = graph_triangle_count(spark, sf).collect()[0]
    assert row["n_vertices"] == 3
    assert row["n_edges"] == 3
    assert row["n_triangles"] == 1
    assert row["n_wedges"] == 3  # each vertex has degree 2 -> 1 wedge each
    assert row["clustering_coeff"] == 1.0


# -- int8 scalar quantization ---------------------------------------------


def test_sq_int8_identical_vector_ranks_first(spark, tmp_path):
    """A corpus vector identical to probe 0 quantizes to the same codes
    and must rank 1 for probe 0 with the maximal integer self-dot."""
    from clueso_spark.plans.similarity_queries import sim_sq_int8_ann

    base = [[float(((i * 7 + j * 13) % 19) - 9) for j in range(DIM)]
            for i in range(8)]
    vecs = base + [list(base[0])]  # vec_id 8 == probe 0 exactly
    sf = _write_embeddings(tmp_path, vecs)
    out = sim_sq_int8_ann(spark, sf)
    top = {
        r["probe_id"]: (r["vec_id"], r["qdot"])
        for r in out.where("rk = 1").collect()
    }
    assert top[0][0] == 8
    # identical codes -> the score is the (positive) self dot product
    assert top[0][1] > 0


# -- matryoshka truncation recall -----------------------------------------


def test_matryoshka_prefix_only_signal_gives_full_recall(spark, tmp_path):
    """When all signal lives in the first 8 dims (rest exactly zero),
    every truncated ranking equals the full ranking: recall 1.0 at
    every dim for every probe."""
    from clueso_spark.plans.similarity_queries import sim_matryoshka_recall

    vecs = []
    for i in range(16):
        head = [float((i * 5 + j * 3) % 11 + 1) for j in range(8)]
        vecs.append(head + [0.0] * (DIM - 8))
    sf = _write_embeddings(tmp_path, vecs)
    rows = sim_matryoshka_recall(spark, sf).collect()
    assert len(rows) == 15  # 3 dims x 5 probes
    assert all(r["recall"] == 1.0 for r in rows), rows


# -- two-stage payload dedup ----------------------------------------------


def test_payload_dedup_funnel_counts(spark, tmp_path):
    """Two identical payloads + one same-length decoy + one unique
    length: only the 3 length-colliders get hashed; one dup group of 2."""
    from clueso_spark.plans.multimodal_queries import mm_payload_dedup

    sf = _write_docs(tmp_path, ["aaaa", "aaaa", "bbbb", "ccccc"])
    row = mm_payload_dedup(spark, sf).collect()[0]
    assert row["n_payloads"] == 4
    assert row["n_len_collision_groups"] == 1
    assert row["n_rows_hashed"] == 3
    assert row["n_dup_groups"] == 1
    assert row["n_dup_rows"] == 2


# -- LM-perplexity proxy --------------------------------------------------


def test_perplexity_rare_tokens_are_more_surprising(spark, tmp_path):
    """A doc of corpus-common tokens scores lower cross-entropy than a
    doc of corpus-unique tokens; a doc repeating one token has the
    corpus-minimal surprisal."""
    from clueso_spark.plans.text_queries import txt_perplexity_proxy

    common = "the " * 49 + "the"
    sf = _write_docs(
        tmp_path,
        [
            common,                       # doc 0: one very common token
            "the the the cat sat here",   # doc 1: mostly common
            "zyx wvu tsr qpo nml kji",    # doc 2: all unique tokens
        ],
    )
    out = {
        r["doc_id"]: r["xent_bits"]
        for r in txt_perplexity_proxy(spark, sf).collect()
    }
    assert out[0] < out[1] < out[2]


# -- IVF nprobe curve -----------------------------------------------------


def test_nprobe_recall_is_monotone(spark):
    """Candidate sets nest as nprobe grows, so recall@10 must be
    non-decreasing in nprobe for every probe (run on the real sf0.001
    corpus)."""
    from clueso_spark.plans.similarity_queries import sim_ivf_nprobe_curve

    rows = sim_ivf_nprobe_curve(spark, SF_DIR).collect()
    by_probe: dict[int, dict[int, float]] = {}
    for r in rows:
        by_probe.setdefault(r["probe_id"], {})[r["nprobe"]] = r["recall"]
    assert len(by_probe) == 5
    for probe_id, curve in by_probe.items():
        assert curve[1] <= curve[2] <= curve[4], (probe_id, curve)


# -- adaptive coarse-quantizer sizing -------------------------------------


def test_adaptive_k_floor_and_growth():
    """K sits on the floor through the oracle-gate corpus sizes, then
    grows as a power of two tracking N/TARGET_CELL."""
    from clueso_spark.plans.similarity_queries import TARGET_CELL, adaptive_k

    assert adaptive_k(0) == 4
    assert adaptive_k(500) == 4       # sf0.01: the oracle floor
    assert adaptive_k(512) == 4
    assert adaptive_k(5000) == 64     # sf0.1
    for n in (10_000, 1_000_000, 10_000_000):
        k = adaptive_k(n)
        assert k & (k - 1) == 0       # power of two
        assert n / k <= TARGET_CELL   # cells never exceed the target
        assert adaptive_k(n * 10) >= k


def test_assign_nearest_flat_path_equals_nearest(spark, tmp_path):
    """Below HIER_MIN_K the hierarchical wrapper must BE the flat exact
    assignment -- that identity is what keeps fixed-K oracles bit-exact
    at the gate's floor."""
    from clueso_spark.plans.similarity_queries import (
        _emb,
        _lloyd_c1,
        _nearest,
        assign_nearest,
    )

    vecs = [
        [float((i * 11 + j * 5) % 13) for j in range(DIM)] for i in range(20)
    ]
    sf = _write_embeddings(tmp_path, vecs)
    emb = _emb(spark, sf)
    cents = _lloyd_c1(emb, k=4)
    flat = sorted(
        (r["vec_id"], r["cid"])
        for r in _nearest(emb, cents).select("vec_id", "cid").collect()
    )
    wrapped = sorted(
        (r["vec_id"], r["cid"])
        for r in assign_nearest(emb, cents, 4).select("vec_id", "cid").collect()
    )
    assert flat == wrapped


# -- MMR diversified rerank -------------------------------------------------


def test_mmr_skips_near_duplicate_of_first_pick(spark, tmp_path):
    """Two candidate clusters at 45 degrees from the probe: step 1 takes
    cluster A's best; step 2 must pass over A's near-copy (nearly the
    same raw relevance) and take cluster B instead -- the reorder MMR
    exists for. (When every candidate is parallel to the probe, max-sim
    mirrors relevance and MMR degenerates to the relevance order -- the
    clusters make the two signals diverge.)"""
    from clueso_spark.plans.similarity_queries import sim_mmr_rerank

    def vec(entries):
        v = [0.0] * DIM
        for i, x in entries:
            v[i] = x
        return v

    p = vec([(0, 1.0)])                       # probe direction
    a1 = vec([(0, 1.0), (1, 1.0)])            # cluster A: rel ~.707
    a2 = vec([(0, 1.0), (1, 1.02)])           # A's near-copy, rel ~.700
    b = vec([(0, 1.0), (32, 1.0)])            # cluster B: rel ~.707,
    #                                           sim(b, a1) = 0.5
    filler = [
        vec([(40 + i, 0.1), (50, 0.01)]) for i in range(8)
    ]  # rel ~0, fills the top-10
    vecs = [p] + [vec([(10 + i, 1.0)]) for i in range(4)]  # probes 1-4
    vecs += [a1, a2, b] + filler              # vec ids 5, 6, 7, 8..15
    sf = _write_embeddings(tmp_path, vecs)
    rows = sim_mmr_rerank(spark, sf).where("probe_id = 0").collect()
    by_step = {r["step"]: r["vec_id"] for r in rows}
    assert by_step[1] == 5                    # cluster A's best
    assert by_step[2] == 7                    # cluster B, not the near-copy


# -- end-to-end curation funnel -------------------------------------------


def test_pretraining_funnel_is_monotone(spark):
    """Every stage filters a subset of the previous stage's survivors,
    so doc and char counts must be non-increasing down the funnel, with
    a non-degenerate final corpus (run on the real sf0.001 corpus)."""
    from clueso_spark.plans.text_queries import pipeline_pretraining_funnel

    rows = pipeline_pretraining_funnel(spark, SF_DIR).collect()
    by = {r["stage"]: (r["n_docs"], r["n_chars"]) for r in rows}
    assert sorted(by) == list(range(8))
    for i in range(7):
        assert by[i][0] >= by[i + 1][0], (i, by)
        assert by[i][1] >= by[i + 1][1], (i, by)
    assert by[7][0] > 0


# -- gap-fill grid bound ---------------------------------------------------


def test_gap_fill_grid_is_bounded_by_horizon(spark, tmp_path):
    """The r8/r9 verdict item, pinned: a user whose activity SPAN is
    multi-year must produce at most GAP_FILL_HORIZON_HOURS grid rows --
    grid growth is O(users x horizon), never O(users x lifetime). A
    short-span user keeps the exact dense span, forward-filled."""
    import datetime

    from clueso_spark.plans.event_queries import (
        GAP_FILL_HORIZON_HOURS,
        ev_gap_fill_forward,
    )

    def ev(eid, uid, days, val):
        return {
            "event_id": eid,
            "ts": datetime.datetime(2020, 1, 1)
            + datetime.timedelta(days=days),
            "user_id": uid,
            "event_type": "click",
            "value": val,
            "props": "{}",
        }

    rows = [
        ev(1, 1, 0, 1.0),        # user 1: 3-year span -> truncated grid
        ev(2, 1, 3 * 365, 2.0),
        ev(3, 2, 0, 5.0),        # user 2: 2-hour span -> exact dense grid
        ev(4, 2, 2 / 24, 7.0),
    ]
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
    out = ev_gap_fill_forward(spark, str(tmp_path)).collect()
    u1 = sorted(
        (r for r in out if r["user_id"] == 1), key=lambda r: r["hour"]
    )
    u2 = sorted(
        (r for r in out if r["user_id"] == 2), key=lambda r: r["hour"]
    )
    assert len(u1) == GAP_FILL_HORIZON_HOURS  # capped, not 3 years of rows
    # only the LAST event sits inside the trailing window: every earlier
    # cell is an unfilled gap (the out-of-window first event is NOT
    # forward-filled in), and the final cell carries its value
    assert all(r["filled_value"] is None and r["is_gap"] == 1 for r in u1[:-1])
    assert u1[-1]["filled_value"] == 2.0 and u1[-1]["is_gap"] == 0
    assert [r["filled_value"] for r in u2] == [5.0, 5.0, 7.0]
    assert [r["is_gap"] for r in u2] == [0, 1, 0]
