"""Parity gate for the round-6 STAGED operators (plans/staged_r6.py).

Runs the exact driver comparison -- row count + schema + order-
insensitive value hash against the DuckDB oracle -- at sf0.001 and
sf0.01, so each staged query is proven green BEFORE round 6 promotes it
into the registry and the driver's verification window.
"""

from __future__ import annotations

import pytest

from clueso_spark.plans.parity import compare, duckdb_connect
from clueso_spark.plans.staged_r6 import STAGED, promote

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_parity(spark, name, sf_dir):
    cq = STAGED[name]
    df = cq.spark(spark, sf_dir)
    if cq.oracle_valid is not None and not cq.oracle_valid(sf_dir):
        assert df.count() >= 0
        return
    con = duckdb_connect(sf_dir)
    res = compare(name, df, cq.oracle, con)
    assert res.ok, (name, res.detail)


def test_staged_rows_nonempty(spark):
    """Every staged query returns at least one row at sf0.01 (the
    driver's smoke bar for registered queries)."""
    for name, cq in sorted(STAGED.items()):
        assert cq.spark(spark, SF_DIRS[1]).count() > 0, name


#: staged ops whose input is not the documents table (embeddings /
#: events / lineitem) -- excluded from the documents-only corpus tests
_NON_DOC = {
    "sim_knn_join",
    "sim_range_search",
    "st_windowed_topk",
    "ev_rfm_segmentation",
    "graph_node_similarity",
}
_DOC_NAMES = [n for n in STAGED if n not in _NON_DOC]


def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string,"
        " n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/documents.parquet")


def test_staged_empty_corpus_does_not_crash(spark, tmp_path):
    """Empty inputs: scalar aggs produce their null/zero row, per-doc
    projections produce zero rows -- never an exception (div-by-zero in
    retention/slope must null out, not raise)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path / "sf_empty")
    _write_docs(spark, sf, [])
    spark.createDataFrame(
        [], "vec_id bigint, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/embeddings.parquet")
    # events/lineitem consumers sniff the parquet footer driver-side
    # (events_stream, load_table), so these must be single FILES with
    # real schemas, not Spark output directories
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([], pa.int64()),
                "ts": pa.array([], pa.timestamp("us")),
                "user_id": pa.array([], pa.int64()),
                "event_type": pa.array([], pa.string()),
                "value": pa.array([], pa.float64()),
                "props": pa.array([], pa.string()),
            }
        ),
        f"{sf}/events.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([], pa.int64()),
                "l_partkey": pa.array([], pa.int64()),
            }
        ),
        f"{sf}/lineitem.parquet",
    )
    for name, cq in sorted(STAGED.items()):
        rows = cq.spark(spark, sf).collect()
        assert isinstance(rows, list), name


def test_staged_unicode_corpus_parity(spark, tmp_path):
    """Non-ASCII corpora (accents, CJK, emoji) flow through the
    md5/log2/length chains identically on both engines -- Spark and
    DuckDB both count code points and hash UTF-8 bytes."""
    import duckdb

    from clueso_spark.plans.parity import compare

    docs = []
    words = ["héllo", "wörld", "漢字", "👍", "naïve", "crème", "the", "a"]
    for i in range(24):
        w = [words[(i + j) % len(words)] for j in range(5 + i % 7)]
        text = " ".join(w)
        docs.append((i, text, "multi", f"src{i % 3}", len(text)))
    sf = str(tmp_path / "sf_uni")
    _write_docs(spark, sf, docs)
    con = duckdb.connect()
    # Spark writes a parquet DIRECTORY; DuckDB globs the part files
    con.sql(
        "create view documents as "
        f"select * from '{sf}/documents.parquet/*.parquet'"
    )
    for name in _DOC_NAMES:
        cq = STAGED[name]
        res = compare(name, cq.spark(spark, sf), cq.oracle, con)
        assert res.ok, (name, res.detail)


#: staged queries whose BroadcastNestedLoopJoin is sanctioned by design:
#: a literal threshold ladder / 1-row scalar totals broadcast against
#: the corpus -- never an all-pairs corpus square
_SANCTIONED_BNLJ = {
    "pipeline_length_filter_curve",  # 7-row literal ladder broadcast
    "pipeline_token_budget_mix",  # 1-row corpus-totals broadcast
    "pipeline_ccnet_buckets",  # 1-row LM-total scalar broadcast
    "ev_rfm_segmentation",  # 1-row corpus-max-date scalar broadcast
    "txt_bigram_perplexity",  # 1-row bigram-total scalar broadcast
}


def test_staged_plan_shapes(spark):
    """Scale-shape gate for the staged tier (the registered catalog's
    test_no_query_has_unsanctioned_cartesian_product, applied here):
    no CartesianProduct anywhere; BNLJ only where a bounded literal /
    1-row side is broadcast by design."""
    from tests.test_plans import plan_of

    offenders = {}
    for name, cq in sorted(STAGED.items()):
        spark.catalog.clearCache()
        plan = plan_of(cq.spark(spark, SF_DIRS[0]))
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif (
            "BroadcastNestedLoopJoin" in plan and name not in _SANCTIONED_BNLJ
        ):
            offenders[name] = "BroadcastNestedLoopJoin"
    assert not offenders, offenders


def test_staged_names_do_not_collide_with_registry():
    from clueso_spark.plans.catalog import all_queries

    live = set(all_queries())
    overlap = live & set(STAGED)
    assert not overlap, overlap


def test_promote_registers_everything():
    """promote() (the round-6 hook) must land every staged query in the
    live registry with its oracle intact; undone afterwards so this
    round's registry (and the rotation invariants) stay untouched."""
    from clueso_spark.plans.catalog import REGISTRY

    before = set(REGISTRY)
    try:
        promote()
        for name, cq in STAGED.items():
            assert REGISTRY[name] is cq
            assert cq.oracle is None or "select" in cq.oracle.lower()
    finally:
        for name in set(REGISTRY) - before:
            del REGISTRY[name]


def test_round6_promotion_rehearsal():
    """Dry-run the round-6 promotion: promote() must register every
    staged query without name clashes, ROUND6_WINDOW must be exactly the
    50-slot driver window with every never-verified (staged) query
    inside it, every window name must resolve in the post-promotion
    registry, AND -- the part a name check alone misses -- the
    stale-green aging invariant (test_entry.py's
    test_no_query_outside_window_has_stale_green) must CLOSE under the
    planned window + ROUND6_LEFTOVERS, simulating round 5's artifact as
    the committed PRIORITY prefix."""
    from clueso_spark.plans.catalog import (
        PRIORITY,
        REGISTRY,
        all_queries,
    )
    from clueso_spark.plans.staged_r6 import (
        ROUND6_LEFTOVERS,
        ROUND6_WINDOW,
        promote,
    )
    from tests.test_entry import _latest_green_rounds

    pre = dict(all_queries())
    try:
        promote()
        post = dict(REGISTRY)
        assert set(post) == set(pre) | set(STAGED)
        assert len(ROUND6_WINDOW) == 50
        assert len(set(ROUND6_WINDOW)) == 50
        # never-driver-verified queries must all sit inside the window
        assert set(STAGED) <= set(ROUND6_WINDOW)
        unresolvable = [n for n in ROUND6_WINDOW if n not in post]
        assert not unresolvable, unresolvable
        # aging invariant under the plan: simulate CORRECTNESS_r05 as
        # the committed 50-slot PRIORITY prefix, then require every
        # post-promotion query outside the round-6 window to be fresh
        # (green in round >= max-1 = 4) or a documented leftover
        latest, _ = _latest_green_rounds()
        for n in PRIORITY[:50]:
            latest[n] = 5
        stale = [
            n
            for n in post
            if n not in set(ROUND6_WINDOW)
            and n not in ROUND6_LEFTOVERS
            and latest.get(n, 0) < 4
        ]
        assert not stale, stale
    finally:
        # promotion mutates the module-level registry; restore so test
        # order can't leak staged names into the live-catalog tests
        REGISTRY.clear()
        REGISTRY.update(pre)
