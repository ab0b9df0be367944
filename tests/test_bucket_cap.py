"""Degenerate-LSH-bucket guard (round-11 review item).

`_bucket_pairs` is the shared candidate-pair emitter behind every
banded dedup/similarity op. Adaptive band widths keep EXPECTED buckets
small, but one mass-duplicated boilerplate family -- a certainty in a
web-scale crawl -- used to concentrate the full O(b^2) pair expansion
in a single task. With ``cap`` set, oversized buckets emit a STAR
(every member paired with the bucket minimum): O(b) rows that still
connect the whole family for downstream verify + connected-components.

These tests plant the pathological bucket directly and pin both the
exact-small-bucket behavior (unchanged) and the star fallback.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import functions as F

from clueso_spark.plans.dedup_queries import LSH_BUCKET_CAP, _bucket_pairs

BIG = 300  # one degenerate bucket, larger than LSH_BUCKET_CAP
SMALL = 5


def _long(spark):
    rows = [("hot", i) for i in range(BIG)] + [
        ("cold", 1000 + i) for i in range(SMALL)
    ]
    return spark.createDataFrame(rows, "bk string, doc_id bigint")


def test_uncapped_is_full_expansion(spark):
    got = {
        (r["doc_a"], r["doc_b"])
        for r in _bucket_pairs(
            _long(spark), ["bk"], "doc_id", "doc_a", "doc_b"
        ).collect()
    }
    want = set(combinations(range(BIG), 2)) | set(
        combinations(range(1000, 1000 + SMALL), 2)
    )
    assert got == want


def test_capped_star_bounds_degenerate_bucket(spark):
    assert BIG > LSH_BUCKET_CAP >= SMALL
    got = [
        (r["doc_a"], r["doc_b"])
        for r in _bucket_pairs(
            _long(spark), ["bk"], "doc_id", "doc_a", "doc_b",
            cap=LSH_BUCKET_CAP,
        ).collect()
    ]
    hot = [(a, b) for a, b in got if b < 1000]
    cold = {(a, b) for a, b in got if b >= 1000}
    # the oversized bucket emits exactly b-1 star rows anchored at the
    # bucket minimum -- every member reachable from the representative,
    # so connected components / keep-best still unify the family
    assert sorted(hot) == [(0, j) for j in range(1, BIG)]
    # buckets at or under the cap keep the exact full expansion
    assert cold == set(combinations(range(1000, 1000 + SMALL), 2))


def test_cap_boundary_is_strictly_greater_than(spark):
    rows = [("k", i) for i in range(10)]
    long = spark.createDataFrame(rows, "bk string, doc_id bigint")
    full = _bucket_pairs(
        long, ["bk"], "doc_id", "doc_a", "doc_b", cap=10
    ).count()
    star = _bucket_pairs(
        long, ["bk"], "doc_id", "doc_a", "doc_b", cap=9
    ).count()
    assert full == 45  # size == cap -> exact expansion
    assert star == 9  # size > cap -> star


def test_capped_plan_stays_keyed(spark):
    """The cap is an expression-level change: still ONE keyed shuffle,
    no join, no cartesian product."""
    df = _bucket_pairs(
        _long(spark), ["bk"], "doc_id", "doc_a", "doc_b",
        cap=LSH_BUCKET_CAP,
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("Exchange") <= 2  # the one keyed agg exchange (+AQE read)
