"""Distributed graph primitives: connected components via min-label
propagation (the GraphX/GraphFrames pattern without the dependency).

Scale design: each round is one keyed join + one aggregate; lineage is
cut per round with ``localCheckpoint`` -- without it round N replays all
N-1 predecessors and the plan grows unboundedly (the classic iterative-
Spark failure). Rounds needed = O(log diameter) for near-clique
components (LSH dup groups), O(diameter) worst case.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, src: str, dst: str, max_rounds: int = 50
) -> DataFrame:
    """Return ``(vertex, component)`` for every vertex appearing in
    ``pairs``; ``component`` is the minimum vertex id reachable from the
    vertex. Iterates to fixpoint (bounded by ``max_rounds`` as a runaway
    guard -- hitting it raises rather than returning wrong labels)."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(pairs.select(F.col(dst), F.col(src)))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("u").alias("vertex"))
        .distinct()
        .withColumn("label", F.col("vertex"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        nbr = (
            labels.join(edges, labels.vertex == edges.u)
            .groupBy("v")
            .agg(F.min("label").alias("nmin"))
        )
        merged = labels.join(nbr, labels.vertex == nbr.v, "left").select(
            "vertex",
            F.col("label"),
            F.least("label", F.coalesce("nmin", F.col("label"))).alias(
                "new_label"
            ),
        )
        changed = merged.where(F.col("new_label") < F.col("label")).count()
        labels = merged.select(
            "vertex", F.col("new_label").alias("label")
        ).localCheckpoint()
        if changed == 0:
            edges.unpersist()
            return labels.select("vertex", F.col("label").alias("component"))
    edges.unpersist()
    raise RuntimeError(f"connected_components did not converge in {max_rounds} rounds")
