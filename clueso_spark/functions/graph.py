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
    pairs: DataFrame,
    src: str,
    dst: str,
    max_rounds: int = 50,
    driver_threshold: int = 2_000_000,
) -> DataFrame:
    """Return ``(vertex, component)`` for every vertex appearing in
    ``pairs``; ``component`` is the minimum vertex id reachable from the
    vertex.

    Hybrid execution: an edge list under ``driver_threshold`` is solved
    with driver-side union-find (one collect; converging a few hundred
    edges through multi-round Spark jobs is pure scheduling overhead --
    measured 7.7 s -> ~0 for the LSH pair graph at sf0.1). Larger graphs
    run the distributed min-label propagation loop to fixpoint (bounded
    by ``max_rounds`` as a runaway guard -- hitting it raises rather
    than returning wrong labels). Dedup pair graphs are sparse by
    construction (LSH emits near-clique clusters), so the driver path
    covers most real corpora; the distributed path is the 100 TB
    guarantee.
    """
    # materialize the pair list ONCE before any branching: the symmetric
    # union's two branches are separate lineage evaluations, so an
    # expensive upstream (the full MinHash pipeline) would otherwise run
    # twice (measured 2x the minhash cost at sf0.1)
    pair_list = pairs.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    n_pairs = pair_list.count()
    if n_pairs <= driver_threshold:
        # driver path: pull the directed pairs through Arrow (one
        # columnar transfer; per-Row collect() measured ~3x slower at
        # 600 k edges) and union-find in python. No symmetrization:
        # union(a, b) is already direction-free.
        spark = pairs.sparkSession
        spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
        pdf = pair_list.toPandas()
        pair_list.unpersist()
        parent: dict = {}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pdf["u"].to_numpy(), pdf["v"].to_numpy()):
            a = int(a)
            b = int(b)
            parent.setdefault(a, a)
            parent.setdefault(b, b)
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        out = [(vtx, find(vtx)) for vtx in parent]
        schema = pairs.select(
            F.col(src).alias("vertex"), F.col(src).alias("component")
        ).schema
        return spark.createDataFrame(out, schema)
    edges = (
        pair_list.union(pair_list.select(F.col("v"), F.col("u")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges.count()
    pair_list.unpersist()
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
