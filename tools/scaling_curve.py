#!/usr/bin/env python3
"""Scaling-curve harness: replicate the sf0.1 tables K-fold into /tmp
(with per-copy perturbations so workloads scale instead of degenerating
-- words are copy-prefixed so near-dup clusters never merge across
copies; user/event/vec ids shift into disjoint ranges) and time the
headline pipeline-tier queries at each K. A scale-safe plan's time grows
~linearly in K; a quadratic pair space or an unkeyed join shows up as a
superlinear bend long before 100 TB would.

Usage: python tools/scaling_curve.py [--ks 1,4,10] [--queries a,b,c]
Prints one JSON line with per-query times at each K.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

DEFAULT_QUERIES = [
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "sim_lsh_ann",
    "txt_tf_df_top_terms",
    "ev_latest_state",
    "ev_sessionize",
]
BASE = "/root/testdata/sf0.1"


def build_scaled(spark, k: int, out_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = spark.read.parquet(f"{BASE}/events.parquet")

    doc_parts, emb_parts, ev_parts = [], [], []
    for i in range(k):
        # copy-prefix every word -> zero cross-copy token overlap, so each
        # copy carries its own duplicate clusters (workload ~ linear in K)
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + i * 10_000_000).alias("doc_id"),
                "lang",
                "source",
                "n_chars",
                F.concat_ws(
                    " ",
                    F.expr(
                        f"transform(split(text, ' '), w -> concat('c{i}', w))"
                    ),
                ).alias("text"),
            )
        )
        # circular-shift each copy's dims so copies are near-orthogonal:
        # a scalar dim-0 nudge leaves cross-copy cosines >= the near-dup
        # threshold, which makes the TRUE pair count (and any correct
        # engine's output) grow quadratically in K -- the embedding
        # analog of the text side's copy-prefixed words
        shift = i % 64
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + i * 10_000_000).alias("vec_id"),
                "label",
                (
                    F.expr(
                        f"concat(slice(embedding, {shift + 1}, {64 - shift}),"
                        f" slice(embedding, 1, {shift}))"
                    )
                    if shift
                    else F.col("embedding")
                ).alias("embedding"),
            )
        )
        ev_parts.append(
            ev.select(
                (F.col("event_id") + i * 1_000_000_000).alias("event_id"),
                "ts",
                (F.col("user_id") + i * 1_000_000).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )

    def union_all(parts):
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    union_all(doc_parts).write.mode("overwrite").parquet(
        f"{out_dir}/documents.parquet"
    )
    union_all(emb_parts).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    union_all(ev_parts).write.mode("overwrite").parquet(
        f"{out_dir}/events.parquet"
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1,4,10")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    args = ap.parse_args()
    ks = [int(x) for x in args.ks.split(",")]
    names = args.queries.split(",")

    sys.path.insert(0, "/root/repo")
    from clueso_spark.plans.catalog import all_queries
    from clueso_spark.session import get_spark

    spark = get_spark("scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")
    registry = all_queries()
    results: dict[str, dict[str, float]] = {n: {} for n in names}
    root = tempfile.mkdtemp(prefix="clueso_curve_")
    try:
        for k in ks:
            sf_dir = f"{root}/x{k}"
            t0 = time.perf_counter()
            build_scaled(spark, k, sf_dir)
            print(f"built x{k} in {time.perf_counter() - t0:.1f}s", flush=True)
            for n in names:
                t0 = time.perf_counter()
                registry[n].spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = round(time.perf_counter() - t0, 2)
                results[n][f"x{k}"] = dt
                print(f"  {n:28s} x{k}: {dt:7.2f}s", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"metric": "scaling_curve", "base": BASE, "results": results}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
