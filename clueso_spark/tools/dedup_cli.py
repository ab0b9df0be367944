"""Corpus dedup report CLI: run the training-data dedup tier over a
documents parquet directory and print one JSON report.

The batch counterpart of the search CLI for the pipeline tier: exact-dup
profile, MinHash-LSH near-dup pairs, and the duplicate GROUPS those
pairs form (connected components) -- the numbers a curation run needs
before deciding what to drop.

Usage:
  python -m clueso_spark.tools.dedup_cli <sf_dir> [--threshold 0.5] [--max-pairs N]
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser(description="Corpus dedup report")
    ap.add_argument("sf_dir", help="directory containing documents.parquet")
    ap.add_argument("--max-pairs", type=int, default=20,
                    help="near-dup pairs to include in the report")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from clueso_spark.functions.graph import connected_components
    from clueso_spark.plans.catalog import all_queries
    from clueso_spark.session import get_spark

    spark = get_spark("clueso-dedup")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    exact = qs["dedup_exact_summary"].spark(spark, args.sf_dir).collect()[0]
    pairs = qs["dedup_minhash_lsh"].spark(spark, args.sf_dir)
    pair_rows = (
        pairs.orderBy(F.col("jaccard").desc(), "doc_a", "doc_b")
        .limit(args.max_pairs)
        .collect()
    )
    comp = (
        connected_components(pairs.select("doc_a", "doc_b"), "doc_a", "doc_b")
        .groupBy("component")
        .count()
    )
    sizes = sorted((r["count"] for r in comp.collect()), reverse=True)

    print(
        json.dumps(
            {
                "n_docs": exact["n_docs"],
                "n_exact_dup_rows": exact["n_dup_rows"],
                "n_near_dup_pairs": pairs.count(),
                "n_dup_groups": len(sizes),
                "largest_groups": sizes[:10],
                "top_pairs": [
                    {
                        "doc_a": r["doc_a"],
                        "doc_b": r["doc_b"],
                        "jaccard": round(r["jaccard"], 4),
                    }
                    for r in pair_rows
                ],
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
