"""Search CLI: the reference's client surface without the HTTP hop.

``bin/search.py`` URL-encodes a SQL WHERE expression into
``GET /<bucket>?search=...`` and prints the rows (ref: bin/search.py:42-58);
here the same query goes straight to MetadataQueryExecutor and prints the
JSON array the Livy/stdout contract produced (ref: SparkUtils.scala:79-97).

Usage:
  python -m clueso_spark.tools.search_cli <store_root> <bucket> \
      ["userMd.\\`x-amz-meta-color\\`='blue'"] [--start-key K] [--limit N]
"""

from __future__ import annotations

import argparse


def main() -> int:
    ap = argparse.ArgumentParser(description="Metadata search")
    ap.add_argument("store_root")
    ap.add_argument("bucket")
    ap.add_argument("where", nargs="?", default="")
    ap.add_argument("--start-key", default=None)
    ap.add_argument("--limit", type=int, default=1000)
    ap.add_argument("--explain", action="store_true")
    args = ap.parse_args()

    from clueso_spark.metrics import SearchMetrics
    from clueso_spark.operators.query import (
        MetadataQuery,
        MetadataQueryExecutor,
    )
    from clueso_spark.session import get_spark
    from clueso_spark.sources.store import MetadataStore

    spark = get_spark("clueso-search")
    store = MetadataStore(spark, args.store_root)
    metrics = SearchMetrics()
    executor = MetadataQueryExecutor(
        spark, store, print_explain=args.explain, metrics=metrics
    )
    query = MetadataQuery(args.bucket, args.where, args.start_key, args.limit)
    print(executor.execute_json(query))
    for line in metrics.graphite_lines():
        if "search_time" in line:
            print(f"# {line}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
