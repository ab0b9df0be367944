"""Data-availability harness: PUT -> searchable latency.

Local counterpart of ``bin/perf_test.py:116-133`` (write an object, poll
the search API until the key appears, report
``data_availability.<bucket>.milli``). Here the whole loop runs in-process:
write a wire event into the inbox, drain the file-source stream, poll the
query path.

Usage: python -m clueso_spark.tools.availability [--n 5]
"""

from __future__ import annotations

import argparse
import json
import tempfile
import time


def measure(n: int = 5) -> list[float]:
    from clueso_spark.operators.query import (
        MetadataQuery,
        MetadataQueryExecutor,
    )
    from clueso_spark.session import get_spark
    from clueso_spark.sources.store import MetadataStore
    from clueso_spark.streaming.pipeline import run_file_ingestion

    spark = get_spark("clueso-availability")
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="clueso-avail-")
    inbox = f"{tmp}/inbox"
    store = MetadataStore(spark, f"{tmp}/store")
    import os

    os.makedirs(inbox)
    executor = MetadataQueryExecutor(spark, store)
    latencies = []
    for i in range(n):
        key = f"avail-{i:04d}"
        event = json.dumps(
            {
                "opIndex": f"{i + 1:012d}_0",
                "type": "put",
                "bucket": "avail",
                "key": key,
                "value": json.dumps({"bucket": "avail", "key": key}),
            }
        )
        t0 = time.perf_counter()
        with open(f"{inbox}/evt-{i}.jsonl", "w") as f:
            f.write(event + "\n")
        run_file_ingestion(spark, inbox, store, f"{tmp}/ckpt")
        while True:
            rows = executor.execute(
                MetadataQuery("avail", f"key = '{key}'", None, 1)
            ).collect()
            if rows:
                break
        latencies.append((time.perf_counter() - t0) * 1e3)
    return latencies


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()
    lat = measure(args.n)
    for i, ms in enumerate(lat):
        print(f"data_availability.avail.milli[{i}] {ms:.0f}")
    print(f"data_availability.avail.milli.avg {sum(lat) / len(lat):.0f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
