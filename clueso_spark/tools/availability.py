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


def measure(n: int = 5, timeout_s: float = 60.0) -> list[float]:
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
        # bounded poll with backoff: if ingestion dropped the event (parse
        # filter, bad envelope) report a failure row instead of spinning
        # the query path forever at full speed
        deadline = t0 + timeout_s
        found = False
        while time.perf_counter() < deadline:
            rows = executor.execute(
                MetadataQuery("avail", f"key = '{key}'", None, 1)
            ).collect()
            if rows:
                found = True
                break
            time.sleep(0.2)
        latencies.append(
            (time.perf_counter() - t0) * 1e3 if found else float("nan")
        )
    return latencies


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5)
    args = ap.parse_args()
    lat = measure(args.n)
    ok = [ms for ms in lat if ms == ms]  # NaN-filtered successes
    for i, ms in enumerate(lat):
        label = f"{ms:.0f}" if ms == ms else "TIMEOUT"
        print(f"data_availability.avail.milli[{i}] {label}")
    if ok:
        print(f"data_availability.avail.milli.avg {sum(ok) / len(ok):.0f}")
    return 0 if len(ok) == len(lat) else 1


if __name__ == "__main__":
    raise SystemExit(main())
