"""Search metrics: per-bucket query counters and timings.

Python-side counterpart of SearchMetricsSource
(ref: org/apache/spark/clueso/metrics/SearchMetricsSource.scala:1-167),
which registers Codahale gauges for per-bucket cache RDD sizes and search
timings. We keep the same metric names but expose them as a plain
dict + optional graphite line emission (the reference's transport,
ref: MetadataStorageInfoTool.scala:24-38) -- a metrics *sink* is
deployment plumbing, not engine semantics.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from contextlib import contextmanager


class SearchMetrics:
    """Thread-safe counters: searches per bucket, latency, cache hits."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self.counters: dict[str, int] = defaultdict(int)
        self.timings_ms: dict[str, list[float]] = defaultdict(list)

    def incr(self, name: str, by: int = 1) -> None:
        with self._lock:
            self.counters[name] += by

    @contextmanager
    def time(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            with self._lock:
                self.timings_ms[name].append((time.perf_counter() - t0) * 1e3)

    def search_timed(self, bucket: str):
        """ref metric name: search_time.<bucket>.milli (bin/search.py:75-81)"""
        self.incr(f"search_count.{bucket}")
        return self.time(f"search_time.{bucket}.milli")

    def snapshot(self) -> dict[str, float]:
        with self._lock:
            out: dict[str, float] = dict(self.counters)
            for name, vals in self.timings_ms.items():
                if vals:
                    out[f"{name}.avg"] = sum(vals) / len(vals)
                    out[f"{name}.last"] = vals[-1]
            return out

    def graphite_lines(self, prefix: str = "search_metadata") -> list[str]:
        now = int(time.time())
        return [
            f"{prefix}.{name} {value} {now}"
            for name, value in sorted(self.snapshot().items())
        ]
