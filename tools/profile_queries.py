#!/usr/bin/env python3
"""Per-query profiler (optimization-round diagnostic, not a driver path).

For each named catalog query, measures separately:
  * t_build  -- time for ``registry[name].spark(spark, sf_dir)`` (plan
    construction; iterative queries run driver-side derivation here),
  * t_exec   -- time to materialize through the noop sink,
and, with the Spark UI enabled, scrapes the REST API for the stages the
query ran: per-stage duration, task count, shuffle read/write bytes and
input bytes, so "where does the time go" is answered from Spark's own
metrics rather than guesswork (guide §1.1/§7.1).

Usage: python tools/profile_queries.py q1 q2 ...  [--repeat N]
Writes a JSON report to /tmp/profile_<name>.json per query and prints a
compact summary.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request


def _api(base: str, path: str):
    with urllib.request.urlopen(base + path, timeout=10) as r:
        return json.load(r)


def main() -> int:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    repeat = 2
    for a in sys.argv[1:]:
        if a.startswith("--repeat="):
            repeat = int(a.split("=", 1)[1])
    os.environ["SPARK_UI"] = "true"
    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from clueso_spark.plans.catalog import all_queries, release_persisted
    from clueso_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    registry = all_queries()
    spark = get_spark(
        "clueso-profile", **{"spark.sql.files.maxPartitionBytes": "1m"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    base = f"{ui}/api/v1/applications/{app_id}"

    # warm-up (same pinned query as bench.py)
    wq = registry["q1_pricing_summary"].spark(spark, sf_dir)
    wq.write.format("noop").mode("overwrite").save()

    for name in names:
        if name not in registry:
            print(f"unknown query: {name}", file=sys.stderr)
            continue
        best = None
        for attempt in range(repeat):
            release_persisted(spark)
            jobs_before = {j["jobId"] for j in _api(base, "/jobs")}
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = registry[name].spark(spark, sf_dir)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            spark.sparkContext.setJobDescription(None)
            rec = {
                "name": name,
                "t_build": round(t1 - t0, 3),
                "t_exec": round(t2 - t1, 3),
                "t_total": round(t2 - t0, 3),
                "jobs_before": jobs_before,
            }
            if best is None or rec["t_total"] < best["t_total"]:
                best = rec
        # stage metrics for the LAST (warmest) attempt's new jobs
        jobs = [
            j for j in _api(base, "/jobs")
            if j["jobId"] not in best["jobs_before"]
        ]
        stage_ids = sorted({s for j in jobs for s in j.get("stageIds", [])})
        stages = []
        for sid in stage_ids:
            try:
                for att in _api(base, f"/stages/{sid}"):
                    stages.append(
                        {
                            "stage": sid,
                            "status": att.get("status"),
                            "name": (att.get("name") or "")[:90],
                            "tasks": att.get("numCompleteTasks"),
                            "ms": (
                                att.get("executorRunTime")
                            ),
                            "cpu_ms": round(
                                (att.get("executorCpuTime") or 0) / 1e6
                            ),
                            "input_mb": round(
                                (att.get("inputBytes") or 0) / 1e6, 1
                            ),
                            "sh_read_mb": round(
                                (att.get("shuffleReadBytes") or 0) / 1e6, 2
                            ),
                            "sh_write_mb": round(
                                (att.get("shuffleWriteBytes") or 0) / 1e6, 2
                            ),
                            "spill_mb": round(
                                (att.get("memoryBytesSpilled") or 0) / 1e6, 1
                            ),
                        }
                    )
            except Exception:
                pass
        best.pop("jobs_before")
        best["n_jobs"] = len(jobs)
        best["n_stages"] = len(stages)
        best["sum_executor_run_s"] = round(
            sum((s["ms"] or 0) for s in stages) / 1000, 2
        )
        best["sum_executor_cpu_s"] = round(
            sum((s["cpu_ms"] or 0) for s in stages) / 1000, 2
        )
        best["sum_shuffle_write_mb"] = round(
            sum(s["sh_write_mb"] for s in stages), 2
        )
        best["stages_by_time"] = sorted(
            stages, key=lambda s: -(s["ms"] or 0)
        )[:15]
        out = f"/tmp/profile_{name}.json"
        with open(out, "w") as fh:
            json.dump(best, fh, indent=1)
        print(
            f"{name}: total {best['t_total']}s "
            f"(build {best['t_build']} + exec {best['t_exec']}), "
            f"{best['n_jobs']} jobs / {best['n_stages']} stages, "
            f"executor-run {best['sum_executor_run_s']}s "
            f"cpu {best['sum_executor_cpu_s']}s "
            f"shuffle-write {best['sum_shuffle_write_mb']}MB -> {out}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
