"""Compactor CLI (ref: tools/MetadataTableCompactorTool.scala:12-45).

Usage: python -m clueso_spark.tools.compact_cli <store_root> [bucket]
       [--force] [--target-file-mb N] [--purge-tolerance-s S]

One bucket or all; output file count is sized by bytes
(``target_file_bytes``) rather than the reference's fixed numPartitions
argument -- the scale-correct policy (SURVEY §7 risk 7).
"""

from __future__ import annotations

import argparse


def main() -> int:
    ap = argparse.ArgumentParser(description="Compact landing into staging")
    ap.add_argument("store_root")
    ap.add_argument("bucket", nargs="?", default=None)
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--target-file-mb", type=int, default=128)
    ap.add_argument("--purge-tolerance-s", type=float, default=0.0)
    ap.add_argument("--parallelism", type=int, default=1)
    args = ap.parse_args()

    from clueso_spark.operators.compact import Compactor
    from clueso_spark.session import get_spark
    from clueso_spark.sources.store import MetadataStore

    spark = get_spark("clueso-compactor")
    store = MetadataStore(spark, args.store_root)
    compactor = Compactor(
        store,
        purge_tolerance_s=args.purge_tolerance_s,
        target_file_bytes=args.target_file_mb * 1024 * 1024,
    )
    if args.bucket:
        results = {args.bucket: compactor.compact_bucket(args.bucket, args.force)}
    else:
        results = compactor.compact(args.force, parallelism=args.parallelism)
    # report BEFORE draining the purge timers: flush_purges() waits out
    # each pending purge's remaining tolerance (possibly hours -- the
    # reference sleeps the full landingPurgeTolerance), and the operator
    # should not stare at a silent terminal for that long when the
    # compaction outcome is already known
    for bucket, did in results.items():
        print(f"{bucket}: {'compacted' if did else 'skipped'}")
    compactor.flush_purges()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
