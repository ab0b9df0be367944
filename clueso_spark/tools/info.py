"""Storage-info tool (S11, ref: tools/MetadataStorageInfoTool.scala:24-80
+ SparkUtils.scala:111-138 getParquetFilesStats).

Per bucket and tier: parquet file count, average/total file size, record
count. Prints graphite-style ``metric value`` lines to stdout (the
reference pushes the same names to graphite; a metrics sink is config,
not engine semantics).
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass


@dataclass
class TierStats:
    file_count: int
    total_bytes: int
    record_count: int

    @property
    def avg_file_size(self) -> float:
        return self.total_bytes / self.file_count if self.file_count else 0.0


def parquet_stats(store, spark, tier: str, bucket: str) -> TierStats:
    root = store.landing if tier == "landing" else store.staging
    path = f"{root}/bucket={bucket}"
    file_count = 0
    total = 0
    if store.exists(path):
        fs, hpath, _ = store._fs(path)
        it = fs.listFiles(hpath, True)
        while it.hasNext():
            status = it.next()
            name = status.getPath().getName()
            if name.endswith(".parquet"):
                file_count += 1
                total += status.getLen()
    reader = store.read_landing if tier == "landing" else store.read_staging
    records = reader(bucket).count()
    return TierStats(file_count, total, records)


def main() -> int:
    ap = argparse.ArgumentParser(description="Metadata storage info")
    ap.add_argument("store_root")
    ap.add_argument("bucket")
    args = ap.parse_args()

    from clueso_spark.session import get_spark
    from clueso_spark.sources.store import MetadataStore

    spark = get_spark("clueso-info")
    store = MetadataStore(spark, args.store_root)
    for tier in ("landing", "staging"):
        s = parquet_stats(store, spark, tier, args.bucket)
        prefix = f"search_metadata.{tier}.{args.bucket}"
        print(f"{prefix}.parquet_file_count {s.file_count}")
        print(f"{prefix}.avg_file_size {s.avg_file_size:.0f}")
        print(f"{prefix}.total_file_size {s.total_bytes}")
        print(f"{prefix}.record_count {s.record_count}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
