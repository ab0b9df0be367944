"""load_table_spread: the corpus-scan spread must be input-adaptive.

The documents-tier queries need the interpreted HOF projections spread
across every core when the corpus arrives as one tiny parquet file, but
the spread must NOT cost a full-corpus shuffle once the scan itself is
wide (at 100 TB the scan is always wide; an unconditional
repartition(defaultParallelism) there is an extra shuffle of raw text
-- OPTIMIZATION_r15.md, guide §2.1/§2.5).
"""

from __future__ import annotations

import pytest

from clueso_spark.sources.tables import (
    _size_suffix_bytes,
    load_table_spread,
    table_bytes,
)

SF_DIR = "/root/testdata/sf0.001"


def _has_repartition(df) -> bool:
    return "RoundRobinPartitioning" in df._jdf.queryExecution().toString()


def test_size_suffix_parsing():
    assert _size_suffix_bytes("1m") == 1 << 20
    assert _size_suffix_bytes("128MB") == 128 << 20
    assert _size_suffix_bytes("134217728") == 134217728
    assert _size_suffix_bytes("16k") == 16 << 10


def test_table_bytes_single_file():
    assert table_bytes(SF_DIR, "documents") > 0


def test_table_bytes_missing_is_zero():
    assert table_bytes("/nonexistent", "documents") == 0


@pytest.fixture()
def _restore_split_conf(spark):
    key = "spark.sql.files.maxPartitionBytes"
    prev = spark.conf.get(key, None)
    yield
    if prev is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, prev)


def test_narrow_scan_gets_spread(spark, _restore_split_conf):
    # one ~100 KB file under a 128 MB split size scans as ONE task:
    # the spread must insert the round-robin repartition
    spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
    assert _has_repartition(load_table_spread(spark, SF_DIR, "documents"))


def test_wide_scan_skips_the_shuffle(spark, _restore_split_conf):
    # force splits >= defaultParallelism (the 100 TB shape): the
    # repartition -- a full shuffle of raw corpus text -- must vanish
    nbytes = table_bytes(SF_DIR, "documents")
    par = spark.sparkContext.defaultParallelism
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(max(1, nbytes // (par + 1)))
    )
    assert not _has_repartition(load_table_spread(spark, SF_DIR, "documents"))


def test_both_paths_same_rows(spark, _restore_split_conf):
    spark.conf.set("spark.sql.files.maxPartitionBytes", "134217728")
    narrow = sorted(
        r["doc_id"]
        for r in load_table_spread(spark, SF_DIR, "documents")
        .select("doc_id")
        .collect()
    )
    nbytes = table_bytes(SF_DIR, "documents")
    par = spark.sparkContext.defaultParallelism
    spark.conf.set(
        "spark.sql.files.maxPartitionBytes", str(max(1, nbytes // (par + 1)))
    )
    wide = sorted(
        r["doc_id"]
        for r in load_table_spread(spark, SF_DIR, "documents")
        .select("doc_id")
        .collect()
    )
    assert narrow == wide and narrow
