"""Multimodal pipeline queries: opaque binary payloads, Arrow-batched
featurization, frame sampling.

The documents table stands in for a media corpus: its text becomes the
opaque ``binary`` payload; typed metadata (modality, byte length) rides in
sibling columns. Real codec decode is stubbed (no media libs in the
runtime, see functions/multimodal.py:decode_media) but the engine-side
plumbing -- schema contract, Arrow batch shape, partition parallelism --
is real and oracle-verified via deterministic byte-level features.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clueso_spark.functions.multimodal import attach_payload, featurize
from clueso_spark.plans.catalog import register
from clueso_spark.sources.tables import load_table


@register(
    "mm_binary_featurize",
    "mapInPandas featurization over binary payloads: byte length + "
    "content md5 per row, computed in Arrow batches (the sanctioned "
    "Python boundary). Oracle checks the features byte-for-byte: "
    "md5(utf-8 payload) == md5(text).",
    """
    select doc_id, 'text' as modality,
           cast(strlen(text) as bigint) as n_bytes,
           md5(text) as content_md5
    from documents
    """,
    "multimodal", "mapinpandas",
)
def mm_binary_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return featurize(attach_payload(docs))


@register(
    "mm_frame_sample",
    "Frame sampling plumbing: treat n_chars as a media duration, emit one "
    "row per sampled frame (every 100 units) with its byte offset. "
    "posexplode(sequence(...)) -- pure JVM row generation, the shape a "
    "video-frame sampler fans out into before per-frame decode.",
    """
    with f as (
      select doc_id, n_chars,
             unnest(range(0, (n_chars // 100) + 1)) as frame_idx
      from documents
    )
    select doc_id,
           cast(frame_idx as bigint) as frame_idx,
           cast(frame_idx * 100 as bigint) as byte_offset,
           cast(n_chars // 100 + 1 as bigint) as n_frames
    from f
    """,
    "multimodal", "frames",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n_frames = F.floor(F.col("n_chars") / 100) + 1
    return docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.floor(F.col("n_chars") / 100))).alias(
            "frame_idx"
        ),
        n_frames.cast("bigint").alias("n_frames"),
    ).select(
        "doc_id",
        F.col("frame_idx").cast("bigint").alias("frame_idx"),
        (F.col("frame_idx") * 100).cast("bigint").alias("byte_offset"),
        "n_frames",
    )


@register(
    "mm_modality_stats",
    "Typed-metadata aggregation over the multimodal corpus: per modality "
    "x source, row count and exact byte volume -- the bookkeeping query "
    "every 100 TB ingest runs; never touches payload bytes.",
    """
    select 'text' as modality, source,
           cast(count(*) as bigint) as n_items,
           cast(sum(strlen(text)) as bigint) as total_bytes
    from documents
    group by source
    """,
    "multimodal", "aggregate",
)
def mm_modality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = attach_payload(load_table(spark, sf_dir, "documents"))
    return docs.groupBy("modality", "source").agg(
        F.count("*").cast("bigint").alias("n_items"),
        F.sum(F.octet_length("payload")).cast("bigint").alias("total_bytes"),
    )


_B_COLS = ",\n           ".join(
    f"cast(ascii(substr(text, ({d} * strlen(text)) // 8 + 1, 1)) as bigint) as b{d}"
    for d in range(8)
)

SAMPLE_ORACLE = f"""
select doc_id,
           {_B_COLS},
       cast(({" + ".join(f"ascii(substr(text, ({d} * strlen(text)) // 8 + 1, 1))" for d in range(8))})
            as double) / 8 as mean_byte
from documents
where strlen(text) >= 8
"""


@register(
    "mm_fixed_shape_features",
    "Fixed-shape tensor extraction through the Arrow boundary: 8 evenly "
    "spaced byte samples + mean per payload via mapInPandas -- the "
    "resize/mel-bin/frame-grid shape every media featurizer emits. The "
    "corpus is ASCII so the oracle reproduces each sampled byte with "
    "ascii(substr(...)) at the same grid positions; the mean divides by "
    "a power of two (exact double cross-engine).",
    SAMPLE_ORACLE,
    "multimodal", "mapinpandas", "tensor",
)
def mm_fixed_shape_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clueso_spark.functions.multimodal import sample_bytes

    docs = attach_payload(load_table(spark, sf_dir, "documents"))
    return sample_bytes(docs)
