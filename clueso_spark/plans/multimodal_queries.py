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
from clueso_spark.plans.catalog import persist_swap, register
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


# ---------------------------------------------------------------------------
# Two-stage exact payload dedup: the media-corpus variant of exact
# dedup, where hashing every payload is the cost to avoid.
# ---------------------------------------------------------------------------

MM_DEDUP_ORACLE = """
with p as (select doc_id, cast(strlen(text) as bigint) as n_bytes, text
           from documents),
len_groups as (
  select n_bytes, count(*) as n_rows from p group by n_bytes
),
collided as (select n_bytes from len_groups where n_rows > 1),
hashed as (
  select p.doc_id, p.n_bytes, md5(p.text) as content_md5
  from p join collided using (n_bytes)
),
dup_groups as (
  select n_bytes, content_md5, count(*) as n_copies
  from hashed group by 1, 2 having count(*) > 1
)
select cast((select count(*) from p) as bigint) as n_payloads,
       cast((select count(*) from collided) as bigint)
         as n_len_collision_groups,
       cast((select count(*) from hashed) as bigint) as n_rows_hashed,
       cast((select count(*) from dup_groups) as bigint) as n_dup_groups,
       cast(coalesce((select sum(n_copies) from dup_groups), 0) as bigint)
         as n_dup_rows
"""


@register(
    "mm_payload_dedup",
    "Two-stage exact dedup over opaque binary payloads: stage 1 groups "
    "by byte LENGTH (metadata only -- the payload is never read); stage "
    "2 hashes ONLY rows whose length collides (a broadcast semi-join on "
    "the collided lengths) and groups by (length, md5). On a 100 TB "
    "media corpus almost all payloads are unique-sized, so the "
    "expensive full-content hash touches a small fraction of the bytes "
    "-- this query reports the funnel (payloads -> collided length "
    "groups -> rows hashed -> duplicate groups/rows) so the saving is "
    "measured, not assumed.",
    MM_DEDUP_ORACLE,
    "multimodal", "dedup",
)
def mm_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Scan discipline (r9): exactly TWO corpus reads. Scan 1 builds the
    # length histogram and NEVER materializes the payload bytes (length
    # is all stage 1 needs); n_payloads and the collision-group count
    # both come off that tiny pinned histogram instead of re-counting
    # the corpus. Scan 2 reads payloads only for collided lengths; every
    # stage-2 metric (rows hashed, dup groups, dup rows) derives from
    # ONE pinned per-(length, md5) group aggregate. The previous shape
    # re-scanned the corpus per metric (5 FileScans measured); nothing
    # corpus-sized is ever persisted -- both pins are histogram-sized.
    p = attach_payload(load_table(spark, sf_dir, "documents")).select(
        "doc_id", "payload", F.length("payload").cast("bigint").alias("n_bytes")
    )
    len_groups = persist_swap(
        spark,
        "mm_dedup_lens",
        p.groupBy("n_bytes").agg(F.count("*").alias("n_rows")),
    )
    collided = len_groups.where(F.col("n_rows") > 1).select("n_bytes")
    hashed = p.join(F.broadcast(collided), "n_bytes").select(
        "doc_id", "n_bytes", F.md5("payload").alias("content_md5")
    )
    grp = persist_swap(
        spark,
        "mm_dedup_grps",
        hashed.groupBy("n_bytes", "content_md5").agg(
            F.count("*").alias("n_copies")
        ),
    )
    dup_groups = grp.where(F.col("n_copies") > 1)
    totals = len_groups.agg(
        F.coalesce(F.sum("n_rows"), F.lit(0)).cast("bigint")
        .alias("n_payloads")
    )
    coll_n = collided.agg(
        F.count("*").cast("bigint").alias("n_len_collision_groups")
    )
    hash_n = grp.agg(
        F.coalesce(F.sum("n_copies"), F.lit(0)).cast("bigint")
        .alias("n_rows_hashed")
    )
    dup_n = dup_groups.agg(
        F.count("*").cast("bigint").alias("n_dup_groups"),
        F.coalesce(F.sum("n_copies"), F.lit(0))
        .cast("bigint")
        .alias("n_dup_rows"),
    )
    return (
        totals.crossJoin(F.broadcast(coll_n))
        .crossJoin(F.broadcast(hash_n))
        .crossJoin(F.broadcast(dup_n))
    )


MM_RESIZE_ORACLE = """
select doc_id,
       cast(64 as bigint) as out_h,
       cast(64 as bigint) as out_w,
       cast(strlen(text) as bigint) as n_bytes_in,
       cast(4096 as bigint) as n_bytes_out,
       md5(rpad(substr(text, 1, 4096), 4096, ' ')) as resized_md5
from documents
"""


@register(
    "mm_resize_fixed",
    "Resize plumbing: every payload normalized to a fixed 64x64 byte "
    "grid in Arrow-batched mapInPandas -- truncate/pad stands in for "
    "codec-decode + interpolate (no media libs in the runtime; a "
    "deployment swaps decode_media in without touching the engine "
    "side). The stage is map-only (embarrassingly parallel at any "
    "scale) and the grid md5 makes the byte transform SQL-replicable, "
    "so the Python boundary itself is hash-verified. Corpus text is "
    "ASCII, so byte-level truncation equals SQL substr; a multibyte "
    "corpus would pin the contract at the byte layer only.",
    MM_RESIZE_ORACLE,
    "multimodal", "mapinpandas", "resize",
)
def mm_resize_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from clueso_spark.functions.multimodal import resize_payloads

    return resize_payloads(
        attach_payload(load_table(spark, sf_dir, "documents"))
    )
