"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design (what a 100 TB multimodal pipeline needs from the engine):
  * the payload is an opaque ``binary`` column; metadata travels in typed
    sibling columns (modality, n_bytes, ...) so filters/pruning never touch
    the bytes;
  * decode / feature-extract runs as an Arrow-batched ``mapInPandas`` --
    whole partitions stream through Python in columnar batches, the only
    sanctioned Python boundary in the engine;
  * real codecs are OPTIONAL: :func:`decode_media` try-imports Pillow
    for images and returns typed metadata when it is installed;
    audio/video (and image, in codec-less containers like this one)
    raise NotImplementedError -- an explicit seam, never a silent fake.
    The batch shape, schema contract, and partition flow around it are
    real and tested with the deterministic byte-level featurizer either
    way (tests/test_multimodal_codec.py pins both sides).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: output contract of the featurizer stage
FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("content_md5", StringType(), False),
    ]
)


def attach_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Turn a text column into the opaque-binary + typed-metadata shape
    every multimodal row uses (here the 'media' is the utf-8 bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "utf-8")).withColumn(
        "modality", F.lit("text")
    )


def _image_codec():
    """Pillow if importable, else None. Resolved lazily (inside the
    Arrow worker, not at module import) so executors without the
    library still run every byte-level path."""
    try:
        from PIL import Image  # optional dependency, never required

        return Image
    except ImportError:
        return None


def decode_media(payload: bytes, modality: str) -> dict:
    """Real media decode. Image decoding uses Pillow WHEN INSTALLED
    (try-import; this container ships no codec libraries, so the seam
    stays a documented stub here) and returns typed metadata features
    ``{width, height, mode, n_pixels}``. Audio/video still raise --
    a deployment plugs torchaudio/av in the same way. The engine-side
    contract (binary in, feature columns out, Arrow batches) does not
    change when a codec is present: ``featurize_batches`` stays the
    partition-parallel shape either way.
    tests/test_multimodal_codec.py exercises the real decode when
    Pillow exists and pins the NotImplementedError contract otherwise.
    """
    if modality == "image":
        Image = _image_codec()
        if Image is not None:
            import io

            img = Image.open(io.BytesIO(payload))
            img.load()
            return {
                "width": int(img.width),
                "height": int(img.height),
                "mode": str(img.mode),
                "n_pixels": int(img.width) * int(img.height),
            }
    raise NotImplementedError(
        f"no codec for modality={modality!r} in this runtime; "
        "install a decoder (e.g. Pillow for images) to enable decode_media"
    )


def featurize_batches(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
    """mapInPandas worker: per Arrow batch, compute deterministic
    byte-level features (length + md5). This is the real partition-parallel
    shape a decode stage runs in -- swap the body for decode_media calls."""
    import pandas as pd

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "modality": pdf["modality"],
                "n_bytes": pdf["payload"].map(len).astype("int64"),
                "content_md5": pdf["payload"].map(
                    lambda b: hashlib.md5(bytes(b)).hexdigest()
                ),
            }
        )


def featurize(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over (doc_id, payload, modality)."""
    return df.select("doc_id", "payload", "modality").mapInPandas(
        featurize_batches, FEATURE_SCHEMA
    )


#: fixed-shape feature contract: D evenly-spaced byte samples + their mean
N_SAMPLE_DIMS = 8

SAMPLE_SCHEMA = StructType(
    [StructField("doc_id", LongType(), False)]
    + [StructField(f"b{d}", LongType(), False) for d in range(N_SAMPLE_DIMS)]
    # mean of 8 ints / 8.0 divides by a power of two -> exact double,
    # bit-identical cross-engine
    + [StructField("mean_byte", DoubleType(), False)]
)


def sample_bytes_batches(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
    """mapInPandas worker: sample N_SAMPLE_DIMS evenly-spaced bytes from
    each payload into a FIXED-shape feature row -- the tensor-extraction
    shape (resize / mel-bin / frame-grid) every media featurizer emits.
    Payloads shorter than the grid are dropped (a real decoder would pad)."""
    import pandas as pd

    D = N_SAMPLE_DIMS
    for pdf in batches:
        keep = pdf["payload"].map(len) >= D
        pdf = pdf[keep]
        if pdf.empty:
            continue
        payloads = pdf["payload"].map(bytes)
        cols = {"doc_id": pdf["doc_id"].astype("int64")}
        samples = []
        for d in range(D):
            vals = payloads.map(lambda b, d=d: b[(d * len(b)) // D])
            cols[f"b{d}"] = vals.astype("int64")
            samples.append(vals.astype("int64"))
        cols["mean_byte"] = (sum(samples) / float(D)).astype("float64")
        yield pd.DataFrame(cols)


def sample_bytes(df: DataFrame) -> DataFrame:
    """Fixed-shape byte sampling over (doc_id, payload) in Arrow batches."""
    return df.select("doc_id", "payload").mapInPandas(
        sample_bytes_batches, SAMPLE_SCHEMA
    )


#: resize contract: a fixed HxW byte grid (the stand-in for image
#: resize; a real deployment decodes with Pillow/av in decode_media and
#: interpolates -- the engine-side schema, Arrow batch flow, and
#: determinism contract are identical)
RESIZE_H = 64
RESIZE_W = 64
RESIZE_BYTES = RESIZE_H * RESIZE_W
RESIZE_PAD = b" "  # ASCII pad keeps the byte-grid md5 SQL-replicable

RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("out_h", LongType(), False),
        StructField("out_w", LongType(), False),
        StructField("n_bytes_in", LongType(), False),
        StructField("n_bytes_out", LongType(), False),
        StructField("resized_md5", StringType(), False),
    ]
)


def resize_batches(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:  # noqa: F821
    """mapInPandas worker: normalize every payload to the fixed
    RESIZE_H x RESIZE_W byte grid (truncate / pad -- the deterministic
    stand-in for codec-decode + interpolate) and emit the grid's md5 so
    the whole stage is byte-exactly verifiable from SQL."""
    import pandas as pd

    n = RESIZE_BYTES
    for pdf in batches:
        payloads = pdf["payload"].map(bytes)
        resized = payloads.map(lambda b: b[:n].ljust(n, RESIZE_PAD))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].astype("int64"),
                "out_h": RESIZE_H,
                "out_w": RESIZE_W,
                "n_bytes_in": payloads.map(len).astype("int64"),
                "n_bytes_out": resized.map(len).astype("int64"),
                "resized_md5": resized.map(
                    lambda b: hashlib.md5(b).hexdigest()
                ),
            }
        )


def resize_payloads(df: DataFrame) -> DataFrame:
    """Fixed-shape payload normalization over (doc_id, payload) in
    Arrow batches."""
    return df.select("doc_id", "payload").mapInPandas(
        resize_batches, RESIZE_SCHEMA
    )
