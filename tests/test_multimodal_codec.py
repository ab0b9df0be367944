"""decode_media codec seam (VERDICT r10 item 6).

The container ships no media libraries, so the image path is a
try-import: with Pillow present decode_media returns real typed
metadata through the SAME Arrow contract; without it the seam stays an
explicit NotImplementedError (never a silent fake). Both sides are
pinned -- the Pillow-backed tests run wherever the library exists and
skip here, so the stub stops being load-bearing the day the
environment gains a codec.
"""

from __future__ import annotations

import importlib.util

import pytest

from clueso_spark.functions.multimodal import decode_media

HAS_PIL = importlib.util.find_spec("PIL") is not None


def test_audio_video_always_raise():
    for modality in ("audio", "video"):
        with pytest.raises(NotImplementedError):
            decode_media(b"\x00" * 64, modality)


@pytest.mark.skipif(HAS_PIL, reason="Pillow installed: image path is live")
def test_image_raises_without_codec():
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG\r\n\x1a\n", "image")


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not in this container")
def test_image_decode_with_pillow():
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (7, 5), (200, 10, 10)).save(buf, format="PNG")
    feats = decode_media(buf.getvalue(), "image")
    assert feats == {"width": 7, "height": 5, "mode": "RGB", "n_pixels": 35}


@pytest.mark.skipif(not HAS_PIL, reason="Pillow not in this container")
def test_image_decode_through_arrow_batches(spark):
    """The decode must run inside the existing mapInPandas shape: one
    Arrow batch in, typed feature rows out, no schema drift."""
    import io

    import pandas as pd
    from PIL import Image
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    def png(w, h):
        b = io.BytesIO()
        Image.new("L", (w, h)).save(b, format="PNG")
        return b.getvalue()

    rows = [(1, png(3, 4), "image"), (2, png(8, 2), "image")]
    df = spark.createDataFrame(
        rows, "doc_id bigint, payload binary, modality string"
    )
    schema = StructType(
        [
            StructField("doc_id", LongType(), False),
            StructField("width", LongType(), False),
            StructField("height", LongType(), False),
            StructField("n_pixels", LongType(), False),
        ]
    )

    def worker(batches):
        for pdf in batches:
            feats = [
                decode_media(bytes(p), m)
                for p, m in zip(pdf["payload"], pdf["modality"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "n_pixels": [f["n_pixels"] for f in feats],
                }
            )

    got = {
        r["doc_id"]: (r["width"], r["height"], r["n_pixels"])
        for r in df.mapInPandas(worker, schema).collect()
    }
    assert got == {1: (3, 4, 12), 2: (8, 2, 16)}
