"""Multimodal column plumbing (brief §datapipe): image/audio/video as
opaque ``binary`` columns with typed metadata, processed by Arrow-batched
``mapInPandas``. The actual codecs (PIL/ffmpeg/librosa) are NOT in this
container, so the decode kernel is a clearly-marked deterministic stub —
the Spark-side contract (schema, batching, partition behavior, UDF
signature) is real and tested, and swapping in a real decoder is a
one-function change.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media_type string, payload binary, n_bytes bigint"
)
FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, n_bytes bigint, "
    "width int, height int, checksum bigint"
)

HAS_REAL_CODECS = False  # flipped when PIL/av are importable
try:  # pragma: no cover - not available in this container
    import PIL.Image  # noqa: F401

    HAS_REAL_CODECS = True
except ImportError:
    pass


def to_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Wrap a text corpus as opaque binary payloads + typed metadata —
    stands in for reading real image/audio bytes from parquet."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        (F.when(F.col(id_col) % 3 == 0, "image")
         .when(F.col(id_col) % 3 == 1, "audio")
         .otherwise("video")).alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
    )


def _stub_decode(n_bytes: int) -> tuple[int, int]:
    """Deterministic fake decode: derive a WxH from the byte length.
    A real implementation would PIL-open the payload; raising here would
    be the honest alternative, but a deterministic fake lets the whole
    plumbing be asserted end-to-end. DO NOT ship real features from this."""
    if HAS_REAL_CODECS:  # pragma: no cover
        raise NotImplementedError("real codec path not wired in this sandbox")
    return (int(n_bytes) % 640 + 1, int(n_bytes) % 480 + 1)


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, Arrow batches
    out; one Python worker pass, no row-at-a-time UDF."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64")
            wh = n.map(_stub_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": n,
                    "width": wh.map(lambda t: t[0]).astype("int32"),
                    "height": wh.map(lambda t: t[1]).astype("int32"),
                    # cheap stand-in checksum computable in the oracle too
                    "checksum": n * 2654435761 % (1 << 31),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id bigint, media_type string, width int, height int, "
    "resized_w int, resized_h int, resized_bytes bigint"
)


def resize(media: DataFrame, target_w: int = 128, target_h: int = 96) -> DataFrame:
    """mapInPandas resize: aspect-preserving downscale to fit
    (target_w, target_h). The pixel kernel is the deterministic stub
    (a real implementation PIL-resizes the decoded payload); the
    arithmetic is plain IEEE-double ops so the DuckDB oracle reproduces
    it exactly."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            n = pdf["payload"].map(len).astype("int64")
            out = {"doc_id": pdf["doc_id"], "media_type": pdf["media_type"],
                   "width": [], "height": [], "resized_w": [], "resized_h": [],
                   "resized_bytes": []}
            for nb in n:
                w, h = _stub_decode(nb)
                scale = min(1.0, target_w / w, target_h / h)
                out["width"].append(w)
                out["height"].append(h)
                out["resized_w"].append(max(1, math.floor(w * scale)))
                out["resized_h"].append(max(1, math.floor(h * scale)))
                out["resized_bytes"].append(max(1, math.floor(nb * scale * scale)))
            yield pd.DataFrame(out)

    return media.mapInPandas(kernel, schema=RESIZE_SCHEMA)


def frame_sample(media: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' stand-in: slice the payload every N bytes (the
    real kernel would pull I-frames); shows binary slicing stays native."""
    return media.select(
        "doc_id",
        "media_type",
        F.posexplode(
            F.transform(
                F.sequence(
                    F.lit(1),
                    F.greatest((F.col("n_bytes") / every_n_bytes).cast("int"), F.lit(1)),
                ),
                lambda i: F.substring(F.col("payload").cast("string"), (i - 1) * every_n_bytes + 1, 8),
            )
        ).alias("frame_idx", "frame_sig"),
    )
