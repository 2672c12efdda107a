"""Multimodal column plumbing (BASELINE.json scope).

Media are opaque ``binary`` columns with typed metadata structs; transforms
run as Arrow-batched ``mapInPandas`` so each task processes columnar
batches — the right shape for decode/resize/frame-sample at scale (the
bytes never round-trip through the driver; partitioning is inherited from
the source).

The container ships no image/audio codecs, so the actual decode is STUBBED:
``decode_media(..., fake=True)`` produces deterministic pseudo-features from
the bytes; ``fake=False`` raises NotImplementedError where a real
PIL/ffmpeg call would go. The Spark-side plumbing — schema, batch
iteration, UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, n_bytes long, media_type string, width int, height int, checksum long"
)


def attach_fake_media(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Make a media-shaped table from text: bytes = utf-8 encode, plus a
    typed metadata struct. Stands in for (image_bytes, exif) columns."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.encode(F.col(text_col), "UTF-8").alias("media_bytes"),
        F.struct(
            F.lit("image/fake").alias("content_type"),
            F.octet_length(F.encode(F.col(text_col), "UTF-8")).alias("n_bytes"),
        ).alias("media_meta"),
    )


def decode_media(df: DataFrame, fake: bool = True) -> DataFrame:
    """Decode/feature-extract media via mapInPandas (Arrow batches).

    With ``fake=True``: deterministic pseudo-decode — n_bytes, a checksum,
    and a fake width/height derived from the byte length (so downstream
    resize/crop plumbing has real-shaped inputs). With ``fake=False``:
    raises NotImplementedError at the exact point a codec would be called.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg (not in container); "
                    "use fake=True for the deterministic stub"
                )
            b = pdf["media_bytes"]
            n = b.map(len)
            checksum = b.map(lambda x: sum(x[:64]) if len(x) else 0)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": n,
                    "media_type": pdf["media_meta"].map(lambda m: m["content_type"]),
                    "width": (n % 640 + 1).astype("int32"),
                    "height": (n % 480 + 1).astype("int32"),
                    "checksum": checksum,
                }
            )

    return df.mapInPandas(_decode, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = (
    "doc_id long, frame_idx int, byte_offset long, frame_bytes binary, frame_checksum long"
)


def sample_frames(
    df: DataFrame,
    frame_size: int = 64,
    stride: int = 256,
    max_frames: int = 4,
    fake: bool = True,
) -> DataFrame:
    """Video frame sampling plumbing: ONE input row -> N frame rows.

    The 1->N row fan-out is the mapInPandas shape batch UDFs can't do
    (pandas_udf is 1:1) — each output frame carries its byte offset and a
    binary payload, so downstream per-frame decode/embed sees ordinary
    rows. ``fake=True`` slices deterministic pseudo-frames from the media
    bytes; ``fake=False`` raises where an ffmpeg keyframe pull would go.
    Partitioning is inherited; no shuffle.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg (not in container); "
                    "use fake=True for the deterministic stub"
                )
            ids, idxs, offs, frames, sums = [], [], [], [], []
            for doc, b in zip(pdf["doc_id"], pdf["media_bytes"]):
                n_frames = min(max_frames, max(1, len(b) // stride))
                for i in range(n_frames):
                    off = i * stride
                    fb = bytes(b[off : off + frame_size])
                    ids.append(doc)
                    idxs.append(i)
                    offs.append(off)
                    frames.append(fb)
                    sums.append(sum(fb))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "byte_offset": pd.Series(offs, dtype="int64"),
                    "frame_bytes": pd.Series(frames, dtype=object),
                    "frame_checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return df.mapInPandas(_sample, schema=FRAME_SCHEMA)


def embed_media(df: DataFrame, dim: int = 16, fake: bool = True) -> DataFrame:
    """Feature extraction plumbing: media bytes -> ``array<float>`` pseudo-
    embedding (deterministic: crc32 of every ``dim``-th byte stride, scaled
    to [-1, 1]). Real models would run here (ONNX/torch per Arrow batch);
    the output column plugs straight into operators/similarity — the
    multimodal -> vector-search bridge. Output: (doc_id, embedding).
    """
    from zlib import crc32

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real embedding requires a model runtime (not in container); "
                    "use fake=True for the deterministic stub"
                )
            out = []
            for b in pdf["media_bytes"]:
                out.append(
                    [crc32(bytes(b[j::dim])) / 2147483647.5 - 1.0 for j in range(dim)]
                )
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "embedding": out})

    return df.mapInPandas(_embed, schema="doc_id long, embedding array<float>")
