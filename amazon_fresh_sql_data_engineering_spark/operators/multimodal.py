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
