"""Multimodal (image/audio/video) column handling.

The interleaved corpus carries media spans (kind='figure',
media_ref='img://doc/s'); at production scale the payload is an
opaque BINARY column read from an object store and decoded inside
Arrow-batched UDFs. This container has no image/audio libraries, so
the DECODE step is stubbed (import-gated), but everything Spark-side
is real and tested: binary column schema, mapInPandas batch shape,
deterministic featurization, partitioning.

Layout:
* :func:`media_table` — media spans + synthetic binary payload
  (md5(media_ref) digest bytes — the deterministic stand-in for an
  object-store fetch).
* :func:`decode_media` — mapInPandas decode/feature-extract. With
  PIL/librosa present it would decode; here the gated fallback
  derives (width, height, n_channels, features) deterministically
  from the payload BYTES, so the oracle can verify the full path in
  SQL (md5 hex arithmetic).
* :func:`sample_frames` — video-style frame sampling plumbing: emits
  one row per sampled frame index (stride over a payload-derived
  frame count) — generator-shaped, no python in the row fan-out.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..corpus import media_from_spans

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # noqa: F401

    HAVE_PIL = True
except Exception:  # pragma: no cover
    HAVE_PIL = False


def media_table(docs_spans: DataFrame) -> DataFrame:
    """(doc_id, media_no, media_ref, offset, payload binary)."""
    return media_from_spans(docs_spans).withColumn(
        "payload", F.unhex(F.md5("media_ref"))
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType()),
        T.StructField("media_no", T.IntegerType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("bytes_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("f0", T.DoubleType()),
        T.StructField("f1", T.DoubleType()),
    ]
)


def _decode_stub(payload: bytes) -> tuple[int, int, int, float, float]:
    """Deterministic fake decode: dimensions/features from the payload
    bytes. A real deployment replaces this body with PIL/torchvision;
    the signature and batch shape stay identical."""
    if HAVE_PIL:  # pragma: no cover
        raise NotImplementedError(
            "real image decode intentionally not wired in this sandbox"
        )
    b = payload
    width = 64 + (b[0] % 192)
    height = 64 + (b[1] % 192)
    n_channels = 1 + (b[2] % 4)
    f0 = round(b[3] / 255.0, 5)
    f1 = round(b[4] / 255.0, 5)
    return width, height, n_channels, f0, f1


def decode_media(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature extraction over the binary column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {c: [] for c in _DECODE_SCHEMA.fieldNames()}
            for doc_id, media_no, media_ref, payload in zip(
                pdf["doc_id"], pdf["media_no"], pdf["media_ref"], pdf["payload"]
            ):
                w, h, c, f0, f1 = _decode_stub(bytes(payload))
                out["doc_id"].append(doc_id)
                out["media_no"].append(media_no)
                out["media_ref"].append(media_ref)
                out["bytes_len"].append(len(payload))
                out["width"].append(w)
                out["height"].append(h)
                out["n_channels"].append(c)
                out["f0"].append(f0)
                out["f1"].append(f1)
            yield pd.DataFrame(out)

    cols = media.select("doc_id", "media_no", "media_ref", "payload")
    return cols.mapInPandas(run, schema=_DECODE_SCHEMA)


def sample_frames(media: DataFrame, stride: int = 4) -> DataFrame:
    """Video-style frame sampling: frame count derived from the last
    payload byte (read via the hex view — binary casts to arrays are
    not supported), frames sampled every `stride`; the fan-out is a
    native explode of a sequence (no python)."""
    n_frames = (
        1 + F.conv(F.substring(F.hex("payload"), 31, 2), 16, 10).cast("int") % 32
    )
    return media.select(
        "doc_id",
        "media_ref",
        n_frames.cast("int").alias("n_frames"),
        F.explode(
            F.sequence(F.lit(0), n_frames.cast("int") - 1, F.lit(stride))
        ).alias("frame_no"),
    )
