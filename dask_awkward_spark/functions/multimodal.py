"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, decode/feature-extract as Arrow-batched Pandas UDFs.

The decode kernels themselves are STUBBED (no image/audio libs in this
container) behind ``_decode_stub`` — a deterministic fake so the Spark-side
plumbing (schema, batch shape, partitioning) is real and tested. Swap
``_decode_stub`` for PIL/librosa on a real cluster; nothing else changes.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("checksum", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, feature array<double>"
)


def attach_binary(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a typed binary media column (here: utf-8 bytes standing in for
    an encoded image) + metadata struct — pure expressions, no UDF."""
    media = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        media.alias("media"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.col(text_col)).cast("bigint").alias("n_bytes"),
            F.md5(media).alias("checksum"),
        ).alias("meta"),
    )


def sample_frames(
    media_df: DataFrame, frame_bytes: int = 256, every_n: int = 4
) -> DataFrame:
    """Video-style frame sampling over the opaque binary column: the
    payload is treated as ``ceil(n_bytes / frame_bytes)`` fixed-size
    frames and every ``every_n``-th frame is emitted as its own row
    ``(doc_id, n_frames, frame_idx, frame, frame_md5)``.

    Pure JVM expressions — sequence/transform/explode + substr on the
    BINARY column — no Python in the path at all; at 100 TB the 1->N
    frame explosion happens inside whole-stage codegen, and downstream
    per-frame decode (the only part that genuinely needs a media lib)
    rides the same Arrow mapInPandas tier as :func:`extract_features`.
    Empty payloads yield no rows (explode of an empty index array)."""
    fb = F.lit(frame_bytes)
    n_frames = F.ceil(F.col("meta.n_bytes") / fb).cast("int")
    idxs = F.when(n_frames > 0, F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).otherwise(
        F.array().cast("array<int>")
    )
    frames = F.transform(
        idxs,
        lambda i: F.struct(
            i.alias("frame_idx"),
            F.col("media").substr(i * fb + 1, fb).alias("frame"),
        ),
    )
    return media_df.select(
        "doc_id", n_frames.alias("n_frames"), F.explode(frames).alias("fr")
    ).select(
        "doc_id",
        "n_frames",
        F.col("fr.frame_idx").alias("frame_idx"),
        F.col("fr.frame").alias("frame"),
        F.md5(F.col("fr.frame")).alias("frame_md5"),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, list[float]]:
    """Deterministic fake decoder: pretends to decode an image and extract
    an 8-dim feature vector. Replace with a real decoder on a cluster.
    Raises on empty payload the way a real decoder raises on corrupt data."""
    if not payload:
        raise NotImplementedError("real media decoding not available in this container")
    h = hashlib.md5(payload).digest()
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    feature = [b / 255.0 for b in h[:8]]
    return width, height, feature


RESIZED_SCHEMA = (
    "doc_id long, media binary, "
    "meta struct<mime: string, n_bytes: bigint, checksum: string, width: int, height: int>"
)


def resize_media(media_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: binary in -> binary out with updated metadata,
    Arrow-batched via mapInPandas (schema/partitioning/batch shape real;
    the pixel kernel is the deterministic stub — swap for PIL on a
    cluster). The fake 'resized' payload is a truncation/pad of the
    original to width*height bytes, so output sizes are exact and
    downstream stages can be tested against them."""
    target = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(media) if media is not None else b""
                resized = payload[:target].ljust(target, b"\0")
                out.append(
                    (
                        doc_id,
                        resized,
                        {
                            "mime": "application/octet-stream",
                            "n_bytes": len(resized),
                            "checksum": hashlib.md5(resized).hexdigest(),
                            "width": width,
                            "height": height,
                        },
                    )
                )
            yield pd.DataFrame(out, columns=["doc_id", "media", "meta"])

    return media_df.select("doc_id", "media").mapInPandas(run, RESIZED_SCHEMA)


def extract_features(media_df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    mapInPandas — the multimodal analogue of the reference's
    map_partitions escape hatch (lib/core.py:2146-2295): arbitrary Python
    per partition, mandatory output schema."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, media in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(media) if media is not None else b""
                try:
                    w, h, feat = _decode_stub(payload)
                except NotImplementedError:
                    w, h, feat = -1, -1, []
                rows.append((doc_id, len(payload), w, h, feat))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "width", "height", "feature"]
            )

    return media_df.select("doc_id", "media").mapInPandas(run, FEATURE_SCHEMA)
