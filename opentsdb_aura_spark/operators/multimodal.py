"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed via Arrow-batched
``mapInPandas``.

The decode step is STUBBED (the container has no image/audio
libraries): ``decode_image_batch`` raises ``NotImplementedError``
unless ``fake=True``, in which case a deterministic fake decoder
produces stable feature rows.  Everything Spark-side — schema,
partition flow, UDF signature, Arrow batch shape — is real and
tested; swapping in a real decoder is a one-function change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = "media_id bigint, kind string, n_bytes bigint, checksum bigint, feat array<double>"


def attach_fake_media(docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Derive a deterministic opaque binary payload + metadata from the
    documents table, standing in for real image/audio bytes."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")), (F.col(id_col) % 3 + 1).cast("int")).alias(
            "kind"
        ),
        payload.alias("payload"),
        (F.col(id_col) % 1920 + 1).cast("int").alias("width"),
        (F.col(id_col) % 1080 + 1).cast("int").alias("height"),
        F.lit(16000).alias("sample_rate"),
        (F.col(id_col) % 300 + 1).cast("int").alias("n_frames"),
    )


def _decode_real(payload: bytes, kind: str):
    raise NotImplementedError(
        "real media decode requires PIL/libav which are not in this "
        "container; pass fake=True or plug a decoder in here"
    )


def extract_features(media: DataFrame, *, fake: bool = True, feat_dim: int = 8) -> DataFrame:
    """Feature extraction over binary media via mapInPandas.

    Arrow streams batches of (media_id, kind, payload, …) into pandas;
    per batch we emit (media_id, kind, n_bytes, checksum, feat).  The
    fake decoder derives features deterministically from the payload
    bytes so tests are stable.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                pdf["payload"].map(lambda p: _decode_real(p, "?"))  # pragma: no cover
            n_bytes = pdf["payload"].map(len)
            checksum = pdf["payload"].map(lambda b: sum(b[:256]) if len(b) else 0)
            feats = [
                [float((int(c) * (i + 1)) % 997) / 997.0 for i in range(feat_dim)]
                for c in checksum
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": n_bytes.astype("int64"),
                    "checksum": checksum.astype("int64"),
                    "feat": feats,
                }
            )

    return media.mapInPandas(op, schema=FEATURE_SCHEMA)


def media_stats(media: DataFrame) -> DataFrame:
    """Pure-JVM metadata aggregation over the media table (no decode):
    per kind: count, total bytes, max dimensions."""
    return media.groupBy("kind").agg(
        F.count("*").alias("n_media"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max("width").alias("max_width"),
        F.max("height").alias("max_height"),
    )


RESIZED_SCHEMA = (
    "media_id bigint, kind string, payload binary, width int, height int, "
    "sample_rate int, n_frames int, resized binary, out_width int, out_height int"
)

FRAMES_SCHEMA = "media_id bigint, frame_idx int, frame binary"


def resize_images(media: DataFrame, out_width: int, out_height: int, *, fake: bool = True) -> DataFrame:
    """Resize stub over mapInPandas: real implementation would decode
    with PIL and re-encode; the fake path derives a deterministic
    payload so the Arrow plumbing (schema, batch shape, binary I/O)
    is real and tested."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                pdf["payload"].map(lambda p: _decode_real(p, "image"))  # pragma: no cover
            # deterministic fake: truncate/pad payload to out_w*out_h/64 bytes
            target = max(1, out_width * out_height // 64)
            resized = pdf["payload"].map(lambda b: bytes(b[:target]).ljust(target, b"\0"))
            out = pdf.copy()
            out["resized"] = resized
            out["out_width"] = out_width
            out["out_height"] = out_height
            yield out

    return media.where(F.col("kind") == "image").mapInPandas(op, schema=RESIZED_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 30, *, fake: bool = True) -> DataFrame:
    """Frame sampling stub for video media: emit every Nth frame as an
    opaque binary.  One input row fans out to ceil(n_frames/every_n)
    rows — the mapInPandas iterator shape for 1→many extraction."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                pdf["payload"].map(lambda p: _decode_real(p, "video"))  # pragma: no cover
            ids, idxs, frames = [], [], []
            for _, row in pdf.iterrows():
                payload = bytes(row["payload"])
                for fi in range(0, int(row["n_frames"]), every_n):
                    ids.append(row["media_id"])
                    idxs.append(fi)
                    # deterministic fake frame: 16-byte slice keyed by index
                    start = (fi * 7) % max(1, len(payload))
                    frames.append(payload[start : start + 16].ljust(16, b"\0"))
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.where(F.col("kind") == "video").mapInPandas(op, schema=FRAMES_SCHEMA)
