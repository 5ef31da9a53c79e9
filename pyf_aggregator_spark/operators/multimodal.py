"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB: store the raw payload as an
opaque `binary` column with typed metadata alongside; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas
functions over ``mapInPandas`` so each batch moves through one Arrow
exchange (never per-row Python).

The actual codecs (PIL/ffmpeg) are NOT in this container, so the decode
body is a clearly-marked deterministic stub — the Spark-side plumbing
(schema, batch shape, partitioning, worker shipping) is real and
tested. A production deployment swaps ``_decode_stub`` for the codec
call; nothing else changes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyf_aggregator_spark.registry import load, register

DECODED_SCHEMA = (
    "doc_id long, n_bytes int, sha1_8 string, width int, height int, "
    "n_frames int"
)


def _decode_stub(payload: bytes) -> tuple[int, int, int]:
    """STUB decoder: deterministic fake (width, height, n_frames)
    derived from the payload bytes. A real deployment replaces this
    with e.g. PIL.Image.open(io.BytesIO(payload)).size — the Spark
    plumbing around it is unchanged. Raises on empty payload like a
    real decoder would.
    """
    if not payload:
        raise ValueError("empty payload (NotImplementedError stand-in)")
    n = len(payload)
    return (n * 7) % 1024 + 1, (n * 13) % 768 + 1, n % 30 + 1


def _decode_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in it:
        payloads = pdf["payload"]
        meta = [_decode_stub(p) for p in payloads]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "n_bytes": [len(p) for p in payloads],
                "sha1_8": [hashlib.sha1(p).hexdigest()[:8] for p in payloads],
                "width": [m[0] for m in meta],
                "height": [m[1] for m in meta],
                "n_frames": [m[2] for m in meta],
            }
        )


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-cast as an opaque binary payload column —
    the fixture standing in for image/audio blobs."""
    return load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("payload")
    )


@register(
    "mm_decode_metadata",
    """
    SELECT doc_id,
           strlen(text)::INT AS n_bytes,
           ((strlen(text) * 7) % 1024 + 1)::INT AS width,
           ((strlen(text) * 13) % 768 + 1)::INT AS height,
           (strlen(text) % 30 + 1)::INT AS n_frames
    FROM documents ORDER BY doc_id
    """,
)
def mm_decode_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode via mapInPandas (Arrow-batched). The oracle checks
    the deterministic stub math on byte length; sha1 is exercised in
    unit tests (DuckDB lacks sha1)."""
    from pyf_aggregator_spark.session import ensure_py_files

    ensure_py_files(spark)
    decoded = media_table(spark, sf_dir).mapInPandas(
        _decode_batches, DECODED_SCHEMA
    )
    return decoded.select(
        "doc_id", "n_bytes", "width", "height", "n_frames"
    ).orderBy("doc_id")


# ---- transform plumbing beyond decode: resize, frame-sample, feature
# extraction. Same contract as the decoder: the Spark dataflow (schemas,
# Arrow batching, 1:N expansion, partitioning) is real; the pixel/codec
# math is a clearly-marked deterministic stub (PIL/ffmpeg not in this
# container) a production deployment swaps in-place.

RESIZED_SCHEMA = "doc_id long, width int, height int, payload binary"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_payload binary"
FEATURE_DIM = 16
FEATURE_SCHEMA = f"doc_id long, embedding array<float>"


def _resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """STUB resize: deterministic re-encode (truncate/pad to w*h bytes).
    Production: PIL Image.resize + re-encode."""
    target = width * height
    return (payload * (target // max(len(payload), 1) + 1))[:target]


def mm_resize(df: "DataFrame", width: int = 32, height: int = 32) -> "DataFrame":
    """Batch image resize over mapInPandas: one Arrow exchange per
    batch, byte payloads in and out — the hot-path shape for bulk
    thumbnailing at 100 TB (pure map, no shuffle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "width": width,
                    "height": height,
                    "payload": [
                        _resize_stub(p, width, height) for p in pdf["payload"]
                    ],
                }
            )

    return df.mapInPandas(batches, RESIZED_SCHEMA)


def mm_frame_sample(df: "DataFrame", every_n: int = 10) -> "DataFrame":
    """Video frame sampling: 1:N row expansion inside mapInPandas (a
    video row yields one row per sampled frame). The stub derives
    n_frames from the payload like the decoder; production swaps in
    ffmpeg keyframe extraction — the expansion dataflow is identical."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(p) % 30 + 1  # stub: same math as decode
                for f in range(0, n_frames, every_n):
                    ids.append(doc_id)
                    idxs.append(f)
                    frames.append(hashlib.sha1(p + f.to_bytes(4, "big")).digest())
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame_payload": frames}
            )

    return df.mapInPandas(batches, FRAME_SCHEMA)


def mm_feature_extract(df: "DataFrame", dim: int = FEATURE_DIM) -> "DataFrame":
    """Embedding extraction: payload → fixed-dim float vector. The stub
    hashes byte windows into a deterministic unit-ish vector; production
    swaps in a model forward pass (same Arrow batch shape). The output
    column is array<float> — directly consumable by the ANN operators
    (similarity.kmeans_fit / ivf_topk_batch)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in it:
            vecs = []
            for p in pdf["payload"]:
                h = hashlib.sha256(p).digest()
                raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4],
                                    dtype=np.uint32).astype(np.float64)
                v = raw / np.linalg.norm(raw)
                vecs.append(v.astype(np.float32).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values, "embedding": vecs})

    return df.mapInPandas(batches, FEATURE_SCHEMA)
