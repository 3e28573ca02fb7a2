"""I2 — multimodal decode / feature-extract plumbing over binary columns.

Images/audio/video are opaque `binary` columns with typed metadata. The
Spark-side plumbing is real — schema contracts, `mapInPandas` Arrow
batching, partition-preserving shape — while the actual codec step is
stubbed (`NotImplementedError`) or replaced by a deterministic fake,
because no image/audio libraries ship in this environment.

Scale: `mapInPandas` streams Arrow record batches through Python without
collecting a partition in memory, so payload size per batch — not per
partition — bounds the Python heap. Decode parallelism equals input
partitions; `repartition(n)` before decoding is the throughput knob. Only
the payload + requested meta columns cross the Arrow boundary (select
before decode → parquet column pruning keeps undecoded bytes unread).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, byte_len int, width int, height int, channels int, mean_byte double"
)

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame_bytes binary"


def real_decode(payload: bytes) -> tuple[int, int, int, float]:
    """The codec boundary. Plug PIL/ffmpeg here on a cluster with codecs."""
    raise NotImplementedError(
        "no image/audio codecs in this environment — use fake_decode for tests"
    )


def fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in decoder: dims/stats derived from the bytes."""
    n = len(payload)
    width = 64 + n % 1857
    height = 64 + (n * 31) % 1017
    mean = (sum(payload[:256]) / min(n, 256)) if n else 0.0
    return width, height, 3, float(mean)


def attach_payload(docs: DataFrame) -> DataFrame:
    """Build the canonical multimodal frame: (doc_id, payload binary)."""
    return docs.select("doc_id", F.encode(F.col("text"), "UTF-8").alias("payload"))


def decode_meta(
    mm: DataFrame, decoder: Callable[[bytes], tuple[int, int, int, float]] = real_decode
) -> DataFrame:
    """Decode payloads to typed metadata via Arrow-batched mapInPandas."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                w, h, c, mean = decoder(b)
                rows.append((doc_id, len(b), w, h, c, mean))
            yield pd.DataFrame(
                rows, columns=["doc_id", "byte_len", "width", "height", "channels", "mean_byte"]
            )

    return mm.mapInPandas(_decode, schema=DECODED_SCHEMA)


def sample_frames(mm: DataFrame, stride: int = 1024, max_frames: int = 4) -> DataFrame:
    """Frame-sample a 'video' payload: fixed-stride byte windows as frames.

    Output is exploded (one row per frame) — the shape a real
    frame-extraction over video bytes produces.
    """

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                for i in range(min(max_frames, max(1, (len(b) + stride - 1) // stride))):
                    rows.append((doc_id, i, b[i * stride : (i + 1) * stride]))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "frame_bytes"])

    return mm.mapInPandas(_frames, schema=FRAME_SCHEMA)
