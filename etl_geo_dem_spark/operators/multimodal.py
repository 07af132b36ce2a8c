"""Multimodal column plumbing — image/audio/video as opaque binary + metadata.

The decode libraries (PIL/ffmpeg/librosa) are not in this container, so the
decode kernel is a clearly-marked deterministic STUB; everything Spark-side is
real and exercised: binary column handling, typed metadata structs, Arrow-batched
``mapInPandas`` signatures, frame-sampling explosion, and partition-preserving
batch shapes. Swap ``_decode_stub`` for a real decoder on a cluster with the
codec libs installed.

Reference analog: chunked raster decode + per-chunk vectorized transforms
(`pipeline_transform_sea_level.py:1034-1254` process_chunk family, P2) — the
Arrow batch IS the chunk.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id long, n_bytes int, fake_width int, fake_height int, checksum string"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat encoded text as the opaque media payload (binary column) with typed
    metadata — the storage shape a 100 TB multimodal table uses (payload binary
    + struct metadata, partition-prunable without touching bytes)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8")).withColumn(
        "media_meta",
        F.struct(
            F.length(F.col(text_col)).alias("n_chars"),
            F.lit("fake/jpeg").alias("mime"),
            (F.crc32(F.encode(F.col(text_col), "UTF-8")) % 1000).cast("int").alias("variant"),
        ),
    )


def _decode_stub(payload: bytes) -> tuple[int, int, int, str]:
    """STUB decode: a real implementation would call the image codec here.
    Deterministic fake: dimensions derived from payload length. Raises nothing;
    to make absence explicit use `decode_real` below."""
    n = len(payload)
    return n, (n % 64) + 1, (n % 48) + 1, format(sum(payload[:16]) % 65536, "04x")


def decode_real(payload: bytes):  # pragma: no cover - documented stub
    raise NotImplementedError(
        "real image/audio decode requires codec libraries not present in this "
        "container; wire PIL/ffmpeg here on a real cluster"
    )


def decode_metadata(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched metadata extraction over binary payloads via mapInPandas.

    The Python kernel sees whole Arrow batches (never rows); partitioning is
    preserved — at scale you repartition upstream to size batches to the codec's
    sweet spot, not here."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_decode_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                decoded, columns=["n_bytes", "fake_width", "fake_height", "checksum"]
            )
            out.insert(0, "doc_id", pdf[id_col].values)
            yield out

    return df.select(id_col, "payload").mapInPandas(kernel, schema=DECODED_SCHEMA)


def sample_frames(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """Frame sampling for video-like payloads: one output row per sampled frame.

    Pure Spark (no Python): frame offsets come from `sequence`, frame bytes from
    `substring` on the binary column — the explode pattern that scales (rows
    fan out inside the task; no driver loop, no UDF)."""
    n_frames = F.greatest(
        (F.length("payload") / every_n_bytes).cast("int"), F.lit(1)
    )
    return (
        df.withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .withColumn(
            "frame_bytes",
            F.expr(f"substring(payload, frame_idx * {every_n_bytes} + 1, {every_n_bytes})"),
        )
        .select("doc_id", "frame_idx", "frame_bytes")
    )
