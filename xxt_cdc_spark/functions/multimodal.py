"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing is real and tested: schema, batch iteration
(mapInPandas over Arrow batches), partitioning, metadata extraction.
The codec step itself is stubbed — the container has no image/audio
libraries — behind clearly-marked deterministic fakes, so swapping in
PIL/torchaudio later changes one function body, not the pipeline.

At scale: binary payloads ride their own parquet column (column
pruning keeps them off queries that don't touch them), decode happens
in mapInPandas with small ``maxRecordsPerBatch`` so a batch of decoded
frames fits executor memory, and derived features land in slim typed
columns for downstream use.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("meta_width", T.IntegerType(), True),
        T.StructField("meta_height", T.IntegerType(), True),
        T.StructField("meta_duration_ms", T.IntegerType(), True),
    ]
)

_MAGIC = {
    b"\xff\xd8\xff": "image/jpeg",
    b"\x89PNG": "image/png",
    b"RIFF": "audio/wav",
    b"\x00\x00\x00": "video/mp4",  # ftyp boxes start with size prefix
}


def binary_meta(content_col: str = "content") -> list[Column]:
    """JVM-side binary metadata: byte length + magic-byte sniff.

    No decode — this is the cheap path that runs on every row.
    """
    c = F.col(content_col)
    sniff = F.lit("application/octet-stream")
    for magic, mime in _MAGIC.items():
        hexpat = magic.hex()
        sniff = F.when(
            F.hex(F.expr(f"substring({content_col}, 1, {len(magic)})")) == F.lit(hexpat.upper()),
            F.lit(mime),
        ).otherwise(sniff)
    return [F.octet_length(c).alias("n_bytes"), sniff.alias("sniffed_mime")]


def decode_image(content: bytes) -> dict:
    """STUB — image decode requires a codec library not present in this
    container. Deterministic fake: derives pseudo-dimensions from the
    payload so the pipeline around it is testable end-to-end.

    Replace the body with PIL.Image.open(...) in production.
    """
    if content is None:
        return {"width": None, "height": None, "ok": False}
    w = 16 + (len(content) % 64)
    h = 16 + (content[0] % 64 if content else 0)
    return {"width": int(w), "height": int(h), "ok": True}


def extract_image_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas feature extraction: Arrow-batched, executor-side.

    Output schema is slim (no re-emission of the binary payload) so
    the expensive column is pruned after this stage.
    """
    out_schema = "media_id long, width int, height int, decode_ok boolean"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_image(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "decode_ok": [f["ok"] for f in feats],
                }
            )

    return df.mapInPandas(batches, out_schema)


def decode_audio(content: bytes) -> dict:
    """STUB — audio decode requires a codec library not present in this
    container. Deterministic fake derives waveform-ish stats from the
    payload bytes (all SQL-expressible, so the Arrow round-trip is
    oracle-checkable). Replace the body with soundfile/torchaudio in
    production.
    """
    if not content:
        return {"sample_rate": None, "duration_ms": None, "peak": None, "ok": False}
    n = len(content)
    rate = 8000 + (n % 3) * 4000  # 8/12/16 kHz buckets
    return {
        "sample_rate": rate,
        "duration_ms": n * 1000 // rate,  # one byte ≈ one sample
        "peak": max(content[0], content[-1]),
        "ok": True,
    }


def extract_audio_features(df: DataFrame, content_col: str = "content") -> DataFrame:
    """mapInPandas audio-feature stage (same Arrow batch shape as the
    image path): binary in → slim typed stats out, payload pruned."""
    out_schema = "media_id long, sample_rate int, duration_ms bigint, peak int, decode_ok boolean"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_audio(c) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "sample_rate": [f["sample_rate"] for f in feats],
                    "duration_ms": [f["duration_ms"] for f in feats],
                    "peak": [f["peak"] for f in feats],
                    "decode_ok": [f["ok"] for f in feats],
                }
            )

    return df.mapInPandas(batches, out_schema)


def resize_image(content: bytes, max_dim: int) -> tuple[bytes, int, int]:
    """STUB resize — a real implementation is PIL ``Image.thumbnail``.
    Deterministic fake: clamps the pseudo-dimensions from
    ``decode_image`` to ``max_dim`` and emits a truncated payload as
    the 'thumbnail' so output size shrinks like a real resize would.
    """
    d = decode_image(content)
    if not d["ok"]:
        return (b"", 0, 0)
    w = min(d["width"], max_dim)
    h = min(d["height"], max_dim)
    return (content[: max(w * h // 4, 1)], w, h)


def resize_images(df: DataFrame, max_dim: int = 32, content_col: str = "content") -> DataFrame:
    """mapInPandas resize stage: binary in → smaller binary + dims out.

    The output keeps a (smaller) binary column on purpose — resize is a
    mid-pipeline stage whose thumbnails feed further decode steps, so
    the plumbing must prove Arrow handles binary in BOTH directions.
    """
    out_schema = "media_id long, thumb binary, thumb_width int, thumb_height int"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = [resize_image(c, max_dim) for c in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "thumb": [t[0] for t in out],
                    "thumb_width": [t[1] for t in out],
                    "thumb_height": [t[2] for t in out],
                }
            )

    return df.mapInPandas(batches, out_schema)


def sample_video_frames(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """STUB frame sampler: emits (media_id, frame_ts_ms) rows at the
    requested cadence from meta_duration_ms — the explode/partition
    shape of a real ffmpeg-backed sampler without the codec.
    """
    return df.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.coalesce(F.col("meta_duration_ms"), F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def synth_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents corpus
    (text → utf-8 bytes as the opaque payload) so the multimodal
    plumbing has real data to run on in tests."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        F.encode(F.col("text"), "utf-8").alias("content"),
        F.lit(None).cast("int").alias("meta_width"),
        F.lit(None).cast("int").alias("meta_height"),
        (F.col("n_chars") * 10).cast("int").alias("meta_duration_ms"),
    )
