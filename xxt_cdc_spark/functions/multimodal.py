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


# --- REAL decoders: codec-free container formats -----------------------------
# PPM (P6) and PCM WAV are fully specified byte layouts that need no
# codec library — so for these two the decode step is NOT a stub: the
# generator writes real container bytes and the decoder genuinely
# parses headers and sample/pixel planes (numpy + stdlib `wave`). The
# compressed formats (JPEG/PNG/MP4) keep the documented deterministic
# stand-ins above; the dispatch boundary is the magic-byte sniff.


def synth_ppm_bytes(media_id: int) -> bytes:
    """Deterministic real P6 image: width/height from the id, pixel
    channel values r=x+y, g=x+y+1, b=x+y+2 (no 8-bit wraparound for
    these dims), so per-channel means have closed forms an oracle can
    compute: mean_r = ((w-1)+(h-1))/2."""
    w = 8 + media_id % 16
    h = 8 + media_id % 8
    header = f"P6\n{w} {h}\n255\n".encode()
    px = bytearray()
    for y in range(h):
        for x in range(w):
            base = x + y
            px += bytes((base, base + 1, base + 2))
    return header + bytes(px)


def decode_ppm(content: bytes) -> dict:
    """REAL P6 decode: header parse + numpy plane reshape. A stride or
    header-length bug shifts channel means by ±1 and fails the oracle."""
    import numpy as np

    if not content or not content.startswith(b"P6"):
        return {"width": None, "height": None, "mean_r": None, "mean_g": None, "mean_b": None, "ok": False}
    # header = 3 whitespace-delimited tokens after the magic; the pixel
    # plane starts one byte after the maxval token
    tokens, i, tok = [], 2, b""
    while len(tokens) < 3 and i < len(content):
        c = content[i : i + 1]
        if c.isspace():
            if tok:
                tokens.append(tok)
                tok = b""
        else:
            tok += c
        i += 1
    if len(tokens) < 3:
        return {"width": None, "height": None, "mean_r": None, "mean_g": None, "mean_b": None, "ok": False}
    w, h = int(tokens[0]), int(tokens[1])
    plane = np.frombuffer(content, dtype=np.uint8, count=w * h * 3, offset=i).reshape(h, w, 3)
    means = plane.astype(np.float64).mean(axis=(0, 1))
    return {
        "width": w,
        "height": h,
        "mean_r": round(float(means[0]), 6),
        "mean_g": round(float(means[1]), 6),
        "mean_b": round(float(means[2]), 6),
        "ok": True,
    }


def synth_wav_bytes(media_id: int) -> bytes:
    """Deterministic real PCM WAV (mono, 16-bit): rate/duration/
    amplitude from the id; samples alternate ±amp so the true peak is
    exactly amp and every stat has an integer closed form."""
    import io
    import wave

    import numpy as np

    rate = 8000 + (media_id % 3) * 4000
    dur_ms = 20 + media_id % 50
    nframes = rate * dur_ms // 1000
    amp = 100 + media_id % 900
    samples = np.full(nframes, amp, dtype=np.int16)
    samples[1::2] *= -1
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(content: bytes) -> dict:
    """REAL PCM WAV decode via stdlib `wave` + numpy: container header
    gives rate/frames, the sample plane gives the true peak."""
    import io
    import wave

    import numpy as np

    if not content or not content.startswith(b"RIFF"):
        return {"sample_rate": None, "duration_ms": None, "n_frames": None, "peak": None, "ok": False}
    with wave.open(io.BytesIO(content), "rb") as wf:
        rate = wf.getframerate()
        nframes = wf.getnframes()
        raw = wf.readframes(nframes)
    samples = np.frombuffer(raw, dtype=np.int16)
    return {
        "sample_rate": rate,
        "duration_ms": nframes * 1000 // rate,
        "n_frames": nframes,
        "peak": int(np.abs(samples.astype(np.int32)).max()) if len(samples) else 0,
        "ok": True,
    }


def ppm_decode_stats(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Generate real PPM bytes per id and decode them back — one
    mapInPandas stage, so the Arrow binary round-trip carries REAL
    container bytes both ways."""
    out_schema = (
        "media_id long, width long, height long, n_bytes long,"
        " mean_r double, mean_g double, mean_b double"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                content = synth_ppm_bytes(int(mid))
                d = decode_ppm(content)
                rows.append(
                    (int(mid), d["width"], d["height"], len(content),
                     d["mean_r"], d["mean_g"], d["mean_b"])
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "width", "height", "n_bytes", "mean_r", "mean_g", "mean_b"],
            )

    return ids.select(F.col(id_col)).mapInPandas(batches, out_schema)


def wav_decode_stats(ids: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Generate real PCM WAV bytes per id and decode them back (same
    real-bytes Arrow round-trip as the PPM stage)."""
    out_schema = (
        "media_id long, sample_rate long, duration_ms long,"
        " n_frames long, peak long, n_bytes long"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid in pdf[id_col]:
                content = synth_wav_bytes(int(mid))
                d = decode_wav(content)
                rows.append(
                    (int(mid), d["sample_rate"], d["duration_ms"],
                     d["n_frames"], d["peak"], len(content))
                )
            yield pd.DataFrame(
                rows,
                columns=["media_id", "sample_rate", "duration_ms", "n_frames", "peak", "n_bytes"],
            )

    return ids.select(F.col(id_col)).mapInPandas(batches, out_schema)


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
