"""Multimodal column operators: image/audio/video as opaque binary columns.

The Spark-side plumbing is real and tested — schema (binary payload +
typed metadata struct), Arrow-batched ``mapInPandas`` operators with
bounded batch sizes, partition-friendly signatures. Decode status:

- **PNG and baseline JPEG images and PCM WAV audio decode for real**
  via the pure-stdlib codecs in operators/mediacodec.py (zlib scanline
  unfiltering / T.81 huffman+IDCT / RIFF parsing) — genuine bytes in,
  genuine pixels/samples out, tested on real files in
  tests/test_multimodal.py. Undecodable payloads yield null feature
  rows (the quarantine-don't-crash behavior a pipeline wants), and
  ``fake=True`` keeps the deterministic no-codec stub for shape tests.
- **Video decodes for real too**: MJPEG-in-AVI (RIFF container walk in
  operators/mediacodec.py; every stream chunk is a baseline JPEG the
  T.81 decoder handles) — ``sample_frames`` parses genuine video bytes
  into genuine per-frame JPEG payloads, and ``decode_frame_features``
  turns those into pixels. Other codecs (H.264 etc.) genuinely require
  a native library and quarantine as null rows, same as corrupt
  payloads. ``fake=True`` keeps the deterministic no-codec stub whose
  byte-slice math the m3 oracle replays in SQL.

At 100 TB: binary payloads ride in parquet; decode stages are
``mapInPandas`` so each task streams Arrow batches without materializing
a partition; metadata-only queries never touch the payload column
(column pruning drops it at the scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata carried next to every opaque payload.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("byte_len", T.LongType(), True),
                    T.StructField("mime", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_bytes", T.BinaryType(), True),
    ]
)


def media_table_from_documents(docs: DataFrame) -> DataFrame:
    """Build a media table with real binary payloads from the documents
    table (text bytes standing in for media bytes) — exercises the exact
    schema/partitioning a real ingest would produce."""
    payload = F.encode(F.col("text"), "UTF-8")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.col("source").alias("source"),
            F.length(payload).cast("long").alias("byte_len"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in for an image decode: dimensions/luma derived
    from the bytes so tests are reproducible without media libraries."""
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    mean_luma = (sum(payload[:256]) / max(min(n, 256), 1)) / 255.0
    return width, height, 3, mean_luma


def decode_image_features(media: DataFrame, fake: bool = False) -> DataFrame:
    """Arrow-batched decode -> feature extraction over the payload column.

    Real path: PNG and baseline-JPEG payloads decode via
    operators/mediacodec.py (pure stdlib — pixels actually come out of
    the bytes); rows whose payload is not a decodable image yield null
    features instead of failing the stage. fake=True keeps the no-codec
    deterministic stub. Either way the mapInPandas shape — batch
    iterator in/out, payload pruned from the output — is the production
    shape.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kafka_streaming_polymarket_pipeline_spark.operators import mediacodec as MC

        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                raw = bytes(p)
                if fake:
                    feats.append(_fake_decode(raw))
                    continue
                try:
                    arr = MC.decode_image(raw)
                    h, w = arr.shape[:2]
                    ch = 1 if arr.ndim == 2 else arr.shape[2]
                    feats.append((w, h, ch, MC.luma(arr)))
                except Exception:
                    feats.append((None, None, None, None))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": pd.array([f[0] for f in feats], dtype="Int32"),
                    "height": pd.array([f[1] for f in feats], dtype="Int32"),
                    "n_channels": pd.array([f[2] for f in feats], dtype="Int32"),
                    "mean_luma": [f[3] for f in feats],
                }
            )

    return media.select("media_id", "payload").mapInPandas(op, IMAGE_FEATURES_SCHEMA)


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_samples", T.LongType(), True),
        T.StructField("n_channels", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
    ]
)


def decode_audio_features(media: DataFrame) -> DataFrame:
    """Real WAV decode (stdlib RIFF/PCM) -> per-clip features: sample and
    channel counts, rate, duration, RMS amplitude (normalized to [0, 1]
    full scale). Undecodable payloads yield null feature rows."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from kafka_streaming_polymarket_pipeline_spark.operators import mediacodec as MC

        for pdf in batches:
            rows = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                try:
                    samples, rate = MC.decode_wav(bytes(p))
                    full = float(2 ** (8 * samples.dtype.itemsize - 1))
                    rms = float(np.sqrt((samples.astype(np.float64) ** 2).mean())) / full
                    rows.append(
                        (mid, samples.shape[0], samples.shape[1], rate,
                         samples.shape[0] / rate, rms)
                    )
                except Exception:
                    rows.append((mid, None, None, None, None, None))
            yield pd.DataFrame(
                {
                    "media_id": [r[0] for r in rows],
                    "n_samples": pd.array([r[1] for r in rows], dtype="Int64"),
                    "n_channels": pd.array([r[2] for r in rows], dtype="Int32"),
                    "sample_rate": pd.array([r[3] for r in rows], dtype="Int32"),
                    "duration_s": [r[4] for r in rows],
                    "rms": [r[5] for r in rows],
                }
            )

    return media.select("media_id", "payload").mapInPandas(op, AUDIO_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n_bytes: int = 64, max_frames: int = 8,
                  frame_stride: int = 1, fake: bool = False) -> DataFrame:
    """Frame sampling for video payloads: 1 row in -> N frame rows out.

    Real path: parse the AVI/RIFF container (mediacodec.decode_avi),
    keep every ``frame_stride``-th frame up to ``max_frames``;
    ``frame_bytes`` is the frame's own complete JPEG payload (feed it to
    ``decode_frame_features`` for pixels) and ``frame_idx`` is the
    frame's index in the source stream. Payloads that are not parseable
    AVI quarantine as a single null-frame row. ``fake=True`` keeps the
    no-codec byte-slice stub (``every_n_bytes`` applies only there)
    whose math the m3 oracle replays in SQL."""

    if frame_stride < 1:
        # reject outside the per-payload quarantine try-block: a bad
        # argument must fail loudly, not silently null every valid video
        raise ValueError(f"frame_stride must be >= 1, got {frame_stride}")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kafka_streaming_polymarket_pipeline_spark.operators import mediacodec as MC

        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p)
                if fake:
                    for i in range(min(max_frames, max(len(raw) // every_n_bytes, 1))):
                        out_ids.append(mid)
                        out_idx.append(i)
                        out_bytes.append(raw[i * every_n_bytes : (i + 1) * every_n_bytes])
                    continue
                try:
                    payloads, _meta = MC.decode_avi(raw)
                    picked = list(enumerate(payloads))[::frame_stride][:max_frames]
                    if not picked:
                        raise ValueError("no video stream chunks")
                    for i, fb in picked:
                        out_ids.append(mid)
                        out_idx.append(i)
                        out_bytes.append(fb)
                except Exception:
                    out_ids.append(mid)
                    out_idx.append(0)
                    out_bytes.append(None)
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return media.select("media_id", "payload").mapInPandas(op, FRAME_SAMPLE_SCHEMA)


FRAME_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
    ]
)


def decode_frame_features(frames: DataFrame) -> DataFrame:
    """Per-frame pixel features for sampled video frames: decode each
    ``frame_bytes`` JPEG (mediacodec) -> width/height/mean luma, keeping
    the (media_id, frame_idx) key. Undecodable/null frames yield null
    features — quarantine, never crash the stage."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kafka_streaming_polymarket_pipeline_spark.operators import mediacodec as MC

        for pdf in batches:
            feats = []
            for p in pdf["frame_bytes"]:
                if p is None:
                    feats.append((None, None, None))
                    continue
                try:
                    arr = MC.decode_image(bytes(p))
                    h, w = arr.shape[:2]
                    feats.append((w, h, MC.luma(arr)))
                except Exception:
                    feats.append((None, None, None))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "width": pd.array([f[0] for f in feats], dtype="Int32"),
                    "height": pd.array([f[1] for f in feats], dtype="Int32"),
                    "mean_luma": [f[2] for f in feats],
                }
            )

    return frames.select("media_id", "frame_idx", "frame_bytes").mapInPandas(
        op, FRAME_FEATURES_SCHEMA
    )


def video_table_from_documents(docs: DataFrame, n_frames: int = 3, size: int = 16,
                               fps: int = 4, quality: int = 75) -> DataFrame:
    """Deterministic REAL video payloads derived from document text: each
    document becomes an MJPEG AVI whose frame k renders the doc's bytes
    starting at offset k (tiled into a size x size x 3 raster), so every
    payload is a genuine RIFF container holding genuine JPEG frames —
    the fixture generator for the real video-decode path. mapInPandas:
    encode cost stays distributed and Arrow-batched."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from kafka_streaming_polymarket_pipeline_spark.operators import mediacodec as MC

        target = size * size * 3
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                raw = text.encode("utf-8") or b"\x00"
                frames = []
                for k in range(n_frames):
                    shifted = raw[k % len(raw):] + raw[: k % len(raw)]
                    tiled = (shifted * (target // len(shifted) + 1))[:target]
                    frames.append(
                        np.frombuffer(tiled, np.uint8).reshape(size, size, 3)
                    )
                payloads.append(MC.encode_avi_mjpeg(frames, fps=fps, quality=quality))
            yield pd.DataFrame(
                {
                    "media_id": pdf["doc_id"],
                    "media_type": "video",
                    "payload": payloads,
                    "source": pdf["source"],
                }
            )

    raw_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("media_type", T.StringType(), False),
            T.StructField("payload", T.BinaryType(), True),
            T.StructField("source", T.StringType(), True),
        ]
    )
    out = docs.select("doc_id", "text", "source").mapInPandas(op, raw_schema)
    return out.select(
        "media_id",
        "media_type",
        "payload",
        F.struct(
            F.col("source").alias("source"),
            F.length("payload").cast("long").alias("byte_len"),
            F.lit("video/x-msvideo").alias("mime"),
        ).alias("meta"),
    )


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), False),
        T.StructField("height", T.IntegerType(), False),
    ]
)


def resize_images(media: DataFrame, width: int = 32, height: int = 32,
                  fake: bool = False) -> DataFrame:
    """Resize stage: payload in -> payload out at fixed dimensions (the
    normalization step before feature extraction in a training-data
    pipeline). Real path: PNG/JPEG decode -> nearest-neighbor resample
    -> PNG re-encode, all pure stdlib+numpy (operators/mediacodec.py);
    undecodable payloads yield a null output payload. fake=True keeps the
    no-codec stub (deterministic byte buffer of width*height*3)."""

    target = width * height * 3

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from kafka_streaming_polymarket_pipeline_spark.operators import mediacodec as MC

        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                raw = bytes(p)
                if fake:
                    raw = raw or b"\x00"
                    reps = (target // len(raw)) + 1
                    out.append((raw * reps)[:target])
                    continue
                try:
                    arr = MC.decode_image(raw)
                    out.append(MC.encode_png(MC.resize_nearest(arr, width, height)))
                except Exception:
                    out.append(None)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return media.select("media_id", "payload").mapInPandas(op, RESIZED_SCHEMA)
