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
- **Video** genuinely requires a native codec library (absent here) and
  raises ``NotImplementedError`` unless ``fake=True`` — the mapInPandas
  shape is the deliverable; the codec slots in.

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
                  fake: bool = False) -> DataFrame:
    """Frame sampling for video payloads: 1 row in -> N frame rows out
    (the fan-out shape of real frame extraction). Stubbed: frames are
    byte-slices; real impl would seek keyframes via a codec library."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires a codec library, not available here; "
                    "pass fake=True for the deterministic stub"
                )
            out_ids, out_idx, out_bytes = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                raw = bytes(p)
                for i in range(min(max_frames, max(len(raw) // every_n_bytes, 1))):
                    out_ids.append(mid)
                    out_idx.append(i)
                    out_bytes.append(raw[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield pd.DataFrame(
                {"media_id": out_ids, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return media.select("media_id", "payload").mapInPandas(op, FRAME_SAMPLE_SCHEMA)


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
