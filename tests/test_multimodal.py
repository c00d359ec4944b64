"""Multimodal tests: binary payload schema, Arrow-batched decode,
frame-sample fan-out. PNG/JPEG/WAV decode is REAL (operators/mediacodec.py,
pure stdlib) and tested on genuine files below; so is video: MJPEG-in-AVI
round-trips through the RIFF container codec and per-frame JPEG decode."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import mediacodec as MC
from kafka_streaming_polymarket_pipeline_spark.operators import multimodal as M
from kafka_streaming_polymarket_pipeline_spark.tables import load


@pytest.fixture(scope="module")
def media(spark, sf_smoke):
    # Deterministic row selection: tables.load fans narrow scans out to
    # the machine parallelism (r11), so a bare limit(20) takes arbitrary
    # rows — this fixture needs doc_id 0 specifically.
    return M.media_table_from_documents(
        load(spark, sf_smoke, "documents").filter(F.col("doc_id") < 20)
    )


def test_media_schema_and_metadata(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "media_type", "payload", "meta"]
    row = media.filter(F.col("media_id") == 0).collect()[0]
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["byte_len"] == len(row["payload"])


def test_undecodable_payloads_yield_null_features(media):
    # The media fixture carries text bytes, not PNGs: the real decode path
    # must quarantine them as null feature rows, not fail the stage.
    rows = M.decode_image_features(media, fake=False).collect()
    assert len(rows) == 20
    assert all(r["width"] is None and r["mean_luma"] is None for r in rows)


def _filtered_png(filters: list[int], pixels, channels: int) -> bytes:
    """Hand-build a PNG applying the given per-scanline filter types —
    independent of encode_png (which always uses filter 0), so the
    decoder's unfiltering math is tested against the spec, not against
    our own encoder."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(pixels, np.int64)
    h, w = a.shape[0], a.shape[1]
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    flat = a.reshape(h, w * channels)
    raw = b""
    prev = np.zeros(w * channels, np.int64)
    for y, ft in zip(range(h), filters):
        row = flat[y]
        enc = row.copy()
        if ft == 1:
            for i in range(len(row) - 1, channels - 1, -1):
                enc[i] = (row[i] - row[i - channels]) % 256
        elif ft == 2:
            enc = (row - prev) % 256
        elif ft == 3:
            for i in range(len(row)):
                aL = row[i - channels] if i >= channels else 0
                enc[i] = (row[i] - (aL + prev[i]) // 2) % 256
        elif ft == 4:
            for i in range(len(row)):
                aL = row[i - channels] if i >= channels else 0
                b, c = prev[i], (prev[i - channels] if i >= channels else 0)
                p = aL + b - c
                pa, pb, pc = abs(p - aL), abs(p - b), abs(p - c)
                pred = aL if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[i] = (row[i] - pred) % 256
        raw += bytes([ft]) + bytes(enc.astype(np.uint8))
        prev = row

    def chunk(ctype, body):
        return (
            struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def test_png_decode_all_filters_bit_exact():
    import numpy as np

    rng = np.random.RandomState(5)
    pixels = rng.randint(0, 256, (5, 7, 3))
    png = _filtered_png([0, 1, 2, 3, 4], pixels, 3)
    got = MC.decode_png(png)
    assert got.shape == (5, 7, 3)
    assert (got == pixels).all()


def test_png_gray_and_rgba_roundtrip():
    import numpy as np

    rng = np.random.RandomState(6)
    for ch in (1, 2, 4):
        pixels = rng.randint(0, 256, (4, 6, ch)).astype(np.uint8)
        got = MC.decode_png(MC.encode_png(pixels))
        assert got.shape == (4, 6, ch) and (got == pixels).all()


def test_jpeg_roundtrip_within_quant_error():
    import numpy as np

    # Solid blocks are DC-only: quantization error is exactly zero.
    solid = np.full((16, 24, 3), 128, np.uint8)
    assert (MC.decode_jpeg(MC.encode_jpeg(solid, 90)) == solid).all()
    # Gradients: lossy, but bounded by quantization at q90.
    y, x = np.mgrid[0:40, 0:56]
    grad = np.stack([(x * 4) % 256, (y * 6) % 256, ((x + y) * 3) % 256], -1).astype(np.uint8)
    dec = MC.decode_jpeg(MC.encode_jpeg(grad, 90))
    rmse = float(((dec.astype(float) - grad.astype(float)) ** 2).mean()) ** 0.5
    assert dec.shape == grad.shape and rmse < 4.0
    # Grayscale single-component scan.
    g = (x * 5 % 256).astype(np.uint8)
    dg = MC.decode_jpeg(MC.encode_jpeg(g, 85))
    assert dg.shape == (40, 56, 1)
    # Odd (non-multiple-of-8) dimensions crop correctly.
    assert MC.decode_jpeg(MC.encode_jpeg(grad[:13, :19], 95)).shape == (13, 19, 3)


def test_jpeg_420_subsampling_decodes():
    """4:2:0 exercises the general MCU loop (2x2 luma blocks per MCU) and
    chroma upsampling in the decoder."""
    import numpy as np

    y, x = np.mgrid[0:37, 0:53]
    img = np.stack([(x * 4) % 256, (y * 6) % 256, ((x + y) * 3) % 256], -1).astype(np.uint8)
    dec = MC.decode_jpeg(MC.encode_jpeg(img, 90, subsample=True))
    rmse = float(((dec.astype(float) - img.astype(float)) ** 2).mean()) ** 0.5
    assert dec.shape == img.shape and rmse < 8.0
    solid = np.full((20, 20, 3), 200, np.uint8)
    assert (MC.decode_jpeg(MC.encode_jpeg(solid, 90, subsample=True)) == solid).all()


def test_jpeg_corrupt_and_unsupported_raise():
    import numpy as np

    jpg = MC.encode_jpeg(np.full((16, 16, 3), 99, np.uint8), 80)
    with pytest.raises(ValueError):
        MC.decode_jpeg(b"\xff\xd8garbage")
    with pytest.raises(ValueError):
        MC.decode_jpeg(jpg[:40])  # truncated mid-tables
    with pytest.raises(ValueError):
        MC.decode_image(b"neither png nor jpeg")
    # Progressive (SOF2) is declared out of scope.
    prog = bytearray(jpg)
    sof_at = prog.find(b"\xff\xc0")
    prog[sof_at + 1] = 0xC2
    with pytest.raises(ValueError):
        MC.decode_jpeg(bytes(prog))


def test_real_image_features_through_spark(spark):
    import numpy as np

    white = np.full((8, 4, 3), 255, np.uint8)
    dark = np.zeros((2, 2, 3), np.uint8)
    mid = np.full((10, 6, 3), 128, np.uint8)
    rows = [
        (1, MC.encode_png(white)),
        (2, MC.encode_png(dark)),
        (3, b"not a png"),
        (4, MC.encode_jpeg(mid, 90)),  # JPEG through the same dispatch
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: r for r in M.decode_image_features(df).collect()}
    assert (got[1]["width"], got[1]["height"], got[1]["n_channels"]) == (4, 8, 3)
    assert got[1]["mean_luma"] == pytest.approx(1.0, abs=1e-6)
    assert got[2]["mean_luma"] == pytest.approx(0.0, abs=1e-6)
    assert got[3]["width"] is None
    assert (got[4]["width"], got[4]["height"], got[4]["n_channels"]) == (6, 10, 3)
    assert got[4]["mean_luma"] == pytest.approx(128 / 255, abs=0.01)


def test_real_resize_through_spark(spark):
    import numpy as np

    # 2x2 checkerboard scaled to 4x4 by nearest neighbor
    src = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]], np.uint8
    )
    df = spark.createDataFrame([(1, MC.encode_png(src))], "media_id long, payload binary")
    out = M.resize_images(df, width=4, height=4).collect()[0]
    arr = MC.decode_png(bytes(out["payload"]))
    assert arr.shape == (4, 4, 3)
    assert (arr[0, 0] == [255, 0, 0]).all() and (arr[0, 1] == [255, 0, 0]).all()
    assert (arr[3, 3] == [255, 255, 255]).all()


def test_real_wav_features_through_spark(spark):
    import io
    import math
    import struct
    import wave

    # 0.5 s of a 440 Hz half-scale sine at 8 kHz, stdlib-written
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        for i in range(4000):
            v = int(16383 * math.sin(2 * math.pi * 440 * i / 8000))
            f.writeframes(struct.pack("<h", v))
    df = spark.createDataFrame(
        [(1, buf.getvalue()), (2, b"junk")], "media_id long, payload binary"
    )
    got = {r["media_id"]: r for r in M.decode_audio_features(df).collect()}
    assert got[1]["n_samples"] == 4000 and got[1]["sample_rate"] == 8000
    assert got[1]["duration_s"] == pytest.approx(0.5)
    # RMS of a half-scale sine is 0.5/sqrt(2)
    assert got[1]["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)
    assert got[2]["n_samples"] is None


def test_fake_decode_deterministic(media):
    a = sorted(M.decode_image_features(media, fake=True).collect(), key=lambda r: r["media_id"])
    b = sorted(M.decode_image_features(media, fake=True).collect(), key=lambda r: r["media_id"])
    assert a == b
    assert all(r["width"] >= 16 and r["n_channels"] == 3 and 0 <= r["mean_luma"] <= 1 for r in a)


def test_frame_sample_fanout(media):
    frames = M.sample_frames(media, every_n_bytes=64, max_frames=4, fake=True)
    rows = frames.collect()
    assert len(rows) > 20  # fan-out: more frames than media rows
    per_media = {}
    for r in rows:
        per_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    for idxs in per_media.values():
        assert sorted(idxs) == list(range(len(idxs)))  # contiguous frame indices


def test_metadata_query_prunes_payload(media):
    # Metadata-only query must not read the payload column (column pruning).
    q = media.select("media_id", "meta.byte_len")
    plan = q.queryExecution if hasattr(q, "queryExecution") else None
    explained = q._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in explained


def test_resize_images_fixed_buffer(spark, sf_smoke):
    from kafka_streaming_polymarket_pipeline_spark.operators import multimodal as M
    from kafka_streaming_polymarket_pipeline_spark.tables import load

    media = M.media_table_from_documents(load(spark, sf_smoke, "documents").limit(10))
    out = M.resize_images(media, width=8, height=8, fake=True).collect()
    assert len(out) == 10
    assert all(len(r.payload) == 8 * 8 * 3 for r in out)
    assert all(r.width == 8 and r.height == 8 for r in out)


def test_resize_images_quarantines_undecodable(spark, sf_smoke):
    # Real path on non-PNG bytes: null output payload, stage doesn't fail.
    from kafka_streaming_polymarket_pipeline_spark.operators import multimodal as M
    from kafka_streaming_polymarket_pipeline_spark.tables import load

    media = M.media_table_from_documents(load(spark, sf_smoke, "documents").limit(1))
    rows = M.resize_images(media, fake=False).collect()
    assert len(rows) == 1 and rows[0].payload is None


# ---------------------------------------------------------------------------
# Real video: MJPEG-in-AVI container round-trip + Spark frame pipeline.
# ---------------------------------------------------------------------------


def _gradient_frames(n=5, size=16):
    import numpy as np

    frames = []
    for k in range(n):
        base = np.linspace(0, 255, size * size * 3) % 256
        arr = ((base + 37 * k) % 256).astype(np.uint8).reshape(size, size, 3)
        frames.append(arr)
    return frames


def test_avi_mjpeg_container_roundtrip():
    import numpy as np

    frames = _gradient_frames(5)
    avi = MC.encode_avi_mjpeg(frames, fps=8)
    payloads, meta = MC.decode_avi(avi)
    assert meta["width"] == 16 and meta["height"] == 16
    assert meta["n_frames"] == 5 and abs(meta["fps"] - 8.0) < 0.01
    assert len(payloads) == 5
    for p, orig in zip(payloads, frames):
        arr = MC.decode_jpeg(p)
        assert arr.shape == orig.shape
        # per-frame pixels survive within JPEG quantization error
        assert np.abs(arr.astype(int) - orig.astype(int)).mean() < 4.0


def test_decode_avi_rejects_non_avi():
    with pytest.raises(ValueError):
        MC.decode_avi(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        MC.decode_avi(b"not a riff at all")


def test_real_frame_sampling_through_spark(spark):
    """1 video row in -> stride-sampled real JPEG frame rows out, then
    per-frame pixel features; a corrupt payload quarantines as one
    null-frame row without failing the stage."""
    import numpy as np

    avi = MC.encode_avi_mjpeg(_gradient_frames(6), fps=4)
    rows = [(1, "video", bytearray(avi), ("t", len(avi), "video/x-msvideo")),
            (2, "video", bytearray(b"garbage-not-a-container"), ("t", 23, "video/x-msvideo"))]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    frames = M.sample_frames(media, frame_stride=2, max_frames=8).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    assert sorted(r["frame_idx"] for r in by_id[1]) == [0, 2, 4]
    assert by_id[2][0]["frame_bytes"] is None
    # sampled bytes are the container's own frame payloads, decodable JPEGs
    originals = _gradient_frames(6)
    feats = M.decode_frame_features(M.sample_frames(media, frame_stride=2)).collect()
    feats_by_key = {(r["media_id"], r["frame_idx"]): r for r in feats}
    for idx in (0, 2, 4):
        r = feats_by_key[(1, idx)]
        assert (r["width"], r["height"]) == (16, 16)
        want = float(
            (0.299 * originals[idx][..., 0] + 0.587 * originals[idx][..., 1]
             + 0.114 * originals[idx][..., 2]).mean() / 255.0
        )
        assert abs(r["mean_luma"] - want) < 0.02
    assert feats_by_key[(2, 0)]["width"] is None


def test_video_table_from_documents_real_containers(spark, sf_smoke):
    docs = load(spark, sf_smoke, "documents").limit(5)
    vids = M.video_table_from_documents(docs, n_frames=3, size=16)
    rows = vids.collect()
    assert len(rows) == 5
    for r in rows:
        payloads, meta = MC.decode_avi(bytes(r["payload"]))
        assert meta["n_frames"] == 3
        assert r["meta"]["mime"] == "video/x-msvideo"
        assert r["meta"]["byte_len"] == len(r["payload"])
        arr = MC.decode_jpeg(payloads[0])
        assert arr.shape == (16, 16, 3)


# ---------------------------------------------------------------------------
# Property tests (hypothesis): codec round-trips and truncation robustness.
# Pure-Python codec paths — no Spark session involved, so these stay fast.
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HYP = True
except ImportError:  # pragma: no cover
    _HYP = False

if _HYP:

    @settings(max_examples=20, deadline=None)
    @given(
        st.integers(min_value=1, max_value=3),
        st.integers(min_value=8, max_value=24),
        st.integers(min_value=8, max_value=24),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def test_prop_avi_roundtrip_any_dims(n_frames, w, h, seed):
        """Any frame count/dimensions (even/odd, non-square) must survive
        encode_avi_mjpeg -> decode_avi -> decode_jpeg with the right
        shapes and frame order."""
        import numpy as np

        rng = np.random.default_rng(seed)
        frames = [rng.integers(0, 256, (h, w, 3), dtype=np.uint8) for _ in range(n_frames)]
        payloads, meta = MC.decode_avi(MC.encode_avi_mjpeg(frames, fps=3))
        assert meta["n_frames"] == n_frames and (meta["width"], meta["height"]) == (w, h)
        for p, orig in zip(payloads, frames):
            assert MC.decode_jpeg(p).shape == orig.shape

    @settings(max_examples=30, deadline=None)
    @given(st.integers(min_value=0, max_value=2**32 - 1), st.data())
    def test_prop_avi_truncation_never_crashes(seed, data):
        """decode_avi on any prefix of a valid file either raises
        ValueError or returns well-formed frames — never an unhandled
        exception (the quarantine contract of sample_frames depends on
        this)."""
        import numpy as np

        rng = np.random.default_rng(seed)
        frames = [rng.integers(0, 256, (8, 8, 3), dtype=np.uint8) for _ in range(2)]
        avi = MC.encode_avi_mjpeg(frames, fps=2)
        cut = data.draw(st.integers(min_value=0, max_value=len(avi)))
        try:
            payloads, meta = MC.decode_avi(avi[:cut])
        except ValueError:
            return
        assert isinstance(payloads, list) and meta["n_frames"] == len(payloads)

    @settings(max_examples=15, deadline=None)
    @given(
        st.integers(min_value=1, max_value=40),
        st.integers(min_value=1, max_value=40),
        st.sampled_from([1, 3]),
        st.integers(min_value=0, max_value=2**32 - 1),
    )
    def test_prop_png_roundtrip_bit_exact(w, h, ch, seed):
        import numpy as np

        rng = np.random.default_rng(seed)
        arr = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        if ch == 1:
            arr = arr[..., 0]
        back = MC.decode_png(MC.encode_png(arr))
        assert np.array_equal(back.squeeze(), arr.squeeze())
