"""Multimodal plumbing tests: binary payload schema, Arrow-batched decode
stub, frame-sample fan-out. The real decode is stubbed (no media libs in
this environment) — these tests pin the Spark-side shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import multimodal as M
from kafka_streaming_polymarket_pipeline_spark.tables import load


@pytest.fixture(scope="module")
def media(spark, sf_smoke):
    return M.media_table_from_documents(load(spark, sf_smoke, "documents").limit(20))


def test_media_schema_and_metadata(media):
    assert [f.name for f in media.schema.fields] == ["media_id", "media_type", "payload", "meta"]
    row = media.filter(F.col("media_id") == 0).collect()[0]
    assert isinstance(row["payload"], (bytes, bytearray))
    assert row["meta"]["byte_len"] == len(row["payload"])


def test_decode_stub_raises_without_fake(media):
    with pytest.raises(Exception) as exc_info:
        M.decode_image_features(media, fake=False).collect()
    assert "NotImplementedError" in str(exc_info.value) or "image decode" in str(exc_info.value)


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


def test_resize_images_real_decode_raises(spark, sf_smoke):
    import pytest as _pytest

    from kafka_streaming_polymarket_pipeline_spark.operators import multimodal as M
    from kafka_streaming_polymarket_pipeline_spark.tables import load

    media = M.media_table_from_documents(load(spark, sf_smoke, "documents").limit(1))
    with _pytest.raises(Exception):  # NotImplementedError surfaces as PythonException
        M.resize_images(media, fake=False).collect()
