"""Streaming quality gate: the stateless classifier/entropy plan must
produce BIT-IDENTICAL output over a readStream micro-batch drain and a
plain batch read of the same files, and the keep/quarantine split must
partition the corpus exactly."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as ST

from kafka_streaming_polymarket_pipeline_spark.streaming import jobs
from kafka_streaming_polymarket_pipeline_spark.streaming import quality_stream as QS

DOC_SCHEMA = ST.StructType(
    [
        ST.StructField("doc_id", ST.LongType()),
        ST.StructField("text", ST.StringType()),
        ST.StructField("lang", ST.StringType()),
        ST.StructField("source", ST.StringType()),
        ST.StructField("n_chars", ST.LongType()),
    ]
)

ROWS = [
    (0, "the quick brown fox jumps over the lazy dog near the river bank", "en", "web", 63),
    (1, "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa", "en", "web", 32),  # low entropy -> quarantine
    (2, "el rapido zorro marron salta sobre el perro perezoso hoy mismo", "es", "web", 62),
    (3, "xxxxxyyyyyxxxxxyyyyyxxxxxyyyyy", "en", "spam", 30),  # 1 bit/char -> quarantine
    (4, "streaming quality gates reject gibberish before dedup costs start", "en", "docs", 65),
]


def _write_src(spark, path):
    df = spark.createDataFrame(ROWS, DOC_SCHEMA)
    df.coalesce(1).write.parquet(str(path))


def test_stream_equals_batch_and_split_partitions(spark, tmp_path):
    src = tmp_path / "docs"
    _write_src(spark, src)

    batch = QS.quality_features_frame(spark.read.schema(DOC_SCHEMA).parquet(str(src)))
    stream_in = spark.readStream.schema(DOC_SCHEMA).parquet(str(src))
    streamed = jobs.run_available_now(
        QS.quality_features_frame(stream_in), "quality_stream_out", spark
    )

    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in streamed.collect())
    assert b == s, "streaming micro-batch output differs from the batch run"

    kept, quarantined = QS.quality_split(
        spark.read.schema(DOC_SCHEMA).parquet(str(src))
    )
    k_ids = {r.doc_id for r in kept.collect()}
    q_ids = {r.doc_id for r in quarantined.collect()}
    assert k_ids | q_ids == {0, 1, 2, 3, 4}
    assert not (k_ids & q_ids)
    assert {1, 3} <= q_ids, "repetitive junk must be quarantined by the entropy floor"


def test_entropy_floor_is_the_binding_gate_for_junk(spark):
    df = spark.createDataFrame(
        [(1, "abababababababab", "en", "x", 16)], DOC_SCHEMA
    )
    out = QS.quality_features_frame(df).collect()[0]
    assert out.char_entropy_bits == 1.0
    assert not out.keep
