"""F1-F15 scalar-function surface (SURVEY §2.7) + hypothesis property tests
for the engine-portable fingerprint functions."""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark import functions as EF
from kafka_streaming_polymarket_pipeline_spark.operators.text import FP_BASE, FP_MOD


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


def test_scalar_battery(spark):
    df = spark.createDataFrame(
        [("Bitcoin Up or Down?", "3.14", "7", "2026-01-25T19:45:00Z", 0),
         ("ETH market", "2.71", "9", "2026-01-25T20:00:00+00:00", 1)],
        "question string, d string, l string, ts string, oi int",
    )
    out = df.select(
        EF.contains_any(F.col("question"), "bitcoin", "btc").alias("is_btc"),
        EF.to_double(F.col("d")).alias("d"),
        EF.to_long(F.col("l")).alias("l"),
        EF.parse_iso_ts(F.col("ts")).alias("ts"),
        EF.decode_outcome(F.col("oi")).alias("outcome"),
        EF.plus_minutes(EF.parse_iso_ts(F.col("ts")), 15).alias("end_ts"),
    ).collect()
    assert [r.is_btc for r in out] == [True, False]
    assert out[0].d == 3.14 and out[0].l == 7
    assert out[0].outcome == "YES" and out[1].outcome == "NO"
    assert (out[0].end_ts - out[0].ts).total_seconds() == 900


def test_json_roundtrip_and_field(spark):
    df = spark.createDataFrame([("m1", 0.52)], "market_id string, yes double")
    ser = df.select(EF.serialize_json(F.col("market_id"), F.col("yes")).alias("payload"))
    row = ser.select(
        EF.json_field(F.col("payload"), "market_id").alias("mid"),
        EF.truncate(F.col("payload"), 10).alias("trunc"),
    ).collect()[0]
    assert row.mid == "m1"
    assert len(row.trunc) == 10
    assert json.loads(ser.collect()[0].payload) == {"market_id": "m1", "yes": 0.52}


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=60))
def test_rolling_hash_matches_python(spark, s):
    """Property: the Spark fold equals the reference polynomial hash."""
    expected = 0
    for ch in s:
        expected = (expected * FP_BASE + ord(ch)) % FP_MOD
    got = _one(spark, EF.rolling_hash(F.lit(s)))
    assert got == expected


@settings(max_examples=20, deadline=None)
@given(st.text(alphabet="ab ", min_size=0, max_size=40))
def test_token_count_matches_python(spark, s):
    assert _one(spark, EF.token_count(F.lit(s))) == len([t for t in s.split(" ") if t])


@settings(max_examples=15, deadline=None)
@given(st.text(alphabet="abcde", min_size=0, max_size=30))
def test_char_shingles_distinct_ngrams(spark, s):
    got = _one(spark, EF.char_shingles(F.lit(s), 3))
    expected = list(dict.fromkeys(s[i:i + 3] for i in range(max(len(s) - 2, 0))))
    assert got == expected
