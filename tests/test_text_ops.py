"""Semantic tests for tokenization and winnowing fingerprints (oracle
parity is the battery's job; these prove the documented guarantees)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import text as T


def test_bpe_tokens_split_classes(spark):
    df = spark.createDataFrame([("don't add 42 tokens!",)], "text string")
    got = df.select(T.bpe_tokens(F.col("text")).alias("t")).first()["t"]
    assert got == ["don", "'", "t", "add", "42", "tokens", "!"]
    ws = df.select(T.token_count(F.col("text"))).first()[0]
    assert ws == 4


def test_winnow_shared_substring_shares_fingerprint(spark):
    # Winnowing guarantee: any match of length >= w + k - 1 (= 8 here)
    # yields at least one common selected hash.
    common = "abcdefghijklmnop"  # length 16 shared run
    rows = [(1, "XXXX" + common + "YYYY"), (2, "QQ" + common + "ZZZZZZ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fps = T.winnow_fingerprints(df, k=5, w=4).collect()
    by_doc = {1: set(), 2: set()}
    for r in fps:
        by_doc[r["doc_id"]].add(r["fp"])
    assert by_doc[1] & by_doc[2]


def test_winnow_density_and_positions(spark):
    text = "the quick brown fox jumps over the lazy dog again and again" * 3
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    fps = T.winnow_fingerprints(df, k=5, w=4).collect()
    n_grams = len(text) - 4
    # Expected density ~ 2/(w+1) = 0.4; allow generous slack both ways.
    assert 0.1 * n_grams < len(fps) < 0.7 * n_grams
    assert all(1 <= r["pos"] <= n_grams for r in fps)
    # Deterministic across runs
    again = T.winnow_fingerprints(df, k=5, w=4).collect()
    assert sorted(map(tuple, fps)) == sorted(map(tuple, again))


def test_winnow_plan_is_shuffle_free(spark):
    # The scale property the implementation exists for: no Exchange anywhere
    # — fingerprints parallelize purely by input split.
    df = spark.createDataFrame([(1, "abcdefghij" * 5)], "doc_id long, text string")
    plan = T.winnow_fingerprints(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_split_plan_is_shuffle_free(spark):
    from kafka_streaming_polymarket_pipeline_spark.operators import sampling as S

    df = spark.createDataFrame([(1, "en")], "doc_id long, lang string")
    plan = S.hash_split(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_winnow_short_doc_excluded(spark):
    df = spark.createDataFrame([(1, "abcdefg")], "doc_id long, text string")  # len 7 < 8
    assert T.winnow_fingerprints(df, k=5, w=4).count() == 0


def test_token_ngrams_and_decontamination_semantics(spark):
    from kafka_streaming_polymarket_pipeline_spark.operators import text as T
    from pyspark.sql import functions as F

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (3, f"benchmark content {span} more words here"),       # benchmark (3 % 17 == 3)
        (1, f"training doc copying {span} verbatim"),           # contaminated
        (2, "completely different training text with no overlap at all ok"),
        (7, "short text"),                                      # < 8 tokens -> no grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    grams = df.select("doc_id", T.token_ngrams(F.col("text"), 8).alias("g")).collect()
    by_id = {r["doc_id"]: r["g"] for r in grams}
    assert by_id[7] == []
    assert span in by_id[1] and span in by_id[3]

    from kafka_streaming_polymarket_pipeline_spark.plans.registry import get
    import tempfile, os
    # run the registered builder against a temp parquet dir shaped like testdata
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["doc_id"]: (r["n_shared_ngrams"], r["contaminated"])
               for r in get("t8_decontamination").builder(spark, d).collect()}
    assert out[1][0] >= 1 and out[1][1] is True
    assert out[2] == (0, False)
    assert out[7] == (0, False)
    assert 3 not in out  # benchmark docs are not scored
