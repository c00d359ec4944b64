"""Semantic tests for BPE vocabulary learning (oracle parity is the
battery's job; these prove the merge semantics on planted corpora)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import bpe as B


def _vocab(spark, words: dict[str, int]):
    return spark.createDataFrame(list(words.items()), "word string, wc long")


def test_merge_pair_greedy_left_to_right(spark):
    df = spark.createDataFrame(
        [("a a a",), ("a b a b",), ("a a a a a",), ("x",)], "seg string"
    )
    got = [r[0] for r in df.select(B.merge_pair(F.col("seg"), "a", "a")).collect()]
    assert got[0] == "aa a" and got[2] == "aa aa a" and got[3] == "x"
    got2 = df.select(B.merge_pair(F.col("seg"), "a", "b")).collect()
    assert got2[1][0] == "ab ab"


def test_learn_bpe_classic_example(spark):
    # Sennrich-style toy: 'low' x5, 'lower' x2 -> first merges build 'lo', 'low'.
    vocab = _vocab(spark, {"low": 5, "lower": 2})
    segmented, rules = B.learn_bpe(vocab, 3)
    assert [(a, b) for a, b, _ in rules] == [("l", "o"), ("lo", "w"), ("e", "r")]
    segs = {r["word"]: r["seg"] for r in segmented.collect()}
    assert segs["low"] == "low"
    assert segs["lower"] == "low er"


def test_learn_bpe_tie_break_deterministic(spark):
    # 'ab' and 'cd' both count 3: lexicographic tie-break picks (a,b) first.
    vocab = _vocab(spark, {"ab": 3, "cd": 3})
    _, rules = B.learn_bpe(vocab, 2)
    assert [(a, b) for a, b, _ in rules] == [("a", "b"), ("c", "d")]


def test_learn_bpe_stops_when_fully_merged(spark):
    vocab = _vocab(spark, {"ab": 1})
    segmented, rules = B.learn_bpe(vocab, 10)
    assert len(rules) == 1
    assert segmented.first()["n_symbols"] == 1


def test_bpe_token_counts(spark):
    docs = spark.createDataFrame(
        [(1, "low low lower"), (2, "lower")], "doc_id long, text string"
    )
    segmented, _ = B.learn_bpe(B.word_vocab(docs), 2)  # learns l+o, lo+w
    counts = {r["doc_id"]: r["n_bpe_tokens"] for r in B.bpe_token_counts(docs, segmented).collect()}
    # low -> 'low' (1 symbol); lower -> 'low e r' (3 symbols)
    assert counts == {1: 1 + 1 + 3, 2: 3}
