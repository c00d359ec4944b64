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


def test_pii_redaction_planted(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@example.co.uk now or call 555-123-4567 ok"),
            (2, "ssn 123-45-6789 from host 192.168.1.254 end"),
            (3, "dotted phone 555.123.4567 and plain text"),
            (4, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    counts = T.pii_counts(F.col("text"))
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            *[c.alias(f"n_{k}") for k, c in counts.items()],
            T.redact_pii(F.col("text")).alias("red"),
        ).collect()
    }
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert out[1]["red"] == "mail <EMAIL> now or call <PHONE> ok"
    assert out[2]["n_ssn"] == 1 and out[2]["n_ipv4"] == 1
    assert out[2]["red"] == "ssn <SSN> from host <IP> end"
    assert out[3]["n_phone"] == 1 and "<PHONE>" in out[3]["red"]
    assert out[4]["red"] == "no pii here at all"
    assert all(out[4][f"n_{k}"] == 0 for k in ("email", "ssn", "phone", "ipv4"))


def test_pii_ssn_not_double_counted_as_phone(spark):
    # SSN (3-2-4) must not match the phone pattern (3-3-4); a full phone
    # must not be eaten by the IP pattern.
    df = spark.createDataFrame([(1, "123-45-6789 and 123-456-7890")], "doc_id long, text string")
    counts = T.pii_counts(F.col("text"))
    r = df.select(*[c.alias(f"n_{k}") for k, c in counts.items()],
                  T.redact_pii(F.col("text")).alias("red")).first()
    assert r["n_ssn"] == 1 and r["n_phone"] == 1 and r["n_ipv4"] == 0
    assert r["red"] == "<SSN> and <PHONE>"


def test_repetition_features_detect_loops(spark):
    df = spark.createDataFrame(
        [
            (1, "spam ham " * 20 + "spam ham"),   # heavy 2-gram loop
            (2, "one two three four five six seven eight"),  # all distinct
        ],
        "doc_id long, text string",
    )
    f = T.repetition_features(F.col("text"))
    out = {r["doc_id"]: r for r in df.select("doc_id", *[v.alias(k) for k, v in f.items()]).collect()}
    loop, clean = out[1], out[2]
    assert loop["dup_word_frac"] > 0.9 and loop["dup_2gram_frac"] > 0.9
    assert loop["top_word_frac"] == pytest.approx(21 / 42)
    assert clean["dup_word_frac"] == 0.0 and clean["dup_2gram_frac"] == 0.0
    assert clean["top_word_frac"] == pytest.approx(1 / 8)


def test_winnowing_coverage_property(spark):
    """The winnowing guarantee (Schleimer et al. SIGMOD 2003): every
    window of w consecutive k-grams contains at least one selected
    fingerprint position."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    k, w = 5, 4

    @settings(max_examples=8, deadline=None)
    @given(st.text(alphabet="abcd ", min_size=k + w - 1, max_size=120))
    def check(s):
        df = spark.createDataFrame([(1, s)], "doc_id long, text string")
        pos = sorted(
            r.pos for r in T.winnow_fingerprints(df, k=k, w=w).collect()
        )
        n_grams = len(s) - (k - 1)
        for start in range(1, n_grams - w + 2):
            assert any(start <= p <= start + w - 1 for p in pos), (s, start, pos)

    check()


def test_span_scrub_removes_shared_spans_keeps_unique(spark):
    """t14 semantics: a span whose 8-gram appears in >= 3 docs is dropped
    from every doc (case-insensitively matched, original case emitted);
    unique text survives; a doc that is ONLY the shared span empties."""
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        (1, f"INTRO {shared} outro one"),
        (2, f"{shared.upper()} tail two"),
        (3, f"pre {shared}"),
        (4, "totally unique text with no duplicated span at all here"),
        (5, shared),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in T.scrub_duplicated_spans(df, n=8, min_df=3).collect()}
    assert got[1].text_clean == "INTRO outro one"
    assert got[2].text_clean == "tail two"
    assert got[3].text_clean == "pre"
    assert got[4].text_clean == rows[3][1] and got[4].n_removed == 0
    assert got[5].text_clean == "" and got[5].n_removed == got[5].n_tokens == 8
    assert got[1].n_tokens == 11 and got[1].n_removed == 8


def test_span_scrub_below_min_df_untouched(spark):
    shared = "a b c d e f g h"
    df = spark.createDataFrame(
        [(1, f"x {shared}"), (2, f"y {shared}")], "doc_id long, text string"
    )  # only 2 docs share it; min_df=3 -> keep everything
    got = {r.doc_id: r for r in T.scrub_duplicated_spans(df, n=8, min_df=3).collect()}
    assert got[1].n_removed == 0 and got[2].n_removed == 0


def test_passage_chunks_window_math(spark):
    """len<=size -> one clamped chunk; len=size -> exactly one; one token
    past a stride boundary -> a new (overlapping) final chunk; empty doc
    -> no chunks. Every token must appear in at least one chunk."""
    from kafka_streaming_polymarket_pipeline_spark.operators.text import passage_chunks

    def doc(n):
        return " ".join(f"w{i}" for i in range(n))

    df = spark.createDataFrame(
        [(0, doc(5)), (1, doc(32)), (2, doc(33)), (3, doc(56)), (4, doc(57)), (5, "")],
        "doc_id long, text string",
    )
    rows = passage_chunks(df, size=32, stride=24).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 5 not in by_doc  # empty doc -> no chunks
    assert [c["n_tokens"] for c in sorted(by_doc[0], key=lambda c: c["chunk_idx"])] == [5]
    assert [c["n_tokens"] for c in sorted(by_doc[1], key=lambda c: c["chunk_idx"])] == [32]
    assert [c["n_tokens"] for c in sorted(by_doc[2], key=lambda c: c["chunk_idx"])] == [32, 9]
    # len 56: chunks at 1..32 and 25..56 cover everything; 57 needs a third
    assert [c["n_tokens"] for c in sorted(by_doc[3], key=lambda c: c["chunk_idx"])] == [32, 32]
    assert [c["n_tokens"] for c in sorted(by_doc[4], key=lambda c: c["chunk_idx"])] == [32, 32, 9]
    # coverage: last token of each doc appears in its final chunk
    for d, n in ((0, 5), (2, 33), (4, 57)):
        last = sorted(by_doc[d], key=lambda c: c["chunk_idx"])[-1]
        assert last["chunk_text"].split(" ")[-1] == f"w{n-1}"


def test_passage_chunks_rejects_bad_stride(spark):
    from kafka_streaming_polymarket_pipeline_spark.operators.text import passage_chunks

    df = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        passage_chunks(df, size=8, stride=0)
    with pytest.raises(ValueError):
        passage_chunks(df, size=8, stride=9)
