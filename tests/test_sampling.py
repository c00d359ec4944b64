"""Semantics tests for deterministic split/sampling operators: exact
per-stratum counts, reproducibility, and stratum-salt decorrelation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import sampling as S


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_hash_split_is_deterministic_and_total(corpus):
    a = {r["doc_id"]: r["split"] for r in S.hash_split(corpus).collect()}
    b = {r["doc_id"]: r["split"] for r in S.hash_split(corpus).collect()}
    assert a == b and len(a) == 300
    # 80/10/10 within coarse tolerance at n=300
    n_train = sum(1 for s in a.values() if s == "train")
    assert 0.7 * 300 < n_train < 0.9 * 300


def test_hash_split_stratum_salt_decorrelates(spark):
    # Same ids, two strata: assignments must differ for some ids (the salt
    # makes split(doc, en) independent of split(doc, de)).
    df_en = spark.createDataFrame([(i, "en") for i in range(200)], "doc_id long, lang string")
    df_de = spark.createDataFrame([(i, "de") for i in range(200)], "doc_id long, lang string")
    en = {r["doc_id"]: r["split"] for r in S.hash_split(df_en).collect()}
    de = {r["doc_id"]: r["split"] for r in S.hash_split(df_de).collect()}
    assert any(en[i] != de[i] for i in range(200))


def test_stratified_exact_sample_counts(corpus):
    for frac in (0.1, 0.25):
        got = S.stratified_exact_sample(corpus, frac).groupBy("lang").count().collect()
        per = {r["lang"]: r["count"] for r in got}
        assert per == {lang: math.ceil(frac * 100) for lang in ("en", "de", "fr")}


def test_stratified_sample_is_nested(corpus):
    # A smaller fraction's sample is a prefix (subset) of a larger one —
    # hash-order selection gives monotone samples, which incremental
    # dataset builds rely on.
    small = {tuple(r) for r in S.stratified_exact_sample(corpus, 0.1).collect()}
    big = {tuple(r) for r in S.stratified_exact_sample(corpus, 0.3).collect()}
    assert small < big


def test_mixture_sample_exact_per_stratum_rates(corpus):
    # 100 docs per lang: en keeps all 100, de ceil(25), fr default-rate 10.
    got = S.mixture_sample(
        corpus, rates={"en": 1.0, "de": 0.25}, default_rate=0.1
    )
    counts = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert counts == {"en": 100, "de": 25, "fr": 10}
    # deterministic: same rows both runs
    again = S.mixture_sample(corpus, rates={"en": 1.0, "de": 0.25}, default_rate=0.1)
    assert got.exceptAll(again).count() == 0


def test_mixture_sample_zero_default_drops_unlisted(corpus):
    got = S.mixture_sample(corpus, rates={"en": 0.5})
    langs = {r["lang"] for r in got.select("lang").distinct().collect()}
    assert langs == {"en"}
    assert got.count() == 50


def test_unimax_budget_water_filling_math(spark, tmp_path):
    """Planted sizes 10/20/30/100, budget 0.8*160=128: the three tail
    languages cap at 1 epoch; the head gets the leftover fill of 68 docs
    (0.68 epochs). Verifies the integer cap decision AND the fill level
    against hand-computed water-filling."""
    import os

    from kafka_streaming_polymarket_pipeline_spark.plans.registry import get

    rows = []
    i = 0
    for lang, n in (("aa", 10), ("bb", 20), ("cc", 30), ("dd", 100)):
        for _ in range(n):
            rows.append((i, lang, f"doc {i} text"))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "documents.parquet"))

    got = {
        r["lang"]: r
        for r in get("x6_unimax_budget").builder(spark, str(tmp_path)).collect()
    }
    assert {k: v["capped"] for k, v in got.items()} == {
        "aa": True, "bb": True, "cc": True, "dd": False
    }
    assert got["aa"]["alloc_docs"] == 10.0 and got["aa"]["epochs"] == 1.0
    assert got["cc"]["alloc_docs"] == 30.0
    assert got["dd"]["alloc_docs"] == 68.0  # 128 - (10+20+30)
    assert got["dd"]["epochs"] == 0.68


def test_x10_override_actually_fires(spark):
    """The contamination override must be live on the driver corpus: at
    least one contaminated doc's hash bucket would have sent it to
    validation/test, and x10 forces it to train."""
    from kafka_streaming_polymarket_pipeline_spark.plans import get

    # sf0.01: the SF where contaminated docs exist whose hash bucket
    # would have left train (sf0.001 has 5 contaminated, all bucket<80)
    from tests.conftest import SF_CORRECT

    out = get("x10_decontam_split").builder(spark, SF_CORRECT)
    rows = out.collect()
    contaminated = [r for r in rows if r["contaminated"]]
    assert contaminated, "driver corpus has no benchmark collisions?"
    assert all(r["split"] == "train" for r in contaminated)
    # the override changed at least one assignment vs the raw hash split
    from kafka_streaming_polymarket_pipeline_spark.operators.sampling import (
        split_bucket,
    )
    from pyspark.sql import functions as F

    raw = {
        r["doc_id"]: r["b"]
        for r in out.sparkSession.read.parquet(
            f"{SF_CORRECT}/documents.parquet"
        )
        .select("doc_id", split_bucket(F.col("doc_id"), F.col("lang")).alias("b"))
        .collect()
    }
    assert any(raw[r["doc_id"]] >= 80 for r in contaminated), (
        "no contaminated doc would have left train — override untested"
    )
    # uncontaminated docs keep their x1 assignment exactly
    for r in rows:
        if not r["contaminated"]:
            b = raw[r["doc_id"]]
            want = "train" if b < 80 else ("validation" if b < 90 else "test")
            assert r["split"] == want


def test_repeat_capped_alloc_math(spark, tmp_path):
    """x12 on planted skewed languages: a 3x-token budget with a 4-epoch
    cap must cap the temperature-BOOSTED tail language (its softened
    weight demands > 4 epochs of its tiny unique supply) while the head
    water-fills below 4; the capped language gets exactly 4.0 epochs,
    total allocation returns the full budget within rounding, and every
    epochs value is <= 4."""
    import os

    from kafka_streaming_polymarket_pipeline_spark.plans.registry import get

    rows, i = [], 0
    # head 'en': 200 docs x 10 tokens; tail 'xx': 5 docs x 10 tokens
    for lang, n in (("en", 200), ("xx", 5)):
        for _ in range(n):
            rows.append((i, lang, " ".join(f"w{i}k{k}" for k in range(10))))
            i += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    df.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "documents.parquet"))

    got = {
        r["lang"]: r
        for r in get("x12_repeat_capped_alloc").builder(spark, str(tmp_path)).collect()
    }
    assert got["xx"]["capped"] and got["xx"]["epochs"] == 4.0
    assert got["xx"]["alloc_tok"] == 4.0 * got["xx"]["n_tok"]
    assert not got["en"]["capped"] and got["en"]["epochs"] <= 4.0
    total_tok = sum(r["n_tok"] for r in got.values())
    total_alloc = sum(r["alloc_tok"] for r in got.values())
    assert abs(total_alloc - 3 * total_tok) < 1e-3, (total_alloc, 3 * total_tok)
