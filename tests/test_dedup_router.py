"""Executable routing contract for exact-Jaccard near-dup detection
(SCALE.md round 6: AllPairs degenerates on flat-DF corpora, near-linear
on long-tail text). The router must send each measured regime to the
right engine, and the sampled estimator must extrapolate to the full
reading."""

from __future__ import annotations

import numpy as np
import pytest

from kafka_streaming_polymarket_pipeline_spark.operators.dedup_router import (
    neardup_pairs_auto,
    neardup_route,
    neardup_route_stats,
)

VOCAB30 = [f"word{i}" for i in range(30)]


def _templated(spark, n=800, words=56, seed=3):
    rng = np.random.RandomState(seed)
    rows = [
        (i, " ".join(rng.choice(VOCAB30, size=words))) for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _longtail(spark, n=800, words=56, seed=4):
    rng = np.random.RandomState(seed)
    rows = [
        (
            i,
            " ".join(
                "".join(rng.choice(list("abcdefghijklmnopqrstuvwxyz"), size=8))
                for _ in range(words)
            ),
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_templated_corpus_routes_to_lsh(spark):
    route, stats = neardup_route(_templated(spark))
    # every doc contains ~all 30 vocab words -> DF ~ n, candidates/doc ~ 30n
    assert route == "lsh"
    assert stats["candidates_per_doc"] > 100 * stats["avg_tokens"]


def test_longtail_corpus_routes_to_allpairs(spark):
    route, stats = neardup_route(_longtail(spark))
    # 8-char random words: DF ~ 1 -> candidates/doc ~ avg_tokens
    assert route == "allpairs"
    assert stats["candidates_per_doc"] < 3 * stats["avg_tokens"]


def test_driver_corpus_routes_to_lsh(spark, sf_smoke):
    # Measured, not assumed: the testdata documents table is generated
    # from a finite vocabulary, so its DF is flat and GROWS with n
    # (flatness 164 at 500 docs -> 1657 at 5000) — the router sends it
    # to LSH, which the bench confirms is right there (d12 27.4 s vs
    # d3c 9.1 s at sf0.1). This corrects the r06 prose that assumed the
    # driver corpus was long-tail.
    from kafka_streaming_polymarket_pipeline_spark.tables import load

    route, stats = neardup_route(load(spark, sf_smoke, "documents"))
    assert route == "lsh"
    assert stats["df_flatness"] > 10


def _dup_corpus(spark, n=240, seed=5):
    """Moderate-vocab templated docs salted with near-copies: random
    pairs sit at token-Jaccard ~0.1 (40 draws from 200 words), each
    near-copy differs from its source by one word (~0.9) — threshold
    1/2 separates cleanly, and BOTH routes are feasible at this n."""
    rng = np.random.RandomState(seed)
    vocab = [f"w{i}" for i in range(200)]
    rows = []
    for i in range(n):
        words = [vocab[j] for j in rng.randint(0, 200, size=40)]
        rows.append((i, " ".join(words)))
        if i % 4 == 0:
            copy = list(words)
            copy[0] = f"zz{i}"
            rows.append((i + 10_000, " ".join(copy)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_both_routes_emit_identical_pairs(spark):
    docs = _dup_corpus(spark)
    ap, r_ap, _ = neardup_pairs_auto(docs, 1, 2, route="allpairs")
    ls, r_ls, _ = neardup_pairs_auto(docs, 1, 2, route="lsh")
    assert (r_ap, r_ls) == ("allpairs", "lsh")
    got_ap = {(r.doc_id_a, r.doc_id_b, r.jaccard) for r in ap.collect()}
    got_ls = {(r.doc_id_a, r.doc_id_b, r.jaccard) for r in ls.collect()}
    assert len(got_ap) >= 60  # the planted near-copies are all found
    assert got_ap == got_ls  # same pair set AND same jaccard values


def test_route_choice_drives_the_executed_plan(spark):
    # templated -> LSH leg: banded signatures in the plan, no df-ordered
    # prefix; long-tail -> AllPairs: prefix stage, no banding anywhere
    pairs, route, stats = neardup_pairs_auto(_templated(spark, n=300))
    assert route == "lsh" and stats["df_flatness"] > 10
    plan = pairs._jdf.queryExecution().analyzed().toString()
    assert "band_hash" in plan and "tdf" not in plan
    pairs, route, stats = neardup_pairs_auto(_longtail(spark, n=300))
    assert route == "allpairs" and stats["df_flatness"] < 10
    plan = pairs._jdf.queryExecution().analyzed().toString()
    assert "tdf" in plan and "band_hash" not in plan


def test_forced_route_skips_stats_and_validates(spark):
    docs = _longtail(spark, n=50)
    _, route, stats = neardup_pairs_auto(docs, route="lsh")
    assert route == "lsh" and stats == {"forced": True}
    with pytest.raises(ValueError, match="unknown route"):
        neardup_pairs_auto(docs, route="simhash")


def test_sampled_estimate_extrapolates_and_keeps_route(spark):
    docs = _templated(spark, n=2000)
    full = neardup_route_stats(docs)
    samp = neardup_route_stats(docs, sample_fraction=0.25)
    # extrapolated n and candidate mass land near the full reading
    assert abs(samp["n_docs"] - full["n_docs"]) < 0.25 * full["n_docs"]
    assert (
        0.5 * full["candidates_per_doc"]
        < samp["candidates_per_doc"]
        < 2.0 * full["candidates_per_doc"]
    )
    route_full, _ = neardup_route(docs)
    route_samp, _ = neardup_route(docs, sample_fraction=0.25)
    assert route_full == route_samp == "lsh"
