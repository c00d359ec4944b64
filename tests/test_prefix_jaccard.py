"""Dedicated tests for d12 — the AllPairs/PPJoin prefix-filtered EXACT
Jaccard self-join (``operators/dedup.py:prefix_jaccard_pairs``).

Three angles the oracle battery can't isolate on its own:

1. PIGEONHOLE property: the prefix-collision candidate set must be a
   SUPERSET of the qualifying-pair answer set on random corpora (the
   correctness core of prefix filtering — if a qualifying pair ever
   fails to share a prefix token, the algorithm silently drops it).
2. Templated-corpus contrast vs the naive quadratic all-pairs filter
   (the same shape d11's blocking-completeness test uses): exact same
   pair set AND exact same jaccard values.
3. Prefix-length edge cases: s - ceil(t*s) + 1 at tiny s (1- and
   2-token docs), threshold 1/1 (identical sets only), and a loose
   threshold where the prefix is nearly the whole doc.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators.dedup import (
    prefix_jaccard_candidates,
    prefix_jaccard_pairs,
)


def _naive_pairs(rows: list[tuple[int, str]], num: int, den: int):
    """Ground truth: all-pairs token-set Jaccard >= num/den, in exact
    integer arithmetic (no float threshold edge)."""
    sets = {i: set(t.lower().split()) - {""} for i, t in rows}
    out = {}
    for a in sets:
        for b in sets:
            if a >= b or not sets[a] or not sets[b]:
                continue
            i = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if den * i >= num * u:
                out[(a, b)] = round(i / u, 6)
    return out


def _random_corpus(rng: random.Random, n_docs: int, vocab: int, max_len: int):
    """Mix of templated near-dups and independent docs — the regime where
    prefix filtering earns its keep."""
    words = [f"w{i}" for i in range(vocab)]
    rows = []
    base = None
    for i in range(n_docs):
        if base is None or rng.random() < 0.4:
            base = rng.sample(words, rng.randint(1, max_len))
            rows.append((i, " ".join(base)))
        else:
            # mutate the previous template: drop/replace up to 2 tokens
            mut = list(base)
            for _ in range(rng.randint(0, 2)):
                if mut and rng.random() < 0.5:
                    mut.pop(rng.randrange(len(mut)))
                else:
                    mut.append(rng.choice(words))
            rows.append((i, " ".join(mut) if mut else rng.choice(words)))
    return rows


@pytest.mark.parametrize("seed,num,den", [(1, 7, 10), (2, 19, 20), (3, 1, 2)])
def test_pigeonhole_candidates_superset_of_answers(spark, seed, num, den):
    rng = random.Random(seed)
    rows = _random_corpus(rng, n_docs=30, vocab=25, max_len=8)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    _, cand = prefix_jaccard_candidates(df, num=num, den=den)
    got_cand = {(r["doc_id_a"], r["doc_id_b"]) for r in cand.collect()}
    want = set(_naive_pairs(rows, num, den))
    missing = want - got_cand
    assert not missing, f"pigeonhole violated: qualifying pairs not in candidates: {missing}"


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_templated_corpus_matches_naive(spark, seed):
    """Exact pair set AND exact rounded jaccard values vs the quadratic
    ground truth (the d11-style blocking-completeness contrast)."""
    rng = random.Random(seed)
    rows = _random_corpus(rng, n_docs=40, vocab=30, max_len=10)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(df, num=7, den=10).collect()
    }
    want = _naive_pairs(rows, 7, 10)
    assert got == want


def test_exact_duplicates_and_subthreshold(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon"),
        (1, "alpha beta gamma delta epsilon"),      # J=1 with 0
        (2, "alpha beta gamma delta zeta"),          # J=4/6=0.667 with 0: below 0.7
        (3, "ALPHA beta gamma delta epsilon"),       # lowercased: J=1 with 0,1
        (4, "totally different words here now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(df, num=7, den=10).collect()
    }
    assert got == {(0, 1): 1.0, (0, 3): 1.0, (1, 3): 1.0}


def test_prefix_length_edge_tiny_docs(spark):
    """s - ceil(t*s) + 1 at s=1 and s=2 must still be >= 1 (a zero-length
    slice would silently drop every tiny doc from candidacy)."""
    rows = [
        (0, "solo"),
        (1, "solo"),             # identical single-token docs: J=1
        (2, "duo trio"),
        (3, "duo trio"),         # identical 2-token docs: J=1
        (4, "duo"),              # J=1/2 with 2/3: below 19/20
        (5, "other"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # threshold 19/20: prefix length at s=1 is 1-1+1=1; at s=2 is 2-2+1=1
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(df, num=19, den=20).collect()
    }
    assert got == {(0, 1): 1.0, (2, 3): 1.0}


def test_threshold_one_means_identical_sets_only(spark):
    rows = [
        (0, "a b c"),
        (1, "c b a"),        # same set, different order: J=1
        (2, "a b c d"),      # superset: J=3/4 < 1
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(df, num=1, den=1).collect()
    }
    assert got == {(0, 1): 1.0}


def test_loose_threshold_prefix_is_whole_doc(spark):
    """num/den = 1/10: prefix length = s - ceil(s/10) + 1 ~ 0.9s; the
    algorithm must still match naive exactly (superset candidates are
    filtered by the exact verify, never admitted)."""
    rng = random.Random(99)
    rows = _random_corpus(rng, n_docs=25, vocab=12, max_len=6)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in prefix_jaccard_pairs(df, num=1, den=10).collect()
    }
    assert got == _naive_pairs(rows, 1, 10)


def test_df_ordering_rarest_tokens_lead_prefix(spark):
    """The per-doc token array must be sorted by (global df ASC, token) —
    the hub-avoidance property: a token shared by every doc sorts LAST
    and stays out of short prefixes."""
    rows = [
        (0, "common rare1"),
        (1, "common rare2"),
        (2, "common rare3"),
        (3, "common rare4"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    docs, cand = prefix_jaccard_candidates(df, num=19, den=20)
    toks = {r["did"]: r["toks"] for r in docs.collect()}
    for did, arr in toks.items():
        assert arr[0].startswith("rare"), (did, arr)
        assert arr[-1] == "common"
    # prefix length at s=2, t=19/20 is 1 -> prefixes are the rare tokens
    # -> zero candidates despite the universal hub token
    assert cand.count() == 0
