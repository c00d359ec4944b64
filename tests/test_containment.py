"""Dedicated tests for d15 — the prefix-filtered EXACT directed
containment join (``operators/dedup.py:containment_pairs``).

Mirrors test_prefix_jaccard.py's three angles for the asymmetric
relation:

1. PIGEONHOLE on the contained side only: every qualifying DIRECTED
   pair must survive candidate generation on random corpora (if a
   qualifying (A, B) ever shares no A-prefix token with B, the
   algorithm silently drops it — the correctness core).
2. Exact-match contrast vs the naive quadratic all-pairs filter:
   identical directed pair set AND identical containment values.
3. Asymmetry + edge cases: subset pairs fire one direction only;
   threshold 1/1 (true subsets only); tiny docs; min_size cut.
"""

from __future__ import annotations

import random

from kafka_streaming_polymarket_pipeline_spark.operators.dedup import containment_pairs


def _naive_containment(rows, num, den, min_size=1):
    sets = {i: set(t.lower().split()) - {""} for i, t in rows}
    out = {}
    for a in sets:
        if len(sets[a]) < min_size or not sets[a]:
            continue
        for b in sets:
            if a == b or not sets[b]:
                continue
            i = len(sets[a] & sets[b])
            if den * i >= num * len(sets[a]):
                out[(a, b)] = round(i / len(sets[a]), 6)
    return out


def _random_corpus(rng: random.Random, n_docs: int, vocab: int, max_len: int):
    """Mix of subset/excerpt docs and independent docs — the regime
    containment dedup targets (quotes inside articles)."""
    words = [f"w{i}" for i in range(vocab)]
    rows = []
    for i in range(n_docs):
        ln = rng.randint(1, max_len)
        rows.append((i, " ".join(rng.choice(words) for _ in range(ln))))
    # excerpts: every third doc gets a child that is a token-subset
    nxt = n_docs
    for i in range(0, n_docs, 3):
        toks = [t for t in rows[i][1].split() if t]
        if len(toks) >= 4:
            keep = rng.sample(toks, k=max(2, int(len(toks) * 0.9)))
            rows.append((nxt, " ".join(keep)))
            nxt += 1
    return rows


def _run(spark, rows, num, den, min_size=1):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return {
        (r.doc_id_a, r.doc_id_b): r.containment
        for r in containment_pairs(
            df, num=num, den=den, min_size=min_size
        ).collect()
    }


def test_matches_naive_on_random_corpora(spark):
    rng = random.Random(1513)
    for trial in range(3):
        rows = _random_corpus(rng, n_docs=24, vocab=40, max_len=14)
        for num, den in [(9, 10), (7, 10), (1, 1)]:
            got = _run(spark, rows, num, den)
            want = _naive_containment(rows, num, den)
            assert got == want, f"trial {trial} t={num}/{den}"


def test_asymmetry_subset_fires_one_direction(spark):
    rows = [
        (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
        (1, "alpha beta gamma delta epsilon zeta eta theta iota"),  # 9/10 subset
        (2, "completely different words here entirely"),
    ]
    got = _run(spark, rows, 1, 1)
    # doc 1's tokens are all inside doc 0; doc 0 is NOT inside doc 1.
    assert (1, 0) in got and got[(1, 0)] == 1.0
    assert (0, 1) not in got
    assert all(2 not in p for p in got)


def test_min_size_drops_tiny_contained_sets(spark):
    rows = [
        (0, "a b"),
        (1, "a b c d e f g h i j k l m n o p q r s t u v w x y z"),
    ]
    # without the cut the 2-token doc is contained
    assert (0, 1) in _run(spark, rows, 9, 10, min_size=1)
    # with it, dropped from the A side; doc 1 still eligible as B only
    got = _run(spark, rows, 9, 10, min_size=3)
    assert got == {}


def test_quote_inside_article_is_jaccard_blind(spark):
    """The motivating case: high containment, low Jaccard."""
    quote = "to be or not to be that is the question"
    article = quote + " " + " ".join(f"article{i}" for i in range(80))
    rows = [(0, quote), (1, article)]
    got = _run(spark, rows, 1, 1)
    assert got[(0, 1)] == 1.0
    qs = set(quote.split())
    js = len(qs) / (len(qs) + 80)
    assert js < 0.15  # Jaccard would never flag this pair at any real bar


from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abcf", min_size=1, max_size=3)
_doc = st.lists(_word, min_size=0, max_size=10).map(" ".join)
_corpus = st.lists(_doc, min_size=2, max_size=10)


@settings(max_examples=5, deadline=None)
@given(_corpus, st.sampled_from([(9, 10), (7, 10), (1, 1)]))
def test_hypothesis_matches_naive(spark, corpus, thr):
    """Adversarially-generated corpora (hypothesis shrinks on failure):
    the prefix-filtered containment join must equal the naive all-pairs
    filter for every generated corpus and threshold — the pigeonhole
    guarantee under inputs a hand-written generator wouldn't try (empty
    docs, all-identical docs, single-token vocabularies)."""
    num, den = thr
    rows = list(enumerate(corpus))
    got = _run(spark, rows, num, den)
    want = _naive_containment(rows, num, den)
    assert got == want


def test_cross_containment_catches_quoted_benchmark_passage(spark):
    """A benchmark passage quoted verbatim inside a long training doc:
    Jaccard is ~0 (the training doc's extra tokens swamp the union) but
    directed containment is 1.0 — the contamination hit the cross form
    exists to catch. Token-reordered quotes (paraphrase that keeps the
    word set) are caught too, where a contiguous 8-gram scan is blind."""
    from kafka_streaming_polymarket_pipeline_spark.operators.dedup import (
        cross_containment_pairs,
    )

    quote = " ".join(f"bench{i}" for i in range(20))
    reordered = " ".join(f"bench{i}" for i in reversed(range(20)))
    filler = " ".join(f"corpus{i}" for i in range(400))
    bench = spark.createDataFrame(
        [(1, quote), (2, reordered), (3, "totally unrelated eval words here")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(100, filler + " " + quote + " " + filler), (101, filler)],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id_a, r.doc_id_b): r.containment
        for r in cross_containment_pairs(
            bench, corpus, num=9, den=10, min_size=1
        ).collect()
    }
    assert got[(1, 100)] == 1.0   # verbatim quote: contained
    assert got[(2, 100)] == 1.0   # reordered quote: token SET contained
    assert (3, 100) not in got and (3, 101) not in got
    # the Jaccard the symmetric ladder would see for the same pair:
    jac = 20 / (20 + 400)
    assert jac < 0.05


def test_cross_containment_same_id_reported(spark):
    """The same doc present in both corpora IS a contamination hit —
    the cross form must not inherit the self-join's a != b guard."""
    from kafka_streaming_polymarket_pipeline_spark.operators.dedup import (
        cross_containment_pairs,
    )

    text = " ".join(f"w{i}" for i in range(10))
    bench = spark.createDataFrame([(7, text)], "doc_id long, text string")
    corpus = spark.createDataFrame([(7, text)], "doc_id long, text string")
    got = cross_containment_pairs(bench, corpus, min_size=1).collect()
    assert [(r.doc_id_a, r.doc_id_b, r.containment) for r in got] == [(7, 7, 1.0)]
