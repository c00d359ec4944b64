"""ExactSubstr maximal duplicated-span operator (Lee et al. 2022 §4.1)
vs a naive Python reference that computes the COVERED-POSITION UNION
directly — independently validating both the L-gram covering equivalence
and the gaps-and-islands run merge.

The reference enumerates every duplicated L-gram (occurrence-counted,
corpus-wide), marks the positions each covers, and reads the maximal
contiguous runs off the covered set. The operator never materializes
positions; agreement over arbitrary corpora is the proof the islands
shortcut (break where start gap > L) reproduces the union semantics.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streaming_polymarket_pipeline_spark.operators.text import (
    exact_substr_scrub,
    exact_substr_spans,
)


def py_exact_substr_spans(docs, L, min_count=2):
    grams: Counter = Counter()
    for _id, toks in docs:
        for i in range(len(toks) - L + 1):
            grams[tuple(toks[i : i + L])] += 1
    out = set()
    for did, toks in docs:
        covered = set()
        for i in range(len(toks) - L + 1):
            if grams[tuple(toks[i : i + L])] >= min_count:
                covered |= set(range(i, i + L))
        run = None
        for p in sorted(covered) + [None]:
            if run and (p is None or p > run[1] + 1):
                out.add((did, run[0], run[1], run[1] - run[0] + 1))
                run = None
            if p is not None:
                run = (run[0], p) if run else (p, p)
    return out


def _spark_spans(spark, docs, L, min_count=2):
    df = spark.createDataFrame(
        [(did, " ".join(toks)) for did, toks in docs], "doc_id long, text string"
    )
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in exact_substr_spans(df, min_len=L, min_count=min_count).collect()
    }


_corpus = st.lists(
    st.lists(st.sampled_from("abc"), min_size=0, max_size=14),
    min_size=1,
    max_size=6,
)


@settings(max_examples=5, deadline=None)
@given(_corpus, st.integers(min_value=2, max_value=4))
def test_spans_match_python_reference(spark, corpus, L):
    docs = [(i, toks) for i, toks in enumerate(corpus)]
    assert _spark_spans(spark, docs, L) == py_exact_substr_spans(docs, L)


def test_intra_doc_repeat_is_duplication(spark):
    """The semantic delta vs t14: a doc repeating a span INTERNALLY is
    duplication (occurrence >= 2) even though only one document holds
    the gram — doc-frequency counting finds nothing here."""
    docs = [(1, "a b c d e a b c d e".split()), (2, "x y z w v u".split())]
    got = _spark_spans(spark, docs, L=5)
    assert got == {(1, 0, 9, 10)} == py_exact_substr_spans(docs, 5)


def test_cross_doc_copy_and_maximality(spark):
    """A shared 7-token run under L=5 yields ONE maximal span covering
    all 7 positions in each doc (three overlapping duplicated 5-grams
    merge), not three window rows; the unique tails stay unspanned."""
    shared = "s1 s2 s3 s4 s5 s6 s7".split()
    docs = [
        (1, ["p", "q"] + shared + ["r"]),
        (2, shared + ["m", "n", "o"]),
    ]
    got = _spark_spans(spark, docs, L=5)
    assert got == {(1, 2, 8, 7), (2, 0, 6, 7)} == py_exact_substr_spans(docs, 5)


def py_exact_substr_scrub(docs, L, min_count=2):
    grams: Counter = Counter()
    for _id, toks in docs:
        for i in range(len(toks) - L + 1):
            grams[tuple(toks[i : i + L])] += 1
    out = {}
    for did, toks in docs:
        covered = set()
        for i in range(len(toks) - L + 1):
            if grams[tuple(toks[i : i + L])] >= min_count:
                covered |= set(range(i, i + L))
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out[did] = (" ".join(kept), len(toks), len(toks) - len(kept))
    return out


def _spark_scrub(spark, docs, L, min_count=2):
    df = spark.createDataFrame(
        [(did, " ".join(toks)) for did, toks in docs], "doc_id long, text string"
    )
    return {
        r.doc_id: (r.text_clean, r.n_tokens, r.n_removed)
        for r in exact_substr_scrub(df, min_len=L, min_count=min_count).collect()
    }


@settings(max_examples=5, deadline=None)
@given(_corpus, st.integers(min_value=2, max_value=4))
def test_scrub_matches_python_reference(spark, corpus, L):
    docs = [(i, toks) for i, toks in enumerate(corpus)]
    assert _spark_scrub(spark, docs, L) == py_exact_substr_scrub(docs, L)


def test_scrub_removes_exactly_the_spans(spark):
    """t19 removes exactly the positions t18 reports: cross-doc shared
    run scrubbed from both copies, unique tails and clean docs intact
    (one output row per doc either way)."""
    shared = "s1 s2 s3 s4 s5 s6 s7".split()
    docs = [
        (1, ["p", "q"] + shared + ["r"]),
        (2, shared + ["m", "n", "o"]),
        (3, ["clean", "doc", "stays"]),
    ]
    got = _spark_scrub(spark, docs, L=5)
    assert got == {
        1: ("p q r", 10, 7),
        2: ("m n o", 10, 7),
        3: ("clean doc stays", 3, 0),
    } == py_exact_substr_scrub(docs, 5)


def test_short_docs_and_no_duplicates_emit_nothing(spark):
    docs = [(1, ["a", "b"]), (2, ["c"] * 6), (3, [])]
    # doc 2's internal 'c c c c' repeats: 5-grams... len 6 -> two 5-gram
    # windows ccccc x2 (positions 0,1) -> duplicated -> one span 0..5
    got = _spark_spans(spark, docs, L=5)
    assert got == {(2, 0, 5, 6)} == py_exact_substr_spans(docs, 5)
    # with min_count above the occurrence count, nothing qualifies
    assert _spark_spans(spark, docs, L=5, min_count=3) == set()
