"""Paragraph-granularity exact dedup (d17): first-occurrence-wins at
32-token-window grain, reading-order reassembly, exact removal
accounting — including the headline property that two docs sharing
only one paragraph lose it from exactly the non-canonical doc."""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_streaming_polymarket_pipeline_spark.operators.dedup import paragraph_dedup


def _para(tag: str, size: int = 32) -> str:
    return " ".join(f"{tag}{i}" for i in range(size))


def _run(spark, docs, size=32):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r.doc_id: r for r in paragraph_dedup(df, size=size).collect()}


def py_paragraph_dedup(docs, size=32):
    """Reference: split on whitespace into size-token windows, keep each
    window text's first (doc_id, idx) occurrence, rebuild in order."""
    paras = []
    for did, text in sorted(docs):
        ts = [t for t in text.split(" ") if t]
        for ci in range((len(ts) + size - 1) // size):
            paras.append((did, ci, " ".join(ts[ci * size : ci * size + size])))
    first: dict = {}
    for did, ci, pt in sorted(paras):
        first.setdefault(pt, (did, ci))
    out = {}
    for did, text in docs:
        ts = [t for t in text.split(" ") if t]
        chunks = [
            " ".join(ts[ci * size : ci * size + size])
            for ci in range((len(ts) + size - 1) // size)
        ]
        kept = [
            pt for ci, pt in enumerate(chunks) if first[pt] == (did, ci)
        ]
        out[did] = (" ".join(kept), len(chunks), len(chunks) - len(kept))
    return out


def test_shared_paragraph_removed_from_noncanonical_doc(spark):
    """Two docs sharing exactly one paragraph: the lower-id doc keeps
    it, the higher-id doc loses exactly those 32 tokens and nothing
    else."""
    shared = _para("sh")
    a_only, b_only = _para("ao"), _para("bo")
    docs = [(1, a_only + " " + shared), (2, shared + " " + b_only)]
    got = _run(spark, docs)
    assert got[1].text_clean == a_only + " " + shared and got[1].n_removed == 0
    assert got[2].text_clean == b_only and got[2].n_removed == 1
    assert got[2].n_paras == 2


def test_boilerplate_scrub_removes_all_copies(spark):
    """d19 semantics vs d17: a cross-doc repeated window is removed from
    EVERY doc (no canonical survivor), while an intra-doc repeat with
    doc-frequency 1 is kept in both positions."""
    from kafka_streaming_polymarket_pipeline_spark.operators.dedup import boilerplate_scrub

    boiler = _para("bp")
    a_only, b_only, twice = _para("ao"), _para("bo"), _para("tw")
    docs = [
        (1, boiler + " " + a_only),
        (2, boiler + " " + b_only),
        (3, twice + " " + twice),  # intra-doc repeat, df=1 -> kept whole
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r for r in boilerplate_scrub(df, size=32).collect()}
    assert got[1].text_clean == a_only and got[1].n_removed == 1
    assert got[2].text_clean == b_only and got[2].n_removed == 1
    assert got[3].text_clean == twice + " " + twice and got[3].n_removed == 0


def test_no_duplicates_roundtrips_text(spark):
    docs = [(i, _para(f"u{i}a") + " " + _para(f"u{i}b")) for i in range(5)]
    got = _run(spark, docs)
    for did, text in docs:
        assert got[did].text_clean == text
        assert got[did].n_removed == 0 and got[did].n_paras == 2


def test_intra_doc_repeat_dedups(spark):
    p = _para("rep")
    got = _run(spark, [(9, p + " " + p + " " + p)])
    assert got[9].text_clean == p
    assert got[9].n_paras == 3 and got[9].n_removed == 2


def test_empty_doc_accounts_zero(spark):
    got = _run(spark, [(0, ""), (1, _para("x"))])
    assert got[0].text_clean == "" and got[0].n_paras == 0 and got[0].n_removed == 0


def test_short_tail_paragraph_participates(spark):
    """Tail windows shorter than size dedup by their exact text too."""
    tail = "t0 t1 t2"
    docs = [(1, _para("h") + " " + tail), (2, tail)]
    got = _run(spark, docs)
    assert got[1].n_removed == 0
    assert got[2].text_clean == "" and got[2].n_removed == 1


@settings(max_examples=6, deadline=None)
@given(st.integers(0, 10_000))
def test_hypothesis_matches_python_reference(spark, seed):
    """Random corpora built from a small paragraph pool (forcing heavy
    cross- and intra-doc collisions) must match the first-occurrence
    reference exactly, window size 4 to keep cases small."""
    rng = random.Random(seed)
    pool = [_para(f"p{k}", size=4) for k in range(4)]
    docs = [
        (
            did,
            " ".join(rng.choice(pool) for _ in range(rng.randint(0, 4))),
        )
        for did in range(rng.randint(1, 6))
    ]
    got = _run(spark, docs, size=4)
    ref = py_paragraph_dedup(docs, size=4)
    for did, (tc, np_, nr) in ref.items():
        assert (got[did].text_clean, got[did].n_paras, got[did].n_removed) == (
            tc,
            np_,
            nr,
        ), (did, docs)


# ---- d18: FUZZY paragraph-grain dedup -------------------------------------


def _run_fuzzy(spark, docs, size=32):
    from kafka_streaming_polymarket_pipeline_spark.operators.dedup import (
        paragraph_neardup_dedup,
    )

    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r.doc_id: r for r in paragraph_neardup_dedup(df, size=size).collect()}


class TestParagraphNearDup:
    def test_edited_shared_paragraph_removed(self, spark):
        """The capability d17 lacks: a LIGHTLY EDITED copy of a shared
        paragraph (one token swapped out of 32 -> Jaccard ~0.87 over char
        5-grams) is removed from the later doc, while the exact pass
        keeps both."""
        shared = _para("boiler")
        edited = shared.replace("boiler7", "changed")
        docs = [
            (0, shared + " " + _para("alpha")),
            (1, edited + " " + _para("beta")),
        ]
        out = _run_fuzzy(spark, docs)
        assert out[0].text_clean == docs[0][1]  # canonical doc untouched
        assert out[1].text_clean == _para("beta")
        assert out[1].n_removed == 1 and out[0].n_removed == 0
        # contrast: exact d17 removes nothing here
        exact = _run(spark, docs)
        assert exact[1].n_removed == 0

    def test_exact_duplicates_still_dedup(self, spark):
        """The fuzzy relation contains equality: d17's headline case
        holds under d18 too (first occurrence wins)."""
        shared = _para("x")
        docs = [(0, shared + " " + _para("a")), (1, _para("b") + " " + shared)]
        out = _run_fuzzy(spark, docs)
        assert out[0].n_removed == 0
        assert out[1].n_removed == 1
        assert out[1].text_clean == _para("b")

    def test_transitive_closure_keeps_one(self, spark):
        """A near-dup CHAIN (A~B, B~C, A!~C directly) collapses to the
        first occurrence: non-transitive pairs, transitive closure."""
        base = _para("t")
        e1 = base.replace("t3", "q3").replace("t9", "q9")
        e2 = e1.replace("t15", "q15").replace("t21", "q21")
        docs = [(0, base), (1, e1), (2, e2)]
        out = _run_fuzzy(spark, docs)
        assert out[0].n_removed == 0 and out[0].text_clean == base
        assert out[1].n_removed == 1 and out[1].text_clean == ""
        assert out[2].n_removed == 1 and out[2].text_clean == ""

    def test_unrelated_docs_untouched(self, spark):
        docs = [(0, _para("aa") + " " + _para("bb")), (1, _para("cc"))]
        out = _run_fuzzy(spark, docs)
        assert out[0].n_removed == 0 and out[1].n_removed == 0
        assert out[0].text_clean == docs[0][1]
        assert out[0].n_paras == 2 and out[1].n_paras == 1


class TestWidPackingGuard:
    """ADVICE r09: wid = doc_id * wid_mult + chunk_idx is injective only
    for 0 <= doc_id < 2^63/wid_mult and chunk_idx < wid_mult; outside
    that the min-wid first-occurrence rule silently corrupts AND the
    oracle shares the formula, so only an in-plan raise can catch it.
    wid_mult is parameterized so the >=-wid_mult-windows case is
    testable without a 33M-token document."""

    def test_doc_with_too_many_windows_raises(self, spark):
        from kafka_streaming_polymarket_pipeline_spark.operators.dedup import (
            paragraph_neardup_dedup,
        )
        import pytest

        # 6 windows of 32 tokens against wid_mult=4 -> chunk_idx 4..5 overflow
        docs = [(0, " ".join(_para(f"w{i}") for i in range(6)))]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        with pytest.raises(Exception, match="wid packing out of range"):
            paragraph_neardup_dedup(df, wid_mult=4).collect()

    def test_negative_doc_id_raises(self, spark):
        from kafka_streaming_polymarket_pipeline_spark.operators.dedup import (
            paragraph_neardup_dedup,
        )
        import pytest

        df = spark.createDataFrame([(-1, _para("neg"))], "doc_id long, text string")
        with pytest.raises(Exception, match="wid packing out of range"):
            paragraph_neardup_dedup(df).collect()

    def test_in_range_unaffected_by_guard(self, spark):
        """The guard is a no-op on valid ids: same result as before."""
        shared = _para("g")
        docs = [(0, shared + " " + _para("h")), (1, shared)]
        out = _run_fuzzy(spark, docs)
        assert out[0].n_removed == 0 and out[1].n_removed == 1
