"""DSIR importance resampling (x9): a plain-Python recomputation of the
identical selection (same md5 gram hashing, same integer micro-unit
rounding, same Gumbel keys) must reproduce the engine's top-k exactly,
and the selection must actually SELECT — docs resembling the
entropy-gated target slice must be over-represented vs a uniform draw."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from kafka_streaming_polymarket_pipeline_spark.operators.sampling import dsir_select

CLEAN = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "distributed query engines shuffle sorted batches into hash tables",
    "watermarks bound streaming state while windows aggregate events",
    "broadcast joins keep the small dimension resident on every core",
    "catalyst prunes columns and pushes filters into the parquet scan",
    "adaptive execution re-plans skewed joins at shuffle boundaries",
]
JUNK = [
    "aa aa aa aa aa aa aa aa aa aa aa aa",
    "zz zz zz zz zz zz zz zz zz zz",
    "qq qq qq qq qq qq qq",
    "xx xx xx xx xx xx xx xx",
]


def _entropy_label(text: str, entropy_min: float = 2.0) -> int:
    chars = list(text)
    n = max(len(chars), 1)
    ent = (
        -sum((k / n) * math.log2(k / n) for k in Counter(chars).values())
        if chars
        else 0.0
    )
    return 1 if round(ent, 6) >= entropy_min else 0


def _bucket(g: str, n_buckets: int = 64) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % n_buckets


def py_dsir(docs, k=5, n_buckets=64, entropy_min=2.0):
    per_doc: list[tuple[int, Counter, int]] = []
    for did, text in docs:
        toks = [t for t in text.lower().split(" ") if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        cnt: Counter = Counter(_bucket(g, n_buckets) for g in grams)
        per_doc.append((did, cnt, _entropy_label(text, entropy_min)))
    raw = [0] * n_buckets
    tgt = [0] * n_buckets
    for _, cnt, is_t in per_doc:
        for b, c in cnt.items():
            raw[b] += c
            if is_t:
                tgt[b] += c
    rtot, ttot = float(sum(raw)), float(sum(tgt))
    lam = [
        # round-half-away-from-zero to match Spark HALF_UP / DuckDB round
        int(
            math.copysign(
                math.floor(
                    abs(
                        (
                            math.log((tgt[b] + 1.0) / (ttot + n_buckets))
                            - math.log((raw[b] + 1.0) / (rtot + n_buckets))
                        )
                        * 1e6
                    )
                    + 0.5
                ),
                (
                    math.log((tgt[b] + 1.0) / (ttot + n_buckets))
                    - math.log((raw[b] + 1.0) / (rtot + n_buckets))
                ),
            )
        )
        for b in range(n_buckets)
    ]
    keyed = []
    for did, cnt, _ in per_doc:
        score = sum(c * lam[b] for b, c in cnt.items())
        h = int(hashlib.md5(str(did).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / 4294967296.0
        g = -math.log(-math.log(u))
        g_micro = int(math.copysign(math.floor(abs(g * 1e6) + 0.5), g))
        keyed.append((did, score, score + g_micro))
    keyed.sort(key=lambda r: (-r[2], r[0]))
    return keyed[:k]


def _run(spark, docs, k):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    return [
        (r.doc_id, r.score_micro, r.key_micro)
        for r in dsir_select(df, k=k).collect()
    ]


def test_matches_python_reference(spark):
    docs = [(i, t) for i, t in enumerate(CLEAN + JUNK)]
    assert _run(spark, docs, k=5) == py_dsir(docs, k=5)


def test_selection_is_target_biased(spark):
    # 6 clean + 4 junk: a top-5 cut must over-represent the clean slice
    # (importance weights push junk logw strongly negative).
    docs = [(i, t) for i, t in enumerate(CLEAN + JUNK)]
    picked = {did for did, _, _ in _run(spark, docs, k=5)}
    n_clean = sum(1 for d in picked if d < len(CLEAN))
    assert n_clean == 5, f"junk doc leaked into the DSIR top-5: {picked}"


def test_empty_and_gramless_docs_score_zero(spark):
    docs = [(0, ""), (1, " "), (2, CLEAN[0]), (3, JUNK[0])]
    rows = dict(
        (r.doc_id, (r.score_micro, r.key_micro))
        for r in dsir_select(
            spark.createDataFrame(docs, ["doc_id", "text"]), k=4
        ).collect()
    )
    assert rows[0][0] == 0 and rows[1][0] == 0  # empty product -> logw 0
    assert len(rows) == 4
    # Gumbel key still differentiates the two zero-score docs.
    assert rows[0][1] != rows[1][1]


def test_k_larger_than_corpus_returns_all(spark):
    docs = [(i, t) for i, t in enumerate(CLEAN)]
    assert len(_run(spark, docs, k=100)) == len(CLEAN)


def test_deterministic_across_runs(spark):
    docs = [(i, t) for i, t in enumerate(CLEAN + JUNK)]
    assert _run(spark, docs, k=7) == _run(spark, docs, k=7)


def test_matches_python_reference_on_random_corpora(spark):
    """Random mixed corpora (d15's robustness pattern): the engine's full
    selection — model fit, integer score, Gumbel key, cut — must equal
    the plain-Python recomputation on every trial, including corpora
    where the target slice is empty or everything."""
    import random

    rng = random.Random(4242)
    words = [f"w{i}" for i in range(60)] + ["aa", "zz", "qq"]
    for trial in range(3):
        docs = []
        for i in range(30):
            ln = rng.randint(0, 12)
            docs.append((i, " ".join(rng.choice(words) for _ in range(ln))))
        got = _run(spark, docs, k=9)
        want = py_dsir(docs, k=9)
        assert got == want, f"trial {trial}"


from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.sampled_from([f"w{i}" for i in range(20)] + ["aa", "zz"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=12))
def test_hypothesis_matches_python_reference(spark, corpus):
    """Hypothesis-generated corpora (shrinks on failure): model fit,
    integer score, Gumbel key and cut must all equal the plain-Python
    recomputation — including degenerate corpora (all-empty docs, a
    target slice that is empty or everything)."""
    docs = list(enumerate(corpus))
    assert _run(spark, docs, k=6) == py_dsir(docs, k=6)
