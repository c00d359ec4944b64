"""Unigram-LM EM E-step (v3): a plain-Python recomputation of the
identical pipeline (substring seed vocab, integer micro-log-prob Viterbi
with the encoded tie-break, backtrace, re-count) must reproduce the
engine exactly, and the E-step must actually LEARN a segmentation —
compound words split into their frequent parts."""

from __future__ import annotations

import collections
import math
import random

from kafka_streaming_polymarket_pipeline_spark.operators.bpe import (
    UNI_OFF,
    unigram_viterbi_estep,
)


def py_estep(docs, max_piece=4, min_count=2):
    wcnt = collections.Counter(
        t for d in docs for t in d.split(" ") if t
    )
    occ: collections.Counter = collections.Counter()
    for wd, wc in wcnt.items():
        for i in range(1, len(wd) + 1):
            for j in range(max(0, i - max_piece), i):
                occ[wd[j:i]] += wc
    vocab = {p: c for p, c in occ.items() if c >= min_count or len(p) == 1}
    tot = float(sum(vocab.values()))
    lp = {p: round(math.log(c / tot) * 1e6) for p, c in vocab.items()}
    used: collections.Counter = collections.Counter()
    for wd, wc in wcnt.items():
        n = len(wd)
        best: list = [0] + [None] * n
        back: list = [None] * (n + 1)
        for i in range(1, n + 1):
            key = None
            for j in range(max(0, i - max_piece), i):
                p = wd[j:i]
                if p in lp and best[j] is not None:
                    kk = (best[j] + lp[p] + UNI_OFF) * 64 + 64 - (i - j)
                    if key is None or kk > key:
                        key = kk
            best[i] = key // 64 - UNI_OFF
            back[i] = i - (64 - key % 64)
        pos = n
        while pos > 0:
            j = back[pos]
            used[wd[j:pos]] += wc
            pos = j
    tot2 = float(sum(used.values()))
    return sorted(
        (p, c, round(math.log(c / tot2) * 1e6)) for p, c in used.items()
    )


def _run(spark, docs):
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    return sorted(tuple(r) for r in unigram_viterbi_estep(df).collect())


def test_matches_python_reference(spark):
    docs = ["the cat hat that", "the that hat cat cathat"]
    assert _run(spark, docs) == py_estep(docs)


def test_compound_word_splits_into_frequent_parts(spark):
    """'cathat' never qualifies as a piece (len 6 > 4); with 'cat' and
    'hat' frequent, Viterbi must segment it as cat+hat rather than
    char-by-char — the EM signal the M-step amplifies."""
    docs = ["cat cat cat hat hat hat cathat"]
    got = dict((p, c) for p, c, _ in _run(spark, docs))
    assert got["cat"] == 4 and got["hat"] == 4
    assert all(len(p) > 1 for p in got), got  # no char fallback anywhere


def test_matches_python_reference_on_random_corpora(spark):
    rng = random.Random(99)
    alpha = "abcde"
    for trial in range(3):
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 12)))
            for _ in range(40)
        ]
        docs = [
            " ".join(rng.choice(words) for _ in range(rng.randint(1, 15)))
            for _ in range(12)
        ]
        assert _run(spark, docs) == py_estep(docs), f"trial {trial}"


def test_singleton_exotic_chars_always_feasible(spark):
    """Every single char is in the vocab regardless of count, so any
    word — including one of unique-once characters — segments."""
    docs = ["xyzq aa aa"]
    got = dict((p, c) for p, c, _ in _run(spark, docs))
    # xyzq: no multi-char substring reaches count 2 -> must fall back to
    # a feasible segmentation over vocab pieces (chars at minimum)
    assert sum(c for p, c in got.items() if set(p) <= set("xyzq")) >= 1
    assert got["aa"] == 2


def py_em2(docs, max_piece=4, min_count=2):
    """Two-round reference: round 1 = py_estep's counts; round 2 uses
    (used pieces + missing chars at 1) renormalized."""
    r1 = py_estep(docs, max_piece, min_count)
    used1 = {p: c for p, c, _ in r1}
    wcnt = collections.Counter(t for d in docs for t in d.split(" ") if t)
    chars = {wd[i] for wd in wcnt for i in range(len(wd))}
    vocab2 = dict(used1)
    for ch in chars:
        vocab2.setdefault(ch, 1)
    tot = float(sum(vocab2.values()))
    lp = {p: round(math.log(c / tot) * 1e6) for p, c in vocab2.items()}
    used: collections.Counter = collections.Counter()
    for wd, wc in wcnt.items():
        n = len(wd)
        best: list = [0] + [None] * n
        back: list = [None] * (n + 1)
        for i in range(1, n + 1):
            key = None
            for j in range(max(0, i - max_piece), i):
                p = wd[j:i]
                if p in lp and best[j] is not None:
                    kk = (best[j] + lp[p] + UNI_OFF) * 64 + 64 - (i - j)
                    if key is None or kk > key:
                        key = kk
            best[i] = key // 64 - UNI_OFF
            back[i] = i - (64 - key % 64)
        pos = n
        while pos > 0:
            j = back[pos]
            used[wd[j:pos]] += wc
            pos = j
    tot2 = float(sum(used.values()))
    return sorted(
        (p, c, round(math.log(c / tot2) * 1e6)) for p, c in used.items()
    )


def _run_em2(spark, docs):
    from kafka_streaming_polymarket_pipeline_spark.operators.bpe import unigram_em2

    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    return sorted(tuple(r) for r in unigram_em2(df).collect())


def test_em2_matches_python_reference(spark):
    docs = ["the cat hat that", "the that hat cat cathat"]
    assert _run_em2(spark, docs) == py_em2(docs)


def test_em2_matches_python_reference_on_random_corpora(spark):
    rng = random.Random(123)
    alpha = "abcd"
    for trial in range(2):
        words = [
            "".join(rng.choice(alpha) for _ in range(rng.randint(1, 10)))
            for _ in range(30)
        ]
        docs = [
            " ".join(rng.choice(words) for _ in range(rng.randint(1, 12)))
            for _ in range(10)
        ]
        assert _run_em2(spark, docs) == py_em2(docs), f"trial {trial}"


def test_em2_compound_split_sharpens(spark):
    """Round 2's vocab has only used pieces (+ chars at 1), so the
    round-1 winners 'cat'/'hat' gain probability mass and the compound
    keeps splitting into them."""
    docs = ["cat cat cat hat hat hat cathat"]
    got = dict((p, c) for p, c, _ in _run_em2(spark, docs))
    assert got["cat"] == 4 and got["hat"] == 4


def test_em2_chars_always_survive(spark):
    """'xyzq' uses char pieces in round 1 only if no multi-char piece
    qualifies; whatever round 1 chose, round 2 must still segment every
    word — the chars-at-count-1 rule guarantees feasibility."""
    docs = ["xyzq aa aa bb bb"]
    got = _run_em2(spark, docs)
    covered = sum(c * len(p) for p, c, _ in got)
    total_chars = sum(len(t) for d in docs for t in d.split())
    assert covered == total_chars  # every position of every token segmented


def test_v4_stream_reconstructs_documents(spark):
    """The apply form's piece stream, concatenated, must spell each
    document's tokens back exactly (reading order, no gaps/overlaps) —
    and the fingerprint must match a hand-assembled stream."""
    import hashlib

    from kafka_streaming_polymarket_pipeline_spark.operators.bpe import (
        UNI_MAX_PIECE,
        UNI_MIN_COUNT,
        unigram_tokenize,
    )

    docs = ["cat cat cat hat hat hat cathat", "the the that"]
    df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
    got = {r.doc_id: (r.n_pieces, r.pieces_fp) for r in unigram_tokenize(df).collect()}

    # independent reconstruction from the python reference machinery:
    # round-2 vocab then viterbi per word (reading order), concat per doc
    r1 = dict((p, c) for p, c, _ in py_estep(docs))
    chars = {c for d in docs for t in d.split() for c in t}
    vocab2 = dict(r1)
    for ch in chars:
        vocab2.setdefault(ch, 1)
    tot = float(sum(vocab2.values()))
    lp = {p: round(math.log(c / tot) * 1e6) for p, c in vocab2.items()}

    def seg(wd):
        n = len(wd)
        best: list = [0] + [None] * n
        back: list = [None] * (n + 1)
        for i in range(1, n + 1):
            key = None
            for j in range(max(0, i - UNI_MAX_PIECE), i):
                p = wd[j:i]
                if p in lp and best[j] is not None:
                    kk = (best[j] + lp[p] + UNI_OFF) * 64 + 64 - (i - j)
                    if key is None or kk > key:
                        key = kk
            best[i] = key // 64 - UNI_OFF
            back[i] = i - (64 - key % 64)
        out, pos = [], n
        while pos > 0:
            j = back[pos]
            out.append(wd[j:pos])
            pos = j
        return list(reversed(out))

    for did, d in enumerate(docs):
        stream = [p for t in d.split() for p in seg(t)]
        assert "".join(stream) == d.replace(" ", "")
        fp = hashlib.md5(" ".join(stream).encode()).hexdigest()
        assert got[did] == (len(stream), fp)


def test_v4_empty_doc_fingerprints_empty(spark):
    import hashlib

    from kafka_streaming_polymarket_pipeline_spark.operators.bpe import unigram_tokenize

    df = spark.createDataFrame([(0, ""), (1, "aa aa")], "doc_id long, text string")
    got = {r.doc_id: (r.n_pieces, r.pieces_fp) for r in unigram_tokenize(df).collect()}
    assert got[0] == (0, hashlib.md5(b"").hexdigest())
    assert got[1][0] >= 1


def test_long_words_segment_correctly(spark):
    """Words of 65+ chars (URLs, hex hashes) used to overflow the 6-bit
    backpointer slot when the key encoded absolute j; the piece-length
    encoding (slot = 64 - len, bounded by max_piece) cannot overflow.
    Both the whole-corpus E-step and per-word coverage must hold."""
    rng = random.Random(7)
    long1 = "".join(rng.choice("abcd") for _ in range(70))
    long2 = "ab" * 40  # 80 chars, highly repetitive -> 'ab'/'abab' pieces
    docs = ["ab ab cd cd " + long1, long2 + " " + long2, "abcd abcd"]
    got = _run(spark, docs)
    assert got == py_estep(docs)
    # every char position of every token must be covered exactly once
    covered = sum(c * len(p) for p, c, _ in got)
    total_chars = sum(len(t) for d in docs for t in d.split())
    assert covered == total_chars
    # and no emitted piece may exceed max_piece or miss the vocab
    assert all(1 <= len(p) <= 4 for p, _, _ in got)


from hypothesis import given, settings
from hypothesis import strategies as st

_word = st.text(alphabet="abz", min_size=1, max_size=90)
_doc = st.lists(_word, min_size=1, max_size=8).map(" ".join)


@settings(max_examples=5, deadline=None)
@given(st.lists(_doc, min_size=1, max_size=6))
def test_hypothesis_estep_matches_reference(spark, corpus):
    """Hypothesis-generated corpora: the full E-step (seed vocab,
    integer Viterbi with the encoded tie-break, backtrace, re-count)
    must equal the Python reference — shrinking finds minimal
    counterexamples in the DP if the tie-break or window logic ever
    drifts."""
    assert _run(spark, corpus) == py_estep(corpus)
