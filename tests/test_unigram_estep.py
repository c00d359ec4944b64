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


# ---- v5: per-doc perplexity under the trained model ----------------------


class TestDocLogprob:
    def _score(self, spark, docs):
        from kafka_streaming_polymarket_pipeline_spark.operators.bpe import unigram_doc_logprob

        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        return {r["doc_id"]: r.asDict() for r in unigram_doc_logprob(df).collect()}

    def test_piece_counts_agree_with_v4(self, spark):
        """v5 scores the SAME segmentation v4 materializes: per-doc
        n_pieces must match exactly."""
        from kafka_streaming_polymarket_pipeline_spark.operators.bpe import (
            unigram_doc_logprob,
            unigram_tokenize,
        )

        rng = random.Random(7)
        words = ["market", "maker", "marketmaker", "order", "book", "orderbook"]
        docs = [
            " ".join(rng.choice(words) for _ in range(rng.randint(1, 12)))
            for _ in range(40)
        ]
        df = spark.createDataFrame(list(enumerate(docs)), "doc_id long, text string")
        v4 = {r["doc_id"]: r["n_pieces"] for r in unigram_tokenize(df).collect()}
        v5 = {r["doc_id"]: r["n_pieces"] for r in unigram_doc_logprob(df).collect()}
        assert v4 == v5

    def test_empty_doc_scores_zero(self, spark):
        out = self._score(spark, ["market maker", ""])
        assert out[1]["n_pieces"] == 0
        assert out[1]["total_lp_micro"] == 0
        assert out[1]["mean_lp"] == 0.0
        assert out[1]["ppl"] == 1.0  # exp(-0)

    def test_mean_and_ppl_consistent(self, spark):
        out = self._score(spark, ["market maker market", "order book order"])
        for r in out.values():
            assert r["n_pieces"] > 0
            expect_mean = round(r["total_lp_micro"] / 1e6 / r["n_pieces"], 6)
            assert r["mean_lp"] == expect_mean
            assert r["ppl"] == round(math.exp(-r["mean_lp"]), 6)
            assert r["mean_lp"] < 0  # log-probs are negative
            assert r["ppl"] > 1.0

    def test_in_distribution_beats_junk(self, spark):
        """The CCNet premise: text made of the corpus's frequent words
        scores lower perplexity than character junk."""
        common = "market maker order book trade price " * 5
        junk = "zqxjkv wvyqzx qzkjxw xkvjqz"
        out = self._score(spark, [common.strip(), junk, common.strip() + " extra"])
        assert out[0]["ppl"] < out[1]["ppl"]


class TestCcnetBuckets:
    def test_buckets_match_python_tertiles(self, spark, tmp_path):
        """x11's bucket assignment reproduces a numpy-derived reference:
        per-lang linear-interpolated tertile cutpoints over v5's ppl,
        6dp-rounded, head <= c1 < middle <= c2 < tail."""
        import numpy as np

        from kafka_streaming_polymarket_pipeline_spark.plans.bpe_plans import (
            x11_ccnet_ppl_buckets,
        )

        rng = random.Random(11)
        words = ["alpha", "beta", "gamma", "delta", "market", "maker"]
        rows = []
        for i in range(60):
            lang = "en" if i % 2 == 0 else "de"
            n = rng.randint(2, 10)
            text = " ".join(rng.choice(words) for _ in range(n))
            if i % 7 == 0:  # some junk docs so ppl spreads
                text += " zzqqxxjj" * (i % 3 + 1)
            rows.append((i, text, lang, "s", len(text)))
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        sf_dir = str(tmp_path)
        df.write.parquet(f"{sf_dir}/documents.parquet")
        out = {r["doc_id"]: r for r in x11_ccnet_ppl_buckets(spark, sf_dir).collect()}
        assert len(out) == 60
        by_lang: dict = {}
        for r in out.values():
            by_lang.setdefault(r["lang"], []).append(r)
        for lang, rs in by_lang.items():
            ppls = np.array(sorted(x["ppl"] for x in rs))
            c1 = round(float(np.percentile(ppls, 100 / 3, method="linear")), 6)
            c2 = round(float(np.percentile(ppls, 200 / 3, method="linear")), 6)
            for x in rs:
                want = (
                    "head" if x["ppl"] <= c1 else "middle" if x["ppl"] <= c2 else "tail"
                )
                assert x["bucket"] == want, (lang, x["doc_id"], x["ppl"], c1, c2)
            # every bucket populated and ordered: max(head) <= min(tail)
            got = {x["bucket"] for x in rs}
            assert got == {"head", "middle", "tail"}
            assert max(x["ppl"] for x in rs if x["bucket"] == "head") <= min(
                x["ppl"] for x in rs if x["bucket"] == "tail"
            )
