"""In-engine logistic-regression training (t20) vs a plain-Python
recomputation of the identical descent (same md5 bucketing, same 6-dp
rounding boundaries), plus proof that the training LEARNS: the weights
it produces must separate clean text from junk when applied as the
linear scorer they're trained to be."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators.text import (
    apply_quality_lr,
    train_quality_lr,
)

CLEAN = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "distributed query engines shuffle sorted batches into hash tables",
    "watermarks bound streaming state while windows aggregate events",
    "broadcast joins keep the small dimension resident on every core",
]
JUNK = ["aa aa aa aa aa aa aa aa aa aa aa aa", "zz zz zz zz zz zz zz zz zz zz"]


def py_train(docs, n_buckets=64, lr=1.0, iters=2, entropy_min=2.0):
    def label(text):
        chars = list(text)
        n = max(len(chars), 1)
        ent = -sum(
            (k / n) * math.log2(k / n) for k in Counter(chars).values()
        ) if chars else 0.0
        return 1.0 if round(ent, 6) >= entropy_min else 0.0

    rows = []
    for _did, text in docs:
        toks = [t for t in text.lower().split(" ") if t]
        cnt: Counter = Counter(
            int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_buckets
            for t in toks
        )
        rows.append((label(text), float(max(len(toks), 1)), cnt))
    big_n = float(len(rows))
    w = [0.0] * n_buckets
    for _ in range(iters):
        grads = [0.0] * n_buckets
        for y, n, cnt in rows:
            z = round(sum(c * w[b] for b, c in cnt.items()) / n, 6)
            p = 1.0 / (1.0 + math.exp(-z))
            for b, c in cnt.items():
                grads[b] += (p - y) * c / n
        w = [round(w[b] - lr * round(grads[b] / big_n, 6), 6) for b in range(n_buckets)]
    return w


def test_training_matches_python_reference(spark):
    docs = [(i, t) for i, t in enumerate(CLEAN + JUNK)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["bucket"]: r["weight"] for r in train_quality_lr(df).collect()}
    want = py_train(docs)
    assert set(got) == set(range(64))
    for b in range(64):
        # both sides round to 6dp at the same boundaries; allow one
        # rounding quantum for boundary-straddling float association
        assert abs(got[b] - want[b]) <= 1.1e-6, (b, got[b], want[b])


def test_trained_weights_separate_clean_from_junk(spark):
    """The point of training: applying the learned weights as the mean
    bucket-weight scorer must rank every clean doc above every junk
    doc (junk's repeated token concentrates negative-gradient mass in
    one bucket)."""
    docs = [(i, t) for i, t in enumerate(CLEAN + JUNK)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    w = {r["bucket"]: r["weight"] for r in train_quality_lr(df).collect()}

    def score(text):
        toks = [t for t in text.lower().split(" ") if t]
        return sum(
            w[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 64] for t in toks
        ) / max(len(toks), 1)

    clean_scores = [score(t) for t in CLEAN]
    junk_scores = [score(t) for t in JUNK]
    assert min(clean_scores) > max(junk_scores)
    assert max(junk_scores) < 0 < min(clean_scores)


def test_apply_closes_the_train_infer_loop(spark):
    """apply_quality_lr over the trained weights reproduces the python
    scorer exactly (same mean-bucket-weight linear form the descent
    optimized), flags every junk doc keep=False and every clean doc
    keep=True, and scores an empty doc 0.0 instead of dropping it."""
    docs = [(i, t) for i, t in enumerate(CLEAN + JUNK)] + [(99, "")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    w = train_quality_lr(df)
    got = {r["doc_id"]: r for r in apply_quality_lr(df, w).collect()}
    wmap = {r["bucket"]: r["weight"] for r in w.collect()}
    assert set(got) == set(range(len(CLEAN) + len(JUNK))) | {99}
    for did, text in docs:
        toks = [t for t in text.lower().split(" ") if t]
        want = round(
            sum(
                wmap[int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 64]
                for t in toks
            )
            / max(len(toks), 1),
            6,
        )
        assert abs(got[did]["quality_logit"] - want) <= 1.1e-6
        assert got[did]["keep"] == (got[did]["quality_logit"] >= 0)
    assert got[99]["quality_logit"] == 0.0
    for i in range(len(CLEAN)):
        assert got[i]["keep"]
    for i in range(len(CLEAN), len(CLEAN) + len(JUNK)):
        assert not got[i]["keep"]


def test_training_decreases_logloss(spark):
    """Each gradient step must reduce the mean logistic loss on the
    training labels — the descent is a descent, not just a hash-stable
    computation."""
    docs = [(i, t) for i, t in enumerate(CLEAN + JUNK)]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def logloss(wmap):
        total = 0.0
        for _did, text in docs:
            toks = [t for t in text.lower().split(" ") if t]
            y = 1.0 if text in CLEAN else 0.0
            z = sum(
                wmap.get(int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % 64, 0.0)
                for t in toks
            ) / max(len(toks), 1)
            p = 1.0 / (1.0 + math.exp(-z))
            total += -(y * math.log(p) + (1 - y) * math.log(1 - p))
        return total / len(docs)

    losses = [logloss({})]  # w=0 baseline: ln(2)
    for k in (1, 2, 3):
        wmap = {
            r["bucket"]: r["weight"]
            for r in train_quality_lr(df, iters=k).collect()
        }
        losses.append(logloss(wmap))
    assert abs(losses[0] - math.log(2)) < 1e-12
    assert losses[0] > losses[1] > losses[2] > losses[3]


def test_spine_keeps_unobserved_buckets(spark):
    """Exactly n_buckets rows regardless of corpus vocabulary; buckets
    no token hashes to stay at 0.0 through every iteration."""
    df = spark.createDataFrame([(1, "solo")], "doc_id long, text string")
    out = train_quality_lr(df, n_buckets=16).collect()
    assert len(out) == 16
    hit = int(hashlib.md5(b"solo").hexdigest()[:8], 16) % 16
    for r in out:
        if r["bucket"] == hit:
            assert r["weight"] != 0.0
        else:
            assert r["weight"] == 0.0


def test_eval_trained_beats_baseline(spark):
    """t21's eval loop on a learnable synthetic corpus: junk docs repeat
    one token (entropy < 2 bits -> y=0), clean docs mix many (y=1); the
    trained model's held-out AUC must be defined, near-perfect, and
    beat the zero-weight baseline (rank by doc_id). Split assignment is
    the deterministic md5 bucket, so held-out membership is stable."""
    from kafka_streaming_polymarket_pipeline_spark.operators.text import quality_lr_eval

    vocab = [
        "river", "engine", "window", "batch", "stream", "table", "query",
        "sorted", "hash", "join", "state", "event", "core", "plan",
    ]
    docs = []
    for i in range(40):
        words = [vocab[(i + k * 3) % len(vocab)] for k in range(12)]
        docs.append((i, "en", " ".join(words)))
    for i in range(40, 80):
        tok = ["aa", "zz", "qq"][i % 3]
        docs.append((i, "en", " ".join([tok] * 12)))
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    row = quality_lr_eval(df).collect()[0]
    assert row.n_held > 0 and row.n_pos > 0 and row.n_neg > 0, row
    assert row.n_held == row.tp + row.fp + row.tn + row.fn
    assert row.auc is not None and row.auc_baseline is not None
    assert row.auc > row.auc_baseline, row
    assert row.auc >= 0.9, row


def test_eval_single_class_auc_null(spark):
    """With one class held out, rank-sum AUC is undefined: both AUC
    columns must be NULL while the confusion counts still fill."""
    from kafka_streaming_polymarket_pipeline_spark.operators.text import quality_lr_eval

    docs = [(i, "en", "the quick brown fox jumps high") for i in range(30)]
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    row = quality_lr_eval(df).collect()[0]
    assert row.n_pos == row.n_held and row.n_neg == 0
    assert row.auc is None and row.auc_baseline is None


def test_calibration_bins_partition_heldout(spark):
    """t22's reliability diagram on the learnable synthetic corpus:
    bins partition the held-out docs (counts sum to n_held), every bin
    id is a valid adaptive decile, per-bin accounting is internally
    consistent (n_pos <= n_docs, gap == |avg_p - pos_rate| at 6 dp),
    and the junk/clean structure separates — the top bin must be purer
    than the bottom bin."""
    from kafka_streaming_polymarket_pipeline_spark.operators.text import (
        quality_lr_calibration,
        quality_lr_eval,
    )

    vocab = [
        "river", "engine", "window", "batch", "stream", "table", "query",
        "sorted", "hash", "join", "state", "event", "core", "plan",
    ]
    docs = []
    for i in range(40):
        words = [vocab[(i + k * 3) % len(vocab)] for k in range(12)]
        docs.append((i, "en", " ".join(words)))
    for i in range(40, 80):
        tok = ["aa", "zz", "qq"][i % 3]
        docs.append((i, "en", " ".join([tok] * 12)))
    df = spark.createDataFrame(docs, "doc_id long, lang string, text string")
    rows = quality_lr_calibration(df).collect()
    n_held = quality_lr_eval(df).collect()[0].n_held
    assert sum(r.n_docs for r in rows) == n_held
    assert all(0 <= r.bin <= 9 for r in rows)
    for r in rows:
        assert 0 <= r.n_pos <= r.n_docs
        assert abs(r.gap - round(abs(r.avg_p - r.pos_rate), 6)) < 2e-6, r
    by_bin = {r.bin: r for r in rows}
    lo, hi = min(by_bin), max(by_bin)
    assert by_bin[hi].pos_rate >= by_bin[lo].pos_rate, (by_bin[lo], by_bin[hi])
