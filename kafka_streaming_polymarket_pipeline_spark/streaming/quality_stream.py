"""Streaming corpus quality gate: the t16 hashed-feature classifier and
t17 char-entropy filter applied to a document stream, with a keep /
quarantine split.

Both feature sets are stateless row-local expressions, so the SAME plan
runs over a batch frame or a readStream frame — no watermark, no state
store, and the streaming micro-batch output is bit-identical to the
batch run over the same files (asserted in
tests/test_streaming_quality.py). This is the online admission filter a
continuously-ingesting training-data pipeline runs in front of the
dedup index: reject gibberish/low-quality documents BEFORE they cost
signature computation and index writes.

At scale: map-only inside whole-stage codegen; throughput is bounded by
source read bandwidth, and the split writes are two append-only sinks
(no rewrite amplification).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import text as T

ENTROPY_MIN_BITS = 2.0  # below ~2 bits/char is repetitive junk / binary


def quality_features_frame(docs: DataFrame, entropy_min: float = ENTROPY_MIN_BITS) -> DataFrame:
    """Attach classifier + entropy features and the admission flag.

    Works identically on batch and streaming frames (stateless). The keep
    rule is the conjunction the papers use independently: classifier
    logit >= 0 (fastText-style quality, Joulin et al. 2016) AND character
    entropy above the gibberish floor (low-entropy filter).
    """
    clf = T.quality_classifier_features(F.col("text"))
    logit = F.round(clf["quality_logit"], 6)
    entropy = F.round(F.col("char_entropy_bits"), 6) + F.lit(0.0)
    return T.char_entropy_frame(docs).select(
        "doc_id",
        "lang",
        "source",
        logit.alias("quality_logit"),
        entropy.alias("char_entropy_bits"),
        ((logit >= 0) & (entropy >= entropy_min)).alias("keep"),
    )


def quality_split(
    docs: DataFrame, entropy_min: float = ENTROPY_MIN_BITS
) -> tuple[DataFrame, DataFrame]:
    """(kept, quarantined) frames — both derived from one feature plan so
    a row lands in exactly one sink."""
    feats = quality_features_frame(docs, entropy_min)
    return feats.filter(F.col("keep")), feats.filter(~F.col("keep"))
