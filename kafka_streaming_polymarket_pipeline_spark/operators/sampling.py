"""Deterministic sampling / dataset-split operators for training-data
pipelines.

A 100 TB corpus can't be split with ``rand()`` — re-runs must assign every
document to the same split (reproducible experiments, incremental re-builds),
and the split must be computable row-locally (no shuffle, no global state).
Both operators key on an **engine-portable content hash** (md5 of
``stratum:id``) so any engine — the DuckDB oracle included — reproduces the
assignment bit-for-bit. Salting the hash with the stratum decorrelates split
assignment across strata (doc 7 being 'test' for lang=en says nothing about
doc 7 for lang=de).

- :func:`hash_split`: constant train/validation/test tagging, map-only.
- :func:`stratified_exact_sample`: *exactly* ceil(frac * n) rows per stratum,
  chosen by hash order (deterministic, unbiased for hash-independent
  content). One window shuffle on the stratum key; at 100 TB strata are
  large and few, so the per-stratum sort is the cost — acceptable for
  sample-building jobs, and the hash-bucket filter form (``bucket(id) <
  frac * NUM_BUCKETS``, approximate counts, zero shuffle) is the map-only
  alternative when exactness per stratum isn't required (that form is
  exactly :func:`hash_split` with different cut points).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

NUM_BUCKETS = 100


def _hash_key(id_col: Column, stratum_col: Column) -> Column:
    """md5 of 'stratum:id' — the portable per-row sampling key."""
    return F.md5(F.concat_ws(":", stratum_col.cast("string"), id_col.cast("string")))


def split_bucket(id_col: Column, stratum_col: Column) -> Column:
    """Deterministic bucket in [0, NUM_BUCKETS): first 8 hex digits of the
    sampling key, mod NUM_BUCKETS."""
    return F.conv(F.substring(_hash_key(id_col, stratum_col), 1, 8), 16, 10).cast(
        "bigint"
    ) % NUM_BUCKETS


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
    train: int = 80,
    validation: int = 10,
) -> DataFrame:
    """Tag every row train/validation/test by its deterministic hash bucket
    (train/validation percentages; the rest is test). Map-only: scales
    linearly, re-runs reproduce the same assignment."""
    b = split_bucket(F.col(id_col), F.col(stratum_col))
    return df.select(
        id_col,
        stratum_col,
        F.when(b < train, "train")
        .when(b < train + validation, "validation")
        .otherwise("test")
        .alias("split"),
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    default_rate: float = 0.0,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> DataFrame:
    """Deterministic data-mixture sampling: per-stratum sampling rates (the
    multilingual/domain up-/down-weighting step of an LLM data pipeline —
    e.g. keep all en, half es, a tenth of everything else). Exactly
    ceil(rate_s * n_s) rows per stratum s, selected in sampling-key order;
    strata not in ``rates`` use ``default_rate``. Same shape and
    determinism argument as :func:`stratified_exact_sample`, with the rate
    a per-stratum CASE instead of a constant."""
    rate = None
    for s, r in sorted(rates.items()):
        cond = F.col(stratum_col) == s
        rate = F.when(cond, r) if rate is None else rate.when(cond, r)
    rate = F.lit(default_rate) if rate is None else rate.otherwise(default_rate)
    w = Window.partitionBy(stratum_col).orderBy(
        _hash_key(F.col(id_col), F.col(stratum_col)), F.col(id_col)
    )
    wn = Window.partitionBy(stratum_col)
    return (
        df.select(
            id_col,
            stratum_col,
            rate.alias("_rate"),
            F.row_number().over(w).alias("_rn"),
            F.count("*").over(wn).alias("_n"),
        )
        .filter(F.col("_rn") <= F.ceil(F.col("_rate") * F.col("_n")))
        .select(id_col, stratum_col)
    )


def stratified_exact_sample(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    stratum_col: str = "lang",
) -> DataFrame:
    """Exactly ceil(fraction * n) rows per stratum, selected in sampling-key
    order (deterministic; unbiased when content is hash-independent).
    One window shuffle on the stratum; ties impossible (key includes id)."""
    w = Window.partitionBy(stratum_col).orderBy(
        _hash_key(F.col(id_col), F.col(stratum_col)), F.col(id_col)
    )
    wn = Window.partitionBy(stratum_col)
    return (
        df.select(
            id_col,
            stratum_col,
            F.row_number().over(w).alias("_rn"),
            F.count("*").over(wn).alias("_n"),
        )
        .filter(F.col("_rn") <= F.ceil(fraction * F.col("_n")))
        .select(id_col, stratum_col)
    )


def group_split(
    df: DataFrame,
    group_col: str = "source",
    train: int = 80,
    validation: int = 10,
) -> DataFrame:
    """Leakage-safe split: the bucket hashes ONLY the group key, so every
    row of a group (a crawl domain, a document source) lands in the same
    split — near-duplicates that share provenance cannot straddle
    train/test (the GroupShuffleSplit contract). Map-only: no join against
    a group table, no shuffle, identical assignment on every engine."""
    b = F.conv(F.substring(F.md5(F.col(group_col).cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    ) % NUM_BUCKETS
    return df.select(
        "doc_id",
        group_col,
        F.when(b < train, "train")
        .when(b < train + validation, "validation")
        .otherwise("test")
        .alias("split"),
    )


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the Efraimidis–Spirakis
    (2006) exponential-key trick: u = deterministic uniform from md5(id),
    key = ln(u) / w, keep the k largest keys. One distributed top-k
    (TakeOrderedAndProject: per-partition heaps merged at the driver —
    never a global sort), so a 1B-row corpus draws a k-row sample with
    map-side work plus a k-row merge. The key is ROUNDED to 9 dp with an
    id tie-break so libm-vs-JVM log() ulp differences cannot reorder the
    cut on any engine."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast("long")
    u = (h + F.lit(1.0)) / F.lit(4294967296.0)  # (0, 1]
    key = F.round(F.log(u) / weight_col, 9)
    return (
        df.select(F.col(id_col), weight_col.alias("weight"), key.alias("sample_key"))
        .orderBy(F.desc("sample_key"), F.asc(id_col))
        .limit(k)
    )


def _dsir_grams_by_bucket(df, n_buckets, id_col, text_col, with_target=None):
    """(did[, tgt], bucket, cnt): md5-hashed unigram+bigram occurrence
    counts per doc — the shared feature stage of the DSIR model fit and
    scorer. ``with_target`` (a Column) adds the target flag."""
    from kafka_streaming_polymarket_pipeline_spark.operators.text import (
        _gram_join,
        tokens,
    )

    toks = tokens(F.lower(F.col(text_col)))
    cols = [F.col(id_col).alias("did"), toks.alias("toks")]
    if with_target is not None:
        cols.append(with_target.alias("tgt"))
    base = df.select(*cols)
    bigrams = F.when(F.size("toks") >= 2, _gram_join(F.col("toks"), 2)).otherwise(
        F.array().cast("array<string>")
    )
    keys = ["did"] + (["tgt"] if with_target is not None else [])
    grams = base.select(
        *keys, F.explode(F.concat(F.col("toks"), bigrams)).alias("g")
    )
    bucket = (
        F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long") % n_buckets
    ).cast("int")
    return (
        grams.select(*keys, bucket.alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count("*").alias("cnt"))
    ), base


def _dsir_labeled_grams(df, n_buckets, entropy_min, id_col, text_col, target=None):
    """(tb, base) with the target flag attached — the shared feature
    stage of the model fit (and of dsir_select's one-pass composition).
    ``target`` (any boolean/int Column over ``df``'s rows) overrides the
    default char-entropy gate; at the driver's gate SFs the entropy gate
    is DEGENERATE (every doc clears 2.0 bits, so tgt == raw and every
    lam is 0 — found by the r10 margin audit), which is why x9c gates a
    lang-slice target whose lams are 64/64 non-zero."""
    if target is not None:
        labeled = df.withColumn("_tgt", target.cast("int"))
    else:
        from kafka_streaming_polymarket_pipeline_spark.operators.text import (
            char_entropy_frame,
        )

        labeled = char_entropy_frame(df, text_col).withColumn(
            "_tgt",
            (F.round(F.col("char_entropy_bits"), 6) >= entropy_min).cast("int"),
        )
    return _dsir_grams_by_bucket(
        labeled, n_buckets, id_col, text_col, with_target=F.col("_tgt")
    )


def _model_from_tb(tb: DataFrame, spark, n_buckets: int) -> DataFrame:
    """Fold a (did, tgt, bucket, cnt) gram table into the n_buckets-row
    (bucket, lam_micro) model — two <= n_buckets-row aggregates."""
    spine = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    bt = spine.join(
        tb.groupBy("bucket").agg(
            F.sum("cnt").alias("raw_cnt"),
            F.sum(F.when(F.col("tgt") == 1, F.col("cnt"))).alias("tgt_cnt"),
        ),
        "bucket",
        "left",
    ).select(
        "bucket",
        F.coalesce("raw_cnt", F.lit(0)).alias("raw_cnt"),
        F.coalesce("tgt_cnt", F.lit(0)).alias("tgt_cnt"),
    )
    tot = bt.agg(
        F.sum("raw_cnt").cast("double").alias("rtot"),
        F.sum("tgt_cnt").cast("double").alias("ttot"),
    )
    return bt.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.round(
            (
                F.log((F.col("tgt_cnt") + 1.0) / (F.col("ttot") + float(n_buckets)))
                - F.log((F.col("raw_cnt") + 1.0) / (F.col("rtot") + float(n_buckets)))
            )
            * 1e6
        )
        .cast("long")
        .alias("lam_micro"),
    )


def dsir_model(
    df: DataFrame,
    n_buckets: int = 64,
    entropy_min: float = 2.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    target: Column | None = None,
) -> DataFrame:
    """Fit the DSIR importance model: exactly ``n_buckets`` rows
    (bucket, lam_micro) where lam_micro is the integer-micro-unit
    log-ratio of the add-one-smoothed target vs raw hashed-n-gram
    bucket models (target = the char-entropy-gated slice). This is the
    offline stage a standing ingest job freezes at build time (the
    drift-monitor reference-histogram pattern); :func:`dsir_score`
    applies it to any frame, batch or per-micro-batch."""
    tb, _ = _dsir_labeled_grams(df, n_buckets, entropy_min, id_col, text_col, target)
    return _model_from_tb(tb, df.sparkSession, n_buckets)


def dsir_score(
    df: DataFrame,
    lam: DataFrame,
    n_buckets: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, score_micro): per-doc DSIR importance log-weight in
    integer micro-units under a FITTED model ``lam`` (bucket,
    lam_micro) — one broadcast join of the <= n_buckets model table plus
    a bigint groupBy(doc); gramless docs score 0 (empty product). Works
    identically on batch frames and inside foreachBatch."""
    tb, base = _dsir_grams_by_bucket(df, n_buckets, id_col, text_col)
    return (
        base.select("did")
        .join(
            tb.join(F.broadcast(lam), "bucket")
            .groupBy("did")
            .agg(F.sum(F.col("cnt") * F.col("lam_micro")).alias("s")),
            "did",
            "left",
        )
        .select(
            F.col("did").alias(id_col),
            F.coalesce("s", F.lit(0)).cast("long").alias("score_micro"),
        )
    )


def gumbel_micro(id_col: str = "doc_id") -> Column:
    """Deterministic per-row Gumbel noise in integer micro-units:
    round(-ln(-ln(u)) * 1e6) with u = (md5_32(id) + 0.5) / 2^32 in
    (0, 1). u is EXACTLY representable (integer + 0.5 over a power of
    two), so the only float evaluation is the two nested logs; the
    margin audit (tests/test_sampling_margins.py) asserts every value
    at the gate SFs sits far enough from a .5 micro boundary that a
    multi-ulp libm difference cannot flip the round on any engine."""
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    u = (h + F.lit(0.5)) / F.lit(4294967296.0)  # (0, 1)
    return F.round(-F.log(-F.log(u)) * 1e6).cast("long")


def dsir_select(
    df: DataFrame,
    k: int = 100,
    n_buckets: int = 64,
    entropy_min: float = 2.0,
    id_col: str = "doc_id",
    text_col: str = "text",
    target: Column | None = None,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    pick the raw-corpus documents whose hashed-n-gram distribution looks
    most like a TARGET slice — the standard pretraining-data selection
    step ("make the crawl look like Wikipedia"). Target here is the
    char-entropy-gated slice (round(entropy, 6) >= ``entropy_min``), the
    same distillation signal t20 trains on; raw is the whole corpus.

    Math: features are md5-hashed unigrams+bigrams in ``n_buckets``
    buckets (the paper's hashed n-gram space; t16's fastText feature
    shape). Bag-of-words bucket models with add-one smoothing:
    p_b = (tgt_b + 1) / (T + B), q_b = (raw_b + 1) / (R + B). A doc's
    importance log-weight is sum_b c_db * (ln p_b - ln q_b); sampling
    WITHOUT replacement from weights ~ exp(logw) is Gumbel-top-k:
    key = logw + g_d with g_d = -ln(-ln(u_d)) from a deterministic
    md5 uniform (the x8 Efraimidis-Spirakis cousin — E-S keys ln(u)/w;
    Gumbel-top-k adds noise to the LOG weight, the form DSIR states).

    Engine-exactness is INTEGER, stronger than the 6-dp precedent: the
    per-bucket log-ratio and the per-doc Gumbel are each rounded once to
    integer MICRO-units (x1e6, <= n_buckets + n_docs rounding sites on
    identical doubles), and everything after — the per-doc score
    sum(c_db * lam_b), the key, the top-k cut — is exact BIGINT
    arithmetic, immune to float association order on any engine.

    Scale shape: one gram explode (the word-count shuffle), two
    <= n_buckets-row aggregates folded back via broadcast, one
    groupBy(doc) bigint sum, then TakeOrderedAndProject (per-partition
    heaps, k-row driver merge — no global sort). Nothing collects; the
    model tables stay bytes-sized however the corpus grows. Gramless
    (empty-text) docs carry logw = 0 — an empty product is weight 1,
    so they compete on Gumbel noise alone, matching the oracle.

    Composed from :func:`dsir_model` (the offline fit a standing ingest
    job freezes) + :func:`dsir_score` + the Gumbel cut.

    Reference lineage: the reference has no data-selection surface; this
    extends the training-data family (x1-x8) per SURVEY §6.
    """
    from pyspark import StorageLevel

    # ONE gram explode feeds both stages: the (did, tgt, bucket, cnt)
    # table is persisted and consumed by the model fold AND the per-doc
    # score (calling dsir_model + dsir_score separately would tokenize
    # and shuffle the corpus twice — the dominant cost).
    tb, base = _dsir_labeled_grams(df, n_buckets, entropy_min, id_col, text_col, target)
    tb = tb.persist(StorageLevel.MEMORY_AND_DISK)
    lam = _model_from_tb(tb, df.sparkSession, n_buckets)
    scores = (
        base.select("did")
        .join(
            tb.join(F.broadcast(lam), "bucket")
            .groupBy("did")
            .agg(F.sum(F.col("cnt") * F.col("lam_micro")).alias("s")),
            "did",
            "left",
        )
        .select("did", F.coalesce("s", F.lit(0)).cast("long").alias("score_micro"))
        .withColumnRenamed("did", id_col)
    )
    g_micro = gumbel_micro(id_col)
    return (
        scores.select(
            id_col,
            "score_micro",
            (F.col("score_micro") + g_micro).alias("key_micro"),
        )
        .orderBy(F.desc("key_micro"), F.asc(id_col))
        .limit(k)
    )
