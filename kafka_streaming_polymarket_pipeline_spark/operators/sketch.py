"""Count-min sketch: fixed-size frequency counters + heavy-hitter probes.

The streaming-sketch complement of a13's HLL: where HLL answers "how many
distinct", CMS answers "how often is THIS key" in O(d x w) memory however
large the stream. Unlike HLL (whose estimates are engine-specific, so a13
is rows-only), this CMS is built on md5 bucket hashing that DuckDB
replicates verbatim — the ENTIRE sketch, estimates included, is
hash-gated (Cormode & Muthukrishnan 2005 structure; deterministic by
construction).

Scale shape: the counter build explodes each row into d (seed, bucket)
pairs and aggregates — map-side partial aggregation collapses every task
to <= d*w counter rows before the shuffle, so the shuffle volume is
O(tasks x d x w), independent of stream length. The probe side joins the
broadcast counter table (d*w rows) on (seed, bucket) equi-keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CMS_DEPTH = 4   # d: independent hash rows (error probability ~ e^-d)
CMS_WIDTH = 256  # w: buckets per row (overestimate ~ N*e/w)


def _bucket(key: Column, seed: Column) -> Column:
    """md5('<seed>:<key>') first 8 hex chars mod width — cross-engine
    reproducible (DuckDB: ('0x'||substr(md5(..),1,8))::BIGINT % w)."""
    h = F.md5(F.concat_ws(":", seed.cast("string"), key.cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % CMS_WIDTH


def _with_seed_buckets(df: DataFrame, key_col: str) -> DataFrame:
    """Explode each row into CMS_DEPTH (seed, bucket) pairs."""
    pairs = F.array(
        *[
            F.struct(
                F.lit(s).cast("int").alias("seed"),
                _bucket(F.col(key_col), F.lit(s)).alias("bucket"),
            )
            for s in range(CMS_DEPTH)
        ]
    )
    return df.select(key_col, F.explode(pairs).alias("_sb")).select(
        key_col, F.col("_sb.seed").alias("seed"), F.col("_sb.bucket").alias("bucket")
    )


def cms_counters(stream: DataFrame, key_col: str) -> DataFrame:
    """(seed, bucket, cnt): the d x w counter table for a key stream.

    Works unchanged on a Structured Streaming input — the explode is
    stateless and the groupBy is a standard streaming aggregation whose
    state is BOUNDED at d x w rows forever (the defining property of the
    sketch: no watermark needed, no state growth). Run with outputMode
    complete/update; tests prove stream == batch counters."""
    return (
        _with_seed_buckets(stream, key_col)
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def cms_heavy_hitters(stream: DataFrame, key_col: str, k: int = 10) -> DataFrame:
    """Exact top-k keys with their CMS estimates and the sketch's
    overestimate (>= 0 always — the CMS one-sided error guarantee, which
    the oracle hash-gates row-by-row). Probes join the broadcast counter
    table per seed and take the min across seeds."""
    counters = cms_counters(stream, key_col)
    exact = stream.groupBy(key_col).agg(F.count("*").alias("exact_n"))
    topk = exact.orderBy(F.desc("exact_n"), F.asc(key_col)).limit(k)
    probes = _with_seed_buckets(topk, key_col).join(
        F.broadcast(counters), ["seed", "bucket"]
    )
    est = probes.groupBy(key_col).agg(F.min("cnt").alias("cms_est"))
    return (
        topk.join(est, key_col)
        .select(
            key_col,
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overestimate"),
        )
    )


# --- Bloom filter: membership prefilter for decontamination at scale ---
#
# t8's exact decontamination joins every training gram against the
# benchmark gram set. At 100 TB the right shape is a BLOOM PREFILTER:
# a few KB of bits broadcast to every task answers "definitely clean"
# for the overwhelming majority of grams map-side, and only the maybe
# set (true hits + false positives) proceeds to the exact join. Like
# the CMS above — and unlike library blooms — the md5 bit positions are
# engine-portable, so the filter CONTENTS and every probe verdict are
# hash-gated against the DuckDB oracle (Bloom 1970 structure).

BLOOM_WORDS = 512  # 512 x 32-bit words = 16384 bits (~4 KB as BIGINT rows):
# sized so the sf0.01 bench gram set (~1.3k keys) fills ~21% of bits ->
# ~1% false-positive rate at k=3; at 100 TB you size m/k from the key
# count the same way (m ~ 1.44 * k * n_keys for target FP) — the table
# stays broadcast-trivial into the megabytes
BLOOM_BITS = BLOOM_WORDS * 32
BLOOM_K = 3        # hash functions per key


def _bloom_pos(key: Column, seed: int) -> tuple[Column, Column]:
    """(word, bit) for one hash of ``key`` — only bits 0..31 of each
    word are used so shifted values never touch the sign bit."""
    h = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), key)), 1, 8), 16, 10
    ).cast("long") % BLOOM_BITS
    return F.floor(h / 32).cast("int"), (h % 32).cast("int")


def bloom_build(keys: DataFrame, key_col: str = "g") -> DataFrame:
    """(word, bits): the filter as <= BLOOM_WORDS rows — broadcastable
    at any input cardinality (the point of the structure)."""
    pos = keys.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        _bloom_pos(F.col(key_col), s)[0].alias("word"),
                        _bloom_pos(F.col(key_col), s)[1].alias("bit"),
                    )
                    for s in range(BLOOM_K)
                ]
            )
        ).alias("_p")
    ).select("_p.word", "_p.bit")
    return pos.groupBy("word").agg(
        F.bit_or(F.expr("shiftleft(1L, bit)")).alias("bits")
    )


def bloom_probe(items: DataFrame, bloom: DataFrame, key_col: str = "g") -> DataFrame:
    """items + ``maybe`` flag: False means DEFINITELY absent (the Bloom
    guarantee); True means present-or-false-positive. The bloom side is
    broadcast; probing is map-side apart from the tiny word join."""
    probes = items.select(
        "*",
        F.explode(
            F.array(
                *[
                    F.struct(
                        _bloom_pos(F.col(key_col), s)[0].alias("word"),
                        _bloom_pos(F.col(key_col), s)[1].alias("bit"),
                    )
                    for s in range(BLOOM_K)
                ]
            )
        ).alias("_p"),
    ).select("*", F.col("_p.word").alias("word"), F.col("_p.bit").alias("bit"))
    hit = (
        F.expr("(shiftright(coalesce(bits, 0L), bit) & 1) = 1")
    )
    return (
        probes.join(F.broadcast(bloom), "word", "left")
        .withColumn("_hit", hit)
        .groupBy(*items.columns)
        .agg(F.bool_and("_hit").alias("maybe"))
    )


# --- Portable HyperLogLog: the fully hash-gated distinct-count sketch ---
#
# a13 uses Spark's built-in HLL++, whose estimates are engine-specific —
# the registry's one permanently rows-only row. This HLL (Flajolet et
# al. 2007) is built from the same md5 hashing as the CMS/Bloom above,
# so registers AND estimates are bit-identical across engines and the
# whole sketch is hash-gated. Error ~ 1.04/sqrt(m) ≈ 6.5% at m=256.
#
# Determinism note: sum(2^-R) over registers is a sum of exact powers of
# two with rank <= 25 — every partial sum fits in < 53 mantissa bits, so
# the aggregation is EXACT and order-independent; the only libm call
# (ln, in the small-range correction) lands under the 6-dp output round.

HLL_P = 8           # 2^8 = 256 registers
HLL_M = 1 << HLL_P
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)  # standard bias constant


def hll_distinct(stream: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(group, hll_est): portable HLL distinct-count per group —
    ``hll_registers`` + ``hll_estimate`` composed (batch form)."""
    return hll_estimate(hll_registers(stream, group_col, key_col), group_col)


def hll_registers(stream: DataFrame, group_col: str, key_col: str) -> DataFrame:
    """(grp, bucket, rmax): the register table — the part a STREAM
    maintains. One groupBy(group, bucket) max: map-side partials collapse
    every task to <= groups x m rows, and as a streaming aggregation the
    state is bounded there forever (mergeable by max — which is also why
    a single stateful operator suffices; the estimate finalization is a
    query-time batch step over the tiny register table, see
    ``hll_estimate``)."""
    h = F.conv(
        F.substring(F.md5(F.col(key_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    bucket = (h / F.lit(1 << 24)).cast("long")  # top 8 of 32 bits
    w = h % F.lit(1 << 24)                      # low 24 bits
    rank = F.when(w == 0, F.lit(25)).otherwise(
        F.lit(25) - F.length(F.conv(w.cast("string"), 10, 2))
    )
    return (
        stream.select(F.col(group_col).alias("grp"), bucket.alias("bucket"), rank.alias("r"))
        .groupBy("grp", "bucket")
        .agg(F.max("r").alias("rmax"))
    )


def hll_estimate(regs: DataFrame, group_col: str) -> DataFrame:
    """Finalize (grp, bucket, rmax) registers into (group, hll_est)."""
    per_group = regs.groupBy("grp").agg(
        F.count("*").alias("n_present"),
        # 1.0 / 2^r, not pow(2.0, -r): the shift+divide is IEEE-exact
        # (libm pow may be off by an ulp), preserving the exact-sum
        # argument above.
        F.sum(F.lit(1.0) / F.expr("shiftleft(1L, rmax)")).alias("s_present"),
    )
    m = F.lit(float(HLL_M))
    s = (m - F.col("n_present")) + F.col("s_present")  # empty registers add 2^0
    e_raw = F.lit(HLL_ALPHA) * m * m / s
    v = m - F.col("n_present")  # empty-register count
    est = F.when((e_raw <= 2.5 * m) & (v > 0), m * F.log(m / v)).otherwise(e_raw)
    return per_group.select(
        F.col("grp").alias(group_col), F.round(est, 6).alias("hll_est")
    )


# --- Bottom-k sample quantiles: the portable mergeable quantile sketch ---
#
# a12 computes exact sort-based percentiles; a14 gates Spark's built-in
# percentile_approx (KLL/GK-style, engine-specific estimates — rows-only
# without a band gate). This sketch is the a17-vs-a13 move applied to
# QUANTILES: a bottom-k sample under the portable md5 rank is a uniform
# sample that any engine reproduces bit-for-bit, so the interpolated
# quantile ESTIMATES are hash-gated, not just banded. Bottom-k is
# mergeable (bottom-k of a union = bottom-k of the unioned bottom-k's),
# so per-partition / per-day sketches combine exactly like KMV (a30).

SQ_K = 512  # sample size; rank error ~ O(1/sqrt(k)) per quantile


def sample_quantile_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = SQ_K,
    margin: int = 8,
) -> DataFrame:
    """(group, n_events, sample_k, est_p50, est_p95, est_p99): quantile
    estimates from the k rows with the smallest portable md5 rank per
    group — deterministic, mergeable, hash-gated.

    100 TB shape (the reason this exists next to a12's global sort):
    pass 1 counts each group (map-side combine, tiny result broadcast
    back); pass 2 keeps only rows whose 32-bit hash falls below
    ``margin * k / n`` of the hash space — ~margin*k survivors per group
    regardless of group size — and the exact bottom-k window runs over
    that residue, so the per-group sort the window implies touches
    O(margin*k) rows, never the group. The filter can only lose a true
    bottom-k member if fewer than k of n uniform hashes land below
    margin*k/n of the space: P ~ exp(-k*(margin-1-ln margin)) ~ e^-2500
    at k=512, margin=8 — not a float edge, a counting bound (same
    budget discipline as d3's documented <=3e-6 LSH miss). Groups with
    n <= margin*k skip no rows (threshold clamps to full space), so
    small groups yield EXACT quantiles by construction."""
    h = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10
    ).cast("long")
    counts = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count("*").alias("_n")
    )
    rows = df.select(
        F.col(group_col).alias("_g"),
        F.col(value_col).alias("_v"),
        F.col(id_col).alias("_id"),
        h.alias("_h"),
    ).join(F.broadcast(counts), "_g")
    space = F.lit(float(1 << 32))
    thresh = F.least(
        space,
        F.ceil(space * F.lit(float(margin * k)) / F.col("_n")).cast("double"),
    )
    surv = rows.filter(F.col("_h") < thresh)
    w = Window.partitionBy("_g").orderBy(F.asc("_h"), F.asc("_id"))
    sample = surv.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    return (
        sample.groupBy("_g")
        .agg(
            F.count("*").alias("sample_k"),
            F.round(F.expr("percentile(_v, 0.5)"), 4).alias("est_p50"),
            F.round(F.expr("percentile(_v, 0.95)"), 4).alias("est_p95"),
            F.round(F.expr("percentile(_v, 0.99)"), 4).alias("est_p99"),
            F.max("_n").alias("n_events"),
        )
        .select(
            F.col("_g").alias(group_col),
            "n_events",
            "sample_k",
            "est_p50",
            "est_p95",
            "est_p99",
        )
    )
