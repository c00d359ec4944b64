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

from pyspark.sql import Column, DataFrame
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
