"""Physical-layout operators for cluster scale: bucketing and skew salting.

Neither changes query semantics — they change the *shuffle structure*:

- **Bucketing** pre-partitions a table by join/agg key at write time, so a
  join of two tables bucketed on the same key with the same bucket count
  runs shuffle-free (SortMergeJoin reads co-located buckets). At 100 TB
  this is the difference between re-shuffling the fact table on every run
  and shuffling it once at landing. (The reference's Postgres expression
  indexes on payload->>'market_id', init.sql:15-76, served the same
  read-locality intent.)

- **Salting** splits a hot key into `salt_n` synthetic sub-keys so one
  skewed group (one market's orderbook burst, one whale wallet) spreads
  over `salt_n` tasks: aggregate per (key, salt) first — map-side combine
  does most of the work — then re-aggregate per key. AQE's skew-join
  handles *join* skew at runtime; salting is for *aggregation* skew, which
  AQE does not split.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: Sequence[str],
    n_buckets: int,
    path: str,
    sort_by: Sequence[str] | None = None,
) -> None:
    """Land ``df`` as a bucketed parquet table (external, at ``path``).

    Joins/aggregations on ``keys`` between tables bucketed identically skip
    the exchange entirely (verified by plan assertion in tests).
    """
    w = df.write.mode("overwrite").option("path", path).bucketBy(n_buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def fan_out_narrow(df: DataFrame, width: int | None = None) -> DataFrame:
    """Scale-adaptive parallelism guard for heavy per-row map stages
    (shingle/token explodes, per-char folds, per-vector scans) that run
    BEFORE their first shuffle: when the input arrives in fewer
    partitions than the machine's parallelism (a single small parquet
    file is one input split — guide §2.5 input skew in its degenerate
    form; a 2-file micro-batch is two), round-robin repartition it up.
    When the input is already at least that wide — any real 100 TB scan
    — this is a NO-OP: no exchange is added, so it is scale-adaptive,
    not a local-mode constant. Row-set semantics are unchanged (round
    robin; sortBeforeRepartition keeps retries deterministic)."""
    spark = df.sparkSession
    width = width or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < width:
        return df.repartition(width)
    return df


def salted(df: DataFrame, salt_n: int, salt_col: str = "_salt") -> DataFrame:
    """Add a deterministic salt in [0, salt_n) derived from a stable row
    hash — reproducible (no rand()) and uniform."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(salt_n)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    salt_n: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed keys.

    Phase 1 groups by (keys + salt): the hot key's rows land on salt_n
    different reducers. Phase 2 merges the partials per key. Only
    decomposable aggregates belong here (sum/count/min/max — the ones whose
    partial merge is the same function); the caller passes phase-1
    expressions and the merge is sum/min/max-of-partials by convention:
    ``aggs`` maps output name -> phase-1 aggregate; phase 2 re-applies
    sum() for sum/count and min()/max() for min/max based on the name
    prefix (``sum_``/``cnt_``/``min_``/``max_``).
    """
    s = salted(df, salt_n)
    phase1 = s.groupBy(*keys, "_salt").agg(*[c.alias(k) for k, c in aggs.items()])
    merged = []
    for name in aggs:
        if name.startswith(("sum_", "cnt_")):
            merged.append(F.sum(name).alias(name))
        elif name.startswith("min_"):
            merged.append(F.min(name).alias(name))
        elif name.startswith("max_"):
            merged.append(F.max(name).alias(name))
        else:
            raise ValueError(
                f"salted_agg output {name!r} must be prefixed sum_/cnt_/min_/max_ "
                "(decomposable aggregates only)"
            )
    return phase1.groupBy(*keys).agg(*merged)


def has_exchange(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle (Exchange) — used by
    tests to prove bucketed joins are co-located."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange" in plan


def salted_join(
    fact: DataFrame, dim: DataFrame, key: str, salt_n: int = 16
) -> DataFrame:
    """Skew-tolerant shuffle join: the hot-key weapon for joins too big
    to broadcast. Fact rows take a deterministic salt in [0, salt_n);
    the dim side replicates each row salt_n times; the join runs on
    (key, salt) so a hot key's rows spread over salt_n reducers instead
    of melting one. Cost: dim shuffle volume x salt_n — use when the dim
    is mid-sized (too big to broadcast, small enough to replicate) and
    AQE's skew splitting can't apply (e.g. the join feeds a co-partitioned
    downstream op). The shuffle_hash hint keeps Catalyst from
    de-salting the plan by broadcasting the replicated dim. Result is
    exactly the plain join (k2's oracle contract)."""
    f = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*fact.columns), F.lit(salt_n)).cast("int")
    )
    d = dim.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(salt_n - 1)).cast("array<int>")).alias(
            "_salt"
        ),
    )
    return f.join(d.hint("shuffle_hash"), [key, "_salt"]).drop("_salt")


def mergeable_state(df: DataFrame, group_col: str, value_col: str, key_col: str):
    """(scalars, registers) mergeable aggregation state for one slice of a
    fact stream: per-group (n, sum, min, max) partials plus portable-HLL
    distinct registers (operators/sketch.py). Every component is an
    algebraic monoid — counts/sums add, min/max combine, registers merge
    by element-wise max — so state computed on disjoint slices merges to
    exactly the state of their union. That is the incremental-maintenance
    contract at 100 TB: a nightly batch folds into a stored state table
    with work proportional to the BATCH, never a rescan of history.
    """
    from kafka_streaming_polymarket_pipeline_spark.operators import sketch as SK

    scalars = df.groupBy(group_col).agg(
        F.count("*").alias("n"),
        F.sum(value_col).alias("s"),
        F.min(value_col).alias("mn"),
        F.max(value_col).alias("mx"),
    )
    regs = SK.hll_registers(df, group_col, key_col)
    return scalars, regs


def merge_states(states, group_col: str) -> DataFrame:
    """Merge [(scalars, registers), ...] slices and finalize: per-group
    (n_events, sum, min, max, avg, hll distinct estimate). The merge is a
    union of STATE rows (groups x registers, not facts) re-aggregated with
    each component's combine function — the same algebra Spark runs
    map-side; here it is lifted to cross-slice granularity."""
    from functools import reduce

    from kafka_streaming_polymarket_pipeline_spark.operators import sketch as SK

    scalars = reduce(lambda a, b: a.unionByName(b), [s for s, _ in states])
    regs = reduce(lambda a, b: a.unionByName(b), [r for _, r in states])
    merged_scalars = scalars.groupBy(group_col).agg(
        F.sum("n").alias("n_events"),
        F.sum("s").alias("sum_value"),
        F.min("mn").alias("min_value"),
        F.max("mx").alias("max_value"),
    )
    merged_regs = regs.groupBy("grp", "bucket").agg(F.max("rmax").alias("rmax"))
    est = SK.hll_estimate(merged_regs, group_col)
    return merged_scalars.join(est, group_col)
