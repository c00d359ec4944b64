"""Bucketized interval (range) join — the scale path for J2.

A plain range join (`fact.ts BETWEEN dim.start AND dim.end`) has no equi-key,
so Spark falls back to BroadcastNestedLoopJoin: O(|facts| x |intervals|)
comparisons, and only viable while the interval side broadcasts. For large
interval sets (a year of 15-minute markets is 35k rows; multi-asset, millions)
the standard fix is time bucketing:

1. every fact row gets an equi-key `_bk = floor(ts / W)`;
2. every interval explodes into the buckets it overlaps
   (`sequence(floor(start/W), floor((end - 1us)/W))` — intervals are
   [start, end), so an end on a bucket boundary does not spill over);
3. equi-join on `_bk` (shuffle-hash/sort-merge — partition-parallel,
   AQE-skew-splittable), then the exact range predicate refines.

Each (fact, interval) pair can meet in at most one bucket (the fact's), so
the join introduces no duplicates. Interval-side blowup is
len(interval)/W + 1 rows — pick W on the order of the typical interval
length (15-minute markets -> 15-minute buckets => ~2 rows per interval).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_US = 1_000_000


def bucketed_interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 900,
    how: str = "inner",
) -> DataFrame:
    """Join facts to [start, end) intervals via time-bucket equi-keys.

    Output columns = facts' + intervals' (minus the internal bucket key).
    """
    w_us = bucket_seconds * _US
    f = facts.withColumn("_bk", F.floor(F.unix_micros(F.col(ts_col)) / w_us))
    iv = intervals.withColumn(
        "_bks",
        F.sequence(
            F.floor(F.unix_micros(F.col(start_col)) / w_us),
            F.floor((F.unix_micros(F.col(end_col)) - 1) / w_us),
        ),
    ).withColumn("_bk", F.explode("_bks")).drop("_bks")
    return (
        f.join(iv, "_bk", how)
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bk")
    )
