"""interval_overlap_join (j10) unit contracts: exact [start, end)
overlap semantics, the later-start meet-once rule (duplicate-free
WITHOUT a distinct shuffle), boundary touches, empty intervals, and the
w8 cumulative-distinct rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import (
    interval_overlap_join,
)
from kafka_streaming_polymarket_pipeline_spark.plans import registry


def _iv(spark, rows):
    return spark.createDataFrame(rows, "iid long, s string, e string").select(
        "iid", F.to_timestamp("s").alias("s"), F.to_timestamp("e").alias("e")
    )


def test_overlap_semantics_and_boundaries(spark):
    left = _iv(spark, [
        (1, "2024-01-01 01:00:00", "2024-01-01 05:00:00"),
        (2, "2024-01-01 10:00:00", "2024-01-01 11:00:00"),
        (3, "2024-01-01 20:00:00", "2024-01-01 20:00:00"),  # empty: dropped
    ])
    right = _iv(spark, [
        (10, "2024-01-01 04:59:59", "2024-01-01 06:00:00"),  # overlaps 1 by 1s
        (11, "2024-01-01 05:00:00", "2024-01-01 06:00:00"),  # touches 1: NO overlap
        (12, "2024-01-01 10:30:00", "2024-01-01 10:40:00"),  # contained in 2
        (13, "2024-01-01 19:00:00", "2024-01-01 22:00:00"),  # would contain 3 if non-empty
    ])
    got = {
        (r["iid"], r["r_iid"])
        for r in interval_overlap_join(left, right, "s", "e").collect()
    }
    assert got == {(1, 10), (2, 12)}


def test_meet_once_across_many_shared_buckets(spark):
    # two 10-hour intervals sharing 9+ hour buckets must emit ONE row
    left = _iv(spark, [(1, "2024-01-01 00:30:00", "2024-01-01 10:30:00")])
    right = _iv(spark, [(2, "2024-01-01 01:15:00", "2024-01-01 11:15:00")])
    out = interval_overlap_join(left, right, "s", "e", bucket_seconds=3600)
    rows = out.collect()
    assert len(rows) == 1  # later-start bucket rule, no distinct() needed
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_overlap_exact_when_spanning_bucket_boundary(spark):
    # overlap window lies exactly across a bucket boundary
    left = _iv(spark, [(1, "2024-01-01 00:00:00", "2024-01-01 01:30:00")])
    right = _iv(spark, [(2, "2024-01-01 00:59:00", "2024-01-01 02:00:00")])
    [row] = interval_overlap_join(left, right, "s", "e", bucket_seconds=3600).collect()
    overlap_us = (
        min(row["e"], row["r_e"]) - max(row["s"], row["r_s"])
    ).total_seconds() * 1e6
    assert overlap_us == 31 * 60 * 1e6  # 00:59 -> 01:30


def test_j10_matches_naive_predicate_join(spark, sf_smoke):
    # engine (bucketed, meet-once) vs the naive O(n^2) range self-join
    # expressed in Spark over the same loaded frame
    from kafka_streaming_polymarket_pipeline_spark.tables import load

    evl = load(spark, sf_smoke, "events")
    iv_ts = evl.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        F.min("ts").alias("s"),
        F.timestamp_micros(F.unix_micros(F.max("ts")) + 1).alias("e"),
    )
    full = (
        interval_overlap_join(iv_ts, iv_ts, "s", "e", bucket_seconds=3600)
        .filter(F.col("user_id") < F.col("r_user_id"))
        .select(
            F.col("user_id").alias("user_a"),
            F.col("r_user_id").alias("user_b"),
            "day",
            (
                F.least(F.unix_micros("e"), F.unix_micros("r_e"))
                - F.greatest(F.unix_micros("s"), F.unix_micros("r_s"))
            ).cast("long").alias("overlap_us"),
        )
    )
    ivf = evl.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
        F.unix_micros(F.min("ts")).alias("s_us"),
        (F.unix_micros(F.max("ts")) + 1).alias("e_us"),
    )
    a, b = ivf.alias("a"), ivf.alias("b")
    naive = (
        a.join(
            b,
            (F.col("a.user_id") < F.col("b.user_id"))
            & (F.col("a.s_us") < F.col("b.e_us"))
            & (F.col("b.s_us") < F.col("a.e_us")),
        )
        .select(
            F.col("a.user_id").alias("user_a"),
            F.col("b.user_id").alias("user_b"),
            F.col("a.day").alias("day"),
            (
                F.least("a.e_us", "b.e_us") - F.greatest("a.s_us", "b.s_us")
            ).cast("long").alias("overlap_us"),
        )
    )
    want = {tuple(r) for r in naive.collect()}
    have = {tuple(r) for r in full.collect()}
    assert have == want and want

    # the registered (top-10/day) form equals the naive set ranked identically
    from pyspark.sql import Window

    w = Window.partitionBy("day").orderBy(F.desc("overlap_us"), "user_a", "user_b")
    want_topk = {
        tuple(r)
        for r in naive.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 10)
        .select("user_a", "user_b", "day", "overlap_us")
        .collect()
    }
    got = registry.get("j10_interval_overlap_join").builder(spark, sf_smoke)
    assert {tuple(r) for r in got.collect()} == want_topk


def test_w8_running_distinct_hand_case(spark):
    import os, tempfile

    rows = [
        (1, 7, "view",     "2024-01-01 00:00:01"),
        (2, 7, "click",    "2024-01-01 00:00:02"),
        (3, 7, "view",     "2024-01-01 00:00:03"),
        (4, 7, "purchase", "2024-01-01 00:00:04"),
        (5, 8, "view",     "2024-01-01 00:00:05"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).selectExpr("event_id", "user_id", "event_type", "CAST(ts AS TIMESTAMP) AS ts")
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = {
        r["event_id"]: r["distinct_types_so_far"]
        for r in registry.get("w8_cumulative_distinct").builder(spark, d).collect()
    }
    assert out == {1: 1, 2: 2, 3: 2, 4: 3, 5: 1}


from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

_iv_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=50_000),  # start second
        st.integers(min_value=0, max_value=7_200),   # duration (0 = empty)
    ),
    min_size=2,
    max_size=25,
)


@settings(max_examples=5, deadline=None)
@given(_iv_strategy, _iv_strategy)
def test_overlap_join_property_vs_python_reference(spark, left_ivs, right_ivs):
    """Property: for arbitrary integer-second intervals (empties and
    bucket-aligned starts included), the bucketed meet-once join returns
    EXACTLY the strict-overlap pairs a plain Python double loop finds —
    same [start, end) convention, duplicate-free."""
    base = datetime(2026, 1, 1)

    def frame(ivs):
        rows = [
            (i, base + timedelta(seconds=s), base + timedelta(seconds=s + d))
            for i, (s, d) in enumerate(ivs)
        ]
        return spark.createDataFrame(rows, "iid long, s timestamp, e timestamp")

    got_rows = interval_overlap_join(
        frame(left_ivs), frame(right_ivs), "s", "e", bucket_seconds=3600
    ).collect()
    got = sorted((r["iid"], r["r_iid"]) for r in got_rows)
    assert len(got) == len(set(got))  # meet-once: no duplicates

    want = sorted(
        (i, j)
        for i, (sa, da) in enumerate(left_ivs)
        for j, (sb, db) in enumerate(right_ivs)
        if da > 0 and db > 0 and sa < sb + db and sb < sa + da
    )
    assert got == want

@settings(max_examples=5, deadline=None)
@given(
    _iv_strategy,
    _iv_strategy,
    st.integers(min_value=0, max_value=7_200),  # min_overlap seconds
)
def test_min_overlap_prune_property_vs_python_reference(
    spark, left_ivs, right_ivs, min_s
):
    """Property: min_overlap_us keeps exactly the pairs whose overlap
    duration >= the threshold (integer-µs arithmetic, [start, end)
    semantics), and 0 reproduces the unpruned result — the 100 TB
    pre-prune is a residual filter, never a semantics change."""
    base = datetime(2026, 1, 1)

    def frame(ivs):
        rows = [
            (i, base + timedelta(seconds=s), base + timedelta(seconds=s + d))
            for i, (s, d) in enumerate(ivs)
        ]
        return spark.createDataFrame(rows, "iid long, s timestamp, e timestamp")

    got = sorted(
        (r["iid"], r["r_iid"])
        for r in interval_overlap_join(
            frame(left_ivs), frame(right_ivs), "s", "e",
            bucket_seconds=3600, min_overlap_us=min_s * 1_000_000,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, (sa, da) in enumerate(left_ivs)
        for j, (sb, db) in enumerate(right_ivs)
        if da > 0 and db > 0 and sa < sb + db and sb < sa + da
        and (min(sa + da, sb + db) - max(sa, sb)) * 1_000_000 >= min_s * 1_000_000
    )
    assert got == want
