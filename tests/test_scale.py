"""Physical-layout operators: bucketed co-located joins (no Exchange) and
salted aggregation for skewed keys."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import scale


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = spark.range(0, 10_000).select(
        F.col("id").alias("order_id"), (F.col("id") % 100).alias("cust")
    )
    items = spark.range(0, 50_000).select(
        (F.col("id") % 10_000).alias("order_id"), (F.col("id") % 7).cast("double").alias("qty")
    )
    scale.write_bucketed(orders, "b_orders", ["order_id"], 8, str(base / "orders"))
    scale.write_bucketed(items, "b_items", ["order_id"], 8, str(base / "items"))
    yield spark.table("b_orders"), spark.table("b_items")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_items")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    orders, items = bucketed_pair
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = orders.join(items, "order_id")
        assert joined.count() == 50_000
        assert not scale.has_exchange(joined), "bucketed join must be co-located"
        # sanity: the same join on unbucketed frames DOES shuffle
        o2 = orders.withColumn("x", F.lit(1)).drop("x")  # still bucketed lineage
        plain_o = spark.createDataFrame(orders.collect(), orders.schema)
        plain_i = spark.createDataFrame(items.collect(), items.schema)
        assert scale.has_exchange(plain_o.join(plain_i, "order_id"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_bucketed_agg_has_no_shuffle(spark, bucketed_pair):
    _, items = bucketed_pair
    agg = items.groupBy("order_id").agg(F.sum("qty").alias("s"))
    assert agg.count() == 10_000
    assert not scale.has_exchange(agg), "groupBy on the bucket key must not shuffle"


def test_salted_agg_matches_plain(spark):
    # one pathologically hot key (90% of rows) + a long tail
    hot = spark.range(0, 90_000).select(F.lit("HOT").alias("k"), (F.col("id") % 13).cast("double").alias("v"))
    tail = spark.range(0, 10_000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    df = hot.unionByName(tail)
    got = scale.salted_agg(
        df, ["k"],
        {"sum_v": F.sum("v"), "cnt_v": F.count(F.lit(1)), "max_v": F.max("v")},
        salt_n=8,
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("sum_v"), F.count(F.lit(1)).alias("cnt_v"), F.max("v").alias("max_v")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_agg_rejects_non_decomposable(spark):
    df = spark.range(5).select(F.lit("a").alias("k"), F.col("id").cast("double").alias("v"))
    with pytest.raises(ValueError):
        scale.salted_agg(df, ["k"], {"avg_v": F.avg("v")})


def test_bucketed_interval_join_is_equi_not_nested_loop(spark):
    from pyspark.sql import functions as F2

    from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import (
        bucketed_interval_join,
    )

    facts = spark.createDataFrame(
        [(i, f"2024-01-05 {i % 24:02d}:30:00") for i in range(100)],
        "fact_id long, ts_s string",
    ).select("fact_id", F2.col("ts_s").cast("timestamp").alias("ts"))
    iv = spark.createDataFrame(
        [(h, f"2024-01-05 {h:02d}:00:00", f"2024-01-05 {h:02d}:59:59") for h in range(24)],
        "win long, s string, e string",
    ).select(
        "win",
        F2.col("s").cast("timestamp").alias("start_ts"),
        (F2.col("e").cast("timestamp") + F2.expr("INTERVAL 1 SECOND")).alias("end_ts"),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_interval_join(facts, iv, "ts", "start_ts", "end_ts", bucket_seconds=3600)
        rows = j.collect()
        assert len(rows) == 100  # every fact matched exactly its hour window
        assert all(r.win == r.fact_id % 24 for r in rows)
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        # boundary semantics: a fact exactly at end_ts is excluded
        edge = spark.createDataFrame([(0, "2024-01-05 01:00:00")], "fact_id long, ts_s string").select(
            "fact_id", F2.col("ts_s").cast("timestamp").alias("ts")
        )
        hit = bucketed_interval_join(
            edge, iv.filter("win = 0"), "ts", "start_ts", "end_ts", bucket_seconds=3600
        )
        assert hit.count() == 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_filter_and_projection_reach_parquet_scan(spark, sf_correct):
    """Predicate pushdown + column pruning land in the physical scan:
    PushedFilters carries the predicate, ReadSchema only the 3 used columns."""
    from kafka_streaming_polymarket_pipeline_spark.tables import load

    df = (
        load(spark, sf_correct, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(event_type), EqualTo(event_type,purchase)" in plan
    import re

    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, plan
    cols = {c.split(":")[0] for c in m.group(1).split(",")}
    assert cols == {"event_id", "user_id", "value", "event_type"}


def test_salted_join_spreads_hot_key_and_matches_plain(spark):
    """A 10k-row hot key must land on many salt partitions, and the
    salted join must equal the plain join exactly."""
    from pyspark.sql import functions as F

    from kafka_streaming_polymarket_pipeline_spark.operators.scale import salted_join

    fact = spark.createDataFrame(
        [(1, i) for i in range(10_000)] + [(k, 0) for k in range(2, 50)],
        "key long, payload long",
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 50)], "key long, name string")
    got = salted_join(fact, dim, key="key")
    plain = fact.join(dim, "key")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, plain.collect()))
    # the hot key's rows carry >= half the salt space
    n_salts = (
        fact.filter(F.col("key") == 1)
        .withColumn("_salt", F.pmod(F.xxhash64(*fact.columns), F.lit(16)))
        .select("_salt").distinct().count()
    )
    assert n_salts >= 8, n_salts
