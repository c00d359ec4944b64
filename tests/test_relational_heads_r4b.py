"""Behavior tests for the final-round-4 TPC-H heads: Q21 semi+anti on the
same fact, Q11 HAVING-vs-global fraction, Q20 semi-join into an
aggregated subquery.

The oracle battery proves DuckDB equivalence; these pin the semantic
contracts via independent reformulations (invariants that would survive
an oracle rewritten wrong on both sides).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark import plans
from kafka_streaming_polymarket_pipeline_spark.tables import load


def test_r21_matches_per_order_aggregate_reformulation(spark, sf_smoke):
    """The semi/anti-join formulation must equal the independent per-order
    aggregate one: a late lineitem qualifies iff its order involves >=2
    distinct suppliers overall and exactly 1 distinct LATE supplier."""
    out = {
        r.s_name: r.numwait
        for r in plans.all_queries()["r21_waiting_suppliers"](spark, sf_smoke).collect()
    }

    orders = (
        load(spark, sf_smoke, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf_smoke, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    n_supp = li.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_supp")
    )
    n_late_supp = late.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.count_distinct("l_suppkey").alias("n_late_supp")
    )
    supp = load(spark, sf_smoke, "supplier")
    naive = {
        r.s_name: r.numwait
        for r in late.join(n_supp, "l_orderkey")
        .join(n_late_supp, F.col("l_orderkey") == F.col("_ok"))
        .filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .collect()
    }
    assert out == naive
    assert out, "r21 returned no waiting suppliers at smoke scale"


def test_r21_plans_semi_and_anti_hash_joins(spark, sf_smoke):
    """The correlated EXISTS / NOT EXISTS pair must compile to LeftSemi and
    LeftAnti hash joins on the order key — never a nested-loop scan."""
    df = plans.all_queries()["r21_waiting_suppliers"](spark, sf_smoke)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_r11_returns_exactly_the_above_threshold_parts(spark, sf_smoke):
    out = plans.all_queries()["r11_important_parts"](spark, sf_smoke)
    rows = out.collect()
    assert rows, "r11 degenerate (0 rows) at smoke scale"
    li = load(spark, sf_smoke, "lineitem")
    pr = li.groupBy("l_partkey").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("r")
    )
    thresh = pr.agg(F.round(F.avg("r") * 1.2, 6).alias("t")).collect()[0].t
    naive = {r.l_partkey for r in pr.filter(F.col("r") > thresh).collect()}
    assert {r.partkey for r in rows} == naive
    assert all(r.part_rev > thresh for r in rows)


def test_r20_supplier_set_matches_naive_distinct(spark, sf_smoke):
    out = {r.s_suppkey for r in plans.all_queries()["r20_excess_supply"](spark, sf_smoke).collect()}
    li = load(spark, sf_smoke, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load(spark, sf_smoke, "part").filter(F.col("p_name").startswith("s"))
    naive = {
        r.l_suppkey
        for r in li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.round(F.sum("l_quantity"), 6).alias("q"))
        .filter(F.col("q") > 45)
        .select("l_suppkey")
        .distinct()
        .collect()
    }
    assert out == naive
    # no supplier appears twice (semi-join, not inner join, against the
    # multi-part heavy set)
    n_rows = plans.all_queries()["r20_excess_supply"](spark, sf_smoke).count()
    assert n_rows == len(out)
