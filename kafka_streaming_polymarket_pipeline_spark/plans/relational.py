"""Core relational queries: the flagship market-candle query plus
TPC-H-style aggregation/join workloads that exercise the engine's
scan -> filter -> join -> aggregate spine at scale.

The flagship re-expresses the reference's core analytical object — a
15-minute prediction-market window over a price stream (SURVEY §2 T1/F10,
market cadence at reference producers/market_discovery.py:114-137) — as a
declarative event-time window aggregation: per (event_type, 15-min window),
OHLC of ``value`` plus direction, which is exactly the "Up or Down per
15-minute market" question the reference pipeline exists to answer
(reference producers/market_resolution.py:84-90 decodes the same).

Scale notes: the candle query is one shuffle (partial aggregation map-side,
AQE-coalesced); the TPC-H joins broadcast every dimension side (region,
nation, customer at sf<=1 scale; at 100 TB the orders/lineitem join is the
only sort-merge and is co-partitioned on the join key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.plans.registry import register
from kafka_streaming_polymarket_pipeline_spark.tables import load

# ---------------------------------------------------------------------------
# Flagship: 15-minute market candles over the events stream table
# ---------------------------------------------------------------------------

_CANDLES_ORACLE = """
WITH b AS (
  SELECT event_type,
         make_timestamp((epoch_us(ts) // 900000000) * 900000000) AS window_start,
         ts, event_id, value
  FROM events
), w AS (
  SELECT event_type, window_start, value,
         first_value(value) OVER (
           PARTITION BY event_type, window_start ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS open_w,
         last_value(value) OVER (
           PARTITION BY event_type, window_start ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS close_w
  FROM b
)
SELECT event_type, window_start,
       any_value(open_w)  AS open,
       max(value)         AS high,
       min(value)         AS low,
       any_value(close_w) AS close,
       count(*)           AS n_events,
       (any_value(close_w) > any_value(open_w)) AS is_up
FROM w
GROUP BY event_type, window_start
"""


@register("market_candles_15m", oracle=_CANDLES_ORACLE)
def market_candles_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: per (event_type, 15-min tumbling window) OHLC + direction.

    Re-expresses the reference's 15-minute market windows
    (producers/market_discovery.py:114-137) and Up/Down resolution decode
    (producers/market_resolution.py:84-90) as one event-time window agg.
    ``min_by``/``max_by`` on (ts, event_id) give deterministic open/close.
    """
    events = load(spark, sf_dir, "events")
    order_key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        events.groupBy(
            F.col("event_type"),
            F.window("ts", "15 minutes").start.alias("window_start"),
        )
        .agg(
            F.min_by("value", order_key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", order_key).alias("close"),
            F.count("*").alias("n_events"),
        )
        .withColumn("is_up", F.col("close") > F.col("open"))
    )


# ---------------------------------------------------------------------------
# TPC-H-style workloads (scan/filter/join/agg spine)
# ---------------------------------------------------------------------------

_Q1_ORACLE = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 4)                                        AS avg_qty,
       round(avg(l_extendedprice), 4)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", oracle=_Q1_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: 1 scan, map-side partial agg, 1 shuffle."""
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


_Q3_ORACLE = """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, l_orderkey
LIMIT 10
"""


@register("shipping_priority_top10", oracle=_Q3_ORACLE)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: selective dim filter -> 3-way join -> agg -> top-K.

    customer (filtered) is broadcast; orders/lineitem join shuffles on the
    order key. The LIMIT uses an l_orderkey tiebreak so the top-10 set is
    deterministic across engines.
    """
    cutoff = F.lit("1998-03-15").cast("timestamp")
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    revenue_raw = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue_raw.alias("_revenue_raw"))
        .orderBy(F.desc("_revenue_raw"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            F.round(F.col("_revenue_raw"), 2).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


_Q5_ORACLE = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


@register("regional_revenue", oracle=_Q5_ORACLE)
def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join; all dimension sides broadcast."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


_ORDER_PRIO_ORACLE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


@register("order_priority_check", oracle=_ORDER_PRIO_ORACLE)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style EXISTS -> left-semi join + count per priority."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    joined = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return joined.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


_MIN_COST_SQL = """
WITH unit AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         min(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT u.partkey, u.suppkey, u.unit_price
FROM unit u
WHERE u.unit_price = (
  SELECT min(u2.unit_price) FROM unit u2 WHERE u2.partkey = u.partkey
)
"""


@register("r2_min_cost_supplier", oracle=_MIN_COST_SQL)
def r2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2-style correlated scalar subquery (cheapest supplier per
    part, ties kept), run through spark.sql so Catalyst's subquery
    DECORRELATION does the work: the correlated min collapses to an
    aggregate + equi-join on partkey — no per-row re-execution, one
    shuffle on the join key. The identical SQL is the oracle. unit_price
    stays UNrounded: min of a single division is bit-identical across
    engines, while round-to-4dp flipped two boundary rows (27.65725-class
    values land on different sides of HALF_UP in Spark vs DuckDB)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_MIN_COST_SQL)


@register(
    "r13_cust_order_counts",
    oracle="""
SELECT n_orders, CAST(count(*) AS BIGINT) AS n_custs
FROM (
  SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY n_orders
""",
)
def r13_cust_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13-style order-count distribution: left join keeps
    zero-order customers (count(o_orderkey) ignores the null-extended
    rows), then a second aggregation histograms the counts. Two narrow
    shuffles; the first join pre-aggregates map-side on custkey."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count("*").cast("long").alias("n_custs"))


_Q8_ORACLE = """
SELECT o_year,
       round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
             / sum(volume), 6) AS mkt_share,
       round(sum(volume), 2) AS total_volume
FROM (
  SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n1.n_regionkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE p.p_type = 'PROMO' AND r.r_name = 'ASIA'
)
GROUP BY o_year
"""


@register("r8_market_share", oracle=_Q8_ORACLE)
def r8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8-style national market share: the engine's widest join
    head (lineitem x part x orders x customer x nation x region x
    supplier x nation — 8 relations). Every dimension side is broadcast
    (part is filtered to one type FIRST, so the build side is pruned
    before it ships); the only shuffles are fact-fact l/o on orderkey
    and the final 7-row year aggregate. The share ratio divides two
    same-group sums, so accumulation-order noise cancels to ~1e-15 and
    6-dp rounding is safely cross-engine."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    n1 = load(spark, sf_dir, "nation")
    n2 = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = load(spark, sf_dir, "supplier")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == n1.n_nationkey)
        .join(F.broadcast(region), n1.n_regionkey == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(
                n2.withColumnRenamed("n_name", "supp_nation").withColumnRenamed(
                    "n_nationkey", "n2_nationkey"
                )
            ),
            supp.s_nationkey == F.col("n2_nationkey"),
        )
        .select(
            F.year("o_orderdate").cast("int").alias("o_year"),
            vol.alias("volume"),
            "supp_nation",
        )
    )
    return joined.groupBy("o_year").agg(
        F.round(
            F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(0.0))
            / F.sum("volume"),
            6,
        ).alias("mkt_share"),
        F.round(F.sum("volume"), 2).alias("total_volume"),
    )


_Q7_ORACLE = """
SELECT supp_nation, cust_nation, o_year, round(sum(volume), 2) AS revenue
FROM (
  SELECT n2.n_name AS supp_nation, n1.n_name AS cust_nation,
         CAST(year(o.o_orderdate) AS INT) AS o_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
  WHERE n1.n_name IN ('NATION_1', 'NATION_2')
    AND n2.n_name IN ('NATION_1', 'NATION_2')
    AND n1.n_name <> n2.n_name
)
GROUP BY supp_nation, cust_nation, o_year
"""


@register("r7_nation_trade", oracle=_Q7_ORACLE)
def r7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7-style bilateral trade volume between two nations by
    year. The nation filters are applied on the BROADCAST dimension
    sides before the joins, so Catalyst turns both fact joins into
    broadcast-pruned probes (customer/supplier shrink to two nations'
    rows); the asymmetric pair predicate is a plain column inequality
    AFTER the equi-joins, never a join condition."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    nations = ("NATION_1", "NATION_2")
    n1 = load(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
    n2 = load(spark, sf_dir, "nation").filter(F.col("n_name").isin(*nations))
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(n1.withColumnRenamed("n_name", "cust_nation")),
            cust.c_nationkey == n1.n_nationkey,
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            F.broadcast(
                n2.withColumnRenamed("n_name", "supp_nation").withColumnRenamed(
                    "n_nationkey", "n2_nationkey"
                )
            ),
            supp.s_nationkey == F.col("n2_nationkey"),
        )
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .select(
            "supp_nation",
            "cust_nation",
            F.year("o_orderdate").cast("int").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
        )
    )
    return joined.groupBy("supp_nation", "cust_nation", "o_year").agg(
        F.round(F.sum("volume"), 2).alias("revenue")
    )


_Q12_ORACLE = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_returnflag
"""


@register("r12_priority_lines", oracle=_Q12_ORACLE)
def r12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12-style conditional aggregation after a fact-fact join:
    the filter prunes lineitem at the scan (pushed to parquet), the
    orderkey join shuffles once, and both counts fold in a single
    grouped pass (no second scan for the complement)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


_Q14_ORACLE = """
SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1998-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-04-01 00:00:00'
"""


@register("r14_promo_share", oracle=_Q14_ORACLE)
def r14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14-style promo revenue share: one broadcast join against
    part, one global aggregate; the ratio divides two sums over the SAME
    row set so accumulation-order noise cancels (the r8 discipline) and
    6-dp rounding is safely cross-engine."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-04-01").cast("timestamp"))
    )
    part = load(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct")
        )
    )


_Q18_ORACLE = """
SELECT c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice, t.sum_qty
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN (
  SELECT l_orderkey, sum(l_quantity) AS sum_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING sum(l_quantity) > 150
) t ON t.l_orderkey = o.o_orderkey
"""


@register("r18_large_orders", oracle=_Q18_ORACLE)
def r18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style large-volume orders: the HAVING subquery is an
    aggregate-then-semi-join — the quantity rollup happens BEFORE the
    order/customer joins, so only qualifying orderkeys (a tiny set)
    reach the wide join. sum_qty is an exact integer-valued double sum
    (quantities are whole numbers), so no rounding is needed."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
    )


_Q15_ORACLE = """
WITH rev AS (
  SELECT l_suppkey AS suppkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN rev ON s_suppkey = suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
"""


@register("r15_top_supplier", oracle=_Q15_ORACLE)
def r15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15-style top supplier: the revenue "view" is one grouped agg
    over a scan-pruned quarter; the MAX scalar subquery becomes a broadcast
    1-row aggregate crossJoin (never a second shuffle of the fact). The
    equality compares the 2-dp-ROUNDED revenue on BOTH sides, so a sub-cent
    cross-engine accumulation difference cannot flip max/tie membership."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("total_revenue"))
    )
    top = rev.agg(F.max("total_revenue").alias("_max_rev"))
    supp = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(top))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(F.broadcast(supp), F.col("suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


_Q16_ORACLE = """
SELECT p_brand, p_type, p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 1000)
GROUP BY p_brand, p_type, p_size
"""


@register("r16_supplier_counts", oracle=_Q16_ORACLE)
def r16_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16-style distinct-supplier counts: the NOT IN subquery is a
    broadcast left-anti join against the (tiny) excluded-supplier set —
    NULL-safe here because s_suppkey is a key column; the part predicates
    prune at the broadcast dim before the fact join; count(DISTINCT) runs
    as Spark's two-level distinct aggregate (partial per-partition dedup,
    so the shuffle carries distinct (group, suppkey) pairs, not rows)."""
    part = load(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    )
    bad_supp = load(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 1000).select("s_suppkey")
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(F.broadcast(bad_supp), li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


_Q17_ORACLE = """
WITH pa AS (
  SELECT l_partkey AS pk, round(avg(l_quantity), 6) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN pa   ON pk = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < 0.2 * avg_qty
"""


@register("r17_small_qty_revenue", oracle=_Q17_ORACLE)
def r17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17-style small-quantity revenue: the correlated per-part AVG
    subquery is decorrelated into one grouped aggregate joined back on
    partkey — agg output and probe side hash-partition on the same key,
    so the join adds no THIRD repartition of either side (the two
    l_partkey exchanges are the floor for an agg-join-self shape); part
    is a broadcast dim. The threshold compares against the 6-dp-ROUNDED
    avg on BOTH sides so a ~1e-15 accumulation-order difference cannot
    flip a borderline row."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    pa = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.round(F.avg("l_quantity"), 6).alias("avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(pa, li.l_partkey == pa.pk)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


_Q19_ORACLE = """
SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#24' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""


@register("r19_disjunctive_join", oracle=_Q19_ORACLE)
def r19_disjunctive_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19-style disjunctive predicate across a join: the OR spans
    both sides, so only the derivable per-side envelopes are pushed to the
    scans (l_quantity BETWEEN 1 AND 30; the part brand/size union) — Spark
    derives these via constraint propagation; the residual OR evaluates
    post-join inside codegen. part stays a broadcast dim."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    disj = (
        ((b == "Brand#12") & s.between(1, 5) & q.between(1, 11))
        | ((b == "Brand#23") & s.between(1, 10) & q.between(10, 20))
        | ((b == "Brand#24") & s.between(1, 15) & q.between(20, 30))
    )
    return j.filter(disj).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue")
    )


_Q22_ORACLE = """
WITH ab AS (
  SELECT round(avg(c_acctbal), 6) AS avg_bal FROM customer WHERE c_acctbal > 0
)
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT)  AS numcust,
       round(sum(c_acctbal), 2)  AS totacctbal
FROM customer, ab
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '1998-01-01 00:00:00')
GROUP BY c_mktsegment
"""


@register("r22_idle_balances", oracle=_Q22_ORACLE)
def r22_idle_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22-style dormant high-balance customers (the spec's "no
    orders for 7 years" dormancy test, scoped to the 1998+ window so the
    result is non-degenerate on this data): the scalar AVG subquery is a
    broadcast 1-row crossJoin; NOT EXISTS is a left-anti join where the
    ORDERS side is date-pruned at the scan, then shuffles on custkey (at
    100 TB orders is the big side — shuffled-hash, never broadcast). The
    balance threshold compares the 6-dp-ROUNDED average on both sides."""
    cust = load(spark, sf_dir, "customer")
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.round(F.avg("c_acctbal"), 6).alias("avg_bal"))
    )
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


_Q6_ORACLE = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""


@register("r6_forecast_revenue", oracle=_Q6_ORACLE)
def r6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style forecast revenue: pure scan-aggregate — every
    predicate (date range, discount band, quantity cap) pushes to the
    parquet scan, so the stage reads only matching row groups and the
    whole query is one map-side fold plus a 1-row merge. The simplest
    possible demonstration that filters actually REACH the scan."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.04)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


_Q9_ORACLE = """
SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(sum(l_extendedprice * (1 - l_discount)
                 - 0.8 * p_retailprice * l_quantity), 2) AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN orders   ON o_orderkey = l_orderkey
WHERE p_type = 'STANDARD'
GROUP BY n_name, CAST(year(o_orderdate) AS BIGINT)
"""


@register("r9_profit_by_nation_year", oracle=_Q9_ORACLE)
def r9_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9-style profit rollup (adapted: the testdata has no
    partsupp, so supply cost is modeled as 80% of p_retailprice — same
    join tree, same group shape). part/supplier/nation broadcast; the
    lineitem-orders fact join is the only data-scale shuffle, then one
    grouped aggregate on (nation, year)."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.8 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("n_name", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(F.round(F.sum(profit), 2).alias("profit"))
    )


_Q10_ORACLE = """
SELECT c_custkey, c_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       c_acctbal, n_name
FROM customer
JOIN orders   ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1997-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, c_custkey
LIMIT 20
"""


@register("r10_returned_top20", oracle=_Q10_ORACLE)
def r10_returned_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style returned-item losses: quarter-pruned orders join
    return-flagged lineitem on the order key (the one shuffle), customer
    and nation broadcast, top-20 by revenue via TakeOrderedAndProject
    with a custkey tie-break so the cut is engine-deterministic. Ranking
    uses the UNROUNDED sum on both engines (identical input sets), the
    display value rounds to 2 dp."""
    cutoff_lo = F.lit("1997-10-01").cast("timestamp")
    cutoff_hi = F.lit("1998-01-01").cast("timestamp")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= cutoff_lo) & (F.col("o_orderdate") < cutoff_hi)
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(rev.alias("_rev"))
        .orderBy(F.desc("_rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("_rev"), 2).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


_Q21_ORACLE = """
WITH late AS (
  SELECT l_orderkey, l_suppkey
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE o_orderstatus = 'F'
    AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM late l1
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM late l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY s_name
"""


@register("r21_waiting_suppliers", oracle=_Q21_ORACLE)
def r21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21-style "suppliers who kept orders waiting": for finished
    orders, count late lineitems (ship >= order date + 60 days — this data
    has no commit/receipt dates, so lateness is vs the order date) whose
    order involved ANOTHER supplier (EXISTS) but where no OTHER supplier
    was late (NOT EXISTS). The two correlated subqueries become a
    left-semi and a left-anti join on l_orderkey with the supplier
    inequality as a residual join condition — both hash-join on the order
    key, so at 100 TB each is one co-partitioned shuffle of the (already
    date/status-pruned) late set against lineitem; supplier is a
    broadcast dim. The semi/anti pair on the SAME fact is the shape this
    head exists to pin."""
    orders = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    l2 = li.select(
        F.col("l_orderkey").alias("_ok2"), F.col("l_suppkey").alias("_sk2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("_ok3"), F.col("l_suppkey").alias("_sk3")
    )
    supp = load(spark, sf_dir, "supplier")
    qualified = (
        late.join(
            l2,
            (late.l_orderkey == l2._ok2) & (late.l_suppkey != l2._sk2),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == l3._ok3) & (F.col("l_suppkey") != l3._sk3),
            "left_anti",
        )
    )
    return (
        qualified.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_Q11_ORACLE = """
WITH pr AS (
  SELECT l_partkey AS partkey,
         round(sum(l_extendedprice * (1 - l_discount)), 2) AS part_rev
  FROM lineitem GROUP BY l_partkey
),
tot AS (
  SELECT round(avg(part_rev) * 1.2, 6) AS thresh FROM pr
)
SELECT partkey, part_rev
FROM pr, tot
WHERE part_rev > thresh
"""


@register("r11_important_parts", oracle=_Q11_ORACLE)
def r11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11-style "important stock" (no partsupp table in this data,
    so value = lineitem revenue per part): keep parts whose revenue
    exceeds 1.2x the AVERAGE per-part revenue — the HAVING-against-
    global-aggregate shape, expressed scale-invariantly (a fixed
    fraction of the global SUM goes degenerate as the part count grows:
    0 qualifying rows at sf0.1; the avg-multiple keeps ~17% of parts at
    every SF). The threshold is a 1-row broadcast crossJoin computed
    over the already-grouped (and 2-dp-rounded) per-part frame — no
    second pass over lineitem, no window; the per-part grouped agg is
    the only data-scale shuffle. The avg of rounded values is itself
    6-dp-rounded so cross-engine accumulation order can't flip a
    borderline part."""
    li = load(spark, sf_dir, "lineitem")
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    pr = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        F.round(rev, 2).alias("part_rev")
    )
    tot = pr.agg(F.round(F.avg("part_rev") * 1.2, 6).alias("thresh"))
    return (
        pr.join(F.broadcast(tot))
        .filter(F.col("part_rev") > F.col("thresh"))
        .select("partkey", "part_rev")
    )


_Q20_ORACLE = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 's%'
    AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
  HAVING round(sum(l_quantity), 6) > 45
)
"""


@register("r20_excess_supply", oracle=_Q20_ORACLE)
def r20_excess_supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20-style nested semi-join into an aggregated subquery (no
    partsupp here, so "excess availability" = a supplier shipped >45
    units of some 's%' part in 1997): part-name and date predicates prune
    at the scans, the grouped HAVING runs on (suppkey, partkey) — one
    shuffle of the pruned fact — and the distinct supplier set semi-joins
    back to the supplier dim. Spark plans the IN as a left-semi hash
    join; the aggregated side is small post-HAVING so AQE broadcasts it.
    The HAVING compares the 6-dp-rounded sum (l_quantity is DOUBLE in
    this data) so both engines cut identically."""
    part = load(spark, sf_dir, "part").filter(F.col("p_name").startswith("s"))
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.round(F.sum("l_quantity"), 6).alias("_qty"))
        .filter(F.col("_qty") > 45)
        .select("l_suppkey")
    )
    supp = load(spark, sf_dir, "supplier")
    return (
        supp.join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )
