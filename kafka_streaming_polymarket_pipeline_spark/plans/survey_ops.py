"""SURVEY.md §2 operator inventory, re-expressed over the testdata tables.

Each query is named after the operator ID(s) it covers (P=projection/filter,
J=join, A=aggregation, O=order/limit, F=scalar function, U=set op) and cites
the reference behavior it mirrors. The reference performs these operators
row-at-a-time in Python (producers/*.py); here every one is a declarative
DataFrame plan that Catalyst can push down / broadcast / codegen.

Operators covered elsewhere:
- A7 (1s latest-wins downsample) streaming form -> streaming/downsample.py
- A11 (running message counter) is operational telemetry -> observe()/listeners,
  not a relational result; intentionally no query entry.
- S1-S9 sources/sinks -> sources/ + streaming/ modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.plans.registry import register
from kafka_streaming_polymarket_pipeline_spark.tables import load

# ---------------------------------------------------------------------------
# P-series: projections / filters / predicates
# ---------------------------------------------------------------------------


@register(
    "p1_substring_filter",
    oracle="""
SELECT doc_id, source, n_chars
FROM documents
WHERE contains(lower(text), 'merge') OR contains(lower(text), 'stream')
""",
)
def p1_substring_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/F1/F2: lowercase substring containment filter.

    Mirrors the reference's BTC-market keyword filter
    (producers/market_discovery.py:35-48: keep markets whose lowercased
    question contains 'bitcoin' or 'btc').
    """
    docs = load(spark, sf_dir, "documents")
    text = F.lower(F.col("text"))
    return docs.filter(text.contains("merge") | text.contains("stream")).select(
        "doc_id", "source", "n_chars"
    )


@register(
    "p2_window_containment",
    oracle="""
SELECT event_id, ts, event_type, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-15 12:00:00'
  AND ts <  TIMESTAMP '2024-01-15 12:00:00' + INTERVAL 15 MINUTE
""",
)
def p2_window_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/F9: time-window containment predicate (start <= t < start + 15 min).

    Mirrors the current-market window check (producers/market_discovery.py:50-73,
    end = start + 15 min at :66).
    """
    events = load(spark, sf_dir, "events")
    start = F.lit("2024-01-15 12:00:00").cast("timestamp")
    return events.filter(
        (F.col("ts") >= start) & (F.col("ts") < start + F.expr("INTERVAL 15 MINUTES"))
    ).select("event_id", "ts", "event_type", "value")


@register(
    "p3_projection_parse",
    oracle="""
SELECT doc_id,
       j ->> 'doc_id' AS doc_id_str,
       j ->> 'lang'   AS language,
       CAST(j ->> 'n_chars' AS BIGINT) AS len_chars
FROM (
  SELECT doc_id,
         to_json(struct_pack(doc_id := doc_id, lang := lang, n_chars := n_chars)) AS j
  FROM documents
)
""",
)
def p3_projection_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3/F3/F4: projection + rename through a JSON envelope — serialize
    fields to a JSON string, then extract-and-cast them back out.

    Mirrors the discovery projection's parse dance
    (producers/market_discovery.py:75-112: 14 fields pulled out of raw
    market JSON with renames and casts) — the schema-on-read round trip the
    whole bronze layer rests on.
    """
    docs = load(spark, sf_dir, "documents")
    j = F.to_json(F.struct("doc_id", "lang", "n_chars"))
    enveloped = docs.select("doc_id", j.alias("j"))
    return enveloped.select(
        "doc_id",
        F.get_json_object("j", "$.doc_id").alias("doc_id_str"),
        F.get_json_object("j", "$.lang").alias("language"),
        F.get_json_object("j", "$.n_chars").cast("long").alias("len_chars"),
    )


@register(
    "p4_type_filter",
    oracle="""
SELECT event_id, user_id, value
FROM events
WHERE event_type = 'purchase'
""",
)
def p4_type_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: discriminator equality filter (reference: keep only type=='ticker'
    frames, producers/coinbase_producer.py:35). Pushed down to the parquet scan."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "value")
    )


@register(
    "p5_event_dispatch",
    oracle="""
SELECT event_id,
       CASE WHEN event_type = 'click'    THEN 'book'
            WHEN event_type = 'view'     THEN 'price_change'
            WHEN event_type = 'purchase' THEN 'trade'
            ELSE 'unknown' END AS routed_type,
       value
FROM events
""",
)
def p5_event_dispatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: multiplexed-stream router (reference: dispatch on event_type in
    {book, price_change, last_trade_price, else},
    producers/polymarket_ws_manager.py:48-162). One select with
    when/otherwise instead of four imperative branches; the 'unknown'
    passthrough is the otherwise arm (:151-162)."""
    events = load(spark, sf_dir, "events")
    routed = (
        F.when(F.col("event_type") == "click", "book")
        .when(F.col("event_type") == "view", "price_change")
        .when(F.col("event_type") == "purchase", "trade")
        .otherwise("unknown")
    )
    return events.select("event_id", routed.alias("routed_type"), "value")


@register(
    "p6_explode_filter",
    oracle="""
SELECT doc_id, count(*) AS n_merge_tokens
FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token = 'merge'
GROUP BY doc_id
""",
)
def p6_explode_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: explode an array column then filter elements (reference: explode
    price_changes array, keep side=='BUY',
    producers/polymarket_ws_manager.py:114-117)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") == "merge")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_merge_tokens"))
    )


@register(
    "p7_positive_filter",
    oracle="""
SELECT event_id, user_id, value
FROM events
WHERE value > 100.0
""",
)
def p7_positive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: threshold filter (reference: skip balance <= 0 positions,
    producers/user_positions_tracker.py:81-85)."""
    return (
        load(spark, sf_dir, "events")
        .filter(F.col("value") > 100.0)
        .select("event_id", "user_id", "value")
    )


@register(
    "p8_null_empty_guards",
    oracle="""
SELECT doc_id, n_chars
FROM documents
WHERE text IS NOT NULL
  AND len(list_filter(string_split(text, ' '), t -> t <> '')) >= 40
""",
)
def p8_null_empty_guards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: null/empty guards (reference: skip markets without eventStartTime,
    require non-empty bids and asks — producers/market_discovery.py:57-59,
    producers/polymarket_ws_manager.py:55-60). Guard = not-null + size()>=N
    on the tokenized array."""
    docs = load(spark, sf_dir, "documents")
    tokens = F.filter(F.split("text", " "), lambda t: t != "")
    return docs.filter(F.col("text").isNotNull() & (F.size(tokens) >= 40)).select(
        "doc_id", "n_chars"
    )


@register(
    "p9_resolution_predicate",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice > 50000.0
""",
)
def p9_resolution_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: conjunctive predicate (reference: resolved iff closed AND
    umaResolutionStatus == 'resolved', producers/market_resolution.py:41)."""
    return (
        load(spark, sf_dir, "orders")
        .filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 50000.0))
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


# ---------------------------------------------------------------------------
# J-series: joins / enrichment
# ---------------------------------------------------------------------------


@register(
    "j1_dim_broadcast_join",
    oracle="""
SELECT c_mktsegment, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""",
)
def j1_dim_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1: fact-stream x tiny-dimension equi-join, broadcast-hash.

    Mirrors the token->outcome dict probe (built per market at
    producers/polymarket_ws_manager.py:279-282, probed at :61,117,135);
    misses drop = inner-join semantics. The dimension side is broadcast —
    at 100 TB the fact side never shuffles for this join.
    """
    events = load(spark, sf_dir, "events")
    cust = load(spark, sf_dir, "customer")
    return (
        events.join(F.broadcast(cust), events.user_id == cust.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "j2_interval_join",
    oracle="""
WITH windows AS (
  SELECT ws AS window_start, ws + INTERVAL 1 HOUR AS window_end
  FROM generate_series(TIMESTAMP '2024-01-05 00:00:00',
                       TIMESTAMP '2024-01-05 23:00:00',
                       INTERVAL 1 HOUR) t(ws)
)
SELECT window_start, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM windows JOIN events ON ts >= window_start AND ts < window_end
GROUP BY window_start
""",
)
def j2_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: interval/as-of correlation — stamp each event with the window
    containing it (reference: current_market_id stamped by wall-clock
    containment, producers/polymarket_ws_manager.py:263-284,92).

    The window dimension is tiny -> broadcast nested-loop on the range
    predicate; the fact side streams through without a shuffle. (At scale,
    if the window table were large, bucketize ts to an equi-key first.)
    """
    events = load(spark, sf_dir, "events")
    base = F.lit("2024-01-05 00:00:00").cast("timestamp")
    windows = spark.range(24).select(
        F.timestamp_seconds(F.unix_timestamp(base) + F.col("id") * 3600).alias("window_start"),
        F.timestamp_seconds(F.unix_timestamp(base) + (F.col("id") + 1) * 3600).alias("window_end"),
    )
    return (
        events.join(
            F.broadcast(windows),
            (events.ts >= windows.window_start) & (events.ts < windows.window_end),
        )
        .groupBy("window_start")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
    )


@register(
    "j3_left_label_join",
    oracle="""
SELECT c_custkey, c_mktsegment,
       coalesce(n_orders, 0) AS n_orders,
       round(coalesce(total_spend, 0.0), 2) AS total_spend
FROM customer
LEFT JOIN (
  SELECT o_custkey, count(*) AS n_orders, sum(o_totalprice) AS total_spend
  FROM orders GROUP BY o_custkey
) o ON c_custkey = o_custkey
""",
)
def j3_left_label_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: left outer label join with null back-fill (reference plan: join
    resolutions back onto features as the winner label, README.md:225-229;
    unresolved markets keep null -> coalesce default)."""
    cust = load(spark, sf_dir, "customer")
    per_cust = (
        load(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count("*").alias("_n"), F.sum("o_totalprice").alias("_spend"))
    )
    return cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("_n"), F.lit(0)).alias("n_orders"),
        F.round(F.coalesce(F.col("_spend"), F.lit(0.0)), 2).alias("total_spend"),
    )


@register(
    "j4_lag_deltas",
    oracle="""
SELECT event_id, user_id, value,
       round(value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 2) AS delta
FROM events
""",
)
def j4_lag_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: snapshot-over-snapshot delta as a lag window, not a self-join
    (reference plan: whale position changes between 10s snapshots,
    README.md:228; key at producers/user_positions_tracker.py:94)."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        "value",
        F.round(F.col("value") - F.lag("value").over(w), 2).alias("delta"),
    )


@register(
    "j5_latest_scalar",
    oracle="""
SELECT event_id, ts, event_type, value
FROM events
ORDER BY ts DESC, event_id DESC
LIMIT 1
""",
)
def j5_latest_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/O2: latest-row scalar lookup (reference: SELECT payload->>... ORDER BY
    ingested_at DESC LIMIT 1, producers/user_positions_tracker.py:171-180).
    event_id tiebreak keeps it deterministic."""
    return (
        load(spark, sf_dir, "events")
        .orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(1)
        .select("event_id", "ts", "event_type", "value")
    )


# ---------------------------------------------------------------------------
# A-series: aggregations
# ---------------------------------------------------------------------------


@register(
    "a1_array_sum",
    oracle="""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST((SELECT sum(len(t.token)) FROM unnest(string_split(text, ' ')) t(token)) AS BIGINT)
         AS total_token_chars
FROM documents
""",
)
def a1_array_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: fold over an array column without exploding (reference:
    total_bid_volume = sum of sizes over book levels,
    producers/polymarket_ws_manager.py:73-74). Uses the higher-order
    ``aggregate`` so the sum stays inside codegen, no shuffle at all."""
    docs = load(spark, sf_dir, "documents")
    tokens = F.split("text", " ")
    total = F.aggregate(
        tokens, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t).cast("long")
    )
    return docs.select(
        "doc_id",
        F.size(tokens).cast("long").alias("n_tokens"),
        total.alias("total_token_chars"),
    )


@register(
    "a2_argmax_per_group",
    oracle="""
SELECT event_type, event_id AS top_event_id, value AS top_value
FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1
""",
)
def a2_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: argmax — return the row attributes at the max value (reference:
    largest bid/ask order returns both size and price,
    producers/polymarket_ws_manager.py:77-84). ``max_by`` on a (value, id)
    struct = one-pass agg, no sort."""
    events = load(spark, sf_dir, "events")
    key = F.struct(F.col("value"), F.col("event_id"))
    return events.groupBy("event_type").agg(
        F.max_by("event_id", key).alias("top_event_id"),
        F.max("value").alias("top_value"),
    )


@register(
    "a3_positional_first",
    oracle="""
SELECT user_id, any_value(fv) AS first_val
FROM (
  SELECT user_id,
         first_value(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS fv
  FROM events
)
GROUP BY user_id
""",
)
def a3_positional_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: positional first element of an ordered collection (reference:
    best bid = bids[0], assuming best-first order,
    producers/polymarket_ws_manager.py:67-70). Built as
    collect -> array_sort -> element_at(1) to exercise real array
    positional access; the sortedness assumption is made explicit here."""
    events = load(spark, sf_dir, "events")
    ordered = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    return events.groupBy("user_id").agg(
        F.element_at(ordered, 1).getField("value").alias("first_val")
    )


@register(
    "a4_ratio_guarded",
    oracle="""
SELECT user_id,
       round(CASE WHEN (click_v + view_v) > 0
                  THEN (click_v - view_v) / (click_v + view_v)
                  ELSE 0.0 END, 6) AS imbalance
FROM (
  SELECT user_id,
         sum(CASE WHEN event_type = 'click' THEN value ELSE 0 END) AS click_v,
         sum(CASE WHEN event_type = 'view'  THEN value ELSE 0 END) AS view_v
  FROM events GROUP BY user_id
)
""",
)
def a4_ratio_guarded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: derived ratio with zero-denominator guard (reference:
    book_imbalance = (bidVol-askVol)/(bidVol+askVol), 0 on empty book,
    producers/polymarket_ws_manager.py:87-88)."""
    events = load(spark, sf_dir, "events")
    click_v = F.sum(F.when(F.col("event_type") == "click", F.col("value")).otherwise(0.0))
    view_v = F.sum(F.when(F.col("event_type") == "view", F.col("value")).otherwise(0.0))
    agg = events.groupBy("user_id").agg(click_v.alias("_c"), view_v.alias("_v"))
    denom = F.col("_c") + F.col("_v")
    imb = F.when(denom > 0, (F.col("_c") - F.col("_v")) / denom).otherwise(0.0)
    return agg.select("user_id", F.round(imb, 6).alias("imbalance"))


@register(
    "a5_topk_per_group",
    oracle="""
SELECT event_type, event_id, value, CAST(rn AS INT) AS rank
FROM (
  SELECT event_type, event_id, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
  FROM events
) WHERE rn <= 5
""",
)
def a5_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5/O1: top-K per group by value (reference: top-1000 positions per
    market by balance desc, pushed into GraphQL at
    producers/user_positions_tracker.py:30-47). row_number window; at scale
    AQE handles the skewed-group case."""
    events = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    return (
        events.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("event_type", "event_id", "value", "rank")
    )


@register(
    "a6_count_empty_marker",
    oracle="""
SELECT u.user_id, t.event_type,
       CAST(coalesce(c.n, 0) AS BIGINT) AS n,
       (coalesce(c.n, 0) = 0) AS is_empty
FROM (SELECT DISTINCT user_id FROM events) u
CROSS JOIN (SELECT DISTINCT event_type FROM events) t
LEFT JOIN (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY user_id, event_type
) c ON u.user_id = c.user_id AND t.event_type = c.event_type
""",
)
def a6_count_empty_marker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: group counts densified with explicit empty-group markers
    (reference: emit position_snapshot_empty when a snapshot has 0 rows,
    producers/user_positions_tracker.py:65-76,105). Cross join of the key
    domains + left join + coalesce(0)."""
    events = load(spark, sf_dir, "events")
    users = events.select("user_id").distinct()
    types = events.select("event_type").distinct()
    counts = events.groupBy("user_id", "event_type").agg(F.count("*").alias("_n"))
    dense = users.crossJoin(F.broadcast(types)).join(counts, ["user_id", "event_type"], "left")
    n = F.coalesce(F.col("_n"), F.lit(0).cast("long"))
    return dense.select("user_id", "event_type", n.alias("n"), (n == 0).alias("is_empty"))


@register(
    "a7_downsample_last",
    oracle="""
SELECT event_type,
       make_timestamp((epoch_us(ts) // 60000000) * 60000000) AS window_start,
       any_value(lv) AS last_val
FROM (
  SELECT event_type, ts, value,
         last_value(value) OVER (
           PARTITION BY event_type, make_timestamp((epoch_us(ts) // 60000000) * 60000000)
           ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
  FROM events
)
GROUP BY event_type, window_start
""",
)
def a7_downsample_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7/T3: latest-value-per-window downsample (reference: coinbase ticker
    throttle keeps the latest message per second,
    producers/coinbase_producer.py:11,36-48 — last-value dedup, not an
    average). Batch form; the streaming form is streaming/downsample.py."""
    events = load(spark, sf_dir, "events")
    return events.groupBy(
        "event_type", F.window("ts", "1 minute").start.alias("window_start")
    ).agg(F.max_by("value", F.struct("ts", "event_id")).alias("last_val"))


@register(
    "a8_incremental_watermark_max",
    oracle="""
SELECT event_type, max(ts) AS high_watermark, count(*) AS n
FROM events GROUP BY event_type
""",
)
def a8_incremental_watermark_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: max-watermark gate for incremental models (reference: dbt
    incremental gate SELECT MAX(discovered_at) FROM {{this}},
    models/silver/btc_prices.sql:17-19). In streaming this disappears into
    checkpoint offsets; batch form is a plain max."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.max("ts").alias("high_watermark"), F.count("*").alias("n"))
    )


@register(
    "a9_change_detect_dedup",
    oracle="""
SELECT user_id, event_type, event_id AS first_event_id
FROM (
  SELECT user_id, event_type, event_id,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""",
)
def a9_change_detect_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: keep-first dedup per key (reference: act only when token_ids
    changed, producers/polymarket_ws_manager.py:271). Deterministic
    first-by-(ts,id) via min_by instead of dropDuplicates (whose pick is
    partition-order dependent)."""
    events = load(spark, sf_dir, "events")
    return events.groupBy("user_id", "event_type").agg(
        F.min_by("event_id", F.struct("ts", "event_id")).alias("first_event_id")
    )


@register(
    "a10_consecutive_runs",
    oracle="""
WITH s AS (
  SELECT user_id, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rnt
  FROM events
), runs AS (
  SELECT user_id, count(*) AS run_len
  FROM s WHERE event_type = 'error'
  GROUP BY user_id, rn - rnt
)
SELECT user_id, CAST(max(run_len) AS BIGINT) AS max_error_run
FROM runs GROUP BY user_id
""",
)
def a10_consecutive_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10: consecutive-failure run length (reference: consecutive-error
    counter alerting every 5th failure, resetting on success,
    producers/user_positions_tracker.py:13,119-151). Batch form via
    gaps-and-islands (rn - rn_per_type); the stateful streaming form is
    streaming/stateful.py."""
    events = load(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    islands = (
        events.withColumn("_island", F.row_number().over(w_all) - F.row_number().over(w_type))
        .filter(F.col("event_type") == "error")
        .groupBy("user_id", "_island")
        .agg(F.count("*").alias("_run_len"))
    )
    return islands.groupBy("user_id").agg(F.max("_run_len").alias("max_error_run"))


# ---------------------------------------------------------------------------
# U-series: set operations (§2.6) + grouping sets
# ---------------------------------------------------------------------------


@register(
    "u1_union_by_name",
    oracle="""
SELECT event_id, kind, value, user_id FROM (
  SELECT event_id, 'big' AS kind, value, user_id FROM events WHERE value > 150
  UNION ALL BY NAME
  SELECT event_id, user_id, 'err' AS kind, CAST(NULL AS DOUBLE) AS value
  FROM events WHERE event_type = 'error' AND value <= 150
)
""",
)
def u1_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: union of differently-shaped branches by column name (reference:
    the multiplexed polymarket-prices topic materializes the union of
    orderbook_summary/price_change/trade shapes,
    producers/polymarket_ws_manager.py:110,131,149,161)."""
    events = load(spark, sf_dir, "events")
    big = events.filter(F.col("value") > 150).select(
        "event_id", F.lit("big").alias("kind"), "value", "user_id"
    )
    err = events.filter((F.col("event_type") == "error") & (F.col("value") <= 150)).select(
        "event_id", "user_id", F.lit("err").alias("kind")
    )
    return big.unionByName(err, allowMissingColumns=True)


@register(
    "u2_rollup_revenue",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice), 2) AS sum_base_price, count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def u2_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: hierarchical rollup totals (beyond the reference's surface — its
    planned gold layer needs share-of-total metrics, README.md:225-229;
    rollup computes the totals level in one pass)."""
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# F-series: scalar function battery
# ---------------------------------------------------------------------------


@register(
    "f_scalar_battery",
    oracle="""
SELECT event_id,
       lower(event_type) AS lower_type,
       contains(event_type, 'ck') AS has_ck,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
       CAST(value AS DOUBLE) AS value_dbl,
       ts + INTERVAL 15 MINUTE AS ts_plus_15m,
       date_trunc('hour', ts) AS ts_hour,
       CASE WHEN value >= 150 THEN 'Up' WHEN value < 50 THEN 'Down' ELSE 'Unknown' END AS winner,
       CASE WHEN user_id % 2 = 0 THEN 'YES' ELSE 'NO' END AS outcome,
       CAST(floor(epoch(ts - TIMESTAMP '2024-01-01 00:00:00') / 10) AS BIGINT) AS elapsed_10s,
       substring(event_type, 1, 3) AS type_prefix
FROM events
WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
""",
)
def f_scalar_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1-F15 scalar battery: lower (F1), contains (F2), JSON extract+cast
    (F3/F14), double cast (F5), long cast (F6), interval add (F9),
    hour truncation (F10), winner decode when/otherwise (F11), parity
    outcome decode (F12), elapsed/10 bucket (F13), substring truncation
    (F15) — each mirroring the cited reference call sites in SURVEY §2.7."""
    events = load(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-02").cast("timestamp")
    )
    winner = (
        F.when(F.col("value") >= 150, "Up")
        .when(F.col("value") < 50, "Down")
        .otherwise("Unknown")
    )
    outcome = F.when(F.col("user_id") % 2 == 0, "YES").otherwise("NO")
    epoch_base = F.unix_timestamp(F.lit("2024-01-01 00:00:00").cast("timestamp"))
    return events.select(
        "event_id",
        F.lower("event_type").alias("lower_type"),
        F.col("event_type").contains("ck").alias("has_ck"),
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
        F.col("value").cast("double").alias("value_dbl"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("ts_plus_15m"),
        F.date_trunc("hour", "ts").alias("ts_hour"),
        winner.alias("winner"),
        outcome.alias("outcome"),
        F.floor((F.unix_timestamp("ts") - epoch_base) / 10).cast("long").alias("elapsed_10s"),
        F.substring("event_type", 1, 3).alias("type_prefix"),
    )


@register(
    "f7_iso8601_parse",
    oracle="""
SELECT event_id,
       -- AT TIME ZONE 'UTC', not a bare CAST: casting TIMESTAMPTZ to
       -- TIMESTAMP converts into the DuckDB session TimeZone, which the
       -- driver's connection inherits from its OS environment — the one
       -- tz-dependent expression a UTC-pinned engine can't compensate for.
       CAST(strptime(replace(iso, 'Z', '+00:00'), '%Y-%m-%dT%H:%M:%S.%f%z')
            AT TIME ZONE 'UTC' AS TIMESTAMP)
         AS parsed_ts
FROM (
  SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') || 'Z' AS iso
  FROM events WHERE ts < TIMESTAMP '2024-01-02 00:00:00'
)
""",
)
def f7_iso8601_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F7: ISO-8601 string -> timestamp round-trip, Z suffix included
    (reference parses ISO strings with a manual Z->+00:00 fixup,
    producers/market_discovery.py:62; Spark's to_timestamp handles Z).
    The serialize leg mirrors F8's isoformat() producers."""
    events = load(spark, sf_dir, "events").filter(
        F.col("ts") < F.lit("2024-01-02").cast("timestamp")
    )
    iso = F.concat(F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"), F.lit("Z"))
    return events.select(
        "event_id",
        F.to_timestamp(iso, "yyyy-MM-dd'T'HH:mm:ss.SSSSSSX").alias("parsed_ts"),
    )


@register(
    "f4_json_serialize_roundtrip",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(j, '$.event_type') AS VARCHAR) AS rt_type,
       CAST(json_extract(j, '$.value') AS DOUBLE) AS rt_value
FROM (
  SELECT event_id,
         to_json(struct_pack(event_type := event_type, value := value)) AS j
  FROM events WHERE event_type = 'purchase'
)
""",
)
def f4_json_serialize_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4+F3: to_json(struct(...)) then parse back (reference: every
    producer.send JSON-serializes dicts, producers/market_discovery.py:11;
    consumers deserialize at consumers/db_writer.py:51)."""
    events = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    j = F.to_json(F.struct("event_type", "value"))
    return events.select(
        "event_id",
        F.get_json_object(j, "$.event_type").alias("rt_type"),
        F.get_json_object(j, "$.value").cast("double").alias("rt_value"),
    )


# ---------------------------------------------------------------------------
# Extended relational breadth (beyond the reference's own surface): distinct
# aggregation, anti-join, cube grouping, frame-based running windows — the
# patterns the reference's planned gold features imply (SURVEY §2.4 note).
# ---------------------------------------------------------------------------


@register(
    "u3_distinct_agg",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(count(*) AS BIGINT)                AS n_events,
       round(sum(value), 2)                    AS total_value
FROM events
GROUP BY event_type
""",
)
def u3_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (wallet counts in the planned concentration
    features, README.md:228-229; approx_count_distinct is the 100 TB
    variant — exact here so the oracle can hash-match)."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count_distinct("user_id").alias("n_users"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


@register(
    "u4_anti_join",
    oracle="""
SELECT c.c_custkey, c.c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
""",
)
def u4_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join: customers with no orders (the empty-group marker
    pattern A6 generalized; Catalyst broadcasts the smaller side)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "u5_cube_revenue",
    oracle="""
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
""",
)
def u5_cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping over (returnflag, linestatus): all 2^2 grouping sets in
    one pass (partial-agg then expand — one shuffle, not four scans)."""
    li = load(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "u6_pivot_status",
    oracle="""
SELECT l_returnflag,
       round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_f,
       round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_o,
       CAST(count(CASE WHEN l_linestatus = 'F' THEN 1 END) AS BIGINT) AS n_f,
       CAST(count(CASE WHEN l_linestatus = 'O' THEN 1 END) AS BIGINT) AS n_o
FROM lineitem
GROUP BY l_returnflag
""",
)
def u6_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT on line status: wide per-status quantity/count columns per
    return flag. The pivot values are passed EXPLICITLY, so Spark skips the
    extra distinct-values job and the plan is a single grouped aggregation
    with conditional folds (exactly the CASE WHEN expansion the oracle
    writes) — one shuffle at any scale, and the output schema is static,
    which a 1000-executor job needs for downstream contract stability."""
    li = load(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return wide.select(
        "l_returnflag",
        F.coalesce(F.col("F_qty"), F.lit(0.0)).alias("qty_f"),
        F.coalesce(F.col("O_qty"), F.lit(0.0)).alias("qty_o"),
        F.coalesce(F.col("F_n"), F.lit(0)).alias("n_f"),
        F.coalesce(F.col("O_n"), F.lit(0)).alias("n_o"),
    )


@register(
    "u7_intersect_users",
    oracle="""
SELECT user_id, event_type
FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
INTERSECT
SELECT user_id, event_type
FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
""",
)
def u7_intersect_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct set semantics): (user, event_type) pairs active
    in BOTH halves of the month — retention overlap. Spark plans this as
    partial-distinct then a single hash join on the full row, one shuffle
    per side; no row explosion at any scale."""
    ev = load(spark, sf_dir, "events")
    mid = F.lit("2024-01-16").cast("timestamp")
    a = ev.filter(F.col("ts") < mid).select("user_id", "event_type")
    b = ev.filter(F.col("ts") >= mid).select("user_id", "event_type")
    return a.intersect(b)


@register(
    "u8_except_all_pairs",
    oracle="""
SELECT user_id, event_type
FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00'
EXCEPT ALL
SELECT user_id, event_type
FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00'
""",
)
def u8_except_all_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (multiset semantics): per-pair activity surplus of the
    first half over the second — each (user, type) emits
    max(m1 - m2, 0) duplicate rows. Spark's ExceptAll rewrites to a
    count-per-side aggregate + generate, so the shuffle carries distinct
    pairs with counts, never the raw duplicated rows."""
    ev = load(spark, sf_dir, "events")
    mid = F.lit("2024-01-16").cast("timestamp")
    a = ev.filter(F.col("ts") < mid).select("user_id", "event_type")
    b = ev.filter(F.col("ts") >= mid).select("user_id", "event_type")
    return a.exceptAll(b)


@register(
    "w1_running_sum",
    oracle="""
SELECT user_id, ts, value,
       round(sum(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value,
       CAST(row_number() OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT)  AS event_seq
FROM events
WHERE user_id < 100
""",
)
def w1_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-based running aggregate per user (cumulative volume — the
    momentum-feature building block, README.md:225-229). One sort-shuffle
    per partition key; the frame is computed in a single pass."""
    from pyspark.sql import Window

    events = load(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id", "ts", "value",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias("running_value"),
        F.row_number().over(w).cast("long").alias("event_seq"),
    )


@register(
    "j2b_bucketed_interval_join",
    oracle="""
WITH windows AS (
  SELECT ws AS window_start, ws + INTERVAL 1 HOUR AS window_end
  FROM generate_series(TIMESTAMP '2024-01-05 00:00:00',
                       TIMESTAMP '2024-01-05 23:00:00',
                       INTERVAL 1 HOUR) t(ws)
)
SELECT window_start, count(*) AS n_events, round(sum(value), 2) AS total_value
FROM windows JOIN events ON ts >= window_start AND ts < window_end
GROUP BY window_start
""",
)
def j2b_bucketed_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 scale path: the same interval correlation as j2_interval_join but
    via time-bucket equi-keys (operators/rangejoin.py) — an equi-join that
    shuffle-partitions instead of a nested-loop, so it survives interval
    tables far beyond broadcast size. Same oracle as j2: identical output.
    """
    from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import bucketed_interval_join

    events = load(spark, sf_dir, "events")
    base = F.lit("2024-01-05 00:00:00").cast("timestamp")
    windows = spark.range(24).select(
        F.timestamp_seconds(F.unix_timestamp(base) + F.col("id") * 3600).alias("window_start"),
        F.timestamp_seconds(F.unix_timestamp(base) + (F.col("id") + 1) * 3600).alias("window_end"),
    )
    joined = bucketed_interval_join(
        events, windows, "ts", "window_start", "window_end", bucket_seconds=3600
    )
    return joined.groupBy("window_start").agg(
        F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("total_value")
    )


@register(
    "w2_session_windows",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WHERE user_id < 50
), ids AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, min(ts) AS session_start,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM ids GROUP BY user_id, session_id
""",
)
def w2_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based session windows (30-min inactivity gap) per user via
    ``session_window`` — the reference's per-market session lifecycle (T4)
    generalized to data-driven sessions. The oracle reproduces the exact
    semantics with gaps-and-islands SQL; outputs key on session_start
    (min event ts), the convention both models share."""
    events = load(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.min("ts").alias("session_start"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select("user_id", "session_start", "n_events", "total_value")
    )


@register(
    "a12_percentiles",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 4)  AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(min(value), 4)                 AS v_min,
       round(max(value), 4)                 AS v_max
FROM events
GROUP BY event_type
""",
)
def a12_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (latency/price distribution
    features). ``percentile`` is the exact (sort-based) form so the oracle
    hash-matches; at 100 TB swap to ``percentile_approx`` (t-digest sketch,
    one pass, mergeable) and accept the documented error bound."""
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
        F.round(F.min("value"), 4).alias("v_min"),
        F.round(F.max("value"), 4).alias("v_max"),
    )


@register("a13_approx_count_distinct", oracle=None)
def a13_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct wallets per event type — the 100 TB form
    of u3's exact count (register-merge is commutative: one narrow shuffle,
    no distinct expansion). No SQL oracle: DuckDB's HLL yields a different
    estimate by construction; tests assert the estimate lands within the
    configured 1% rsd of the exact count instead."""
    events = load(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("n_events"),
    )

@register(
    "a13b_approx_distinct_gate",
    oracle="""
SELECT event_type,
       CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
       TRUE AS approx_ok
FROM events GROUP BY event_type
""",
)
def a13b_approx_distinct_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable gate for a13: HLL estimates differ by engine, so
    the hashable contract is the *quality bound* — per event type, emit the
    exact distinct count plus a flag that the rsd=1% HLL++ estimate landed
    within 3x its configured rsd (the derived-oracle pattern s2_recall
    uses). The oracle asserts the flag is TRUE for every group, so a
    regression in the sketch path flips the hash."""
    events = load(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count_distinct("user_id").alias("exact_users"),
    )
    return per_type.select(
        "event_type",
        F.col("exact_users").cast("long").alias("exact_users"),
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.greatest(F.round(0.03 * F.col("exact_users")), F.lit(2))
        ).alias("approx_ok"),
    )


@register(
    "k1_salted_agg",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS cnt_events,
       round(CAST(sum(value) AS DOUBLE), 4) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events GROUP BY event_type
""",
)
def k1_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation under the correctness gate: the skew
    weapon for hot keys (AQE splits skewed joins but NOT skewed
    aggregations). The oracle is the plain GROUP BY — the salted plan must
    be result-identical, which is exactly the decomposability contract
    `operators/scale.py:salted_agg` enforces. sum is rounded on both
    sides (partial-merge order differs from a single-pass sum by design)."""
    from kafka_streaming_polymarket_pipeline_spark.operators.scale import salted_agg

    events = load(spark, sf_dir, "events")
    out = salted_agg(
        events.select("event_type", "value"),
        keys=["event_type"],
        aggs={
            "cnt_events": F.count(F.lit(1)),
            "sum_value": F.sum("value"),
            "min_value": F.min("value"),
            "max_value": F.max("value"),
        },
    )
    return out.select(
        "event_type",
        F.col("cnt_events").cast("long").alias("cnt_events"),
        F.round("sum_value", 4).alias("sum_value"),
        "min_value",
        "max_value",
    )


@register(
    "a14_approx_percentile_gate",
    oracle="""
WITH s AS (
  SELECT event_type,
         quantile_cont(value, 0.5)  AS p50,
         quantile_cont(value, 0.95) AS p95,
         min(value) AS vmin, max(value) AS vmax
  FROM events GROUP BY event_type
)
SELECT event_type,
       round(p50, 4) AS exact_p50,
       round(p95, 4) AS exact_p95,
       TRUE AS approx_ok
FROM s
""",
)
def a14_approx_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable gate for the sketch percentile (the 100 TB swap
    a12's docstring prescribes): percentile_approx is a KLL/GK-style
    mergeable sketch whose exact output no other engine reproduces, so —
    like a13b for HLL — the hashable contract is the error bound: the
    accuracy-10000 estimate must land inside a rank band around the exact
    quantile ([p45, p55] for the median, [p90, p97.5] for p95) — rank
    bands hold at any group size, unlike value tolerances (a sketch
    returns an actual sample, which for tiny groups can sit a whole
    order-statistic gap from the interpolated exact value)."""
    events = load(spark, sf_dir, "events")
    agg = events.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.95)").alias("p95"),
        F.expr("percentile(value, 0.45)").alias("lo50"),
        F.expr("percentile(value, 0.55)").alias("hi50"),
        F.expr("percentile(value, 0.90)").alias("lo95"),
        F.expr("percentile(value, 0.975)").alias("hi95"),
        F.expr("percentile_approx(value, 0.5, 10000)").alias("a50"),
        F.expr("percentile_approx(value, 0.95, 10000)").alias("a95"),
    )
    return agg.select(
        "event_type",
        F.round("p50", 4).alias("exact_p50"),
        F.round("p95", 4).alias("exact_p95"),
        (
            F.col("a50").between(F.col("lo50"), F.col("hi50"))
            & F.col("a95").between(F.col("lo95"), F.col("hi95"))
        ).alias("approx_ok"),
    )


@register(
    "w3_rank_battery",
    oracle="""
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity,
       CAST(rank()       OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       round(percent_rank() OVER w, 6)     AS prnk,
       round(cume_dist()    OVER w, 6)     AS cdist,
       CAST(ntile(4) OVER w AS INT)        AS quartile
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-02-01 00:00:00'
WINDOW w AS (PARTITION BY l_returnflag
             ORDER BY l_quantity, l_orderkey, l_linenumber)
""",
)
def w3_rank_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function battery: rank / dense_rank / percent_rank /
    cume_dist / ntile in one window pass (one sort-shuffle on the
    partition key). The ORDER BY ends in the (orderkey, linenumber)
    unique key so even ntile — whose buckets depend on ROW order, not
    value order — is engine-deterministic; rank/dense_rank tie on equal
    quantities by SQL semantics identically in both engines."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-02-01").cast("timestamp"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    return li.select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.round(F.cume_dist().over(w), 6).alias("cdist"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


@register(
    "k2_salted_join",
    oracle="""
SELECT c_mktsegment,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""",
)
def k2_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted shuffle join under the correctness gate (k1's sibling for
    joins): fact side salted, dim side replicated salt_n times, joined
    on (key, salt) with a shuffle_hash hint so the plan actually
    exercises the salted path. The oracle is the PLAIN join — hash
    equality proves salting is result-invariant."""
    from kafka_streaming_polymarket_pipeline_spark.operators.scale import salted_join

    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").withColumnRenamed("c_custkey", "o_custkey")
    joined = salted_join(orders, cust, key="o_custkey")
    return joined.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )


@register(
    "w4_trailing_range_window",
    oracle="""
SELECT user_id, ts, value,
       round(sum(value) OVER w, 2)          AS trailing_1h_sum,
       CAST(count(*) OVER w AS BIGINT)      AS trailing_1h_n
FROM events
WHERE user_id < 30
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def w4_trailing_range_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame trailing window: per-user 1-hour trailing volume — the
    time-based frame w1's ROWS frame can't express (ties and gaps in event
    time change the frame contents). Ordered on integer MICROSECONDS
    (unix_micros / epoch_us) so the frame boundary arithmetic is exact and
    identical on both engines; one sort-shuffle per user partition."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-3600 * 1000 * 1000, 0)
    )
    return ev.select(
        "user_id",
        "ts",
        "value",
        F.round(F.sum("value").over(w), 2).alias("trailing_1h_sum"),
        F.count(F.lit(1)).over(w).cast("long").alias("trailing_1h_n"),
    )


@register(
    "a18_funnel_stages",
    oracle="""
WITH v AS (
  SELECT user_id, min(ts) AS t_view FROM events
  WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts > v.t_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_view,
       (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_view_click,
       (SELECT CAST(count(*) AS BIGINT) FROM p) AS n_view_click_purchase,
       round((SELECT count(*) FROM p) * 1.0
             / greatest((SELECT count(*) FROM v), 1), 6) AS conversion
""",
)
def a18_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> later click -> later purchase): three
    chained per-user aggregations, all partitioned on user_id so the
    exchanges co-locate and AQE reuses them; stage timestamps are exact
    event-time minima (no floats until the final rounded ratio). The
    sequencing predicate (strictly-later) is the part a naive
    count-per-type 'funnel' gets wrong."""
    ev = load(spark, sf_dir, "events")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_view_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
    return (
        nv.crossJoin(F.broadcast(nc))
        .crossJoin(F.broadcast(np_))
        .select(
            "n_view",
            "n_view_click",
            "n_view_click_purchase",
            F.round(
                F.col("n_view_click_purchase")
                / F.greatest(F.col("n_view"), F.lit(1)),
                6,
            ).alias("conversion"),
        )
    )


@register(
    "a19_cohort_retention",
    oracle="""
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS cohort_day
  FROM events GROUP BY user_id
)
SELECT f.cohort_day,
       CAST(date_diff('day', CAST(f.cohort_day AS DATE),
                       CAST(date_trunc('day', e.ts) AS DATE)) AS BIGINT)
         AS day_offset,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active
FROM events e JOIN first_seen f ON f.user_id = e.user_id
GROUP BY 1, 2
""",
)
def a19_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-seen day, counted
    distinct on each later activity day offset. One aggregate for first
    touch, one fact-side join on user_id (co-partitioned with the
    aggregate's exchange), one distinct-count aggregate — the layout a
    1000-executor retention job wants: no window over the whole fact, no
    per-cohort scans. Offsets are integer day arithmetic, engine-exact."""
    ev = load(spark, sf_dir, "events")
    # cohort_day stays a TIMESTAMP (midnight) rather than a DATE: the
    # date/timestamp distinction survives Arrow->pandas differently per
    # engine, and the midnight timestamp is the portable representation.
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    return (
        ev.join(first_seen, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(
                F.to_date(F.date_trunc("day", F.col("ts"))), F.to_date("cohort_day")
            )
            .cast("long")
            .alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


@register(
    "w5_scd2_intervals",
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         lag(event_type) OVER w AS prev_type
  FROM events
  WHERE user_id < 20
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
  SELECT user_id, ts, event_id, event_type
  FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_type,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       (lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL)
         AS is_current
FROM changes
""",
)
def w5_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 dimension build from an event stream: collapse repeated
    states per user (lag != current), then close each interval with the
    next change's timestamp (lead; NULL = current row). Two window passes
    over the SAME (user_id, ts, event_id) sort order, so Spark plans one
    sort-shuffle and reuses it — the standard warehouse history-table
    materialization, engine-exact because only timestamps and equality
    are involved."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNull() | (F.col("event_type") != F.col("prev_type")))
        .select("user_id", "ts", "event_id", "event_type")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w2).alias("valid_to"),
        F.lead("ts").over(w2).isNull().alias("is_current"),
    )


@register(
    "a20_gap_fill_ffill",
    oracle="""
WITH hourly AS (
  SELECT user_id, hr, any_value(lv) AS last_value FROM (
    SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
           last_value(value) OVER (
             PARTITION BY user_id, date_trunc('hour', ts)
             ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS lv
    FROM events WHERE user_id < 10
  )
  GROUP BY user_id, hr
), grid AS (
  SELECT u.user_id, g.g AS grid_ts
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 10) u,
       generate_series(TIMESTAMP '2024-01-01 00:00:00',
                       TIMESTAMP '2024-01-30 23:00:00',
                       INTERVAL 1 HOUR) AS g(g)
)
SELECT g.user_id, g.grid_ts,
       last_value(h.last_value IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.grid_ts
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
       (h.last_value IS NULL) AS was_gap
FROM grid g LEFT JOIN hourly h ON h.user_id = g.user_id AND h.hr = g.grid_ts
""",
)
def a20_gap_fill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling with forward fill: downsample to hourly
    last-wins values, explode a fixed hourly grid per key, left-join, and
    carry the last observation forward (last(ignorenulls) over an ordered
    frame). The resample-and-ffill primitive every feature pipeline needs
    when sensors/markets go quiet. The grid explode is per-key and
    calendar-bounded (720 rows/key/month regardless of corpus size) and
    the ffill is one sort-shuffle per key — no global pass. Values are
    exact max_by passthroughs, so nothing needs rounding."""
    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    hourly = ev.groupBy(
        F.col("user_id").alias("h_user"),
        F.date_trunc("hour", F.col("ts")).alias("hr"),
    ).agg(F.max_by("value", F.struct("ts", "event_id")).alias("last_value"))
    grid = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit("2024-01-01 00:00:00").cast("timestamp"),
                    F.lit("2024-01-30 23:00:00").cast("timestamp"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("grid_ts"),
        )
    )
    joined = grid.join(
        hourly,
        (F.col("user_id") == F.col("h_user")) & (F.col("grid_ts") == F.col("hr")),
        "left",
    ).select("user_id", "grid_ts", "last_value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        "user_id",
        "grid_ts",
        F.last("last_value", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("last_value").isNull().alias("was_gap"),
    )


@register(
    "a21_value_histogram",
    oracle="""
SELECT CAST(floor(value / 10.0) AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       round(min(value), 2) AS lo,
       round(max(value), 2) AS hi
FROM events
GROUP BY 1
""",
)
def a21_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (width 10): one map-side-combined
    groupBy on the computed bucket — the distribution profile that sizes
    skew salts and validates quality-score cuts. Bucket arithmetic is
    floor division (engine-exact); min/max are raw passthroughs rounded
    only for display."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.floor(F.col("value") / 10.0).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 2).alias("lo"),
            F.round(F.max("value"), 2).alias("hi"),
        )
    )


@register(
    "a22_type_trend_corr",
    oracle="""
SELECT event_type,
       round(corr(value, epoch_us(ts) / 1000000.0), 4) AS trend_corr,
       round(covar_samp(value, epoch_us(ts) / 1000000.0), 2) AS trend_covar,
       round(stddev_samp(value), 4) AS value_stddev
FROM events
GROUP BY event_type
""",
)
def a22_type_trend_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value-vs-time correlation, sample covariance, and stddev
    — the statistical-aggregate family (Pearson co-moments) in one
    grouped pass. Both engines use streaming co-moment updates whose
    merge order differs at ~1e-12 relative, so outputs round at 4/2/4 dp
    (covar magnitudes here are ~1e5, hence the coarser 2 dp)."""
    ev = load(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts")) / F.lit(1000000.0)
    return ev.groupBy("event_type").agg(
        F.round(F.corr("value", t), 4).alias("trend_corr"),
        F.round(F.covar_samp("value", t), 2).alias("trend_covar"),
        F.round(F.stddev_samp("value"), 4).alias("value_stddev"),
    )


@register(
    "j6_asof_join",
    oracle="""
WITH bdup AS (
  SELECT user_id, ts, value, event_id,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'view'
), b AS (
  SELECT user_id, ts, value AS view_value, event_id AS view_event_id
  FROM bdup WHERE rn = 1
), p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
)
SELECT p.event_id, p.user_id, p.ts, round(p.value, 6) AS purchase_value,
       b.view_event_id, round(b.view_value, 6) AS view_value
FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts
""",
)
def j6_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2-adjacent: generic backward AS-OF join — each purchase picks up
    the user's most recent view at-or-before it (last-touch attribution).
    The oracle is DuckDB's native ASOF LEFT JOIN; the Spark side is the
    union-marker scan (operators/rangejoin.py asof_join): one shuffle on
    the key, unbounded look-back with no interval explosion — the form
    a bucketed range join cannot express without a staleness horizon.
    Build rows are deduped to one per (user, ts) first (max event_id
    wins) because same-instant build rows have no defined as-of winner.
    """
    from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import asof_join

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    build = (
        ev.filter(F.col("event_type") == "view")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("value").alias("view_value"),
            F.col("event_id").alias("view_event_id"),
        )
    )
    probe = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    out = asof_join(
        probe, build, on="user_id", ts_col="ts",
        build_cols=["view_event_id", "view_value"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 6).alias("purchase_value"),
        "view_event_id",
        F.round("view_value", 6).alias("view_value"),
    )


@register(
    "a23_mad_outliers",
    oracle="""
WITH med AS (
  SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS med
  FROM orders GROUP BY o_orderpriority
), dev AS (
  SELECT o.o_orderpriority, quantile_cont(abs(o.o_totalprice - m.med), 0.5) AS mad
  FROM orders o JOIN med m USING (o_orderpriority)
  GROUP BY o.o_orderpriority
)
SELECT o.o_orderkey, o.o_orderpriority, round(o.o_totalprice, 2) AS totalprice,
       round(0.6745 * (o.o_totalprice - m.med) / d.mad, 6) AS robust_z
FROM orders o
JOIN med m USING (o_orderpriority)
JOIN dev d USING (o_orderpriority)
ORDER BY abs(round(0.6745 * (o.o_totalprice - m.med) / d.mad, 6)) DESC, o.o_orderkey
LIMIT 50
""",
)
def a23_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly scoring: the 50 most anomalous orders per the
    Iglewicz–Hoaglin modified z-score 0.6745*(x - median)/MAD, computed
    per priority group. Median and MAD come from two grouped exact
    percentiles (sort-based; at 100 TB swap to percentile_approx and the
    score becomes approximate with a documented bound); the per-group
    scalars broadcast back (5 groups), so the scan side never shuffles —
    plan is two grouped aggs + two broadcast joins + TakeOrderedAndProject.
    Ordering compares the ROUNDED score on both engines, id tie-broken,
    so accumulation-order noise cannot flip the cut."""
    orders = load(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("med")
    )
    dev = (
        orders.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority")
        .agg(F.expr("percentile(abs(o_totalprice - med), 0.5)").alias("mad"))
    )
    scored = (
        orders.join(F.broadcast(med), "o_orderpriority")
        .join(F.broadcast(dev), "o_orderpriority")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.round(
                0.6745 * (F.col("o_totalprice") - F.col("med")) / F.col("mad"), 6
            ).alias("robust_z"),
        )
    )
    return scored.orderBy(F.abs(F.col("robust_z")).desc(), "o_orderkey").limit(50)


@register(
    "a24_ewma_per_user",
    oracle="""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(list_reduce(list(value ORDER BY ts, event_id),
                         (acc, x) -> acc * 0.75 + 0.25 * x), 6) AS ewma_value
FROM events
WHERE value IS NOT NULL
GROUP BY user_id
""",
)
def a24_ewma_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average (alpha = 0.25) of
    event values in time order — the classic smoothed-state feature a
    window frame cannot express (each step depends on the previous
    OUTPUT, not a fixed frame). Implemented as a deterministic left fold
    over the (ts, event_id)-sorted value array: both engines evaluate
    literally `acc * 0.75 + 0.25 * x` left-to-right over the identical
    order, so the doubles agree bit-for-bit before the 6 dp round.

    Scale note: collect_list bounds state to one user's history per row —
    fine for bounded per-key series. For unbounded series the fold is an
    affine map x -> a*x + b per element, and affine maps compose
    associatively, so the same result is computable as a mergeable
    two-level aggregation of (a, b) pairs (segment-scan form) without
    materializing the array; streaming form = applyInPandasWithState.

    NULL values are filtered on BOTH sides (r04 ADVICE): the
    coalesce-seeded fold would silently RESTART the EWMA after a NULL
    while DuckDB's list_reduce would propagate it — excluding NULLs
    makes the engines agree by construction instead of by data luck.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    vals = F.transform(arr, lambda r: r["value"])
    ewma = F.aggregate(
        vals,
        F.lit(None).cast("double"),
        lambda acc, x: F.coalesce(acc * F.lit(0.75) + F.lit(0.25) * x, x),
    )
    return ev.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.round(ewma, 6).alias("ewma_value"),
    )


@register(
    "a24b_ewma_unbounded",
    oracle="""
WITH seq AS (
  SELECT user_id, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
         count(*) OVER (PARTITION BY user_id) AS n
  FROM events WHERE value IS NOT NULL
)
SELECT user_id, CAST(max(n) AS BIGINT) AS n_events,
       round(sum(CASE WHEN rn = 1 THEN value * pow(0.75, n - 1)
                      ELSE 0.25 * value * pow(0.75, n - rn) END), 6) AS ewma_value
FROM seq GROUP BY user_id
""",
)
def a24b_ewma_unbounded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """a24's EWMA without the per-user array — the UNBOUNDED-history
    form (r05 verdict task #7). The fold acc -> 0.75*acc + 0.25*x is an
    affine map per element, and affine maps compose associatively
    ((a2,b2)∘(a1,b1) = (a2*a1, a2*b1 + b2)) — the segmented-scan view.
    With CONSTANT decay the suffix product telescopes: element i of an
    n-element series contributes weight 0.75^(n-i) (times 0.25, except
    the seed row, which keeps coefficient 1), so the whole composition
    collapses to a commutative weighted SUM — the parallel prefix is a
    closed form, no scan and no array at all. (For time-VARYING decay
    a_i the same telescope is exp of a cumulative-sum window in log
    space; streaming form = applyInPandasWithState carrying one (a,b)
    pair per key.)

    Physical plan: one sort-based window per user (row_number + count
    over the same partition spec — a single shuffle on user_id, O(1)
    state per row) feeding a plain partial-aggregated groupBy sum.
    collect_list never appears: per-user history can exceed executor
    memory at 100 TB in a24's form but streams through this one
    (asserted in tests/test_ewma_unbounded.py, which also checks the
    values equal a24's literal fold to <= 1e-6 — same math, different
    association). pow(0.75, k) is libm on both engines (<= 1-ulp apart),
    terms only shrink, and both sides round the sum to the 6 dp grid —
    same numeric contract as a29's exp decay."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id")).alias("n"),
    )
    term = F.when(
        F.col("rn") == 1, F.col("value") * F.pow(F.lit(0.75), F.col("n") - 1)
    ).otherwise(
        F.lit(0.25) * F.col("value") * F.pow(F.lit(0.75), F.col("n") - F.col("rn"))
    )
    return seq.groupBy("user_id").agg(
        F.max("n").cast("long").alias("n_events"),
        F.round(F.sum(term), 6).alias("ewma_value"),
    )


@register(
    "a24c_ewma_timeaware",
    oracle="""
WITH t AS (
  SELECT user_id, value, ts,
         max(ts) OVER (PARTITION BY user_id) AS tref
  FROM events WHERE value IS NOT NULL
)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value * pow(0.5, (epoch_us(tref) - epoch_us(ts)) / 86400000000.0))
             / sum(pow(0.5, (epoch_us(tref) - epoch_us(ts)) / 86400000000.0)),
             6) AS ewma_value
FROM t GROUP BY user_id
""",
)
def a24c_ewma_timeaware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-AWARE EWMA for irregular series (pandas ``ewm(halflife=
    <timedelta>, times=...)`` adjust=True semantics, halflife = 1 day):
    a24/a24b weight by OBSERVATION COUNT, which misweights bursty event
    streams; here each event's weight is 0.5^(age_days) against the
    user's LATEST event, ewma = sum(w*x)/sum(w). This is the varying-
    decay case of a24b's affine-composition telescope: with a_i =
    2^(-dt_i/h) the suffix product collapses to 2^(-(t_ref - t_i)/h) —
    again a closed-form per-row weight, so the whole thing is one
    commutative aggregation with NO ordering dependence at all (the
    adjust=True form is order-free by construction; a24b's count-based
    weights still needed a row_number).

    Physical plan: one shuffle on user_id for the max(ts) window, reused
    by the groupBy (same single-Exchange shape as a24b). The weight
    exponent is exact integer-µs arithmetic / a float constant on both
    engines (a29's contract), and the result DIVIDES two same-group sums
    so accumulation-order noise largely cancels before the 6 dp round
    (r8_market_share precedent)."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    tref = F.max("ts").over(Window.partitionBy("user_id"))
    age_days = (F.unix_micros(tref) - F.unix_micros(F.col("ts"))) / F.lit(86_400_000_000.0)
    w = F.pow(F.lit(0.5), age_days)
    return (
        ev.select("user_id", "value", w.alias("w"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("w") * F.col("value")) / F.sum("w"), 6).alias(
                "ewma_value"
            ),
        )
    )


@register(
    "j10_interval_overlap_join",
    oracle="""
WITH iv AS (
  SELECT user_id,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         epoch_us(min(ts)) AS s_us,
         epoch_us(max(ts)) + 1 AS e_us
  FROM events
  GROUP BY user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
), pairs AS (
  SELECT a.user_id AS user_a, b.user_id AS user_b, a.day,
         least(a.e_us, b.e_us) - greatest(a.s_us, b.s_us) AS overlap_us
  FROM iv a JOIN iv b
    ON a.user_id < b.user_id AND a.s_us < b.e_us AND b.s_us < a.e_us
)
SELECT user_a, user_b, day, CAST(overlap_us AS BIGINT) AS overlap_us
FROM (
  SELECT *, row_number() OVER (PARTITION BY day
                               ORDER BY overlap_us DESC, user_a, user_b) AS rn
  FROM pairs
) WHERE rn <= 10
""",
)
def j10_interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-OVERLAP join (two-sided; J2 is point-in-interval): the
    10 most co-active user pairs per day — users whose daily activity
    spans [first event, last event + 1µs) intersect, ranked by the
    exact integer-µs overlap. The engine runs
    ``operators.rangejoin.interval_overlap_join``: both interval sets
    explode into hour buckets and a pair is emitted ONLY in the bucket
    containing the later start (which overlap guarantees lies inside
    both intervals), so the equi-join is duplicate-free with no
    distinct() shuffle where the oracle's naive range self-join is
    O(|iv|²). All bounds, the duration, and the rank ties (user ids)
    are integers — no float boundary can disagree (the j7 band-edge
    lesson). The raw pair set is output-bound by nature (this synthetic
    corpus co-activates everyone daily: 168k pairs at sf0.01, ~16M at
    sf0.1), so the registered form ranks it to a bounded answer — the
    top-k window partitions by day (calendar-bounded), and at 100 TB
    the pre-prune is an overlap-duration threshold pushed into the
    join's residual filter. Dense corpora should bucket coarser
    (bucket ~ typical interval length, the J2 sizing rule); the raw
    join form stays available as the operator."""
    from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import (
        interval_overlap_join,
    )

    ev = load(spark, sf_dir, "events")
    iv = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.min("ts").alias("s"),
            F.timestamp_micros(F.unix_micros(F.max("ts")) + 1).alias("e"),
        )
    )
    joined = interval_overlap_join(iv, iv, "s", "e", bucket_seconds=3600)
    pairs = joined.filter(F.col("user_id") < F.col("r_user_id")).select(
        F.col("user_id").alias("user_a"),
        F.col("r_user_id").alias("user_b"),
        "day",
        (
            F.least(F.unix_micros("e"), F.unix_micros("r_e"))
            - F.greatest(F.unix_micros("s"), F.unix_micros("r_s"))
        ).cast("long").alias("overlap_us"),
    )
    # Exact top-k pre-prune (r10, guide §1.2 "don't compute what you
    # throw away"): overlap(a,b) <= min(len_a, len_b), and the global
    # top-10 of a day is bounded below by the 10th-best overlap of ANY
    # concrete pair subset. Pairing just the 11 longest intervals per
    # day (a <= 55-pair probe, driver-free, broadcast back) yields a
    # per-day threshold T_d; every pair with overlap_us < T_d provably
    # cannot rank — so the ~17M-row pair mass dies inside the join's
    # output stage instead of feeding the top-k sort (the measured 15 s
    # of j10 was the WindowGroupLimit's local sort of that mass; the
    # join itself is 4.8 s). Days with < 10 probe pairs keep everything
    # (T_d -> -inf), so the output is row-identical by construction.
    ln = (F.unix_micros("e") - F.unix_micros("s")).alias("_len")
    w_len = Window.partitionBy("day").orderBy(F.desc("_len"), "user_id")
    top_iv = (
        iv.select("user_id", "day", "s", "e", ln)
        .withColumn("_r", F.row_number().over(w_len))
        .filter(F.col("_r") <= 11)
    )
    ta = top_iv.select(
        F.col("day"), F.col("user_id").alias("_ua"),
        F.col("s").alias("_sa"), F.col("e").alias("_ea"),
    )
    tb = top_iv.select(
        F.col("day"), F.col("user_id").alias("_ub"),
        F.col("s").alias("_sb"), F.col("e").alias("_eb"),
    )
    probe_ov = (
        ta.join(tb, "day")
        .filter(
            (F.col("_ua") < F.col("_ub"))
            & (F.col("_sa") < F.col("_eb"))
            & (F.col("_sb") < F.col("_ea"))
        )
        .select(
            "day",
            (
                F.least(F.unix_micros("_ea"), F.unix_micros("_eb"))
                - F.greatest(F.unix_micros("_sa"), F.unix_micros("_sb"))
            ).cast("long").alias("_pov"),
        )
    )
    w_pr = Window.partitionBy("day").orderBy(F.desc("_pov"))
    thr = (
        probe_ov.withColumn("_pr", F.row_number().over(w_pr))
        .filter(F.col("_pr") == 10)
        .select("day", F.col("_pov").alias("_thr"))
    )
    pairs = (
        pairs.join(F.broadcast(thr), "day", "left")
        .filter(F.col("overlap_us") >= F.coalesce("_thr", F.lit(-(1 << 62))))
        .drop("_thr")
    )
    # r10 skew audit: this top-k window is NOT the day-partition skew it
    # reads as — Spark 4 plans a map-side WindowGroupLimit(Partial)
    # below the exchange, so each scan task locally sorts and keeps
    # <= 10 rows/day and only ~tasks x 10 x days rows ever shuffle.  A
    # salted two-level variant (rank within (day, salt-64) first) was
    # built and MEASURED SLOWER (19.6 s -> 26.8 s at sf0.1): it re-sorts
    # the full 17M-row pair mass a second time for zero shuffle savings.
    # The remaining cost is the local sort of the inherently quadratic
    # pair mass feeding the partial limit — the exact-output floor.
    w = Window.partitionBy("day").orderBy(
        F.desc("overlap_us"), "user_a", "user_b"
    )
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 10)
        .select("user_a", "user_b", "day", "overlap_us")
    )


@register(
    "w8_cumulative_distinct",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY ts, event_id) = 1
              THEN 1 ELSE 0 END AS first_seen
  FROM events
)
SELECT event_id, user_id, ts,
       CAST(sum(first_seen) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS distinct_types_so_far
FROM marked
""",
)
def w8_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count over a stream of events — "how many
    different event types has this user exhibited so far" at every
    event. COUNT(DISTINCT) OVER a running frame is unsupported in both
    engines (and inherently holds a set per row if done naively); the
    standard O(1)-state rewrite marks each (user, type)'s FIRST
    occurrence, then a plain running SUM of the marker. Both window
    passes partition by user_id alone — the first detects a type's
    first occurrence via lag() under an (event_type, ts, event_id)
    sort, so the SAME exchange serves both windows (one shuffle, two
    in-partition sorts; the row_number-per-(user, type) form the oracle
    uses would hash a different key and shuffle twice). Every value is
    an integer or a passthrough timestamp — no rounding contract."""
    ev = load(spark, sf_dir, "events")
    type_w = Window.partitionBy("user_id").orderBy("event_type", "ts", "event_id")
    run_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    first_seen = F.when(
        F.lag("event_type").over(type_w).isNull()
        | (F.lag("event_type").over(type_w) != F.col("event_type")),
        F.lit(1),
    ).otherwise(F.lit(0))
    return (
        ev.withColumn("first_seen", first_seen)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.sum("first_seen").over(run_w).cast("long").alias("distinct_types_so_far"),
        )
    )


@register(
    "w6_peak_concurrency",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), ids AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), sess AS (
  SELECT user_id, session_id, min(ts) AS s, max(ts) AS e
  FROM ids GROUP BY user_id, session_id
), bounds AS (
  SELECT s AS ts, 1 AS delta FROM sess
  UNION ALL
  SELECT e AS ts, -1 AS delta FROM sess
), sweep AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, delta,
         sum(delta) OVER (ORDER BY ts, delta DESC ROWS UNBOUNDED PRECEDING) AS conc
  FROM bounds
)
SELECT day, CAST(max(conc) AS BIGINT) AS peak_concurrency
FROM sweep GROUP BY day
""",
)
def w6_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sweep-line interval concurrency: peak number of simultaneously
    active user sessions per day. Sessions come from the same 30-min-gap
    sessionization as w2 (all users); each contributes a +1 boundary at
    its start and a -1 at its end (inclusive [s, e]: +1 sorts before -1
    at equal instants via delta DESC on both engines).

    The oracle sweeps with ONE global running sum — correct but a
    single-partition sort at scale. The Spark side is the two-level scan
    (the pk1/pk2 prefix-sum discipline): a running sum per DAY partition
    (parallel across days) plus a carry-in offset per day (cumulative
    sum of per-day boundary totals — a window over #days rows, bounded
    by the calendar, never by data volume). peak(day) =
    max(carry_in + within-day running sum); cross-midnight sessions are
    handled exactly because the carry-in is the concurrency at the
    day boundary. Tie groups make the per-day max well-defined: all +1s
    at an instant precede the -1s, so any permutation within the +1 run
    peaks at the run's end with the same value.
    """
    events = load(spark, sf_dir, "events")
    sess = (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.min("ts").alias("s"), F.max("ts").alias("e"))
    )
    # day stays a TIMESTAMP (midnight), the a19 cohort_day portability
    # convention: a DATE column round-trips as pandas Timestamp on the
    # oracle side but datetime.date on the Spark side and hash-mismatches.
    bounds = sess.select(F.col("s").alias("ts"), F.lit(1).alias("delta")).unionByName(
        sess.select(F.col("e").alias("ts"), F.lit(-1).alias("delta"))
    ).withColumn("day", F.date_trunc("day", F.col("ts")))
    w_day = (
        Window.partitionBy("day")
        .orderBy(F.col("ts"), F.col("delta").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = bounds.withColumn("run", F.sum("delta").over(w_day))
    day_totals = bounds.groupBy("day").agg(F.sum("delta").alias("day_total"))
    w_carry = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, -1)
    carry = day_totals.withColumn(
        "carry_in", F.coalesce(F.sum("day_total").over(w_carry), F.lit(0))
    ).select("day", "carry_in")
    return (
        within.join(F.broadcast(carry), "day")
        .groupBy("day")
        .agg(F.max(F.col("carry_in") + F.col("run")).alias("peak_concurrency"))
    )


@register(
    "j7_band_join",
    oracle="""
WITH p AS (
  SELECT event_id, user_id, value FROM events WHERE event_type = 'purchase'
), b AS (
  SELECT event_id, user_id, value FROM events WHERE event_type = 'error'
)
SELECT p.user_id, p.event_id, b.event_id AS b_event_id,
       round(p.value, 6) AS value, round(b.value, 6) AS b_value,
       round(abs(p.value - b.value), 6) AS value_diff
FROM p JOIN b ON p.user_id = b.user_id
WHERE abs(p.value - b.value) <= 0.5
""",
)
def j7_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric band join: purchase/error event pairs per user whose
    values agree within eps = 0.5 (sensor-agreement / reconciliation
    matching). The oracle states the plain range predicate — which Spark
    would plan as a BroadcastNestedLoopJoin; the engine instead runs the
    epsilon-bucketed equi-join (operators/rangejoin.py band_join): probe
    rows explode to 3 adjacent eps-width buckets, the join key is
    (user, bucket), and each qualifying pair meets exactly once. The
    residual predicate compares the RAW diff — one subtract+abs over
    identical doubles is IEEE-identical on both engines, and raw is what
    the 3-bucket coverage proof requires (see band_join)."""
    from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import band_join

    ev = load(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "value")
    b = ev.filter(F.col("event_type") == "error").select("event_id", "user_id", "value")
    out = band_join(p, b, on="user_id", value_col="value", eps=0.5)
    return out.select(
        "user_id",
        "event_id",
        "b_event_id",
        F.round("value", 6).alias("value"),
        F.round("b_value", 6).alias("b_value"),
        "value_diff",
    )


def _profile_oracle() -> str:
    blocks = []
    for col, kind in [
        ("event_id", "num"), ("user_id", "num"), ("value", "num"),
        ("ts", "ts"), ("event_type", "str"), ("props", "str"),
    ]:
        expr = f"epoch_us({col})" if kind == "ts" else col
        if kind == "str":
            mn, mx = "CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)"
            mns, mxs = f"min({col})", f"max({col})"
        else:
            mn, mx = f"round(CAST(min({expr}) AS DOUBLE), 6)", f"round(CAST(max({expr}) AS DOUBLE), 6)"
            mns, mxs = "CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)"
        blocks.append(f"""SELECT '{col}' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({col}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct,
       {mn} AS min_num, {mx} AS max_num, {mns} AS min_str, {mxs} AS max_str
FROM events""")
    return "\nUNION ALL\n".join(blocks)


@register("a26_column_profile", oracle=_profile_oracle())
def a26_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profile (the Deequ/soda data-quality shape): per
    column, row count, null count, EXACT distinct count, and typed
    min/max (numerics/timestamps in min_num/max_num, strings in
    min_str/max_str — never engine-specific float-to-string formatting).
    All metrics for all columns compute inside ONE aggregate: Spark plans
    a single scan with an Expand for the multi-distinct (one pass over
    the fact table, expansion factor = #profiled columns — the standard
    profiling trade; at 100 TB swap exact distincts for approx_count_
    distinct and the Expand disappears). The oracle is a per-column
    UNION ALL of the same metrics, which DuckDB computes in 6 scans —
    the single-scan vs multi-scan contrast IS the point of the plan."""
    ev = load(spark, sf_dir, "events")
    specs = [
        ("event_id", "num"), ("user_id", "num"), ("value", "num"),
        ("ts", "ts"), ("event_type", "str"), ("props", "str"),
    ]
    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    metrics = []
    for col, kind in specs:
        probe = F.unix_micros(F.col(col)) if kind == "ts" else F.col(col)
        is_str = kind == "str"
        metrics.append(
            F.struct(
                F.lit(col).alias("column_name"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(col).isNull(), 1).otherwise(0))
                .cast("long")
                .alias("n_null"),
                F.count_distinct(probe).alias("n_distinct"),
                (null_d if is_str else F.round(F.min(probe).cast("double"), 6)).alias("min_num"),
                (null_d if is_str else F.round(F.max(probe).cast("double"), 6)).alias("max_num"),
                (F.min(F.col(col)) if is_str else null_s).alias("min_str"),
                (F.max(F.col(col)) if is_str else null_s).alias("max_str"),
            )
        )
    return (
        ev.agg(F.array(*metrics).alias("_m"))
        .select(F.explode("_m").alias("m"))
        .select("m.*")
    )


@register(
    "a27_markov_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), t AS (
  SELECT prev_type, event_type, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type
)
SELECT prev_type, event_type, n,
       round(n / sum(n) OVER (PARTITION BY prev_type), 6) AS p
FROM t
""",
)
def a27_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: count (prev_type -> type) transitions in (ts, event_id)
    order, normalize per source state. One lag window per user partition
    + one grouped count + a 25-row normalization window — sequence
    mining whose heavy stage is the same shuffle a session build needs.
    n/sum(n) divides a count by a same-group count (exact integers), so
    the probability is engine-exact before its 6 dp round."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w)).filter(
        F.col("prev_type").isNotNull()
    )
    t = seq.groupBy("prev_type", "event_type").agg(F.count("*").alias("n"))
    wn = Window.partitionBy("prev_type")
    return t.select(
        "prev_type",
        "event_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wn), 6).alias("p"),
    )


@register(
    "a28_pair_lift",
    oracle="""
WITH marked AS (
  SELECT user_id, ts, event_type, event_id,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), ids AS (
  SELECT user_id, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
), items AS (
  SELECT DISTINCT user_id, session_id, event_type FROM ids
), ns AS (
  SELECT CAST(count(DISTINCT (user_id, session_id)) AS BIGINT) AS n_sessions FROM items
), singles AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM items GROUP BY event_type
), pairs AS (
  SELECT a.event_type AS item_a, b.event_type AS item_b, CAST(count(*) AS BIGINT) AS n_pair
  FROM items a JOIN items b
    ON a.user_id = b.user_id AND a.session_id = b.session_id
   AND a.event_type < b.event_type
  GROUP BY a.event_type, b.event_type
)
SELECT p.item_a, p.item_b, p.n_pair,
       round(p.n_pair / ns.n_sessions, 6) AS support,
       round((p.n_pair * ns.n_sessions * 1.0) / (sa.n * sb.n), 6) AS lift
FROM pairs p
CROSS JOIN ns
JOIN singles sa ON sa.event_type = p.item_a
JOIN singles sb ON sb.event_type = p.item_b
""",
)
def a28_pair_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association mining (the market-basket shape): within-session
    event-type pair co-occurrence with support and lift. Itemsets are a
    session's DISTINCT types, so the pair join explodes within (user,
    session) keys and is bounded by |type alphabet|^2 per session —
    never corpus^2; supports come from exact counts and lift divides
    identically-composed integer products on both engines before the
    6 dp round. Session identity reuses the same 30-min session_window
    as w2/w6 (gaps-and-islands in the oracle)."""
    ev = load(spark, sf_dir, "events")
    # session_window only merges inside an aggregation — aggregate the
    # session's distinct type set first, then explode it back to items.
    items = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.collect_set("event_type").alias("types"))
        .select(
            "user_id",
            F.col("w.start").alias("ws"),
            F.explode("types").alias("event_type"),
        )
    )
    ns = items.select("user_id", "ws").distinct().agg(F.count("*").alias("n_sessions"))
    singles = items.groupBy("event_type").agg(F.count("*").alias("n"))
    a, b = items.alias("a"), items.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.user_id") == F.col("b.user_id"))
            & (F.col("a.ws") == F.col("b.ws"))
            & (F.col("a.event_type") < F.col("b.event_type")),
        )
        .groupBy(
            F.col("a.event_type").alias("item_a"), F.col("b.event_type").alias("item_b")
        )
        .agg(F.count("*").alias("n_pair"))
    )
    sa = singles.select(F.col("event_type").alias("item_a"), F.col("n").alias("n_a"))
    sb = singles.select(F.col("event_type").alias("item_b"), F.col("n").alias("n_b"))
    return (
        pairs.crossJoin(F.broadcast(ns))
        .join(F.broadcast(sa), "item_a")
        .join(F.broadcast(sb), "item_b")
        .select(
            "item_a",
            "item_b",
            "n_pair",
            F.round(F.col("n_pair") / F.col("n_sessions"), 6).alias("support"),
            F.round(
                (F.col("n_pair") * F.col("n_sessions") * F.lit(1.0))
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "u9_grouping_sets",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(sum(o_totalprice), 2) AS revenue
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
""",
)
def u9_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form u2's ROLLUP and u5's
    CUBE are sugar for) with the grouping_id bitmask distinguishing
    which dimensions each output row aggregates over — one Expand +
    one aggregation, exactly ROLLUP/CUBE's plan but with a caller-chosen
    set list (here: by-status, by-priority, and the full cross)."""
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("u9_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
               count(*) AS n_orders,
               round(sum(o_totalprice), 2) AS revenue
        FROM u9_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
    """)


@register(
    "a29_time_decay_sum",
    oracle="""
WITH tref AS (SELECT max(ts) AS T FROM events)
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value * exp(-((epoch_us(tref.T) - epoch_us(ts))
                               / 86400000000.0))), 6) AS decayed_sum
FROM events CROSS JOIN tref
GROUP BY user_id
""",
)
def a29_time_decay_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-time exponentially-decayed activity score per user
    (tau = 1 day against the corpus's latest timestamp) — the
    order-INDEPENDENT complement of a24's fold EWMA: each event
    contributes value * exp(-age/tau), so the aggregation is a plain
    commutative sum (map-side partials, one shuffle) with no
    sequential recurrence at all; the streaming form just adds new
    terms and rescales on read. Both engines compose the exact same
    exp argument from integer microsecond arithmetic; 1-ulp libm
    differences accumulate ~1e-12, far under the 6 dp grid."""
    ev = load(spark, sf_dir, "events")
    tref = ev.agg(F.max("ts").alias("T"))
    age_days = (F.unix_micros(F.col("T")) - F.unix_micros(F.col("ts"))) / F.lit(
        86400000000.0
    )
    return (
        ev.crossJoin(F.broadcast(tref))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value") * F.exp(-age_days)), 6).alias("decayed_sum"),
        )
    )


@register(
    "u10_unpivot",
    oracle="""
WITH wide AS (
  SELECT l_returnflag,
         round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0 END), 2) AS qty_f,
         round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0 END), 2) AS qty_o
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, 'qty_f' AS metric, qty_f AS qty FROM wide
UNION ALL
SELECT l_returnflag, 'qty_o' AS metric, qty_o AS qty FROM wide
""",
)
def u10_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the inverse of u6's PIVOT — wide per-status
    quantity columns back to (group, metric, value) long rows via the
    native DataFrame ``unpivot`` API, which compiles to a single Expand
    node over the already-aggregated frame (rows x n_metrics, no shuffle
    beyond the grouped agg that built the wide frame; the oracle's UNION
    ALL re-scan is exactly what Expand avoids at scale)."""
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "F", F.col("l_quantity")).otherwise(0.0)), 2
        ).alias("qty_f"),
        F.round(
            F.sum(F.when(F.col("l_linestatus") == "O", F.col("l_quantity")).otherwise(0.0)), 2
        ).alias("qty_o"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty_f", "qty_o"],
        variableColumnName="metric",
        valueColumnName="qty",
    )


@register(
    "u11_full_outer_reconcile",
    oracle="""
WITH od AS (
  SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n_orders,
         round(CAST(sum(o_totalprice) AS DOUBLE), 2) AS order_revenue
  FROM orders GROUP BY 1
),
sd AS (
  SELECT CAST(date_trunc('day', l_shipdate) AS TIMESTAMP) AS day,
         CAST(count(*) AS BIGINT) AS n_ship_lines,
         round(CAST(sum(l_quantity) AS DOUBLE), 2) AS ship_qty
  FROM lineitem GROUP BY 1
)
SELECT COALESCE(od.day, sd.day) AS day,
       COALESCE(od.n_orders, 0) AS n_orders,
       COALESCE(od.order_revenue, 0.0) AS order_revenue,
       COALESCE(sd.n_ship_lines, 0) AS n_ship_lines,
       COALESCE(sd.ship_qty, 0.0) AS ship_qty,
       CASE WHEN od.day IS NULL THEN 'ship_only'
            WHEN sd.day IS NULL THEN 'order_only'
            ELSE 'both' END AS side
FROM od FULL OUTER JOIN sd ON od.day = sd.day
""",
)
def u11_full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER JOIN reconciliation — the one join type no other
    registered query exercises: daily order activity vs daily shipping
    activity, keyed on day, with unmatched days surviving from EITHER
    side (shipping lags orders by up to ~4 months, so the range edges
    produce genuine order_only / ship_only rows). Day keys stay
    midnight TIMESTAMPs (a19/w6 convention — DATE collect() would
    hash-mismatch the oracle). One shuffle per grouped side, then a
    sort-merge full-outer on the tiny per-day frames; at 100 TB both
    sides pre-aggregate to O(distinct days) rows before the join, so
    the outer join itself is never data-scale."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    od = orders.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day")
    ).agg(
        F.count("*").alias("n_orders"),
        F.round(F.sum("o_totalprice").cast("double"), 2).alias("order_revenue"),
    )
    sd = li.groupBy(F.date_trunc("day", "l_shipdate").alias("day")).agg(
        F.count("*").alias("n_ship_lines"),
        F.round(F.sum("l_quantity").cast("double"), 2).alias("ship_qty"),
    )
    o, s = od.alias("o"), sd.alias("s")
    return (
        o.join(s, F.col("o.day") == F.col("s.day"), "full_outer")
        .select(
            F.coalesce(F.col("o.day"), F.col("s.day")).alias("day"),
            F.coalesce(F.col("o.n_orders"), F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("o.order_revenue"), F.lit(0.0)).alias("order_revenue"),
            F.coalesce(F.col("s.n_ship_lines"), F.lit(0)).alias("n_ship_lines"),
            F.coalesce(F.col("s.ship_qty"), F.lit(0.0)).alias("ship_qty"),
            F.when(F.col("o.day").isNull(), "ship_only")
            .when(F.col("s.day").isNull(), "order_only")
            .otherwise("both")
            .alias("side"),
        )
    )


@register(
    "j8_asof_forward_join",
    oracle="""
WITH bdup AS (
  SELECT user_id, ts, value, event_id,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
), b AS (
  SELECT user_id, ts, value AS purchase_value, event_id AS purchase_event_id
  FROM bdup WHERE rn = 1
), p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'view'
)
SELECT p.event_id, p.user_id, p.ts, round(p.value, 6) AS view_value,
       b.purchase_event_id, round(b.purchase_value, 6) AS purchase_value
FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts <= b.ts
""",
)
def j8_asof_forward_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join — j6's mirror: each view picks up the user's
    NEXT purchase at-or-after it (conversion attribution; pandas
    merge_asof direction='forward'). The oracle is DuckDB's native ASOF
    LEFT JOIN with the inequality flipped (p.ts <= b.ts); the Spark side
    is the same union-marker scan run toward unboundedFollowing with
    first(ignorenulls) — still one shuffle on the key, no horizon, no
    interval explosion. Build rows dedupe to one per (user, ts) first
    (max event_id wins), j6's convention."""
    from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import asof_join

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    build = (
        ev.filter(F.col("event_type") == "purchase")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "user_id",
            "ts",
            F.col("value").alias("purchase_value"),
            F.col("event_id").alias("purchase_event_id"),
        )
    )
    probe = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts", F.round("value", 6).alias("view_value")
    )
    return asof_join(
        probe, build, on="user_id", ts_col="ts",
        build_cols=["purchase_event_id", "purchase_value"],
        direction="forward",
    ).select(
        "event_id", "user_id", "ts", "view_value",
        "purchase_event_id", F.round("purchase_value", 6).alias("purchase_value"),
    )


@register(
    "w7_rolling_median",
    oracle="""
SELECT event_id, user_id, ts,
       round(quantile_cont(value::DOUBLE, 0.5)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6) AS med5
FROM events
WHERE value IS NOT NULL
""",
)
def w7_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling MEDIAN over a row frame — the robust-smoothing window no
    rank/avg battery covers: per user, the exact interpolated median of
    the trailing 5 values in (ts, event_id) order. Spark's exact
    ``percentile(value, 0.5)`` aggregate runs over the window frame
    (DuckDB twin: quantile_cont — NOT ``median``, whose DECIMAL path is
    discrete); both engines interpolate identically and the 6-dp round
    absorbs nothing because the inputs are the same doubles. One
    sort-shuffle on user_id; frame state is 5 rows."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.expr(
            "round(percentile(value, 0.5) OVER (PARTITION BY user_id"
            " ORDER BY ts, event_id ROWS BETWEEN 4 PRECEDING AND CURRENT ROW), 6)"
        ).alias("med5"),
    )


@register(
    "j9_asof_nearest_join",
    oracle="""
WITH bdup AS (
  SELECT user_id, ts, value, event_id,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'view'
), b AS (
  SELECT user_id, ts, value AS view_value, event_id AS view_event_id
  FROM bdup WHERE rn = 1
), p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), back AS (
  SELECT p.event_id, b.ts AS bts, b.view_event_id AS bid, b.view_value AS bval
  FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts
), fwd AS (
  SELECT p.event_id, b.ts AS fts, b.view_event_id AS fid, b.view_value AS fval
  FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts <= b.ts
)
SELECT p.event_id, p.user_id, p.ts, round(p.value, 6) AS purchase_value,
       CASE WHEN back.bid IS NOT NULL AND (fwd.fid IS NULL
                 OR epoch_us(p.ts) - epoch_us(back.bts)
                    <= epoch_us(fwd.fts) - epoch_us(p.ts))
            THEN back.bid ELSE fwd.fid END AS view_event_id,
       round(CASE WHEN back.bid IS NOT NULL AND (fwd.fid IS NULL
                       OR epoch_us(p.ts) - epoch_us(back.bts)
                          <= epoch_us(fwd.fts) - epoch_us(p.ts))
                  THEN back.bval ELSE fwd.fval END, 6) AS view_value
FROM p
LEFT JOIN back ON p.event_id = back.event_id
LEFT JOIN fwd ON p.event_id = fwd.event_id
""",
)
def j9_asof_nearest_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join (kdb ``wj``/pandas direction='nearest' family):
    each purchase picks the user's temporally CLOSEST view, before or
    after, ties -> the earlier (backward) one. Composed from the two
    directional union-marker scans (j6 + j8's machinery) joined back on
    the probe's unique event_id with an integer-microsecond distance
    compare — no float time math, so the tie boundary cannot disagree
    (the j7 band-edge lesson). The oracle composes DuckDB's two native
    ASOF directions identically. Cost = two key-sorted scans + one id
    equi-join; still no horizon and no interval explosion."""
    from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import asof_join

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    build = (
        ev.filter(F.col("event_type") == "view")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", F.col("value").alias("vv"), F.col("event_id").alias("vid"))
    )
    probe = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 6).alias("purchase_value")
    )
    # each direction carries its matched build ts in the payload so the
    # nearest pick can compare distances
    b2 = build.select(
        "user_id", "ts",
        F.col("vid").alias("bid"), F.col("vv").alias("bval"), F.col("ts").alias("bts"),
    )
    f2 = build.select(
        "user_id", "ts",
        F.col("vid").alias("fid"), F.col("vv").alias("fval"), F.col("ts").alias("fts"),
    )
    back = asof_join(probe, b2, on="user_id", ts_col="ts",
                     build_cols=["bid", "bval", "bts"], direction="backward")
    fwd = asof_join(probe.select("event_id", "user_id", "ts"), f2,
                    on="user_id", ts_col="ts",
                    build_cols=["fid", "fval", "fts"], direction="forward")
    both = back.join(fwd.select("event_id", "fid", "fval", "fts"), "event_id", "left")
    take_back = F.col("bid").isNotNull() & (
        F.col("fid").isNull()
        | (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("bts"))
           <= F.unix_micros(F.col("fts")) - F.unix_micros(F.col("ts")))
    )
    return both.select(
        "event_id", "user_id", "ts", "purchase_value",
        F.when(take_back, F.col("bid")).otherwise(F.col("fid")).alias("view_event_id"),
        F.round(
            F.when(take_back, F.col("bval")).otherwise(F.col("fval")), 6
        ).alias("view_value"),
    )


@register(
    "a31_psi_drift",
    oracle="""
WITH rng AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
binned AS (
  SELECT CAST(least(floor((value - mn) * 10.0 / (mx - mn)), 9) AS INTEGER) AS bin,
         user_id % 2 AS slice
  FROM events, rng
),
a AS (SELECT bin, count(*) AS cnt FROM binned WHERE slice = 0 GROUP BY bin),
b AS (SELECT bin, count(*) AS cnt FROM binned WHERE slice = 1 GROUP BY bin),
tot AS (
  SELECT (SELECT CAST(sum(cnt) AS DOUBLE) FROM a) AS na,
         (SELECT CAST(sum(cnt) AS DOUBLE) FROM b) AS nb
)
SELECT
  COALESCE(a.bin, b.bin) AS bin,
  CAST(COALESCE(a.cnt, 0) AS BIGINT) AS cnt_a,
  CAST(COALESCE(b.cnt, 0) AS BIGINT) AS cnt_b,
  round((COALESCE(a.cnt, 0) / na + 1e-6) - (COALESCE(b.cnt, 0) / nb + 1e-6), 6)
    AS share_gap,
  round(((COALESCE(a.cnt, 0) / na + 1e-6) - (COALESCE(b.cnt, 0) / nb + 1e-6))
        * ln((COALESCE(a.cnt, 0) / na + 1e-6) / (COALESCE(b.cnt, 0) / nb + 1e-6)), 6)
    AS psi_term
FROM a FULL JOIN b ON a.bin = b.bin, tot
""",
)
def a31_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI drift gate: per-bin (p−q)·ln(p/q) between two slices.

    Population Stability Index — the standard production monitor for
    "has this feature's distribution moved between two populations"
    (credit-scoring lineage; smoothing ε=1e-6 on both shares). Here the
    two populations are deterministic user_id-parity slices of
    events.value; a real pipeline compares a reference window against
    the live batch — the plan is identical, only the slice predicate
    changes (e.g. ts windows). Per-bin rows so the consumer can
    localize the drift, not just threshold the sum.

    Float discipline (the j7 band-edge lesson): the 10-bin assignment
    is ONE shared expression shape — floor((value−mn)·10/(mx−mn))
    clamped to 9 — where mn/mx are each engine's exact min/max of the
    same stored doubles (every value is in [mn, mx] by construction,
    so only the top edge needs clamping); shares and psi terms are
    rounded to 6 dp on both sides. Scale: ONE map-side binning pass —
    both slices' counts come from a single groupBy(bin) with
    conditional sums (r07 ADVICE: the earlier per-slice filter branches
    each re-executed the events scan), so events is scanned once and
    the ≤10-row counts frame needs no join at all; slice totals come
    from unpartitioned window sums over that ≤10-row frame (bounded
    like a30's rank window), not from extra aggregations whose lineage
    would rescan events."""
    ev = load(spark, sf_dir, "events")
    rng = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = ev.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.floor((F.col("value") - F.col("mn")) * 10.0 / (F.col("mx") - F.col("mn"))),
            F.lit(9),
        ).cast("int").alias("bin"),
        (F.col("user_id") % 2).alias("slice"),
    )
    # one shuffle on bin; a bin with rows in only one slice gets 0 in the
    # other column — exactly the oracle's FULL JOIN + COALESCE semantics
    joined = binned.groupBy("bin").agg(
        F.count_if(F.col("slice") == 0).alias("raw_a"),
        F.count_if(F.col("slice") == 1).alias("raw_b"),
    )
    cnt_a = F.col("raw_a")
    cnt_b = F.col("raw_b")
    # totals via window sums over the <=10-bin counts frame: groupBy(bin)
    # preserves every bin's count exactly once, so these equal the
    # per-slice totals without re-deriving the scan lineage
    wtot = Window.partitionBy()
    na = F.sum(cnt_a).over(wtot).cast("double")
    nb = F.sum(cnt_b).over(wtot).cast("double")
    p = cnt_a / na + F.lit(1e-6)
    q = cnt_b / nb + F.lit(1e-6)
    return joined.select(
        "bin",
        cnt_a.cast("long").alias("cnt_a"),
        cnt_b.cast("long").alias("cnt_b"),
        F.round(p - q, 6).alias("share_gap"),
        F.round((p - q) * F.log(p / q), 6).alias("psi_term"),
    )


@register(
    "a32_ks_two_sample",
    oracle="""
WITH rng AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
binned AS (
  SELECT CAST(least(floor((value - mn) * 10.0 / (mx - mn)), 9) AS INTEGER) AS bin,
         user_id % 2 AS slice
  FROM events, rng
),
a AS (SELECT bin, count(*) AS cnt FROM binned WHERE slice = 0 GROUP BY bin),
b AS (SELECT bin, count(*) AS cnt FROM binned WHERE slice = 1 GROUP BY bin),
joined AS (
  SELECT COALESCE(a.bin, b.bin) AS bin,
         COALESCE(a.cnt, 0) AS cnt_a, COALESCE(b.cnt, 0) AS cnt_b
  FROM a FULL JOIN b ON a.bin = b.bin
),
cum AS (
  SELECT bin,
         SUM(cnt_a) OVER (ORDER BY bin) / (SELECT CAST(sum(cnt_a) AS DOUBLE) FROM joined) AS cdf_a,
         SUM(cnt_b) OVER (ORDER BY bin) / (SELECT CAST(sum(cnt_b) AS DOUBLE) FROM joined) AS cdf_b
  FROM joined
)
SELECT round(max(abs(cdf_a - cdf_b)), 6) AS ks_stat,
       CAST((SELECT sum(cnt_a) FROM joined) AS BIGINT) AS n_a,
       CAST((SELECT sum(cnt_b) FROM joined) AS BIGINT) AS n_b
FROM cum
""",
)
def a32_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned KS two-sample statistic: max |CDF_a − CDF_b|.

    Kolmogorov–Smirnov — PSI's (a31) companion drift gate over the
    SAME shared 10-bin discretization and user-parity slices, so one
    binning pass serves both monitors in a real deployment. This is
    the BINNED KS (the distributed-monitoring form); the exact order
    statistic needs a full sort and is what you reach for only on
    samples.

    The cumulative and total window sums run over at most 10 rows (one
    per bin) — unpartitioned by construction and provably bounded,
    like a30's ≤2k-row KMV rank window — so the ≤10-row counts frame
    is consumed in ONE pass (no totals aggregation whose lineage
    rescans events). Like a31, both slices count in a single
    groupBy(bin) with conditional sums (one events scan, no join —
    r07 ADVICE). Single-row output: (ks_stat, n_a, n_b)."""
    ev = load(spark, sf_dir, "events")
    rng = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = ev.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.floor((F.col("value") - F.col("mn")) * 10.0 / (F.col("mx") - F.col("mn"))),
            F.lit(9),
        ).cast("int").alias("bin"),
        (F.col("user_id") % 2).alias("slice"),
    )
    joined = binned.groupBy("bin").agg(
        F.count_if(F.col("slice") == 0).alias("cnt_a"),
        F.count_if(F.col("slice") == 1).alias("cnt_b"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wtot = Window.partitionBy()  # <=10 rows: bounded by the bin count
    ta = F.sum("cnt_a").over(wtot).cast("double")
    tb = F.sum("cnt_b").over(wtot).cast("double")
    cum = joined.select(
        (F.sum("cnt_a").over(w) / ta).alias("cdf_a"),
        (F.sum("cnt_b").over(w) / tb).alias("cdf_b"),
        ta.alias("ta"), tb.alias("tb"),
    )
    return cum.agg(
        F.round(F.max(F.abs(F.col("cdf_a") - F.col("cdf_b"))), 6).alias("ks_stat"),
        F.max("ta").cast("long").alias("n_a"),
        F.max("tb").cast("long").alias("n_b"),
    )


@register(
    "a33_wasserstein_drift",
    oracle="""
WITH rng AS (SELECT min(value) AS mn, max(value) AS mx FROM events),
binned AS (
  SELECT CAST(least(floor((value - mn) * 10.0 / (mx - mn)), 9) AS INTEGER) AS bin,
         user_id % 2 AS slice
  FROM events, rng
),
joined AS (
  SELECT bin,
         count(*) FILTER (WHERE slice = 0) AS cnt_a,
         count(*) FILTER (WHERE slice = 1) AS cnt_b
  FROM binned GROUP BY bin
),
spine AS (SELECT CAST(unnest(range(0, 10)) AS INTEGER) AS bin),
full_bins AS (
  SELECT s.bin, COALESCE(j.cnt_a, 0) AS cnt_a, COALESCE(j.cnt_b, 0) AS cnt_b
  FROM spine s LEFT JOIN joined j USING (bin)
),
cum AS (
  SELECT bin,
         SUM(cnt_a) OVER (ORDER BY bin)
           / (SELECT CAST(sum(cnt_a) AS DOUBLE) FROM full_bins) AS cdf_a,
         SUM(cnt_b) OVER (ORDER BY bin)
           / (SELECT CAST(sum(cnt_b) AS DOUBLE) FROM full_bins) AS cdf_b
  FROM full_bins
)
SELECT round(sum(abs(cdf_a - cdf_b)) * (SELECT (mx - mn) / 10.0 FROM rng), 6)
         AS w1_distance,
       CAST((SELECT sum(cnt_a) FROM full_bins) AS BIGINT) AS n_a,
       CAST((SELECT sum(cnt_b) FROM full_bins) AS BIGINT) AS n_b
FROM cum
""",
)
def a33_wasserstein_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binned 1-Wasserstein (earth mover's) distance — the third drift
    gate over the SAME 10-bin discretization and user-parity slices as
    a31 (PSI) and a32 (KS): W1 = Σ_bins |CDF_a − CDF_b| · Δ with
    Δ = (mx − mn)/10, i.e. the area between the two binned CDFs. The
    triple covers the standard monitoring trade-offs: PSI is
    mass-sensitive but support-blind, KS sees the single worst CDF gap,
    W1 weighs HOW FAR mass moved — a small shift of all mass and a far
    shift of little mass read identically in KS but not in W1.

    One delta vs a32's plan: the cumulative window runs over a
    LITERAL 10-row bin spine (left join + COALESCE 0), not just the
    occupied bins — a bin empty in BOTH slices carries the previous
    cumulative gap forward, and the SUM (unlike a32's MAX, which the
    flat-CDF stretch can never raise) must count that persisted area.
    The spine join is a broadcast of a 10-row range; every window runs
    over exactly 10 rows (same bounded-window class as a30/a31/a32,
    plan-guard allowlisted with rationale); slices count in the single
    conditional-sum binning pass (one events scan). Float discipline:
    bin edges are the same raw min/max expression both engines, the
    only rounding is the final 6-dp output."""
    ev = load(spark, sf_dir, "events")
    rng = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    binned = ev.crossJoin(F.broadcast(rng)).select(
        F.least(
            F.floor((F.col("value") - F.col("mn")) * 10.0 / (F.col("mx") - F.col("mn"))),
            F.lit(9),
        ).cast("int").alias("bin"),
        (F.col("user_id") % 2).alias("slice"),
    )
    counts = binned.groupBy("bin").agg(
        F.count_if(F.col("slice") == 0).alias("cnt_a"),
        F.count_if(F.col("slice") == 1).alias("cnt_b"),
    )
    spine = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    full_bins = spine.join(counts, "bin", "left").select(
        "bin",
        F.coalesce("cnt_a", F.lit(0)).alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).alias("cnt_b"),
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    wtot = Window.partitionBy()  # exactly 10 rows: the literal spine
    ta = F.sum("cnt_a").over(wtot).cast("double")
    tb = F.sum("cnt_b").over(wtot).cast("double")
    cum = full_bins.select(
        (F.sum("cnt_a").over(w) / ta).alias("cdf_a"),
        (F.sum("cnt_b").over(w) / tb).alias("cdf_b"),
        ta.alias("ta"), tb.alias("tb"),
    )
    width = rng.select(((F.col("mx") - F.col("mn")) / 10.0).alias("bw"))
    return (
        cum.agg(
            F.sum(F.abs(F.col("cdf_a") - F.col("cdf_b"))).alias("_s"),
            F.max("ta").cast("long").alias("n_a"),
            F.max("tb").cast("long").alias("n_b"),
        )
        .crossJoin(F.broadcast(width))
        .select(
            F.round(F.col("_s") * F.col("bw"), 6).alias("w1_distance"),
            "n_a",
            "n_b",
        )
    )


@register(
    "j11_asof_interpolate",
    oracle="""
WITH bdup AS (
  SELECT user_id, ts, value, event_id,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'view'
), b AS (
  SELECT user_id, ts, value FROM bdup WHERE rn = 1
), p AS (
  SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
), pb AS (
  SELECT p.event_id, p.user_id, p.ts, p.value,
         b.ts AS t0, b.value AS v0
  FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts >= b.ts
), pf AS (
  SELECT p.event_id, b.ts AS t1, b.value AS v1
  FROM p ASOF LEFT JOIN b ON p.user_id = b.user_id AND p.ts < b.ts
)
SELECT pb.event_id, pb.user_id, pb.ts,
       round(pb.value, 6) AS purchase_value,
       round(CASE WHEN t0 IS NULL AND t1 IS NULL THEN NULL
                  WHEN t0 IS NULL THEN v1
                  WHEN t1 IS NULL THEN v0
                  ELSE v0 + (v1 - v0)
                       * (CAST(epoch_us(pb.ts) - epoch_us(t0) AS DOUBLE)
                          / CAST(epoch_us(t1) - epoch_us(t0) AS DOUBLE))
             END, 6) AS interp_view_value
FROM pb JOIN pf USING (event_id)
""",
)
def j11_asof_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolating as-of join — the as-of family's completion (j6
    backward / j8 forward / j9 nearest pick a side; j11 reconstructs
    the value BETWEEN sides): each purchase gets the user's view-value
    series linearly interpolated at the purchase timestamp, pandas
    ``interpolate(method='time')`` as a join. One union-marker shuffle
    computes BOTH bracketing rows (backward-inclusive + forward-strict
    windows over the same sort — see operators/rangejoin.py
    asof_interpolate); the oracle runs DuckDB's native ASOF twice
    (>= and <) and applies the identically-parenthesized formula.
    Exact-ts matches take fraction 0 (exactly v0, no float edge); edge
    probes extrapolate flat; the divisor t1 - t0 is structurally
    positive. Build rows dedupe to one per (user, ts), j6's
    convention."""
    from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import (
        asof_interpolate,
    )

    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    build = (
        ev.filter(F.col("event_type") == "view")
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", "value")
    )
    probe = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.col("value").alias("purchase_value")
    )
    out = asof_interpolate(
        probe,
        build,
        on="user_id",
        ts_col="ts",
        value_col="value",
        out_col="interp_view_value",
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.round("purchase_value", 6).alias("purchase_value"),
        "interp_view_value",
    )


@register(
    "w9_resample_interpolate",
    oracle="""
WITH bdup AS (
  SELECT user_id, ts, value,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE user_id < 10
), b AS (
  SELECT user_id, ts, value FROM bdup WHERE rn = 1
), grid AS (
  SELECT u.user_id, g.g AS grid_ts
  FROM (SELECT DISTINCT user_id FROM events WHERE user_id < 10) u,
       generate_series(TIMESTAMP '2024-01-01 00:00:00',
                       TIMESTAMP '2024-01-30 23:00:00',
                       INTERVAL 1 HOUR) AS g(g)
), pb AS (
  SELECT grid.user_id, grid.grid_ts, b.ts AS t0, b.value AS v0
  FROM grid ASOF LEFT JOIN b
    ON grid.user_id = b.user_id AND grid.grid_ts >= b.ts
), pf AS (
  SELECT grid.user_id, grid.grid_ts, b.ts AS t1, b.value AS v1
  FROM grid ASOF LEFT JOIN b
    ON grid.user_id = b.user_id AND grid.grid_ts < b.ts
)
SELECT pb.user_id, pb.grid_ts,
       round(CASE WHEN t0 IS NULL AND t1 IS NULL THEN NULL
                  WHEN t0 IS NULL THEN v1
                  WHEN t1 IS NULL THEN v0
                  ELSE v0 + (v1 - v0)
                       * (CAST(epoch_us(pb.grid_ts) - epoch_us(t0) AS DOUBLE)
                          / CAST(epoch_us(t1) - epoch_us(t0) AS DOUBLE))
             END, 6) AS interp_value
FROM pb JOIN pf ON pb.user_id = pf.user_id AND pb.grid_ts = pf.grid_ts
""",
)
def w9_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-grid resampling with LINEAR interpolation — a20's ffill
    sibling (pandas ``resample().interpolate('time')``): every user's
    irregular event-value series is evaluated at each hourly grid point
    by j11's interpolating as-of scan, probe = the calendar grid, build
    = the (user, ts)-deduped raw series. Pure composition: the grid
    explode is per-key calendar-bounded (720 rows/key/month regardless
    of corpus size) and asof_interpolate's single union-marker shuffle
    computes both bracketing directions at once — cheaper than a20's
    join+ffill when the consumer needs values BETWEEN observations
    rather than stale carries. Same fixed grid, same user_id < 10 cut,
    flat extrapolation at the edges."""
    from kafka_streaming_polymarket_pipeline_spark.operators.rangejoin import (
        asof_interpolate,
    )

    ev = load(spark, sf_dir, "events").filter(F.col("user_id") < 10)
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    build = (
        ev.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "ts", "value")
    )
    grid = (
        ev.select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit("2024-01-01 00:00:00").cast("timestamp"),
                    F.lit("2024-01-30 23:00:00").cast("timestamp"),
                    F.expr("INTERVAL 1 HOUR"),
                )
            ).alias("grid_ts"),
        )
    )
    return asof_interpolate(
        grid,
        build,
        on="user_id",
        ts_col="grid_ts",
        value_col="value",
        build_ts_col="ts",
    ).select("user_id", "grid_ts", "interp_value")
