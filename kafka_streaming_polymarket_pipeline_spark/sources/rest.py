"""Micro-batch REST/GraphQL ingest (S3/S4 in SURVEY §2.1).

The reference polls the Gamma REST API every 15 minutes
(producers/market_discovery.py:14-33) and a GraphQL endpoint every 10 s
with `first:1000 orderBy:balance desc` (producers/user_positions_tracker.py:
27-60) — source-side filter/sort/limit pushdown that Catalyst cannot do
for an HTTP API, so the engine keeps it in the ingest parameters, exactly
like the reference (SURVEY §4).

Implemented as driver-side fetch -> ``spark.createDataFrame`` appended to
a bronze path per trigger. The fetcher is injectable (no network in this
environment; tests inject fixtures). At scale this stays a tiny driver
job whose *output* is the distributed table — the API rate limit, not
Spark, is the bottleneck (50 req/10 s, README.md:330).
"""

from __future__ import annotations

import json
from collections.abc import Callable, Iterable
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession

from kafka_streaming_polymarket_pipeline_spark import schemas

Fetcher = Callable[[], Iterable[dict]]

# Source-pushdown parameters, kept verbatim from the reference.
GAMMA_MARKETS_PARAMS = {"tag_id": 102467, "closed": "false"}  # market_discovery.py:18-21
GOLDSKY_TOP_K = 1000  # user_positions_tracker.py:33-36
GOLDSKY_ORDER = ("balance", "desc")


def fetch_to_bronze(
    spark: SparkSession,
    fetcher: Fetcher,
    topic: str,
    bronze_path: str | None = None,
) -> DataFrame:
    """One micro-batch: call the fetcher, wrap rows in the bronze envelope,
    optionally append to the bronze parquet path. Returns the batch DF."""
    now = datetime.now(timezone.utc)
    rows = [(topic, None, None, now, now, json.dumps(m)) for m in fetcher()]
    df = spark.createDataFrame(rows, schemas.BRONZE)
    if bronze_path:
        df.write.mode("append").parquet(bronze_path)
    return df
