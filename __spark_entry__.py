"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()``/``oracle_sql()`` expose the full registry from
``kafka_streaming_polymarket_pipeline_spark.plans`` — one entry per implemented operator
(SURVEY.md §2 inventory + training-data extensions), each with its
DuckDB oracle SQL where SQL-expressible.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streaming_polymarket_pipeline_spark import plans  # noqa: E402
from kafka_streaming_polymarket_pipeline_spark.session import tune_session  # noqa: E402

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    tune_session(spark)
    return plans.get("market_candles_15m").builder(spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(builder):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_session(spark)
            return builder(spark, sf_dir)

        return run

    return {name: _wrap(b) for name, b in plans.all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for each SQL-expressible query."""
    return plans.all_oracles()
