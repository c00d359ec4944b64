"""Loaders for the driver's synthetic tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a scale-factor dir.
Reads go through ``spark.read.parquet`` so Catalyst gets predicate
pushdown + column pruning on every query in the registry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Timestamp columns whose physical parquet type varies by testdata
# generation: TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
# read as raw nanos via the legacy conf and truncate to microseconds,
# exactly what DuckDB/pandas do with the same file) or timestamp[us]
# (arrives as TIMESTAMP_NTZ — reinterpret as session-local TIMESTAMP;
# sessions are UTC-pinned, so the value is unchanged and matches DuckDB).
# Either way downstream code sees a plain TIMESTAMP column.
_NANO_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

# Tables whose consumers do heavy PER-ROW map work before their first
# shuffle (shingle/token explodes, per-char entropy folds, per-vector
# distance scans). A small table lands as ONE parquet file = one 128 MB
# input split = ONE task for that entire map stage regardless of core
# count — guide §2.5's "input skew" in its degenerate form (measured
# r11: the d3 payload aggregation ran 4.8 s on one core vs 0.84 s
# repartitioned, with 31 cores idle). These scans are widened to the
# machine's parallelism when they arrive narrower; a real 100 TB scan
# arrives with thousands of splits and the guard is a NO-OP (no
# exchange added — this is scale-adaptive, not a local-mode constant).
# Relational tables stay as-is: their per-row work is cheap codegen
# scans whose first shuffle arrives immediately.
_FAN_OUT_TABLES = frozenset({"documents", "embeddings"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    nano_cols = _NANO_TS_COLS.get(name, ())
    if nano_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in nano_cols:
        if isinstance(df.schema[c].dataType, LongType):
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
        elif isinstance(df.schema[c].dataType, TimestampNTZType):
            df = df.withColumn(c, F.to_timestamp(c))
    if name in _FAN_OUT_TABLES:
        # Filters/column pruning push through Repartition, so scan
        # pruning is unaffected; no query depends on row placement.
        from kafka_streaming_polymarket_pipeline_spark.operators.scale import fan_out_narrow

        df = fan_out_narrow(df)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries are reachable via spark.sql."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
