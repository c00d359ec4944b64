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
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so queries are reachable via spark.sql."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
