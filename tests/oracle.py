"""Local proxy for the driver's correctness gate.

Runs a registered query's Spark builder and its DuckDB oracle SQL on the
same parquet tables and compares row count, column names/order-insensitive
values. Floats compare with a tiny tolerance; everything else exactly —
queries are expected to round on both sides so even exact hashing matches.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from kafka_streaming_polymarket_pipeline_spark.tables import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_bool_dtype(s):
            df[c] = s.astype(bool)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.apply(lambda v: tuple(v) if isinstance(v, (list, tuple)) else v)
    sort_cols = list(df.columns)
    return df.sort_values(by=sort_cols, kind="mergesort").reset_index(drop=True)


def _values_close(a, b) -> bool:
    if isinstance(a, float) or isinstance(b, float):
        if pd.isna(a) and pd.isna(b):
            return True
        try:
            return math.isclose(float(a), float(b), rel_tol=1e-9, abs_tol=1e-9)
        except (TypeError, ValueError):
            return False
    if pd.isna(a) and pd.isna(b):
        return True
    return a == b


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, name: str) -> None:
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns), (
        f"{name}: column mismatch {sorted(spark_pdf.columns)} vs {sorted(oracle_pdf.columns)}"
    )
    assert len(spark_pdf) == len(oracle_pdf), (
        f"{name}: row count {len(spark_pdf)} vs {len(oracle_pdf)}"
    )
    s, d = _canon(spark_pdf), _canon(oracle_pdf)
    for col in s.columns:
        sv, dv = s[col].tolist(), d[col].tolist()
        for i, (a, b) in enumerate(zip(sv, dv)):
            assert _values_close(a, b), (
                f"{name}: value mismatch col={col} row={i}: spark={a!r} oracle={b!r}"
            )


def check_query(spark, name: str, sf_dir: str) -> int:
    """Run query `name` both ways at sf_dir; raise on mismatch; return rowcount."""
    from kafka_streaming_polymarket_pipeline_spark.plans import get

    q = get(name)
    spark_pdf = q.builder(spark, sf_dir).toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0
        return len(spark_pdf)
    con = duckdb_con(sf_dir)
    try:
        oracle_pdf = con.execute(q.oracle).df()
    finally:
        con.close()
    compare_frames(spark_pdf, oracle_pdf, name)
    return len(spark_pdf)
