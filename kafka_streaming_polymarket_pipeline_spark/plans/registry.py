"""Registry mapping query name -> (Spark builder, DuckDB oracle SQL).

Every operator the engine claims (SURVEY.md §2 inventory + the
training-data extensions) registers here. The driver's correctness gate
runs the Spark builder and the oracle SQL side-by-side at sf=0.01 and
compares row count, schema, and an order-insensitive value hash — so:

- builders take ``(spark, sf_dir)`` and return a DataFrame;
- every computed column is aliased IDENTICALLY in builder and oracle;
- floating-point aggregates are explicitly ``round()``-ed on BOTH sides
  so accumulation-order differences between engines can't flip the hash;
- oracles are ANSI SQL runnable by DuckDB against the same parquet
  (views: region nation customer supplier part orders lineitem events
  documents embeddings);
- a ``None`` oracle marks a genuinely non-SQL-expressible op (driver
  then records a weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    builder: Builder
    oracle: str | None
    doc: str = ""


_REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "") -> Callable[[Builder], Builder]:
    """Decorator: register a query builder under ``name`` with its oracle SQL."""

    def deco(fn: Builder) -> Builder:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = Query(name=name, builder=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def get(name: str) -> Query:
    return _REGISTRY[name]


def all_queries() -> dict[str, Builder]:
    return {q.name: q.builder for q in _REGISTRY.values()}


def all_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _REGISTRY.values() if q.oracle is not None}
