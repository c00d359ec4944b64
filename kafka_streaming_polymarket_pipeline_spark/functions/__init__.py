"""Scalar-function surface: the F1-F15 inventory (SURVEY §2.7) as reusable
column builders.

The reference scatters these across its producers as inline Python; here
each is a named Column function (all built-in Spark expressions — JVM-side,
codegen, no UDFs). Heavier operator families live in operators/ and are
re-exported for a single import surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# F10-F12, P9 decodes (operators/markets.py)
from kafka_streaming_polymarket_pipeline_spark.operators.markets import (  # noqa: F401
    align_15m,
    decode_winner,
    is_resolved,
)

# text/fingerprint functions (operators/text.py)
from kafka_streaming_polymarket_pipeline_spark.operators.text import (  # noqa: F401
    char_shingles,
    content_fingerprint,
    lang_id,
    quality_score,
    rolling_hash,
    token_count,
    tokens,
)


def contains_any(text: Column, *needles: str) -> Column:
    """F1/F2: lowercased substring containment against any needle
    (market_discovery.py:41-44)."""
    t = F.lower(text)
    cond = F.lit(False)
    for n in needles:
        cond = cond | t.contains(n.lower())
    return cond


def parse_json(col: Column, schema) -> Column:
    """F3: JSON parse, incl. the double-encoded array dance
    (market_discovery.py:85-95) — apply twice for stringified arrays."""
    return F.from_json(col, schema)


def serialize_json(*cols: Column) -> Column:
    """F4: JSON-serialize columns into one string (producer value_serializer,
    market_discovery.py:11)."""
    return F.to_json(F.struct(*cols))


def to_double(col: Column) -> Column:
    """F5 (coinbase_producer.py:38-40 et al.)."""
    return col.cast("double")


def to_long(col: Column) -> Column:
    """F6 (user_positions_tracker.py:81,87)."""
    return col.cast("long")


def parse_iso_ts(col: Column) -> Column:
    """F7: ISO-8601 parse; Spark handles the Z suffix the reference fixes up
    by hand (market_discovery.py:62)."""
    return F.to_timestamp(col)


def utc_now() -> Column:
    """F8: current timestamp — always UTC session time (the engine fixes the
    reference's naive-local stamps, SURVEY §1.2)."""
    return F.current_timestamp()


def plus_minutes(ts: Column, minutes: int) -> Column:
    """F9: timestamp + interval (end = start + 15 min,
    market_discovery.py:66)."""
    return ts + F.expr(f"INTERVAL {int(minutes)} MINUTES")


def decode_outcome(outcome_index: Column) -> Column:
    """F12: positional outcome decode (user_positions_tracker.py:87-88)."""
    return F.when(outcome_index == 0, "YES").otherwise("NO")


def elapsed_seconds(later: Column, earlier: Column) -> Column:
    """F13: duration math (downtime / missed-snapshot estimates,
    user_positions_tracker.py:196-199)."""
    return later.cast("long") - earlier.cast("long")


def missed_snapshots(later: Column, earlier: Column, interval_s: int = 10) -> Column:
    """F13: elapsed/interval floor (user_positions_tracker.py:199)."""
    return F.floor(elapsed_seconds(later, earlier) / interval_s)


def json_field(payload: Column, key: str) -> Column:
    """F14: JSONB-style field extraction (payload->>'k', init.sql indexes,
    silver dbt casts)."""
    return F.get_json_object(payload, f"$.{key}")


def truncate(col: Column, n: int = 200) -> Column:
    """F15: log-truncation (db_writer.py:69) — and the fix for its bug
    (slicing a dict): truncation belongs on the serialized string."""
    return F.substring(col, 1, n)
