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

# The driver's correctness gate checks the first 50 registry entries per
# round (CORRECTNESS_r01/r02 are each exactly the registry's 50-entry
# prefix). With >50 registered queries, iteration order decides which get
# an official audited row, so the order rotates per round: queries with no
# green row in any prior CORRECTNESS_r*.json come first, then this round's
# new/changed queries, then re-checks of the highest-scrutiny entries.
# Union coverage across rounds is tracked in COVERAGE.md. Names absent
# from this list keep registration order after the prioritized prefix.
_DRIVER_PRIORITY: list[str] = [
    # never driver-checked (no row in r01 or r02)
    "a13_approx_count_distinct",
    "a13b_approx_distinct_gate",
    "t8_decontamination",
    "t9_pii_redaction",
    "t10_repetition_stats",
    "m2_image_decode_features",
    # errored in r02 (canonicalizer could not hash list cells; fixed since)
    "q1_embedding_quantize",
    # no row in r02 (checked in r01 only)
    "a4_ratio_guarded",
    "a5_topk_per_group",
    "a6_count_empty_marker",
    "a7_downsample_last",
    "a8_incremental_watermark_max",
    "a9_change_detect_dedup",
    "a10_consecutive_runs",
    "u1_union_by_name",
    "u2_rollup_revenue",
    "f_scalar_battery",
    "f7_iso8601_parse",
    "f4_json_serialize_roundtrip",
    "u3_distinct_agg",
    "u4_anti_join",
    "u5_cube_revenue",
    "w1_running_sum",
    "j2b_bucketed_interval_join",
    "w2_session_windows",
    "a12_percentiles",
    "t1_token_stats",
    "t2_lang_id",
    "t3_quality_score",
    "t4_fingerprint",
    "t5_top_tokens",
    "t6_bpe_token_count",
    "t7_winnow_fingerprints",
    "m1_binary_metadata",
    "m3_frame_sample",
    # new this round
    "t11_tfidf_top_terms",
    "t12_bigram_lm_score",
    "t13_boilerplate_coverage",
    "q2_pq_adc_topk",
    "q2_recall",
    "q3_ivf_pq_topk",
    "q3_recall",
    "x4_temperature_weights",
    "k1_salted_agg",
    "x5_temperature_repeats",
    "a14_approx_percentile_gate",
    "r2_min_cost_supplier",
    "r13_cust_order_counts",
    "e2e_corpus_build_t",
    # re-checks: highest-scrutiny previously-green entries
    "e2e_corpus_build",
]


def _ordered() -> list[Query]:
    rank = {n: i for i, n in enumerate(_DRIVER_PRIORITY)}
    names = list(_REGISTRY)
    return [
        _REGISTRY[n]
        for n in sorted(names, key=lambda n: (rank.get(n, len(rank) + names.index(n)),))
    ]


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
    return {q.name: q.builder for q in _ordered()}


def all_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in _ordered() if q.oracle is not None}
