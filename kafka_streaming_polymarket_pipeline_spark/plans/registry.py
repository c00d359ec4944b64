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

Exactly TWO queries are rows-only BY DESIGN, each paired with an
adjacent fully-hash-gated twin: ``a13_approx_count_distinct`` (HLL
estimates are engine-specific; its error bound is hash-gated by
``a13b_hll_error_bound``) and ``m4_video_decode`` (JPEG pixel math is
not SQL-expressible; its decoded output is hash-gated by
``m4b_video_decode_gate`` and pixel exactness is asserted in
tests/test_multimodal.py).  A permanent ``no_oracle`` row for either is
expected, not a defect; keep each twin adjacent in every rotation.
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
# round (CORRECTNESS_r01..r03 are each exactly the registry's 50-entry
# prefix). With >50 registered queries, iteration order decides which get
# an official audited row, so the order rotates per round so that every
# query's newest green row stays <=2 rounds old. Round-4 prefix policy:
# every query that has NEVER held an official row leads (the round-4
# additions, newest first), then queries whose code changed this round,
# then everything whose newest green row is r02.
# a13_approx_count_distinct stays OUT of the prefix: its row is
# permanently rows-only (HLL estimates are engine-specific) and its
# error bound is hash-gated by a13b, which holds a green r03 row.
# Union coverage across rounds is tracked in COVERAGE.md. Names absent
# from this list keep registration order after the prioritized prefix.
_DRIVER_PRIORITY: list[str] = [
    # ---- r05 gate prefix (exactly 50 entries) ----
    # Block 1 (16): every query that has NEVER held an official driver
    # row.  d12 first (added in the r04 end-of-round snapshot), then the
    # rest of the never-audited set named by the r04 verdict.  All 16
    # pass the local 3-SF DuckDB battery; this block gives each its
    # first official CORRECTNESS row.
    "d12_prefix_jaccard_join",
    "d11_editdist_pairs",
    "a27_markov_transitions",
    "a28_pair_lift",
    "u9_grouping_sets",
    "a29_time_decay_sum",
    "r21_waiting_suppliers",
    "r11_important_parts",
    "r20_excess_supply",
    "u10_unpivot",
    "w3_rank_battery",
    "z1_zorder_layout",
    "k2_salted_join",
    "r12_priority_lines",
    "r14_promo_share",
    "r18_large_orders",
    # Block 2 (17): the r02-stale core families the r04 verdict named
    # explicitly (newest green row r02; battery-checked per commit).
    "a1_array_sum",
    "a2_argmax_per_group",
    "a3_positional_first",
    "p1_substring_filter",
    "p2_window_containment",
    "p3_projection_parse",
    "p4_type_filter",
    "p5_event_dispatch",
    "p6_explode_filter",
    "p7_positive_filter",
    "p8_null_empty_guards",
    "p9_resolution_predicate",
    "j1_dim_broadcast_join",
    "j2_interval_join",
    "j3_left_label_join",
    "j4_lag_deltas",
    "j5_latest_scalar",
    # Block 3 (17): the remaining r02-stale rows that fit the 50-row
    # window — ANN family + recall gates, graph features, sampling,
    # and the five relational heads.
    "s1_ann_bruteforce_topk",
    "s2_ann_ivf_topk",
    "s3_ann_lsh_topk",
    "s2_recall",
    "s3_recall",
    "g1_momentum_volatility",
    "g2_whale_deltas",
    "g3_concentration",
    "g4_winner_label",
    "x1_hash_split",
    "x2_stratified_sample",
    "x3_mixture_sample",
    "market_candles_15m",
    "pricing_summary",
    "shipping_priority_top10",
    "regional_revenue",
    "order_priority_check",
    # ---- end of the 50-row r05 window ----
    # Round-5 additions, registered PAST the window (displacing audited
    # rows would break the rotation policy) and locally hash-verified at
    # sf0.001/0.01/0.1: d8b_semantic_dedup_kscaled (the k-prop-to-n
    # SemDeDup knob), d8c_semantic_dedup_signcells (the linear
    # sign-bit-cell production path; probe 1.5/2.4/4.6 s at 2k/6k/20k),
    # u11_full_outer_reconcile (the one join type no other query
    # exercises), j8_asof_forward_join (j6's forward mirror, gated
    # against DuckDB's native forward ASOF), and w7_rolling_median
    # (exact interpolated median over a row frame), and
    # j9_asof_nearest_join (kdb-style nearest as-of composed from the
    # two directional scans, integer-microsecond tie contract).  They
    # MUST join the r06 prefix.
    # Still r02-stale after this rotation (48 stale + 16 never-audited
    # > 50 slots; these 14 MUST lead the r06 prefix together with any
    # query added during round 5): pk1_pack_assignments,
    # pk2_sequence_fill, sh1_shard_assignment, v1_bpe_learn_vocab,
    # v2_bpe_tokenize_corpus, d1_exact_dedup, d2_ngram_jaccard,
    # d3_minhash_lsh, d7_incremental_neardup, d6_neardup_clusters,
    # d6b_neardup_clusters_star, d4_simhash, d5_embedding_neardup,
    # d5b_embedding_neardup_blocked.  All hold green r02 rows and are
    # battery-checked per commit.
    "pk1_pack_assignments",
    "pk2_sequence_fill",
    "sh1_shard_assignment",
    "v1_bpe_learn_vocab",
    "v2_bpe_tokenize_corpus",
    "d1_exact_dedup",
    "d2_ngram_jaccard",
    "d3_minhash_lsh",
    "d7_incremental_neardup",
    "d6_neardup_clusters",
    "d6b_neardup_clusters_star",
    "d4_simhash",
    "d5_embedding_neardup",
    "d5b_embedding_neardup_blocked",
    # r03-green rows (re-audit window r06/r07)
    "t11_tfidf_top_terms",
    "e2e_corpus_build_t",
    "m3_frame_sample",
    # r04-green rows (freshest; lowest rotation priority).  Two rows are
    # rows-only BY DESIGN, each with an adjacent hash-gated twin that IS
    # fully green: a13_approx_count_distinct (HLL estimates are
    # engine-specific; its error bound is hash-gated by a13b) and
    # m4_video_decode (JPEG pixel math is not SQL-expressible; its
    # decode output is hash-gated by m4b_video_decode_gate and
    # pixel-exactness is asserted in tests/test_multimodal.py).  Keep
    # each twin adjacent to its rows-only query in every rotation.
    "j6_asof_join",
    "c3_triangle_count",
    "a23_mad_outliers",
    "a24_ewma_per_user",
    "a25_incremental_state_merge",
    "w6_peak_concurrency",
    "j7_band_join",
    "a26_column_profile",
    "r15_top_supplier",
    "r16_supplier_counts",
    "r17_small_qty_revenue",
    "r19_disjunctive_join",
    "r22_idle_balances",
    "u6_pivot_status",
    "t16_quality_classifier",
    "x7_group_split",
    "x8_weighted_sample",
    "t17_char_entropy",
    "q4_binary_hamming_topk",
    "q4_recall",
    "u7_intersect_users",
    "u8_except_all_pairs",
    "w4_trailing_range_window",
    "a18_funnel_stages",
    "a19_cohort_retention",
    "w5_scd2_intervals",
    "r6_forecast_revenue",
    "r9_profit_by_nation_year",
    "r10_returned_top20",
    "a20_gap_fill_ffill",
    "a21_value_histogram",
    "a22_type_trend_corr",
    "m4_video_decode",
    "m4b_video_decode_gate",  # hash-gated twin for m4 (a13/a13b pattern)
    "t14_span_scrub",
    "sh2_epoch_shuffle",
    "d3c_minhash_lsh_dfpruned",
    "c1_kmeans_assign",
    "d8_semantic_dedup",
    "x6_unimax_budget",
    "t15_passage_chunks",
    "d9_semantic_clusters",
    "b1_bm25_topk",
    "d10_semantic_decontam",
    "r7_nation_trade",
    "r8_market_share",
    "a15_cms_heavy_hitters",
    "c2_pagerank",
    "a16_bloom_decontam",
    "a17_portable_hll",
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
