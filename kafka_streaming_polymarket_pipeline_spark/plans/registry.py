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
    # NEW (latest): generic backward AS-OF join (union-marker scan vs
    # DuckDB's native ASOF JOIN oracle), degree-ordered triangle count
    # over the semantic pair graph, MAD robust z-score anomaly ranking,
    # and the deterministic-fold per-key EWMA
    "j6_asof_join",
    "c3_triangle_count",
    "a23_mad_outliers",
    "a24_ewma_per_user",
    # NEW (latest): incremental aggregation maintenance — merged
    # mergeable states (scalars + HLL registers) hash-gated against the
    # full single-pass recompute
    "a25_incremental_state_merge",
    # NEW (latest): sweep-line interval concurrency via the two-level
    # prefix sum (per-day windows + calendar-bounded carry roll-up),
    # gated against the naive global-sweep oracle
    "w6_peak_concurrency",
    # NEW (latest): numeric band (tolerance) join — epsilon-bucketed
    # equi-join vs the naive range-predicate oracle
    "j7_band_join",
    # NEW (latest): single-pass Deequ-style column profile (null/distinct/
    # typed min-max per column in ONE aggregate) vs a per-column UNION ALL
    "a26_column_profile",
    # NEW (latest): TPC-H Q15/Q16/Q17/Q19/Q22-style heads (scalar
    # subqueries, NOT IN anti-join, decorrelated per-part AVG, disjunctive
    # join predicate, NOT EXISTS + scalar AVG), explicit-values PIVOT, and
    # the fastText-style hashed-feature quality classifier
    "r15_top_supplier",
    "r16_supplier_counts",
    "r17_small_qty_revenue",
    "r19_disjunctive_join",
    "r22_idle_balances",
    "u6_pivot_status",
    "t16_quality_classifier",
    # NEW (latest): leakage-safe group split, Efraimidis-Spirakis weighted
    # sampling, Shannon char-entropy quality gate
    "x7_group_split",
    "x8_weighted_sample",
    "t17_char_entropy",
    # NEW (latest): binary sign-bit quantization ANN tier + recall gate,
    # set-op completion (INTERSECT distinct / EXCEPT ALL multiset)
    "q4_binary_hamming_topk",
    "q4_recall",
    "u7_intersect_users",
    "u8_except_all_pairs",
    # NEW (latest): time-based RANGE frame, ordered funnel, cohort
    # retention — the analytics-engine trio
    "w4_trailing_range_window",
    "a18_funnel_stages",
    "a19_cohort_retention",
    "w5_scd2_intervals",
    # NEW (latest): the last reachable TPC-H shapes (Q6 scan-agg, Q9
    # profit rollup, Q10 returned-item top-20)
    "r6_forecast_revenue",
    "r9_profit_by_nation_year",
    "r10_returned_top20",
    # NEW (latest): gap-fill/ffill resample, value histogram, statistical
    # aggregate family (corr/covar/stddev)
    "a20_gap_fill_ffill",
    "a21_value_histogram",
    "a22_type_trend_corr",
    # NEW this round, never audited: real video decode (rows-only by
    # nature — JPEG pixel math is not SQL-expressible; pixel exactness is
    # asserted in tests/test_multimodal.py) and the span-scrub rewrite
    "m4_video_decode",
    "m4b_video_decode_gate",  # hash-gated pairing for m4 (a13/a13b pattern)
    "t14_span_scrub",
    "sh2_epoch_shuffle",
    # NEW (late round 4): DF-pruned LSH production lever, deterministic
    # k-means (the first fully hash-gated iterative Lloyd), SemDeDup
    "d3c_minhash_lsh_dfpruned",
    "c1_kmeans_assign",
    "d8_semantic_dedup",
    "x6_unimax_budget",
    "t15_passage_chunks",
    "d9_semantic_clusters",
    # NEW (round-4 continuation): BM25 retrieval + embedding-level eval
    # decontamination
    "b1_bm25_topk",
    "d10_semantic_decontam",
    "r7_nation_trade",
    "r8_market_share",
    "a15_cms_heavy_hitters",
    "c2_pagerank",
    "a16_bloom_decontam",
    "a17_portable_hll",
    # NEW (latest, registered PAST the 50-row r04 window by choice —
    # displacing a16/a17 would leave other same-round queries rowless):
    # SymSpell deletion-neighborhood edit-distance-1 entity pairs and
    # the Markov transition matrix. Locally hash-verified at
    # sf0.001/sf0.01/sf0.1; they lead the r05 prefix with the rest.
    "d11_editdist_pairs",
    "a27_markov_transitions",
    "a28_pair_lift",
    "u9_grouping_sets",
    "a29_time_decay_sum",
    # NEW (final round-4 stretch, past the r04 window like d11..a29;
    # locally hash-verified, they join the never-audited block of the
    # r05 prefix): the last reachable TPC-H shapes on this data — Q21
    # semi+anti on the same fact, Q11 HAVING-vs-global-fraction, Q20
    # semi-join into an aggregated subquery, plus UNPIVOT/melt. (Q13
    # already exists as r13_cust_order_counts; Q2's correlated min as
    # r2_min_cost_supplier.)
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
    # changed this round, newest green r02 (packing/shard roll-up rewrite)
    "pk1_pack_assignments",
    "pk2_sequence_fill",
    "sh1_shard_assignment",
    # changed this round, newest green r03 (rank-rounding / repeat clamp;
    # m3's sample_frames gained the real-AVI branch around its fake path)
    "t11_tfidf_top_terms",
    "e2e_corpus_build_t",
    "m3_frame_sample",
    # newest green row is r02 — re-audit before it goes stale
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
    "s1_ann_bruteforce_topk",
    "s2_ann_ivf_topk",
    "s3_ann_lsh_topk",
    "s2_recall",
    "s3_recall",
    "p1_substring_filter",
    "p2_window_containment",
    "p3_projection_parse",
    "p4_type_filter",
    "p5_event_dispatch",
    "p6_explode_filter",
    # The r04 gate records the FIRST 50 entries only. With the late
    # j6/c3/a23/a24/a25/w6/j7/a26 additions the 50-row window now ends
    # at a17_portable_hll: w3_rank_battery, z1_zorder_layout,
    # k2_salted_join, r12_priority_lines, r14_promo_share and
    # r18_large_orders (new this round, locally hash-verified at
    # sf0.001/sf0.01/sf0.1) and the changed-this-round
    # pk1/pk2/sh1/t11/e2e_corpus_build_t/m3 (green r02/r03 rows +
    # per-commit battery) MUST open the r05 prefix, before the
    # r02-stale families below.
    # p7/p8/p9 and j1/j2/j3 displaced late in round 4 by the new
    # d3c/c1/d8/d9/x6/t15 rows; j4_lag_deltas / j5_latest_scalar
    # displaced (with a1/a2/a3) by the new m4/m4b/t14/sh2 rows; p1–p6
    # displaced by the round-4-continuation b1/d10/r7/r8/a15/c2 rows.
    # All r02-green, battery-checked per commit, and they MUST lead the
    # r05 prefix: a1, a2, a3, j1, j2, j3, j4, j5, p1_substring_filter,
    # p2_window_containment, p3_projection_parse, p4_type_filter,
    # p5_event_dispatch, p6_explode_filter, p7_positive_filter,
    # p8_null_empty_guards, p9_resolution_predicate — plus, displaced by
    # the continuation's w3/z1/k2/a16/a17 rows: s1_ann_bruteforce_topk,
    # s2_ann_ivf_topk, s3_ann_lsh_topk, s2_recall, s3_recall — plus, as
    # the new r15/r16/r17/r19/r22/u6/t16/x7/x8/t17 rows push the prefix
    # window forward another 10 (the r04 prefix now ends at
    # d5b_embedding_neardup_blocked): g1_momentum_volatility,
    # g2_whale_deltas, g3_concentration, g4_winner_label, x1_hash_split,
    # x2_stratified_sample, x3_mixture_sample, market_candles_15m,
    # pricing_summary, shipping_priority_top10.
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
