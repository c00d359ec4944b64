"""Corpus-statistics router for exact-Jaccard near-dup detection.

d12 (AllPairs/PPJoin, plans/dedup_plans.py) prunes candidate pairs via
token-frequency skew: a doc's prefix tokens are its RAREST, and the
candidate mass is bounded by the sum of squared document frequencies
over prefix tokens. On long-tail vocabularies (real text) that mass is
near-linear in n; on template-heavy/tiny-vocab corpora every token has
DF ~ n/|V| and the candidate mass degenerates to Σ DF² ~ n²/|V|
(measured: 1140 s at 50k docs on the 30-word-vocab probe corpus vs
near-linear on long-tail text — SCALE.md round 6). The ROUTING CONTRACT
was prose until round 7; this module makes it executable: estimate the
candidate mass from the corpus's own DF distribution (one token-key
shuffle — the same shape as d12's first stage, so the estimate is never
more expensive than one pass of the thing it gates) and route
template-heavy corpora to the LSH family (d3c DF-pruned funnel) instead.

Estimator: candidates_per_doc = Σ_t DF_t² / n, an upper bound on the
average number of candidate comparisons AllPairs can be asked to make
per doc (prefix filtering only shrinks it). Compare against the
corpus's average token count: AllPairs is the right tool when a doc
meets roughly its own vocabulary's worth of candidates; once
candidates_per_doc exceeds ``factor`` × avg_tokens the prefix filter
has provably lost its lever (flat DF) and LSH's banded signatures are
the scale path. The default factor 10 sits two orders of magnitude
between the two measured regimes (long-tail: candidates_per_doc ≈
avg_tokens × O(1); 30-word template vocab: ≈ n × |V| / avg — crossover
is unambiguous).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def neardup_route_stats(
    docs: DataFrame,
    text_col: str = "text",
    sample_fraction: float | None = None,
    seed: int = 7,
) -> dict:
    """Compute the routing statistics. One shuffle on token; pass
    ``sample_fraction`` to estimate from a Bernoulli sample at very
    large n. Candidate mass is quadratic in DF, so the sampled reading
    is EXTRAPOLATED back to full-corpus scale (a p-sample sees DF' ≈
    p·DF and n' ≈ p·n, hence Σ DF'²/n' ≈ p · Σ DF²/n — divide by p).

    Returns {n_docs, avg_tokens, candidates_per_doc, df_flatness} where
    df_flatness = candidates_per_doc / avg_tokens (the routing ratio:
    ~O(1) on long-tail text, ~n/|V| on templated corpora). n_docs and
    candidates_per_doc are full-corpus-scale estimates when sampling.
    """
    d = docs.select(F.split(F.col(text_col), r"\s+").alias("toks"))
    if sample_fraction:
        d = d.sample(fraction=sample_fraction, seed=seed)
    # two aggregations consume the tokenized frame (DF² needs a token-key
    # shuffle, n/avg are doc-level) — persist so the input scan +
    # tokenize + sample run once, not once per action
    d = d.persist()
    try:
        df_sq = (
            d.select(F.explode(F.array_distinct("toks")).alias("tok"))
            .groupBy("tok")
            .agg(F.count("*").alias("df"))
            .agg(F.sum(F.col("df") * F.col("df")).alias("df_sq"))
            .collect()[0]["df_sq"]
        )
        n, avg_toks = d.agg(
            F.count("*").alias("n"), F.avg(F.size("toks")).alias("avg_toks")
        ).collect()[0]
    finally:
        d.unpersist()
    n = max(n, 1)
    avg_toks = float(avg_toks or 1.0)
    cand_per_doc = float(df_sq or 0.0) / n
    scale = 1.0 / sample_fraction if sample_fraction else 1.0
    return {
        "n_docs": int(n * scale),
        "avg_tokens": round(avg_toks, 1),
        "candidates_per_doc": round(cand_per_doc * scale, 1),
        "df_flatness": round(cand_per_doc * scale / max(avg_toks, 1.0), 2),
    }


def neardup_route(
    docs: DataFrame,
    text_col: str = "text",
    factor: float = 10.0,
    sample_fraction: float | None = None,
) -> tuple[str, dict]:
    """('allpairs' | 'lsh', stats): run d12 when the prefix filter has a
    rare tail to prune with; route to the LSH family (d3c) when the DF
    distribution is flat enough that AllPairs' candidate mass
    degenerates quadratically (SCALE.md round 6 contract)."""
    stats = neardup_route_stats(docs, text_col, sample_fraction)
    route = (
        "lsh"
        if stats["candidates_per_doc"] > factor * stats["avg_tokens"]
        else "allpairs"
    )
    return route, stats
