"""Distributed PageRank over a document/similarity graph.

Complements the connected-components family (operators/dedup.py d6/d6b)
with the other canonical iterative graph pattern: power iteration with
damping (Page/Brin 1998), used in data curation to score document
centrality inside near-duplicate neighborhoods.

Cross-engine gating discipline (the rounded-Lloyd precedent,
operators/clustering.py): every iteration's ranks are rounded to
ROUND_DP before the next iteration reads them, so the DuckDB oracle —
which unrolls the fixed iteration count as CTEs — reproduces every
intermediate bit-exactly; accumulation-order noise (~1e-15) is far
below the 1e-9 rounding grid.

Scale shape per iteration: one equi-join of edges to ranks on src, one
groupBy(dst) with map-side partial aggregation, one broadcast 1-row
dangling-mass aggregate. No collect; iteration count is a fixed small
constant. Edges/outdeg are localCheckpoint-ed once and each round's
ranks are localCheckpoint-ed (the d6/BPE pattern): every iteration
references ranks TWICE (contribution join + dangling mass), so without
truncation the lineage — and with an expensive upstream edge pipeline
like SemDeDup, the actual recompute — doubles per round (measured 41 s
at 2k vectors unchecked vs ~3 s checkpointed)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85
ROUND_DP = 9
PR_ITERS = 3


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    n_iter: int = PR_ITERS,
    damping: float = DAMPING,
    node_col: str = "node",
) -> DataFrame:
    """(node, pr) after ``n_iter`` damped power iterations.

    ``nodes``: one row per vertex (column ``node_col``). ``edges``:
    directed (src, dst); for an undirected graph pass both directions.
    Dangling mass (vertices with no out-edges) redistributes uniformly
    each round — the standard stochastic-matrix fix, without which total
    rank leaks and isolated vertices under-rank.
    """
    nodes = nodes.select(F.col(node_col).alias("node")).localCheckpoint(eager=False)
    edges = edges.localCheckpoint(eager=False)
    n_frame = nodes.agg(F.count("*").alias("_n"))
    outdeg = edges.groupBy("src").agg(F.count("*").alias("_outdeg")).localCheckpoint(
        eager=False
    )

    ranks = nodes.crossJoin(F.broadcast(n_frame)).select(
        "node", F.round(F.lit(1.0) / F.col("_n"), ROUND_DP).alias("pr")
    )
    for _ in range(n_iter):
        contrib = (
            edges.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .groupBy("dst")
            .agg(F.sum(F.col("pr") / F.col("_outdeg")).alias("_contrib"))
            .withColumnRenamed("dst", "node")
        )
        dangling = (
            ranks.join(outdeg.withColumnRenamed("src", "node"), "node", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)).alias("_dm"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_frame))
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("_n")
                    + damping
                    * (
                        F.coalesce(F.col("_contrib"), F.lit(0.0))
                        + F.col("_dm") / F.col("_n")
                    ),
                    ROUND_DP,
                ).alias("pr"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
