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


def triangle_count(pairs: DataFrame) -> DataFrame:
    """One-row (n_edges, n_triangles) over an undirected simple graph given
    as canonical pairs (va < vb, no duplicates).

    Degree-ordered node-iterator (Schank/Wagner 2005): orient every edge
    from its lower-(degree, id) endpoint to the higher one, build wedges at
    the low vertex with a self-equi-join on the wedge apex, then close each
    wedge with one more equi-join against the oriented edge set. Every
    triangle is counted exactly once (at its unique (deg, id)-minimal
    corner), and because wedges form only at the LOW-degree endpoint the
    join fan-out is sum(d_out^2) = O(m^1.5) instead of sum(d^2) — a hub
    with a million neighbors contributes no wedges unless it is the
    low-ordered endpoint, which orientation by degree prevents. All three
    steps are hash equi-joins on ids: shuffle-partitioned, AQE-splittable,
    no cartesian anywhere.

    The triangle COUNT is orientation-invariant, so the DuckDB oracle uses
    the simpler id-ordered orientation (va < vb as given) — same number,
    cheaper to express in SQL; the Spark side runs the degree-ordered form
    that survives skewed degree distributions at scale.
    """
    pairs = pairs.select("va", "vb").localCheckpoint(eager=False)
    deg = (
        pairs.select(F.col("va").alias("node"))
        .unionAll(pairs.select(F.col("vb").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # Orient low -> high by (deg, id); ties broken by id so the order is total.
    e = (
        pairs.join(deg.withColumnRenamed("node", "va").withColumnRenamed("deg", "da"), "va")
        .join(deg.withColumnRenamed("node", "vb").withColumnRenamed("deg", "db"), "vb")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("va") < F.col("vb"))),
                F.struct(F.col("va").alias("lo"), F.col("vb").alias("hi")),
            )
            .otherwise(F.struct(F.col("vb").alias("lo"), F.col("va").alias("hi")))
            .alias("e")
        )
        .select(F.col("e.lo").alias("lo"), F.col("e.hi").alias("hi"))
        .localCheckpoint(eager=False)
    )
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.lo") == F.col("e2.lo"))
        .filter(F.col("e1.hi") < F.col("e2.hi"))
        .select(F.col("e1.hi").alias("x"), F.col("e2.hi").alias("y"))
    )
    # A wedge (x, y) — id-ordered x < y by construction — closes iff the
    # edge set contains {x, y}; re-canonicalize the oriented edges by id
    # (degree orientation may have lo > hi as ids) and equi-join.
    closed = wedges.join(
        e.select(
            F.least("lo", "hi").alias("x"), F.greatest("lo", "hi").alias("y")
        ),
        ["x", "y"],
    )
    return (
        closed.agg(F.count("*").alias("n_triangles"))
        .crossJoin(F.broadcast(pairs.agg(F.count("*").alias("n_edges"))))
        .select("n_edges", "n_triangles")
    )


KCORE_K = 2
KCORE_ROUNDS = 3


def kcore_peel(
    pairs: DataFrame,
    k: int = KCORE_K,
    rounds: int = KCORE_ROUNDS,
) -> DataFrame:
    """(node, degree) survivors of ``rounds`` fixed peel iterations of the
    k-core decomposition (Seidman 1983; distributed fixed-round form as
    in Montresor et al.) over an undirected simple graph given as
    canonical pairs (va < vb). Each round drops every node whose degree
    among CURRENT survivors is < k; the reported degree is the one the
    final round computed (restricted to the previous round's survivors —
    mirrored exactly in the oracle's unrolled CTEs).

    In data curation the k-core of the near-dup graph separates dense
    template FAMILIES (cores survive peeling) from incidental chains
    (leaves peel away round by round) — the structural complement of
    c3's triangle density and d13's cluster collapse.

    Fixed rounds keep the op oracle-unrollable (the Lloyd/PageRank/BPE
    precedent); peeling converges monotonically, so round t's survivor
    set is a superset of the true k-core and equals it once a round
    removes nothing. All arithmetic is integer (degrees) — no rounding
    discipline needed anywhere.

    Scale shape per round: two semi-joins (edge endpoints against the
    shrinking survivor set) + one groupBy(src) count with map-side
    combine. Survivor frames are localCheckpoint-ed per round (each is
    read twice next round; the d6/PageRank lineage lesson)."""
    if rounds < 1:
        raise ValueError(f"kcore_peel needs rounds >= 1, got {rounds}")
    edges = (
        pairs.select(F.col("va").alias("src"), F.col("vb").alias("dst"))
        .unionByName(pairs.select(F.col("vb").alias("src"), F.col("va").alias("dst")))
        .localCheckpoint(eager=False)
    )
    alive = edges.select(F.col("src").alias("node")).distinct()
    deg = None
    for i in range(rounds):
        e = edges.join(
            alive.withColumnRenamed("node", "src"), "src", "left_semi"
        ).join(alive.withColumnRenamed("node", "dst"), "dst", "left_semi")
        deg = e.groupBy("src").agg(F.count("*").alias("degree"))
        if i < rounds - 1:
            # the final round's survivor frame is never read again —
            # checkpointing it would run one redundant round-sized job
            alive = (
                deg.filter(F.col("degree") >= k)
                .select(F.col("src").alias("node"))
                .localCheckpoint(eager=True)
            )
    return deg.filter(F.col("degree") >= k).select(
        F.col("src").alias("node"), "degree"
    )
