"""Distributed k-means clustering + semantic dedup (SemDeDup-style).

New operator family for corpus organization at training-data scale:
k-means over an embedding column as pure DataFrame ops, then clusters
used as blocking keys for semantic (embedding-space) dedup — the
SemDeDup recipe (Abbas et al. 2023: cluster with k-means, then drop
near-cosine-duplicates *within* clusters, never across the full corpus).

The engine already runs Lloyd iterations inside IVF refinement
(`operators/similarity.py:_centroids`), but that path is documented as
non-oracle-checkable: float-mean summation order is engine-specific, so
the registered IVF query pins ``kmeans_iters=0``. This module lifts that
limitation with a *deterministic-by-construction* Lloyd:

- centroid coordinates ROUND TO 6 DP after every mean update, and
- assignment ranks on the 6-dp-ROUNDED cosine (ties -> smaller cell id),

so the ~1e-15 accumulation-order differences between Spark and DuckDB
sit ~9 orders of magnitude below every comparison's granularity and the
whole iterative pipeline hash-gates end-to-end (the same
round-before-rank fix the t11 TF-IDF ranking uses, and the unrolled-CTE
oracle pattern established by the BPE learner, operators/bpe.py).

Physical shape per Lloyd iteration (the 100 TB story):
- assignment: crossJoin against the BROADCAST k-row centroid table
  (k rows, never the corpus) -> map-side argmax via ``max_by`` -> the
  shuffle carries one narrow (id, cell) row per vector;
- update: posexplode to (cell, pos, val) -> groupBy(cell, pos) mean
  (map-side partial agg: shuffle volume is O(k x dim), not O(n)) ->
  k rebuilt arrays, localCheckpoint'ed (k rows) to cut the per-round
  lineage growth exactly as `_centroids` does.
Iteration count is fixed so the oracle can unroll the same rounds.

Refs: Lloyd 1982 (k-means); Abbas et al. 2023 (SemDeDup); reference
repo has no clustering — builder's-brief training-data extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators.similarity import _dot

KMEANS_K = 8
KMEANS_ITERS = 2


def _assign(pts: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, _v, cell, _s): each point's best cell by 6-dp-rounded
    cosine (the ranking key on BOTH engines), ties -> smaller cell id.
    One broadcast crossJoin (k rows) + one narrow map-side-combined
    groupBy per pass. Norms (_nv per point, _nc per centroid) are folded
    ONCE per vector upstream, not once per (point, centroid) pair —
    sqrt(dot(v,v)) over the same operands is bit-identical either way,
    so the oracle's inline-norm formula still matches exactly."""
    scored = pts.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        "_v",
        "cell",
        F.round(
            _dot(F.col("_v"), F.col("_c")) / (F.col("_nv") * F.col("_nc")), 6
        ).alias("_s"),
    )
    best = F.max_by(
        F.struct("cell", "_s"), F.struct(F.col("_s"), (-F.col("cell")).alias("t"))
    ).alias("b")
    return (
        scored.groupBy("vec_id")
        .agg(best, F.first("_v").alias("_v"))
        .select("vec_id", "_v", F.col("b.cell").alias("cell"), F.col("b._s").alias("_s"))
    )


def _update(assigned: DataFrame) -> DataFrame:
    """(cell, _c): per-cell element-wise mean, each coordinate rounded to
    6 dp — the determinism contract. Cells that received no points simply
    disappear (both engines agree, since assignments agree)."""
    pe = assigned.select("cell", F.posexplode("_v").alias("pos", "val"))
    return (
        pe.groupBy("cell", "pos")
        .agg(F.round(F.avg("val"), 6).alias("m"))
        .groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cell", F.transform("pm", lambda s: s["m"]).alias("_c"))
        .withColumn("_nc", F.sqrt(_dot(F.col("_c"), F.col("_c"))))
        .localCheckpoint(eager=True)
    )


def kmeans_assign(
    df: DataFrame, k: int = KMEANS_K, n_iter: int = KMEANS_ITERS,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """K-means cell assignment, cross-engine deterministic.

    Init: the k vectors with smallest md5(id) (one TakeOrderedAndProject
    pass, the `_centroids` seed pick); cell label = the seed's id. Then
    ``n_iter`` Lloyd rounds (assign by rounded cosine, update to rounded
    means) and one final assignment under the last centroids. Returns
    (vec_id, cell, score) where score is the rounded cosine the
    assignment ranked on.
    """
    v = F.col(vec_col).cast("array<double>")
    pts = df.select(F.col(id_col).alias("vec_id"), v.alias("_v")).withColumn(
        "_nv", F.sqrt(_dot(F.col("_v"), F.col("_v")))
    )
    cents = (
        pts.orderBy(F.md5(F.col("vec_id").cast("string")))
        .limit(k)
        .select(
            F.col("vec_id").alias("cell"),
            F.col("_v").alias("_c"),
            F.col("_nv").alias("_nc"),
        )
    )
    for _ in range(n_iter):
        cents = _update(_assign(pts, cents))
    return _assign(pts, cents).select(
        "vec_id", "cell", F.col("_s").alias("score")
    )


def semantic_dedup_pairs(
    df: DataFrame, threshold: float = 0.45,
    k: int = KMEANS_K, n_iter: int = KMEANS_ITERS,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup: near-duplicate embedding pairs WITHIN k-means cells.

    The cluster is the blocking key — the within-cell self-join is an
    equi-join on cell, so pair work is sum over cells of |cell|^2, never
    corpus^2, and cross-cell near-dups are *missed by design* (the
    SemDeDup trade: at billions of vectors the cells are small and the
    loss is the documented approximation). Output = the brute-force pair
    set (d5's semantics: exact cosine >= threshold on raw vectors)
    restricted to same-cell pairs; the cosine predicate is the identical
    unrounded expression on both engines, d5's precedent.
    """
    v = F.col(vec_col).cast("array<double>")
    # Norm folded once per vector, not once per pair (the d5 lesson);
    # bit-identical to the oracle's inline sqrt(dot(v,v)) per pair.
    pts = df.select(F.col(id_col).alias("vec_id"), v.alias("_v")).withColumn(
        "_n", F.sqrt(_dot(F.col("_v"), F.col("_v")))
    )
    asg = kmeans_assign(df, k, n_iter, id_col, vec_col).join(pts, "vec_id")
    a = asg.select(
        F.col("vec_id").alias("vec_id_a"), "cell",
        F.col("_v").alias("_va"), F.col("_n").alias("_na"),
    )
    b = asg.select(
        F.col("vec_id").alias("vec_id_b"), "cell",
        F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
    )
    cos = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        a.join(b, "cell")
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .filter(cos >= F.lit(threshold))  # unrounded, same predicate as the oracle
        .select("vec_id_a", "vec_id_b", "cell", F.round(cos, 6).alias("cosine"))
    )


def signbit_cells(n_docs: int, target_cell: int = 125) -> int:
    """Smallest b with target_cell * 2^b >= n_docs (min 1) — pure integer
    arithmetic so Spark and the SQL oracle derive the identical bit
    count at any scale (no float log2 boundary anywhere)."""
    return max(1, next(i for i in range(48) if target_cell * (1 << i) >= n_docs))


def semantic_dedup_pairs_signcells(
    df: DataFrame, threshold: float = 0.45, target_cell: int = 125,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup with a LINEAR-assignment clusterer: the cell is the first
    ``b`` coordinate sign bits of the embedding (b = smallest int with
    target_cell * 2^b >= n, so cell count ~ n / target_cell grows with
    the corpus while mean cell size stays ~constant).

    Why this exists next to the Lloyd forms: exact flat k-means
    assignment is O(n * k) — with the production k-proportional-to-n
    knob that is O(n^2 / cell), and the d8b probe MEASURED it (54 s of
    a 48 s total at 20k docs is the assignment crossJoin). Production
    SemDeDup escapes via hierarchical / approximate assignment (faiss
    IVF); sign-bit cells are the deterministic, oracle-checkable
    stand-in with the same cost shape: assignment is O(n * b) row-local
    work (b grows logarithmically), pair work stays
    sum(|cell|^2) ~ n * cell_size. Cross-cell near-dups are missed by
    design, exactly like d8 — the blocking key changed, not the trade.

    Sign-bit cells need no training pass at all, which is what makes
    the whole pipeline a single linear scan + one equi-join; the cost
    is less adaptive cells than k-means (coordinate signs instead of
    learned centroids) — acceptable for the blocking role.
    """
    n_docs = df.count()  # bounded driver-side scalar
    b = signbit_cells(n_docs, target_cell)
    v = F.col(vec_col).cast("array<double>")
    pts = df.select(F.col(id_col).alias("vec_id"), v.alias("_v")).withColumn(
        "_n", F.sqrt(_dot(F.col("_v"), F.col("_v")))
    )
    # cell = sum_{i<b} (e[i] > 0) * 2^i — row-local, no shuffle, no rounds
    asg = pts.withColumn(
        "cell",
        F.expr(
            f"aggregate(sequence(1, {b}), 0L,"
            " (acc, i) -> acc + IF(element_at(_v, i) > 0, shiftleft(1L, i - 1), 0L))"
        ),
    )
    a = asg.select(
        F.col("vec_id").alias("vec_id_a"), "cell",
        F.col("_v").alias("_va"), F.col("_n").alias("_na"),
    )
    bb = asg.select(
        F.col("vec_id").alias("vec_id_b"), "cell",
        F.col("_v").alias("_vb"), F.col("_n").alias("_nb"),
    )
    cos = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        a.join(bb, "cell")
        .filter(F.col("vec_id_a") < F.col("vec_id_b"))
        .filter(cos >= F.lit(threshold))  # unrounded, same predicate as the oracle
        .select("vec_id_a", "vec_id_b", "cell", F.round(cos, 6).alias("cosine"))
    )
