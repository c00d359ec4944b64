"""Clustering queries: deterministic k-means + SemDeDup semantic dedup.

The DuckDB oracles unroll the fixed number of Lloyd rounds as CTEs (the
BPE precedent, plans/bpe_plans.py) — every round's rounded centroid means
and rounded-cosine assignments are re-derived from scratch in SQL, so
the driver hash-gates the ENTIRE iterative pipeline, not just row
counts. This is the capability `plans/similarity_plans.py` documents as
impossible for the unrounded IVF refinement; rounding to 6 dp at every
cross-engine comparison point (operators/clustering.py) is what makes it
checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from kafka_streaming_polymarket_pipeline_spark.operators import clustering as C
from kafka_streaming_polymarket_pipeline_spark.plans.registry import register
from kafka_streaming_polymarket_pipeline_spark.tables import load

_K = C.KMEANS_K
_ITERS = C.KMEANS_ITERS
_SEM_THRESHOLD = 0.45  # d5's near-dup threshold: d8 = d5 ∩ same-cell


def _cos_sql(e: str, c: str) -> str:
    return (
        f"round(list_dot_product({e}, {c})"
        f" / (sqrt(list_dot_product({e}, {e})) * sqrt(list_dot_product({c}, {c}))), 6)"
    )


def _kmeans_ctes(k: int | str, n_iter: int) -> str:
    """WITH-chain replicating kmeans_assign: c0 = md5-ordered seed pick;
    a_i = rounded-cosine assignment under c_i (ties -> smaller cell);
    c_{i+1} = 6-dp-rounded element-wise means of a_i's cells.

    ``k`` may be an int literal or a SQL expression string (DuckDB's
    LIMIT accepts expressions/subqueries) — the d8b production knob
    computes k from the corpus size INSIDE the oracle so both engines
    derive the identical k at any scale."""
    parts = [
        "v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cell, e AS ce FROM v"
        f" ORDER BY md5(CAST(vec_id AS VARCHAR)) LIMIT {k})",
    ]
    for i in range(n_iter + 1):
        parts.append(
            f"""a{i} AS (
  SELECT vec_id, e, cell, s FROM (
    SELECT v.vec_id, v.e, c.cell, {_cos_sql('v.e', 'c.ce')} AS s,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY {_cos_sql('v.e', 'c.ce')} DESC, c.cell) AS rn
    FROM v CROSS JOIN c{i} c) WHERE rn = 1)"""
        )
        if i < n_iter:
            parts.append(
                f"""c{i + 1} AS (
  SELECT cell, list(m ORDER BY pos) AS ce FROM (
    SELECT cell, pos, round(avg(val), 6) AS m FROM (
      SELECT cell, unnest(e) AS val, unnest(range(1, len(e) + 1)) AS pos FROM a{i})
    GROUP BY cell, pos) GROUP BY cell)"""
            )
    return "WITH " + ",\n".join(parts)


@register(
    "c1_kmeans_assign",
    oracle=f"""
{_kmeans_ctes(_K, _ITERS)}
SELECT vec_id, cell, s AS score FROM a{_ITERS}
""",
)
def c1_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-means ({_K} cells, {_ITERS} Lloyd rounds) over the
    embeddings table: md5-seeded init, rounded-cosine assignment, rounded
    mean updates — the iterative-algorithm-under-full-hash-gate form."""
    return C.kmeans_assign(load(spark, sf_dir, "embeddings"), k=_K, n_iter=_ITERS)


@register(
    "d8_semantic_dedup",
    oracle=f"""
{_kmeans_ctes(_K, _ITERS)}
SELECT vec_id_a, vec_id_b, cell, round(c, 6) AS cosine FROM (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, a.cell AS cell,
         list_dot_product(a.e, b.e)
           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS c
  FROM a{_ITERS} a JOIN a{_ITERS} b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
) WHERE c >= {_SEM_THRESHOLD}
""",
)
def d8_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup: cosine >= {_SEM_THRESHOLD} pairs WITHIN k-means cells —
    d5's brute-force pair set restricted to same-cell pairs (cross-cell
    near-dups missed by design; the cluster is the blocking key, so pair
    work is sum(|cell|^2), never corpus^2)."""
    return C.semantic_dedup_pairs(
        load(spark, sf_dir, "embeddings"), threshold=_SEM_THRESHOLD, k=_K, n_iter=_ITERS
    )


# The production knob (SemDeDup, Abbas et al. 2023 §3: k grows with the
# corpus so cells stay constant-size): k = max(4, n // 125) on BOTH
# engines — Spark computes it from a bounded count(), the oracle inlines
# the identical arithmetic in the seed pick's LIMIT expression.  Holding
# CELL SIZE (not k) constant makes within-cell pair work sum(|cell|^2)
# ~ n * cell_size, i.e. LINEAR in corpus size — the scale shape d8's
# pinned k=8 cannot show (its 19x-at-10x probe artifact, SCALE.md r04).
_KSCALED = "(greatest(4, (SELECT count(*) FROM embeddings) // 125))"


@register(
    "d8b_semantic_dedup_kscaled",
    oracle=f"""
{_kmeans_ctes(_KSCALED, _ITERS)}
SELECT vec_id_a, vec_id_b, cell, round(c, 6) AS cosine FROM (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, a.cell AS cell,
         list_dot_product(a.e, b.e)
           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS c
  FROM a{_ITERS} a JOIN a{_ITERS} b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
) WHERE c >= {_SEM_THRESHOLD}
""",
)
def d8b_semantic_dedup_kscaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the PRODUCTION k-proportional-to-n knob: cosine >=
    {_SEM_THRESHOLD} pairs within k-means cells where k = max(4, n//125)
    holds cell size ~125 constant, so pair work grows LINEARLY with the
    corpus (d8's pinned k=8 is the oracle-parity form; this row hash-
    gates the scale shape itself — k differs per SF and both engines
    derive it from the same integer arithmetic)."""
    emb = load(spark, sf_dir, "embeddings")
    k = max(4, emb.count() // 125)  # bounded driver-side scalar
    return C.semantic_dedup_pairs(emb, threshold=_SEM_THRESHOLD, k=k, n_iter=_ITERS)


@register(
    "d8c_semantic_dedup_signcells",
    oracle=f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
bsel AS (
  SELECT greatest(1, min(i)) AS b FROM range(0, 48) t(i)
  WHERE 125 * (1 << i) >= (SELECT count(*) FROM embeddings)
),
cells AS (
  SELECT vec_id, e,
         list_sum(list_transform(range(1, (SELECT b FROM bsel) + 1),
           i -> CASE WHEN e[i] > 0 THEN (1::BIGINT << (i - 1)) ELSE 0 END))::BIGINT AS cell
  FROM v
)
SELECT vec_id_a, vec_id_b, cell, round(c, 6) AS cosine FROM (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, a.cell AS cell,
         list_dot_product(a.e, b.e)
           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS c
  FROM cells a JOIN cells b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
) WHERE c >= {_SEM_THRESHOLD}
""",
)
def d8c_semantic_dedup_signcells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with the LINEAR-assignment clusterer: cells are the first
    b coordinate sign bits (b = smallest int with 125 * 2^b >= n, pure
    integer arithmetic on both engines), so cell count grows with the
    corpus at constant mean cell size WITHOUT the O(n*k) Lloyd
    assignment d8b's probe measured quadratic (operators/clustering.py
    docstring has the decomposition). Assignment is one row-local scan;
    pair work ~ n * cell_size — the near-linear production scale shape,
    probe-verified at 2k/6k/20k embeddings."""
    return C.semantic_dedup_pairs_signcells(
        load(spark, sf_dir, "embeddings"), threshold=_SEM_THRESHOLD, target_cell=125
    )


@register(
    "d9_semantic_clusters",
    oracle=f"""
{_kmeans_ctes(_K, _ITERS).replace("WITH ", "WITH RECURSIVE ", 1)},
pairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM a{_ITERS} a JOIN a{_ITERS} b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
        >= {_SEM_THRESHOLD}
),
edges AS (
  SELECT va AS src, vb AS dst FROM pairs
  UNION ALL
  SELECT vb, va FROM pairs
),
reach(node, lab) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst
)
SELECT node AS vec_id, min(lab) AS cluster_id FROM reach GROUP BY node
""",
)
def d9_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic near-dup CLUSTERS: connected components (large-star/
    small-star) over the SemDeDup same-cell cosine pair graph — the
    keep-one-per-cluster form of d8, and a three-subsystem composition
    under ONE hash gate: iterative k-means (rounded Lloyd), k-means-cell
    blocking, and iterative star CC, with the oracle re-deriving all
    three in SQL (unrolled Lloyd CTEs + recursive reachability).
    Singletons cluster to themselves; cluster_id = min reachable id."""
    from pyspark.sql import functions as F

    from kafka_streaming_polymarket_pipeline_spark.operators import dedup as D

    emb = load(spark, sf_dir, "embeddings")
    pairs = C.semantic_dedup_pairs(
        emb, threshold=_SEM_THRESHOLD, k=_K, n_iter=_ITERS
    ).select(
        F.col("vec_id_a").alias("doc_id_a"), F.col("vec_id_b").alias("doc_id_b")
    )
    ids = emb.select(F.col("vec_id").alias("doc_id"))
    return D.neardup_clusters_star(ids, pairs).select(
        F.col("doc_id").alias("vec_id"), "cluster_id"
    )


def _pagerank_ctes(n_iter: int, damping: float, dp: int) -> str:
    """pr0..pr{n_iter} CTEs replicating operators/graph.py:pagerank —
    per-round 1e-{dp} rounding makes every intermediate cross-engine
    exact (the rounded-Lloyd discipline)."""
    parts = [
        "edges AS (SELECT va AS src, vb AS dst FROM prpairs"
        " UNION ALL SELECT vb, va FROM prpairs)",
        "outdeg AS (SELECT src, CAST(count(*) AS BIGINT) AS outdeg"
        " FROM edges GROUP BY src)",
        "cnt AS (SELECT CAST(count(*) AS BIGINT) AS n FROM embeddings)",
        f"pr0 AS (SELECT vec_id AS node, round(1.0 / cnt.n, {dp}) AS pr"
        " FROM embeddings CROSS JOIN cnt)",
    ]
    for i in range(n_iter):
        parts.append(
            f"""pr{i + 1} AS (
  SELECT nd.node,
         round(({1.0 - damping:.2f}) / c0.n
               + {damping} * (coalesce(ct.contrib, 0) + dm.m / c0.n), {dp}) AS pr
  FROM (SELECT node FROM pr0) nd
  CROSS JOIN cnt c0
  CROSS JOIN (SELECT coalesce(sum(pr), 0) AS m FROM pr{i}
              WHERE node NOT IN (SELECT src FROM edges)) dm
  LEFT JOIN (SELECT e.dst AS node, sum(p.pr / od.outdeg) AS contrib
             FROM edges e
             JOIN pr{i} p ON p.node = e.src
             JOIN outdeg od ON od.src = e.src
             GROUP BY e.dst) ct ON ct.node = nd.node
)"""
        )
    return ",\n".join(parts)


from kafka_streaming_polymarket_pipeline_spark.operators import graph as _G  # noqa: E402

G_ITERS = _G.PR_ITERS
G_DAMPING = _G.DAMPING
G_DP = _G.ROUND_DP


@register(
    "c2_pagerank",
    oracle=f"""
{_kmeans_ctes(_K, _ITERS)},
prpairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM a{_ITERS} a JOIN a{_ITERS} b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
        >= {_SEM_THRESHOLD}
),
{_pagerank_ctes(G_ITERS, G_DAMPING, G_DP)}
SELECT node AS vec_id, pr FROM pr{G_ITERS}
""",
)
def c2_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Damped PageRank (3 power iterations, dangling mass redistributed)
    over the SemDeDup same-cell cosine pair graph — document centrality
    inside near-dup neighborhoods, the keep-the-canonical-copy signal.
    Composes THREE iterative subsystems under one hash gate: rounded
    Lloyd k-means, cell-blocked pair generation, and rounded power
    iteration, with the oracle unrolling all three as CTEs."""
    from pyspark.sql import functions as F

    from kafka_streaming_polymarket_pipeline_spark.operators import graph as G

    emb = load(spark, sf_dir, "embeddings")
    pairs = C.semantic_dedup_pairs(emb, threshold=_SEM_THRESHOLD, k=_K, n_iter=_ITERS)
    edges = pairs.select(
        F.col("vec_id_a").alias("src"), F.col("vec_id_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("vec_id_b").alias("src"), F.col("vec_id_a").alias("dst"))
    )
    ranks = G.pagerank(emb.select("vec_id"), edges, node_col="vec_id")
    return ranks.select(F.col("node").alias("vec_id"), "pr")


@register(
    "c3_triangle_count",
    oracle=f"""
{_kmeans_ctes(_K, _ITERS)},
prpairs AS (
  SELECT a.vec_id AS va, b.vec_id AS vb
  FROM a{_ITERS} a JOIN a{_ITERS} b
    ON a.cell = b.cell AND a.vec_id < b.vec_id
  WHERE list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
        >= {_SEM_THRESHOLD}
)
SELECT (SELECT CAST(count(*) AS BIGINT) FROM prpairs) AS n_edges,
       (SELECT CAST(count(*) AS BIGINT)
        FROM prpairs e1
        JOIN prpairs e2 ON e2.va = e1.vb
        JOIN prpairs e3 ON e3.va = e1.va AND e3.vb = e2.vb) AS n_triangles
""",
)
def c3_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count over the SemDeDup same-cell cosine pair graph —
    the local-clustering / community-density signal for near-dup
    neighborhoods (a triangle-rich neighborhood is a template family, a
    triangle-free one is chained drift). Spark runs the degree-ordered
    node-iterator (operators/graph.py triangle_count, O(m^1.5) wedge
    work); the oracle counts the same orientation-invariant quantity with
    the cheaper id-ordered 3-way self-join."""
    from pyspark.sql import functions as F

    from kafka_streaming_polymarket_pipeline_spark.operators import graph as G

    emb = load(spark, sf_dir, "embeddings")
    pairs = C.semantic_dedup_pairs(emb, threshold=_SEM_THRESHOLD, k=_K, n_iter=_ITERS)
    return G.triangle_count(
        pairs.select(F.col("vec_id_a").alias("va"), F.col("vec_id_b").alias("vb"))
    )


def _kcore_ctes(k: int, rounds: int) -> str:
    """Unrolled fixed-round k-core peel CTEs over ``prpairs`` — the same
    unroll-the-iteration discipline as ``_pagerank_ctes``; all-integer
    arithmetic, so no rounding grid is needed."""
    parts = [
        "edges AS (SELECT va AS src, vb AS dst FROM prpairs "
        "UNION ALL SELECT vb AS src, va AS dst FROM prpairs)",
        "alive0 AS (SELECT DISTINCT src AS node FROM edges)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"""d{i} AS (
  SELECT e.src AS node, CAST(count(*) AS BIGINT) AS degree
  FROM edges e
  JOIN alive{i - 1} a1 ON a1.node = e.src
  JOIN alive{i - 1} a2 ON a2.node = e.dst
  GROUP BY e.src
),
alive{i} AS (SELECT node FROM d{i} WHERE degree >= {k})"""
        )
    return ",\n".join(parts)


KC_K = _G.KCORE_K
KC_ROUNDS = _G.KCORE_ROUNDS

# c4 peels the d3/d6 shingle-Jaccard near-dup graph, not the SemDeDup
# cosine graph: the cosine graph's same-cell pairs are chain-sparse at
# every test SF (empty 2-core — a signal-free gate), while template
# families in the Jaccard graph form genuine cliques the peel keeps
# (7 / 3 survivors at sf0.001 / sf0.01, with leaves peeled round 1).
_KCORE_PAIRS_CTE = """
sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(text) - 3, 1)),
                                 i -> substr(text, CAST(i AS INT), 5))) AS s
    FROM documents)
), sz AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), prpairs AS (
  SELECT doc_id_a AS va, doc_id_b AS vb
  FROM inter
  JOIN sz sa ON doc_id_a = sa.doc_id
  JOIN sz sb ON doc_id_b = sb.doc_id
  WHERE i / (sa.n + sb.n - i) >= 0.5
)"""


@register(
    "c4_kcore",
    oracle=f"""
WITH {_KCORE_PAIRS_CTE},
{_kcore_ctes(KC_K, KC_ROUNDS)}
SELECT node AS doc_id, degree FROM d{KC_ROUNDS} WHERE degree >= {KC_K}
""",
)
def c4_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-round k-core peel (k=2, 3 rounds; Seidman 1983) over the
    MinHash-LSH verified near-dup pair graph (d3's exact pair set) —
    the structural template-family detector: dense near-dup cores
    survive peeling, incidental chains and leaves fall off round by
    round (complementing c3's triangle density and d13's
    collapse-to-canonical). Completes the graph family's iterative
    trio: label propagation (d6/d6b), power iteration (c2), and now
    degree peeling — all-integer arithmetic, so this is the one
    iterative gate needing NO rounding discipline; the oracle unrolls
    the peel rounds as CTEs over the exact shingle-Jaccard pair CTE d6
    gates on."""
    from pyspark.sql import functions as F

    from kafka_streaming_polymarket_pipeline_spark.operators import dedup as D
    from kafka_streaming_polymarket_pipeline_spark.operators import graph as G

    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(docs, threshold=0.5, n=5)
    surv = G.kcore_peel(
        pairs.select(F.col("doc_id_a").alias("va"), F.col("doc_id_b").alias("vb"))
    )
    return surv.select(F.col("node").alias("doc_id"), "degree")


@register(
    "c4b_kcore_dfpruned",
    oracle=f"""
WITH sh0 AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(text) - 3, 1)),
                                 i -> substr(text, CAST(i AS INT), 5))) AS s
    FROM documents)
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), dfq AS (
  SELECT s, CAST(count(*) AS BIGINT) AS d FROM sh0 GROUP BY s
), sh AS (
  SELECT sh0.doc_id, sh0.s
  FROM sh0 JOIN dfq USING (s) CROSS JOIN n
  WHERE dfq.d * 100 <= 10 * n.n_docs
), sz AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), prpairs AS (
  SELECT doc_id_a AS va, doc_id_b AS vb FROM (
    SELECT doc_id_a, doc_id_b, i / (sa.n + sb.n - i) AS j
    FROM inter
    JOIN sz sa ON doc_id_a = sa.doc_id
    JOIN sz sb ON doc_id_b = sb.doc_id
  ) WHERE j >= 0.5
),
{_kcore_ctes(KC_K, KC_ROUNDS)}
SELECT node AS doc_id, degree FROM d{KC_ROUNDS} WHERE degree >= {KC_K}
""",
)
def c4b_kcore_dfpruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """c4's PRODUCTION form on template-heavy corpora — the prescription
    SCALE.md's c4 probe note makes, executable and gated: the peel fed
    from d3c's doc-frequency-pruned funnel (shingles in >10% of docs
    dropped corpus-wide before signatures), so boilerplate-driven edges
    never form and the funnel's candidate mass stays linear where the
    unpruned d3 funnel goes quadratic (the 30-word-vocab probe regime).
    Same fixed-round integer peel, same oracle unroll — only the pair
    CTE swaps to the DF-pruned one d3c gates on."""
    from pyspark.sql import functions as F

    from kafka_streaming_polymarket_pipeline_spark.operators import dedup as D
    from kafka_streaming_polymarket_pipeline_spark.operators import graph as G

    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup_dfpruned(docs, threshold=0.5, n=5, max_df_pct=10)
    surv = G.kcore_peel(
        pairs.select(F.col("doc_id_a").alias("va"), F.col("doc_id_b").alias("vb"))
    )
    return surv.select(F.col("node").alias("doc_id"), "degree")
