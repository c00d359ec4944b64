"""Deduplication queries over documents/embeddings (training-data ops).

d2 (exact n-gram Jaccard) and d3 (MinHash-LSH, exact-verified) share one
oracle: LSH is a candidate *filter* whose verified output equals the exact
pair set (miss bound ~1e-8/pair at J>=0.5 with 64x2 banding), so the same
ground-truth SQL checks both — and d3's value is doing it with near-linear
work instead of the full shingle self-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import dedup as D
from kafka_streaming_polymarket_pipeline_spark.plans.registry import register
from kafka_streaming_polymarket_pipeline_spark.tables import load

_JACCARD_ORACLE = """
WITH sh AS (
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
)
SELECT doc_id_a, doc_id_b, round(j, 6) AS jaccard FROM (
  SELECT doc_id_a, doc_id_b, i / (sa.n + sb.n - i) AS j
  FROM inter
  JOIN sz sa ON doc_id_a = sa.doc_id
  JOIN sz sb ON doc_id_b = sb.doc_id
) WHERE j >= 0.5
"""


@register(
    "d1_exact_dedup",
    oracle="""
SELECT md5(text) AS content_hash,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM documents
GROUP BY md5(text)
""",
)
def d1_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup via content-hash groupBy: one shuffle on the hash, the
    canonical id is the group minimum."""
    return D.exact_duplicate_groups(load(spark, sf_dir, "documents"))


@register("d2_ngram_jaccard", oracle=_JACCARD_ORACLE)
def d2_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs: character-5-gram Jaccard >= 0.5 via shingle
    inverted-index self-join (the ground truth for d3)."""
    return D.ngram_jaccard_pairs(load(spark, sf_dir, "documents"), threshold=0.5, n=5)


@register("d3_minhash_lsh", oracle=_JACCARD_ORACLE)
def d3_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(128) + LSH(64 bands x 2 rows) candidate generation, then
    exact-Jaccard verification at 0.5 — same output as d2, near-linear cost."""
    return D.minhash_lsh_dedup(load(spark, sf_dir, "documents"), threshold=0.5, n=5)


@register(
    "d3c_minhash_lsh_dfpruned",
    oracle="""
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
)
SELECT doc_id_a, doc_id_b, round(j, 6) AS jaccard FROM (
  SELECT doc_id_a, doc_id_b, i / (sa.n + sb.n - i) AS j
  FROM inter
  JOIN sz sa ON doc_id_a = sa.doc_id
  JOIN sz sb ON doc_id_b = sb.doc_id
) WHERE j >= 0.5
""",
)
def d3c_minhash_lsh_dfpruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-frequency-pruned MinHash-LSH: shingles in >10% of docs dropped
    corpus-wide before signatures + verification; output is exact Jaccard
    >= 0.5 over the pruned shingle sets. The production lever for
    template-heavy corpora — boilerplate-driven similarity stops counting
    and the funnel's candidate mass collapses with it (SCALE.md r04)."""
    return D.minhash_lsh_dedup_dfpruned(
        load(spark, sf_dir, "documents"), threshold=0.5, n=5, max_df_pct=10
    )


@register("d3d_minhash_lsh_oph", oracle=_JACCARD_ORACLE)
def d3d_minhash_lsh_oph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-Permutation-Hashing MinHash (Li/Owen/Zhang 2012 + rotation
    densification, Shrivastava/Li 2014) through d3's banding/est/verify
    funnel: ONE hash per shingle instead of 128 multiply-mods, attacking
    the Omega(shingles x 128) signature floor SCALE.md documents as d3's
    measured cost driver. Output contract and oracle are d3's exactly —
    the funnel's exact-Jaccard verification means any densification recall
    loss surfaces as a hash mismatch, not silent corruption."""
    return D.minhash_lsh_dedup_oph(load(spark, sf_dir, "documents"), threshold=0.5, n=5)


@register(
    "d7_incremental_neardup",
    oracle="""
WITH sh AS (
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
)
SELECT doc_id_a, doc_id_b, round(j, 6) AS jaccard FROM (
  SELECT doc_id_a, doc_id_b, i / (sa.n + sb.n - i) AS j
  FROM inter
  JOIN sz sa ON doc_id_a = sa.doc_id
  JOIN sz sb ON doc_id_b = sb.doc_id
) WHERE j >= 0.5 AND (doc_id_a % 10 = 7 OR doc_id_b % 10 = 7)
""",
)
def d7_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup: docs with doc_id % 10 = 7 play the 'new batch';
    the rest is the indexed corpus. Pairs touching the new batch, found by
    probing the corpus's band buckets with only the new docs' signatures —
    per-batch cost O(|new|), the form a 100 TB pipeline runs continuously.
    Oracle = the exact pair set restricted to pairs with a new-batch doc."""
    docs = load(spark, sf_dir, "documents")
    from pyspark.sql import functions as F

    new = docs.filter(F.col("doc_id") % 10 == 7)
    corpus = docs.filter(F.col("doc_id") % 10 != 7)
    return D.minhash_lsh_incremental(corpus, new, threshold=0.5, n=5)


def _simhash_oracle() -> str:
    return """
WITH tok AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS t
    FROM documents)
), bit_charge AS (
  SELECT doc_id, CAST(j AS INT) AS j,
         sum(CASE WHEN (CAST(strpos('0123456789abcdef',
                                    substr(md5(t), 1 + CAST(j AS INT) // 4, 1)) - 1 AS INT)
                        >> (3 - CAST(j AS INT) % 4)) & 1 = 1
                  THEN 1 ELSE -1 END) AS charge
  FROM tok, (SELECT unnest(range(0, 64)) AS j) js
  GROUP BY doc_id, j
), digits AS (
  SELECT doc_id, j // 4 AS pos,
         sum(CASE WHEN charge > 0 THEN 1 << (3 - j % 4) ELSE 0 END) AS d
  FROM bit_charge GROUP BY doc_id, j // 4
)
SELECT doc_id,
       string_agg(substr('0123456789abcdef', CAST(d AS INT) + 1, 1), '' ORDER BY pos)
         AS simhash
FROM digits GROUP BY doc_id
"""


@register(
    "d6_neardup_clusters",
    oracle="""
WITH RECURSIVE sh AS (
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
), pairs AS (
  SELECT doc_id_a, doc_id_b
  FROM inter
  JOIN sz sa ON doc_id_a = sa.doc_id
  JOIN sz sb ON doc_id_b = sb.doc_id
  WHERE i / (sa.n + sb.n - i) >= 0.5
), edges AS (
  SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
  UNION ALL
  SELECT doc_id_b, doc_id_a FROM pairs
), reach(node, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst
)
SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
""",
)
def d6_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components over the MinHash-LSH verified
    pair graph (identical to the exact pair graph — see d3) via iterative
    min-label propagation; cluster_id = min reachable doc_id, singletons
    included. The oracle computes the same transitive closure with a
    recursive CTE."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(docs, threshold=0.5, n=5)
    return D.neardup_clusters(docs, pairs)


_D6_ORACLE = """
WITH RECURSIVE sh AS (
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
), pairs AS (
  SELECT doc_id_a, doc_id_b
  FROM inter
  JOIN sz sa ON doc_id_a = sa.doc_id
  JOIN sz sb ON doc_id_b = sb.doc_id
  WHERE i / (sa.n + sb.n - i) >= 0.5
), edges AS (
  SELECT doc_id_a AS src, doc_id_b AS dst FROM pairs
  UNION ALL
  SELECT doc_id_b, doc_id_a FROM pairs
), reach(node, lab) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst
)
SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
"""


@register("d6b_neardup_clusters_star", oracle=_D6_ORACLE)
def d6b_neardup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d6's connected components via alternating large-star/small-star
    (Kiveris et al. SoCC'14): O(log^2 n) rounds on any graph where
    min-label propagation needs diameter-many — the form that survives
    adversarial long chains at 100 TB. Same oracle as d6."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(docs, threshold=0.5, n=5)
    return D.neardup_clusters_star(docs, pairs)


@register("d4_simhash", oracle=_simhash_oracle())
def d4_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signature (hex) per document from token-md5 bit
    charges — engine-portable (md5), verified bit-for-bit by the oracle."""
    return D.simhash_signatures(load(spark, sf_dir, "documents"))


@register(
    "d5_embedding_neardup",
    oracle="""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT vec_id_a, vec_id_b, round(c, 6) AS cosine FROM (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         list_dot_product(a.e, b.e)
           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS c
  FROM v a JOIN v b ON a.vec_id < b.vec_id
) WHERE c >= 0.45
""",
)
def d5_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (>= 0.45), brute-force pair scan —
    kept registered in the oracle-contrast role d2 plays for d3: the
    ground-truth form the blocked d5b is measured against. The first-class
    path is d5b_embedding_neardup_blocked."""
    return D.embedding_near_dup_pairs(load(spark, sf_dir, "embeddings"), threshold=0.45)


@register(
    "d5b_embedding_neardup_blocked",
    oracle="""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)
SELECT vec_id_a, vec_id_b, round(c, 6) AS cosine FROM (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b,
         list_dot_product(a.e, b.e)
           / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))) AS c
  FROM v a JOIN v b ON a.vec_id < b.vec_id
) WHERE c >= 0.45
""",
)
def d5b_embedding_neardup_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-class embedding near-dup: metric cell blocking (triangle-
    inequality admissible cell pairs -> equi-join candidates -> exact
    cosine verify). Output equals d5's brute force unconditionally; the
    plan contains no BroadcastNestedLoopJoin (asserted in
    tests/test_dedup.py) — candidate generation is a distributed shuffle
    equi-join on cell ids, the shape that survives 100 TB."""
    return D.embedding_neardup_blocked(load(spark, sf_dir, "embeddings"), threshold=0.45)


@register(
    "d11_editdist_pairs",
    oracle="""
SELECT a.c_custkey AS rid_a, b.c_custkey AS rid_b,
       lower(a.c_name) AS name_a, lower(b.c_name) AS name_b
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND levenshtein(lower(a.c_name), lower(b.c_name)) = 1
""",
)
def d11_editdist_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution string-similarity join: customer-name pairs at
    Levenshtein distance exactly 1 (near-identical identities — the
    record-linkage primitive). The oracle is the naive all-pairs
    levenshtein self-join; the engine runs SymSpell deletion-neighborhood
    blocking (operators/dedup.py editdist1_pairs): |name|+1 deletion
    keys per record, candidate generation by key equi-join, exact
    integer verify — same answer, O(n * |name|) candidate work instead
    of O(n^2), and key skew bounded by the alphabet."""
    from kafka_streaming_polymarket_pipeline_spark.operators.dedup import editdist1_pairs

    cust = load(spark, sf_dir, "customer")
    return editdist1_pairs(cust, "c_custkey", "c_name")


# d12 and d14 share one ground truth: exact word-token-set Jaccard
# >= 19/20 pairs (naive all-pairs token self-join, integer
# cross-multiplied threshold). d12 answers it with AllPairs prefix
# filtering; d14 routes between that and the semantics-preserving
# banded-MinHash leg on corpus DF statistics — same answer either way.
_TOKEN_JACCARD_19_20_ORACLE = """
WITH tok AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS t
    FROM documents)
), sz AS (
  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
  FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_id_a, doc_id_b,
       round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sz sa ON doc_id_a = sa.doc_id
JOIN sz sb ON doc_id_b = sb.doc_id
WHERE 20 * i >= 19 * (sa.n + sb.n - i)
"""


@register("d12_prefix_jaccard_join", oracle=_TOKEN_JACCARD_19_20_ORACLE)
def d12_prefix_jaccard_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT set-similarity self-join: word-token Jaccard >= 0.95 pairs via
    AllPairs/PPJoin prefix filtering (Bayardo WWW'07; Xiao WWW'08) — the
    third rung of the dedup ladder: d2 is the quadratic proof, d3 the
    probabilistic funnel, d12 the exact algorithm that scales. Docs sort
    their tokens by global (doc-frequency ASC, token) and only the
    rarest s - ceil(0.95 s) + 1 tokens (the prefix) enter the candidate
    equi-join; pigeonhole makes the candidate set a superset of the
    answer, an exact integer-arithmetic Jaccard verify finishes. The
    oracle is the naive all-pairs token self-join; identical answers,
    near-linear candidate work. Threshold is the rational 19/20
    (word-token similarity on this templated corpus is loose: 0.7 admits
    41% of ALL pairs, 0.95 keeps the near-identical tail) with all
    comparisons integer cross-multiplications on BOTH engines — no float
    boundary can disagree (the j7 band-edge lesson)."""
    return D.prefix_jaccard_pairs(load(spark, sf_dir, "documents"), num=19, den=20)


@register(
    "d12c_prefix_jaccard_dfpruned",
    oracle="""
WITH tok0 AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id,
           unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS t
    FROM documents)
), n AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), dfq AS (
  SELECT t, CAST(count(*) AS BIGINT) AS d FROM tok0 GROUP BY t
), tok AS (
  SELECT tok0.doc_id, tok0.t
  FROM tok0 JOIN dfq USING (t) CROSS JOIN n
  WHERE dfq.d * 100 <= 10 * n.n_docs
), sz AS (
  SELECT doc_id, count(*) AS n FROM tok GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b, count(*) AS i
  FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_id_a, doc_id_b,
       round(i * 1.0 / (sa.n + sb.n - i), 6) AS jaccard
FROM inter
JOIN sz sa ON doc_id_a = sa.doc_id
JOIN sz sb ON doc_id_b = sb.doc_id
WHERE 20 * i >= 19 * (sa.n + sb.n - i)
""",
)
def d12c_prefix_jaccard_dfpruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """d3c's corpus-wide DF-pruning cut applied to d12's AllPairs prefix
    filter (r09 verdict task 5): tokens in >10% of docs are dropped
    corpus-wide BEFORE prefix ordering, candidates, and verification;
    output is exact Jaccard >= 19/20 over the PRUNED token sets —
    boilerplate-blind similarity, the production semantics on
    template-heavy corpora, which is exactly where AllPairs candidate
    mass explodes (the templated token mass IS the candidate mass; d3c
    measured a 435x collapse for the MinHash funnel, and on this corpus
    the cut collapses AllPairs candidates to the answer set itself —
    every pair sharing ANY surviving token qualifies). The DF cut is
    one integer-exact filter on the df table the prefix ordering
    already computes, so it adds only a broadcast one-row count join;
    the DuckDB oracle replicates the kept set bit-for-bit."""
    return D.prefix_jaccard_pairs(
        load(spark, sf_dir, "documents"), num=19, den=20, max_df_pct=10
    )


@register("d14_neardup_auto", oracle=_TOKEN_JACCARD_19_20_ORACLE)
def d14_neardup_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROUTED exact near-dup pairs — the executable form of the
    AllPairs-vs-LSH routing contract (SCALE.md round 6; VERDICT r07
    task 3). ``operators.dedup_router.neardup_pairs_auto`` estimates the
    corpus's candidate mass from its own document-frequency distribution
    (one token-key shuffle: Σ DF²/n vs avg tokens) and picks the engine:
    AllPairs prefix filtering where a rare token tail gives the prefix
    filter a lever, the semantics-preserving banded-MinHash funnel
    (d12's integer verify predicate over the d3 plan machinery) where
    flat DF degenerates AllPairs quadratically. The driver corpus is
    templated (flatness ~160 at sf0.01) so THIS registration exercises
    the LSH leg against the same naive exact oracle d12 is gated on —
    the strongest both-legs-agree check available: the routed answer
    must equal the exact pair set bit-for-bit regardless of which
    engine ran. Threshold 19/20 with integer cross-multiplication on
    both engines (no float edge); the LSH leg's documented miss budget
    is <=3e-6/pair (banding + band-count + estimate cuts combined)."""
    from kafka_streaming_polymarket_pipeline_spark.operators.dedup_router import neardup_pairs_auto

    pairs, _route, _stats = neardup_pairs_auto(
        load(spark, sf_dir, "documents"), num=19, den=20
    )
    return pairs


_D13_CLUSTERS_CTE = _D6_ORACLE.replace(
    "SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node", ""
).rstrip().rstrip(")") + """),
clusters AS (
  SELECT node AS doc_id, min(lab) AS cluster_id FROM reach GROUP BY node
)"""


@register(
    "d13_keep_longest_per_cluster",
    oracle=_D13_CLUSTERS_CTE + """
SELECT cluster_id, kept_doc_id, n_docs, kept_len FROM (
  SELECT c.cluster_id,
         d.doc_id AS kept_doc_id,
         CAST(count(*) OVER (PARTITION BY c.cluster_id) AS BIGINT) AS n_docs,
         CAST(len(d.text) AS BIGINT) AS kept_len,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY len(d.text) DESC, d.doc_id) AS rn
  FROM clusters c JOIN documents d ON c.doc_id = d.doc_id
) WHERE rn = 1
""",
)
def d13_keep_longest_per_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document SELECTION — the step that turns a near-dup
    cluster map into a kept corpus: per connected component of the
    verified LSH pair graph (d6's clusters), keep the LONGEST document
    (char length; ties -> smaller doc_id), the standard keep-the-longest-
    copy rule (C4/RefinedWeb lineage) rather than d6's arbitrary min-id
    canonical. Composition under one hash gate: LSH funnel -> CC ->
    per-cluster argmax; the oracle re-derives all three (recursive
    reachability + a row_number argmax). Output one row per cluster:
    (cluster_id, kept_doc_id, n_docs, kept_len). Length is an integer,
    so the argmax needs no rounding contract; the window partitions by
    cluster_id — bounded by construction (clusters are near-dup
    neighborhoods, not the corpus). Selection logic lives in
    ``operators.dedup.keep_longest_per_cluster`` (unit-tested in
    tests/test_keep_longest.py: tie-break, singletons, n_docs vs d6)."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_dedup(docs, threshold=0.5, n=5)
    clusters = D.neardup_clusters(docs, pairs)
    return D.keep_longest_per_cluster(docs, clusters)


@register(
    "d15_containment_pairs",
    oracle="""
WITH tk AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(string_split(lower(text), ' '),
                                          x -> x <> ''))) AS tok
  FROM documents
),
sz AS (SELECT doc_id, count(*) AS n FROM tk GROUP BY 1),
ov AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS ov
  FROM tk a JOIN tk b USING (tok)
  WHERE a.doc_id <> b.doc_id
  GROUP BY 1, 2
)
SELECT a_id AS doc_id_a, b_id AS doc_id_b,
       round(CAST(ov AS DOUBLE) / sa.n, 6) AS containment
FROM ov JOIN sz sa ON sa.doc_id = ov.a_id
WHERE 10 * ov >= 9 * sa.n AND sa.n >= 30
""",
)
def d15_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT directed token-set containment >= 0.9 pairs ("A is nearly a
    subset of B") — the ASYMMETRIC near-dup relation the Jaccard ladder
    (d2/d3/d12) cannot see: a quote inside an article is Jaccard ~0 but
    containment 1.0, and subsumption dedup (drop documents another
    document swallows) needs exactly this relation. Prefix filtering
    generalizes (Xiao WWW'08): only the CONTAINED side carries a prefix
    (pigeonhole on A alone — overlap >= ceil(0.9|A|) cannot hide in a
    suffix of |A| - ceil(0.9|A|) tokens); B is indexed by its full token
    set (asymmetry admits no B-side prefix) with the sole sound B-prune
    |B| >= ceil(0.9|A|). All comparisons integer cross-multiplied on
    both engines; the oracle is the naive all-pairs token join.
    min_size=30 drops signal-free tiny contained sets (a 2-token doc is
    "contained" everywhere on a templated corpus)."""
    return D.containment_pairs(
        load(spark, sf_dir, "documents"), num=9, den=10, min_size=30
    )


@register(
    "d16_cross_containment",
    oracle="""
WITH sp AS (
  SELECT doc_id, text,
         ('0x' || substr(md5(concat_ws(':', lang, CAST(doc_id AS VARCHAR))), 1, 8))::BIGINT
           % 100 AS sb
  FROM documents
),
tka AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(string_split(lower(text), ' '),
                                          x -> x <> ''))) AS tok
  FROM sp WHERE sb >= 90
),
tkb AS (
  SELECT doc_id,
         unnest(list_distinct(list_filter(string_split(lower(text), ' '),
                                          x -> x <> ''))) AS tok
  FROM sp WHERE sb < 80
),
sza AS (SELECT doc_id, count(*) AS n FROM tka GROUP BY 1),
ov AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS ov
  FROM tka a JOIN tkb b USING (tok)
  GROUP BY 1, 2
)
SELECT a_id AS doc_id_a, b_id AS doc_id_b,
       round(CAST(ov AS DOUBLE) / sa.n, 6) AS containment
FROM ov JOIN sza sa ON sa.doc_id = ov.a_id
WHERE 10 * ov >= 9 * sa.n AND sa.n >= 30
""",
)
def d16_cross_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS-CORPUS directed containment — the decontamination form of
    d15 (r08 verdict task 6): benchmark docs (x1's deterministic 'test'
    split) as the CONTAINED side A against the training corpus (the
    'train' split) as B, reporting every eval doc whose token set is
    >= 0.9 inside some training doc. The span-level complement of the
    t8/x10 8-gram scan: a quoted eval passage inside a long training
    document is Jaccard ~0 (union swamped) and survives paraphrase
    reordering that breaks contiguous 8-grams, but containment sees it
    at 1.0. Same prefix-filter machinery as d15 with two inputs and one
    SHARED union doc-frequency token order; identical ids would be
    reported, not skipped (splits are disjoint, so none arise here).
    The oracle is the naive cross token join. B-side explode is the
    inverted-index shuffle; the A side is benchmark-sized (tiny by
    construction) — effectively a broadcast-scale probe at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    from kafka_streaming_polymarket_pipeline_spark.operators.sampling import hash_split

    sp = hash_split(docs).select("doc_id", "split")
    d = docs.join(sp, "doc_id")
    bench = d.filter(F.col("split") == "test").drop("split")
    corpus = d.filter(F.col("split") == "train").drop("split")
    return D.cross_containment_pairs(bench, corpus, num=9, den=10, min_size=30)


@register(
    "d17_paragraph_dedup",
    oracle="""
WITH tkz AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents
),
n AS (SELECT doc_id, ts, len(ts) AS L FROM tkz),
p AS (
  SELECT doc_id, CAST(ci AS INT) AS pidx,
         array_to_string(ts[CAST(ci * 32 + 1 AS BIGINT) : CAST(ci * 32 + 32 AS BIGINT)], ' ') AS ptext
  FROM (SELECT doc_id, ts,
               unnest(range(0, greatest(CAST(floor((L - 32 + 31) / 32) AS BIGINT), 0) + 1)) AS ci
        FROM n WHERE L > 0)
),
k AS (
  SELECT doc_id, pidx, ptext,
         row_number() OVER (PARTITION BY ptext ORDER BY doc_id, pidx) AS rn
  FROM p
),
reb AS (
  SELECT doc_id, string_agg(ptext, ' ' ORDER BY pidx) AS text_clean,
         count(*) AS nk
  FROM k WHERE rn = 1 GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS np FROM p GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(reb.text_clean, '') AS text_clean,
       CAST(coalesce(tot.np, 0) AS BIGINT) AS n_paras,
       CAST(coalesce(tot.np, 0) - coalesce(reb.nk, 0) AS BIGINT) AS n_removed
FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN reb USING (doc_id)
""",
)
def d17_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Paragraph-granularity exact dedup (r08 verdict stretch): split
    every doc into non-overlapping 32-token paragraphs, keep only each
    paragraph's globally first occurrence (min (doc_id, idx) — d1's
    rule at sub-document grain, the C4/RefinedWeb line-level pass), and
    reassemble survivors in reading order. One row per input doc
    (scrubbed text + removal accounting) so untouched docs hash too.
    The oracle re-derives first-occurrence with a row_number window;
    Spark uses a groupBy min-struct + join back (map-side combined —
    no global window at corpus scale)."""
    return D.paragraph_dedup(load(spark, sf_dir, "documents"), size=32)


@register(
    "d19_boilerplate_scrub",
    oracle="""
WITH tkz AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents
),
n AS (SELECT doc_id, ts, len(ts) AS L FROM tkz),
p AS (
  SELECT doc_id, CAST(ci AS INT) AS pidx,
         array_to_string(ts[CAST(ci * 32 + 1 AS BIGINT) : CAST(ci * 32 + 32 AS BIGINT)], ' ') AS ptext
  FROM (SELECT doc_id, ts,
               unnest(range(0, greatest(CAST(floor((L - 32 + 31) / 32) AS BIGINT), 0) + 1)) AS ci
        FROM n WHERE L > 0)
),
freq AS (
  SELECT ptext FROM p GROUP BY ptext HAVING count(DISTINCT doc_id) > 1
),
k AS (SELECT doc_id, pidx, ptext FROM p ANTI JOIN freq USING (ptext)),
reb AS (
  SELECT doc_id, string_agg(ptext, ' ' ORDER BY pidx) AS text_clean,
         count(*) AS nk
  FROM k GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS np FROM p GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(reb.text_clean, '') AS text_clean,
       CAST(coalesce(tot.np, 0) AS BIGINT) AS n_paras,
       CAST(coalesce(tot.np, 0) - coalesce(reb.nk, 0) AS BIGINT) AS n_removed
FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN reb USING (doc_id)
""",
)
def d19_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency boilerplate scrub (r10): delete EVERY occurrence
    of a 32-token paragraph that appears in more than one distinct
    document — the CCNet/RefinedWeb template-removal pass, the semantic
    complement of d17's keep-one-canonical rule (repeated content is
    noise here, not a canonical survivor; intra-doc repeats with
    doc-frequency 1 survive). Spark: count-distinct per window, LEFT
    ANTI join against the Zipf-small frequent set (broadcastable at
    corpus scale — the scrub itself is map-side), d17's reading-order
    reassembly with one row per input doc."""
    return D.boilerplate_scrub(load(spark, sf_dir, "documents"), size=32, max_doc_freq=1)


@register(
    "d18_paragraph_neardup",
    oracle="""
WITH RECURSIVE tkz AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ts
  FROM documents
),
nn AS (SELECT doc_id, ts, len(ts) AS L FROM tkz),
p AS (
  SELECT doc_id, CAST(ci AS INT) AS pidx,
         array_to_string(ts[CAST(ci * 32 + 1 AS BIGINT) : CAST(ci * 32 + 32 AS BIGINT)], ' ') AS ptext
  FROM (SELECT doc_id, ts,
               unnest(range(0, greatest(CAST(floor((L - 32 + 31) / 32) AS BIGINT), 0) + 1)) AS ci
        FROM nn WHERE L > 0)
),
w AS (
  SELECT doc_id, pidx, ptext,
         CAST(doc_id * 1048576 + pidx AS BIGINT) AS wid
  FROM p
),
sh AS (
  SELECT DISTINCT wid, s FROM (
    SELECT wid,
           unnest(list_transform(range(1, greatest(len(ptext) - 3, 1)),
                                 i -> substr(ptext, CAST(i AS INT), 5))) AS s
    FROM w)
),
sz AS (SELECT wid, count(*) AS n FROM sh GROUP BY wid),
inter AS (
  SELECT a.wid AS wa, b.wid AS wb, count(*) AS i
  FROM sh a JOIN sh b ON a.s = b.s AND a.wid < b.wid
  GROUP BY 1, 2
),
prs AS (
  SELECT wa, wb
  FROM inter
  JOIN sz sa ON wa = sa.wid
  JOIN sz sb ON wb = sb.wid
  WHERE i / (sa.n + sb.n - i) >= 0.5
),
edges AS (
  SELECT wa AS src, wb AS dst FROM prs
  UNION ALL
  SELECT wb, wa FROM prs
),
reach(node, lab) AS (
  SELECT wid, wid FROM w
  UNION
  SELECT e.src, r.lab FROM edges e JOIN reach r ON r.node = e.dst
),
labs AS (SELECT node AS wid, min(lab) AS cl FROM reach GROUP BY node),
kept AS (
  SELECT w.doc_id, w.pidx, w.ptext
  FROM w JOIN labs USING (wid) WHERE w.wid = labs.cl
),
reb AS (
  SELECT doc_id, string_agg(ptext, ' ' ORDER BY pidx) AS text_clean,
         count(*) AS nk
  FROM kept GROUP BY doc_id
),
tot AS (SELECT doc_id, count(*) AS np FROM p GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(reb.text_clean, '') AS text_clean,
       CAST(coalesce(tot.np, 0) AS BIGINT) AS n_paras,
       CAST(coalesce(tot.np, 0) - coalesce(reb.nk, 0) AS BIGINT) AS n_removed
FROM documents d LEFT JOIN tot USING (doc_id) LEFT JOIN reb USING (doc_id)
""",
)
def d18_paragraph_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY paragraph-grain dedup — the Dolma/RefinedWeb combination
    d17 exactifies: near-duplicate (exact-verified Jaccard >= 0.5, d3's
    funnel) matching between 32-token windows corpus-wide, the pair
    relation closed into clusters by large-star/small-star CC, each
    cluster keeping only its reading-order-first window, survivors
    reassembled per doc. Lightly edited boilerplate paragraphs dedup
    where d17's exact equality misses. Four subsystems under ONE hash
    gate (splitter -> LSH funnel -> star CC -> reassembly); the oracle
    re-derives exact window Jaccard from character 5-gram shingles and
    the closure with a recursive CTE, d6's pattern at window grain."""
    return D.paragraph_neardup_dedup(load(spark, sf_dir, "documents"), size=32)
