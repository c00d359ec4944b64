"""Positive-case tests for the dedup operators: plant known duplicates and
near-duplicates, assert each method finds them (the oracle battery proves
engine-vs-SQL parity; these prove the operators detect what they claim to)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import dedup as D

BASE = (
    "the quick brown fox jumps over the lazy dog while the merge join "
    "streams sorted batches of rows into the hash table for the big scan"
)


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact duplicate of 0
        (2, BASE.replace("quick", "rapid")),  # near-duplicate of 0
        (3, "completely different content about window functions and watermarks"),
        (4, "unrelated short text"),
        (5, BASE.replace("dog", "cat").replace("rows", "tuples")),  # near-dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(planted):
    groups = {r["content_hash"]: r for r in D.exact_duplicate_groups(planted).collect()}
    assert len(groups) == 5  # 6 docs, one exact pair
    dup = [g for g in groups.values() if g["n_copies"] == 2]
    assert len(dup) == 1 and dup[0]["canonical_doc_id"] == 0


def test_ngram_jaccard_finds_near_dups(planted):
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(planted, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.8
    assert (0, 5) in pairs
    assert all(3 not in p and 4 not in p for p in pairs)


def test_minhash_lsh_matches_exact(planted):
    exact = {
        (r["doc_id_a"], r["doc_id_b"]) for r in D.ngram_jaccard_pairs(planted, 0.5).collect()
    }
    lsh = {
        (r["doc_id_a"], r["doc_id_b"]) for r in D.minhash_lsh_dedup(planted, 0.5).collect()
    }
    assert lsh == exact and exact  # finds the same non-empty pair set


def test_oph_lsh_matches_exact(planted):
    exact = {
        (r["doc_id_a"], r["doc_id_b"]) for r in D.ngram_jaccard_pairs(planted, 0.5).collect()
    }
    oph = {
        (r["doc_id_a"], r["doc_id_b"]) for r in D.minhash_lsh_dedup_oph(planted, 0.5).collect()
    }
    assert oph == exact and exact


def test_oph_signatures_dense_and_deterministic(planted, spark):
    # Short docs (<128 shingles) force empty bins; rotation densification
    # must fill every one of the 128 columns, and two docs with identical
    # text must produce identical signatures.
    dup = spark.createDataFrame(
        [(10, "tiny text"), (11, "tiny text")], "doc_id long, text string"
    )
    sigs = D.oph_signatures(D.shingle_index(dup)).collect()
    by_id = {r["doc_id"]: [r[f"m{i}"] for i in range(D.NUM_PERM)] for r in sigs}
    assert all(v is not None for v in by_id[10])  # densified: no holes
    assert by_id[10] == by_id[11]  # content-determined


def test_lsh_params_reproduce_calibrated_constants():
    # threshold=0.5 must reproduce round-1's hand-calibrated prefilters
    # exactly (r=2, min_bands=3, est cutoff 38/128) so registered-query
    # hashes are unchanged by the derivation.
    assert D._lsh_params(0.5) == (2, 3, 38)


def test_minhash_lsh_low_threshold_matches_exact(planted):
    # threshold=0.35 sits below the r=2 banding regime; the derived r=1
    # params must keep the exact-output contract (this call silently
    # dropped true pairs when the prefilters were fixed 0.5-calibrated
    # constants).
    exact = {
        (r["doc_id_a"], r["doc_id_b"]) for r in D.ngram_jaccard_pairs(planted, 0.35).collect()
    }
    lsh = {
        (r["doc_id_a"], r["doc_id_b"]) for r in D.minhash_lsh_dedup(planted, 0.35).collect()
    }
    assert lsh == exact and len(exact) > 3  # wider than the 0.5 pair set


def test_minhash_lsh_rejects_unguaranteeable_threshold(planted):
    with pytest.raises(ValueError, match="threshold"):
        D.minhash_lsh_dedup(planted, threshold=0.1)


def test_simhash_near_dups_close(planted):
    sig = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(planted).collect()}
    assert all(len(s) == 16 for s in sig.values())
    assert sig[0] == sig[1]  # identical content -> identical signature

    def hamming(a: str, b: str) -> int:
        return sum(bin(int(x, 16) ^ int(y, 16)).count("1") for x, y in zip(a, b))

    # One-word change perturbs the signature less than unrelated content.
    # (Short docs have many near-zero bit charges, so absolute distances
    # are noisy; the *ordering* near-dup < unrelated is the invariant.)
    assert hamming(sig[0], sig[2]) < hamming(sig[0], sig[3])
    assert hamming(sig[0], sig[5]) < hamming(sig[0], sig[3])


def test_simhash_near_pairs(planted):
    pairs = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in D.simhash_near_pairs(planted, max_hamming=16).collect()
    }
    assert pairs.get((0, 1)) == 0  # exact dup at distance 0
    assert (3, 4) not in pairs  # unrelated docs don't pair


def test_simhash_blocking_finds_spread_bits(spark):
    # 4 differing bits, one in each 16-bit quarter — the exact case naive
    # 4-quarter blocking misses (every quarter differs). With max_hamming=6
    # the Manku pigeonhole (7 blocks) guarantees at least one agreeing
    # block, so the pair MUST surface.
    sig = spark.createDataFrame(
        [
            (0, "0000000000000000"),
            (1, "1000100010001000"),  # hamming 4, spread across quarters
            (2, "ffffffffffffffff"),  # hamming 64 from doc 0
        ],
        "doc_id long, simhash string",
    )
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["hamming"]
        for r in D.simhash_pairs_from_signatures(sig, max_hamming=6).collect()
    }
    assert got == {(0, 1): 4}


def test_simhash_blocking_verify_excludes_over_threshold(spark):
    # 7 differing bits > max_hamming=6: even if blocking proposes the pair,
    # the exact-hamming verify must drop it.
    sig = spark.createDataFrame(
        [(0, "0000000000000000"), (1, "000000000000007f")],
        "doc_id long, simhash string",
    )
    assert D.simhash_pairs_from_signatures(sig, max_hamming=6).count() == 0


def test_incremental_matches_batch_restriction(planted):
    # Split planted docs: {2, 5} arrive as the new batch. Incremental pairs
    # must equal the full batch pair set restricted to pairs touching 2 or 5.
    new = planted.filter(F.col("doc_id").isin(2, 5))
    corpus = planted.filter(~F.col("doc_id").isin(2, 5))
    full = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(planted, 0.5).collect()
    }
    expected = {p: j for p, j in full.items() if p[0] in (2, 5) or p[1] in (2, 5)}
    got = {
        (r["doc_id_a"], r["doc_id_b"]): r["jaccard"]
        for r in D.minhash_lsh_incremental(corpus, new, 0.5).collect()
    }
    assert got == expected and expected


def test_neardup_clusters_components(spark):
    # Chain 0-1-2-3 (forces multiple propagation rounds), pair {10,11},
    # singletons 20, 21.
    docs = spark.createDataFrame(
        [(i,) for i in (0, 1, 2, 3, 10, 11, 20, 21)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (10, 11)], "doc_id_a long, doc_id_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in D.neardup_clusters(docs, pairs).collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 10: 10, 11: 10, 20: 20, 21: 21}


def test_star_clusters_adversarial_chain(spark):
    # A 120-node path graph: diameter 119, so min-label propagation needs
    # ~119 rounds (>10 by far) — the regime large-star/small-star exists
    # for. It must converge well inside 30 star rounds and label every
    # node with the chain head.
    n = 120
    docs = spark.createDataFrame([(i,) for i in range(n + 2)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_id_a long, doc_id_b long"
    )
    got = {r["doc_id"]: r["cluster_id"] for r in D.neardup_clusters_star(docs, pairs).collect()}
    expect = {i: 0 for i in range(n)}
    expect[n] = n  # singletons
    expect[n + 1] = n + 1
    assert got == expect


def test_star_clusters_max_iter_zero_raises(spark):
    # ADVICE r10: max_iter=0 on a NON-empty graph must raise
    # non-convergence (r10's empty-graph sentinel reused max_iter and
    # silently returned labels from the raw unconverged edge list).
    import pytest as _pytest

    docs = spark.createDataFrame([(i,) for i in range(4)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1)], "doc_id_a long, doc_id_b long")
    with _pytest.raises(RuntimeError, match="did not converge"):
        D.neardup_clusters_star(docs, pairs, max_iter=0)
    # ... while an empty graph still short-circuits to all-singletons.
    empty = spark.createDataFrame([], "doc_id_a long, doc_id_b long")
    got = {r["doc_id"]: r["cluster_id"] for r in D.neardup_clusters_star(docs, empty, max_iter=0).collect()}
    assert got == {i: i for i in range(4)}


def test_star_clusters_match_propagation(planted):
    pairs = D.ngram_jaccard_pairs(planted, threshold=0.5)
    star = {r["doc_id"]: r["cluster_id"] for r in D.neardup_clusters_star(planted, pairs).collect()}
    prop = {r["doc_id"]: r["cluster_id"] for r in D.neardup_clusters(planted, pairs).collect()}
    assert star == prop


def test_star_clusters_random_graph_matches(spark):
    import random

    rng = random.Random(11)
    docs = spark.createDataFrame([(i,) for i in range(60)], "doc_id long")
    es = {tuple(sorted(rng.sample(range(60), 2))) for _ in range(45)}
    pairs = spark.createDataFrame(sorted(es), "doc_id_a long, doc_id_b long")
    star = {r["doc_id"]: r["cluster_id"] for r in D.neardup_clusters_star(docs, pairs).collect()}
    prop = {r["doc_id"]: r["cluster_id"] for r in D.neardup_clusters(docs, pairs).collect()}
    assert star == prop


def test_neardup_clusters_on_planted(planted):
    pairs = D.ngram_jaccard_pairs(planted, threshold=0.5)
    got = {r["doc_id"]: r["cluster_id"] for r in D.neardup_clusters(planted, pairs).collect()}
    # 0,1 exact dup + 2,5 near-dups of 0 -> one cluster rooted at 0;
    # 3 and 4 are unrelated singletons.
    assert got == {0: 0, 1: 0, 2: 0, 5: 0, 3: 3, 4: 4}


def test_embedding_near_dup(spark):
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.001, 0.0, 0.0]),  # near-dup of 0
        (2, [0.0, 1.0, 0.0, 0.0]),  # orthogonal
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r["vec_id_a"], r["vec_id_b"]) for r in D.embedding_near_dup_pairs(df, 0.95).collect()}
    assert pairs == {(0, 1)}


def test_embedding_blocked_matches_bruteforce(spark):
    # Clustered corpus (two tight clusters + stragglers): the blocked form
    # must return exactly the brute-force pair set, and its plan must not
    # contain a BroadcastNestedLoopJoin (candidate generation is equi-join
    # only — the design contract the brute-force d5 form violates).
    import random

    rng = random.Random(3)
    rows = []
    for i in range(40):
        center = [1.0, 0.0, 0.0, 0.0] if i % 2 == 0 else [0.0, 1.0, 0.0, 0.0]
        rows.append((i, [c + rng.gauss(0, 0.15) for c in center]))
    for i in range(40, 50):  # isotropic stragglers
        rows.append((i, [rng.gauss(0, 1) for _ in range(4)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    brute = {
        (r["vec_id_a"], r["vec_id_b"], r["cosine"])
        for r in D.embedding_near_dup_pairs(df, 0.45).collect()
    }
    blocked_df = D.embedding_neardup_blocked(df, 0.45, n_centroids=8)
    blocked = {
        (r["vec_id_a"], r["vec_id_b"], r["cosine"]) for r in blocked_df.collect()
    }
    assert blocked == brute and len(brute) > 100
    plan = blocked_df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan


def test_hamming_hex_expression(spark):
    df = spark.createDataFrame([("f0f0", "0f0f"), ("abcd", "abcd")], "a string, b string")
    got = [r[0] for r in df.select(D.hamming_hex(F.col("a"), F.col("b"))).collect()]
    assert got == [16, 0]
