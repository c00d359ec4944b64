"""Behavior tests for k-means clustering and SemDeDup (the oracle battery
proves engine-vs-SQL parity; these prove the operators do what they claim):
cluster geometry recovery, determinism, the SemDeDup subset-of-brute-force
contract, and the DF-pruning boilerplate-blindness contract for d3c."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators import clustering as C
from kafka_streaming_polymarket_pipeline_spark.operators import dedup as D


@pytest.fixture(scope="module")
def blobs(spark):
    """Two well-separated 4-d blobs (deterministic jitter): any sane
    k-means with k=2 must put each blob in one cell."""
    rows = []
    for i in range(20):
        j = (i % 5) * 0.01
        rows.append((i, [1.0 + j, 1.0, 0.0, 0.0]))
    for i in range(20, 40):
        j = (i % 5) * 0.01
        rows.append((i, [0.0, 0.0, 1.0, 1.0 + j]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_kmeans_recovers_separated_blobs(blobs):
    asg = C.kmeans_assign(blobs, k=2, n_iter=2).collect()
    assert len(asg) == 40
    cells = {r["vec_id"]: r["cell"] for r in asg}
    blob_a = {cells[i] for i in range(20)}
    blob_b = {cells[i] for i in range(20, 40)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b


def test_kmeans_deterministic_across_runs(blobs):
    a = sorted(map(tuple, C.kmeans_assign(blobs, k=2, n_iter=2).collect()))
    b = sorted(map(tuple, C.kmeans_assign(blobs, k=2, n_iter=2).collect()))
    assert a == b


def test_kmeans_at_most_k_cells(blobs):
    asg = C.kmeans_assign(blobs, k=5, n_iter=1)
    assert asg.select("cell").distinct().count() <= 5


def test_semantic_dedup_is_same_cell_subset_of_brute(blobs):
    """d8's contract: exactly the brute-force cosine pairs whose endpoints
    share a k-means cell — no extras, no same-cell misses."""
    brute = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in D.embedding_near_dup_pairs(
            blobs, threshold=0.9, id_col="vec_id", vec_col="embedding"
        ).collect()
    }
    asg = {r["vec_id"]: r["cell"] for r in C.kmeans_assign(blobs, k=2, n_iter=2).collect()}
    sem = {
        (r["vec_id_a"], r["vec_id_b"])
        for r in C.semantic_dedup_pairs(blobs, threshold=0.9, k=2, n_iter=2).collect()
    }
    expected = {(a, b) for (a, b) in brute if asg[a] == asg[b]}
    assert sem == expected and sem  # non-trivial on this fixture


BOILER = (
    "subscribe to our newsletter terms of service privacy policy all "
    "rights reserved copyright contact us about cookies settings footer"
)


def test_dfpruned_drops_boilerplate_only_pairs(spark):
    """Two docs similar ONLY through shared boilerplate must not pair under
    DF pruning; two docs sharing rare content must still pair."""
    rows = [(i, f"{BOILER} unique tail number {i} " + "x" * i) for i in range(10)]
    rare = "an extremely rare shared passage about sorted merge spill files"
    rows += [(100, rare + " alpha"), (101, rare + " alphb")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    plain = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in D.minhash_lsh_dedup(df, threshold=0.5).collect()
    }
    pruned = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in D.minhash_lsh_dedup_dfpruned(df, threshold=0.5, max_df_pct=50).collect()
    }
    # boilerplate-driven pairs exist unpruned, vanish pruned
    assert any(a < 100 and b < 100 for a, b in plain)
    assert not any(a < 100 and b < 100 for a, b in pruned)
    # the rare-content pair survives pruning (its shingles are in 2/12 docs)
    assert (100, 101) in pruned


def test_dfpruned_equals_exact_on_pruned_sets(spark):
    """The funnel's output must equal a direct exact-Jaccard computation
    over the pruned shingle sets (the same contract d3 has vs d2)."""
    rows = [(i, f"{BOILER} unique tail number {i} " + "y" * (i % 7)) for i in range(12)]
    rare = "one shared rare paragraph on bucketed shuffle hash join spill"
    rows += [(50, rare + " one"), (51, rare + " two")]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    idx0 = D.shingle_index(df)
    n_docs = df.count()
    dfreq = idx0.groupBy("sh").agg(F.count("*").alias("dfq"))
    kept = dfreq.filter(F.col("dfq") * 100 <= 50 * n_docs).select("sh")
    exact = {
        (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
        for r in D._jaccard_from_index(idx0.join(kept, "sh"), 0.5).collect()
    }
    funnel = {
        (r["doc_id_a"], r["doc_id_b"], r["jaccard"])
        for r in D.minhash_lsh_dedup_dfpruned(df, threshold=0.5, max_df_pct=50).collect()
    }
    assert funnel == exact and funnel
