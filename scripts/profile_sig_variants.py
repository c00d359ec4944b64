#!/usr/bin/env python
"""Micro-bench signature-stage variants + honest est/band-count timings.

Variants (each noop-sunk, guide §1.4):
  v0_current        shingle_index (transform+distinct strings) -> 128 min agg
  v1_explode_first  codegen explode(sequence)+substr+hash -> same agg
  v2_mulshift       v1 with multiply-shift permutations (no 64-bit mod)
  v3_from_arrays    hashed-array build (persisted) -> explode -> same agg
  e_band_count      cooc -> groupBy count -> k>=3 (honest, no cache)
  f_est             est filter on candidates (honest, cache only inputs)
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402

from kafka_streaming_polymarket_pipeline_spark.operators import dedup as D  # noqa: E402
from kafka_streaming_polymarket_pipeline_spark.session import get_spark  # noqa: E402
from kafka_streaming_polymarket_pipeline_spark.tables import load  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
spark = get_spark(app_name="profile-sigs", cpus=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
spark.range(1_000_000).selectExpr("sum(id)").collect()


def noop(df, label, n=2):
    best = None
    for _ in range(n):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        best = dt if best is None or dt < best else best
    print(json.dumps({"stage": label, "sec": round(best, 3)}), flush=True)
    spark.sparkContext.setJobDescription(None)


docs = load(spark, SF_DIR, "documents")

# v0: current
noop(D.minhash_signatures(D.shingle_index(docs)), "v0_current")

# v1: explode-first codegen (no array materialization; min-agg dedups)
idx1 = docs.select(
    F.col("doc_id"),
    F.explode(F.sequence(F.lit(1), F.length("text") - 4)).alias("i"),
    F.col("text"),
).select("doc_id", F.expr("xxhash64(substring(text, i, 5))").alias("h64"))
h32 = F.pmod(F.col("h64"), F.lit(1 << 32))
mins = [
    F.min(
        (F.lit(D._PERM_A[i]) * h32 + F.lit(D._PERM_B[i])) % F.lit(D._MERSENNE_P)
    ).alias(f"m{i}")
    for i in range(D.NUM_PERM)
]
noop(idx1.groupBy("doc_id").agg(*mins), "v1_explode_first")

# v3: from persisted hashed arrays (the sharing restructure)
hashed = D._hashed_shingle_arrays(docs, "doc_id", "text", 5)
t0 = time.perf_counter()
hashed.count()
print(json.dumps({"stage": "v3_hashed_build_persist", "sec": round(time.perf_counter() - t0, 3)}), flush=True)
idx3 = hashed.select("doc_id", F.explode("hsh").alias("h64"))
h32b = F.pmod(F.col("h64"), F.lit(1 << 32))
mins3 = [
    F.min(
        (F.lit(D._PERM_A[i]) * h32b + F.lit(D._PERM_B[i])) % F.lit(D._MERSENNE_P)
    ).alias(f"m{i}")
    for i in range(D.NUM_PERM)
]
noop(idx3.groupBy("doc_id").agg(*mins3), "v3_from_cached_arrays")

# honest E (band count) and F (est): persist sigs + cand first, derive fresh
sigs = D.minhash_signatures(D.shingle_index(docs)).persist(StorageLevel.MEMORY_AND_DISK)
n_docs = sigs.count()
buckets = D._band_buckets(sigs, 2).persist(StorageLevel.MEMORY_AND_DISK)
buckets.count()
left = buckets.select(F.col("doc_id").alias("doc_id_a"), "band_id", "band_hash")
right = buckets.select(F.col("doc_id").alias("doc_id_b"), "band_id", "band_hash")
cooc = left.join(right, ["band_id", "band_hash"]).filter(F.col("doc_id_a") < F.col("doc_id_b"))
cand_fresh = (
    cooc.groupBy("doc_id_a", "doc_id_b").agg(F.count("*").alias("k"))
    .filter(F.col("k") >= 3).drop("k")
)
noop(cand_fresh, "e_band_count_from_cached_buckets", n=2)
cand = cand_fresh.persist(StorageLevel.MEMORY_AND_DISK)
cand.count()
noop(D._est_filter(cand, sigs, 38, n_docs), "f_est_filter_honest", n=2)
surv = D._est_filter(cand, sigs, 38, n_docs).persist(StorageLevel.MEMORY_AND_DISK)
print(json.dumps({"survivors": surv.count()}), flush=True)
hashed2 = D._hashed_shingle_arrays(docs, "doc_id", "text", 5)
hashed2.count()
noop(D._verify_jaccard(surv, hashed2, 0.5, n_docs), "h_verify_honest", n=2)
spark.stop()
