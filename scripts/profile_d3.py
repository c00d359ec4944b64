#!/usr/bin/env python
"""Stage-attribution probe for the d3 MinHash-LSH funnel at a given SF.

Times each funnel stage in isolation with the noop sink (guide §1.4) and
prints a JSON line per stage. Run on an idle box; labels jobs for the UI.

Usage: python scripts/profile_d3.py [SF_DIR]
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from kafka_streaming_polymarket_pipeline_spark.operators import dedup as D  # noqa: E402
from kafka_streaming_polymarket_pipeline_spark.session import get_spark  # noqa: E402
from kafka_streaming_polymarket_pipeline_spark.tables import load  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def noop(df, label):
    spark.sparkContext.setJobDescription(label)
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    dt = time.perf_counter() - t0
    print(json.dumps({"stage": label, "sec": round(dt, 3)}), flush=True)
    spark.sparkContext.setJobDescription(None)
    return dt


cpus = int(os.environ.get("SPARK_GRAFT_CPUS", 32))
spark = get_spark(app_name="profile-d3", cpus=cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")

# warm
spark.range(1_000_000).selectExpr("sum(id)").collect()

docs = load(spark, SF_DIR, "documents")
n_docs_total = docs.count()
print(json.dumps({"n_docs": n_docs_total}), flush=True)

# Stage A: shingle index (explode only, no distinct semantics cost)
idx = D.shingle_index(docs)
noop(idx, "A_shingle_index_explode")
print(json.dumps({"shingle_rows": idx.count()}), flush=True)

# Stage B: hashed only
noop(idx.select("doc_id", F.xxhash64("sh").alias("h")), "B_shingles_hashed")

# Stage C: full 128-perm signatures
sigs = D.minhash_signatures(idx)
noop(sigs, "C_minhash_signatures")

# Stage D: banding + bucket self-join + band-count (no est/verify)
from pyspark.storagelevel import StorageLevel

sigs_p = D.minhash_signatures(idx).persist(StorageLevel.MEMORY_AND_DISK)
sigs_p.count()
buckets = D._band_buckets(sigs_p, 2)
left = buckets.select(F.col("doc_id").alias("doc_id_a"), "band_id", "band_hash")
right = buckets.select(F.col("doc_id").alias("doc_id_b"), "band_id", "band_hash")
cooc = left.join(right, ["band_id", "band_hash"]).filter(
    F.col("doc_id_a") < F.col("doc_id_b")
)
noop(cooc.select("doc_id_a", "doc_id_b"), "D_bucket_cooccurrence")
print(json.dumps({"cooc_rows": cooc.count()}), flush=True)

cand = (
    cooc.groupBy("doc_id_a", "doc_id_b")
    .agg(F.count("*").alias("k"))
    .filter(F.col("k") >= 3)
    .drop("k")
)
cand_p = cand.persist(StorageLevel.MEMORY_AND_DISK)
print(json.dumps({"cand_rows": cand_p.count()}), flush=True)
noop(cand, "E_band_count_candidates")

# Stage F: est filter on persisted candidates
surv = D._est_filter(cand_p, sigs_p, 38, n_docs_total)
surv_p = surv.persist(StorageLevel.MEMORY_AND_DISK)
print(json.dumps({"est_survivors": surv_p.count()}), flush=True)
noop(D._est_filter(cand_p, sigs_p, 38, n_docs_total), "F_est_filter")

# Stage G: hashed shingle arrays (map-only build)
hashed = D._hashed_shingle_arrays(docs, "doc_id", "text", 5)
noop(hashed.select("doc_id", "sz"), "G_hashed_arrays_build")

# Stage H: verify on est survivors
noop(D._verify_jaccard(surv_p, hashed, 0.5, n_docs_total), "H_verify")

# Full d3 for reference
for p in (sigs_p, cand_p, surv_p, hashed):
    p.unpersist()
spark.catalog.clearCache()
t0 = time.perf_counter()
D.minhash_lsh_dedup(docs).write.format("noop").mode("overwrite").save()
print(json.dumps({"stage": "FULL_d3", "sec": round(time.perf_counter() - t0, 3)}), flush=True)
spark.stop()
