#!/usr/bin/env python
"""One-off scale probe (VERDICT r03 item 6): measure how the 5 heaviest
queries scale from 5k -> 15k -> 50k documents (sf0.1-equivalent -> ~sf1).

The official /root/testdata is read-only and stops at sf0.1, so the probe
generates its own corpora with the same statistical shape as the driver's
documents table (small shared vocabulary -> heavily templated text, 5
langs, 20 sources, ~50 words/doc) and 64-d embeddings. Both scales come
from the SAME generator, so the measured ratios are generator-controlled
even though the bytes differ from the driver's seed.

Usage: python scripts/scale_probe.py [--keep]
Writes parquet under /tmp/scale_probe/ and prints one JSON line per
(query, scale) with wall seconds; summarize into SCALE.md by hand.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASE = "/tmp/scale_probe"
VOCAB = (
    "key agg row scan slow fast table value part hash merge batch window "
    "spark order data column join small line customer query a the big "
    "filter group sort shuffle read"
).split()
LANGS = ["en", "en", "en", "zh", "de", "fr", "es"]  # en-heavy like the driver's
QUERIES = ["d3_minhash_lsh", "t7_winnow_fingerprints", "q2_pq_adc_topk",
           "q3_ivf_pq_topk", "s1_ann_bruteforce_topk", "t14_span_scrub",
           "d3c_minhash_lsh_dfpruned", "c1_kmeans_assign", "d8_semantic_dedup", "d8b_semantic_dedup_kscaled", "d8c_semantic_dedup_signcells",
           "b1_bm25_topk", "d10_semantic_decontam", "c2_pagerank",
           "q4_binary_hamming_topk", "t16_quality_classifier",
           "t17_char_entropy", "x8_weighted_sample",
           "j6_asof_join", "a24_ewma_per_user", "a23_mad_outliers",
           "c3_triangle_count", "j7_band_join", "w6_peak_concurrency",
           "a26_column_profile", "a27_markov_transitions",
           "d11_editdist_pairs"]
SCALES = {"0.1e": (5_000, 2_000), "0.3e": (15_000, 6_000), "1e": (50_000, 20_000)}
# d3's cost driver is similar-pair mass, quadratic on this templated corpus
# by construction — cap it at 0.3e unless --d3-full is passed.
D3_CAP = "0.3e"
# c3 embeds the SemDeDup pair pipeline with the oracle-pinned fixed k=8,
# which is super-linear at fixed cell count exactly like d8 (SCALE.md's
# documented knob) — probe it at the capped scales only.
CAPPED_AT_03E = {"d3_minhash_lsh", "c3_triangle_count"}


def gen(dirpath: str, n_docs: int, n_emb: int, seed: int = 7) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.RandomState(seed)
    lens = rng.poisson(50, n_docs).clip(5)
    texts = [" ".join(rng.choice(VOCAB, size=k)) for k in lens]
    docs = pa.table({
        "doc_id": pa.array(range(n_docs), pa.int64()),
        "lang": pa.array([LANGS[i] for i in rng.randint(0, len(LANGS), n_docs)]),
        "source": pa.array([f"src{i}" for i in rng.randint(0, 20, n_docs)]),
        "text": pa.array(texts),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(docs, os.path.join(dirpath, "documents.parquet"))
    emb = rng.randn(n_emb, 64).astype(np.float32)
    embt = pa.table({
        "vec_id": pa.array(range(n_emb), pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    })
    pq.write_table(embt, os.path.join(dirpath, "embeddings.parquet"))
    # events/orders for the time-series and robust-stat probes (j6/a23/a24):
    # per-user series depth matches the driver's testdata (~130 events/user).
    n_events = 4 * n_docs
    n_users = max(2, n_events // 130)
    ts0 = np.int64(1_760_000_000_000_000)  # µs epoch base
    ev = pa.table({
        "event_id": pa.array(range(n_events), pa.int64()),
        "ts": pa.array(
            (ts0 + np.sort(rng.randint(0, 86_400_000_000, n_events).astype(np.int64))),
            pa.timestamp("us"),
        ),
        "user_id": pa.array(rng.randint(0, n_users, n_events), pa.int64()),
        "event_type": pa.array(
            [["view", "click", "purchase", "signup", "error"][i]
             for i in rng.randint(0, 5, n_events)]
        ),
        "value": pa.array(rng.rand(n_events) * 100.0),
        "props": pa.array(["{}"] * n_events),
    })
    pq.write_table(ev, os.path.join(dirpath, "events.parquet"))
    n_orders = 3 * n_docs
    orders = pa.table({
        "o_orderkey": pa.array(range(n_orders), pa.int64()),
        "o_custkey": pa.array(rng.randint(0, max(2, n_orders // 10), n_orders), pa.int64()),
        "o_orderstatus": pa.array(["O"] * n_orders),
        "o_totalprice": pa.array(rng.rand(n_orders) * 10_000.0),
        "o_orderdate": pa.array(
            (ts0 + rng.randint(0, 86_400_000_000, n_orders).astype(np.int64)),
            pa.timestamp("us"),
        ),
        "o_orderpriority": pa.array(
            [f"{i}-P" for i in rng.randint(1, 6, n_orders)]
        ),
    })
    pq.write_table(orders, os.path.join(dirpath, "orders.parquet"))
    # customer names for the SymSpell edit-distance probe (d11): dense
    # sequential numbering like the driver's testdata, so distance-1
    # pairs are plentiful and grow with n.
    n_cust = 2 * n_docs
    cust = pa.table({
        "c_custkey": pa.array(range(n_cust), pa.int64()),
        "c_name": pa.array([f"Customer#{i:09d}" for i in range(n_cust)]),
        "c_nationkey": pa.array(rng.randint(0, 25, n_cust).astype("int32"), pa.int32()),
        "c_acctbal": pa.array(rng.rand(n_cust) * 10_000.0),
        "c_mktsegment": pa.array(["BUILDING"] * n_cust),
    })
    pq.write_table(cust, os.path.join(dirpath, "customer.parquet"))


def main() -> None:
    from kafka_streaming_polymarket_pipeline_spark import plans
    from kafka_streaming_polymarket_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm

    for label, (nd, ne) in SCALES.items():
        d = os.path.join(BASE, label)
        docs_path = os.path.join(d, "documents.parquet")
        stale = True
        if os.path.exists(docs_path) and os.path.exists(os.path.join(d, "embeddings.parquet")):
            import pyarrow.parquet as _pq

            # A --keep dir from an older generator version may lack newer
            # columns (n_chars bit us once) or newer tables (events/orders)
            # — regenerate on schema drift.
            stale = "n_chars" not in _pq.read_schema(docs_path).names or not (
                os.path.exists(os.path.join(d, "events.parquet"))
                and os.path.exists(os.path.join(d, "orders.parquet"))
                and os.path.exists(os.path.join(d, "customer.parquet"))
            )
        if stale:
            shutil.rmtree(d, ignore_errors=True)
            gen(d, nd, ne)

    registry = plans.all_queries()
    results = []
    for name in QUERIES:
        for label in SCALES:
            if name in CAPPED_AT_03E and label == "1e" and "--d3-full" not in sys.argv:
                continue
            d = os.path.join(BASE, label)
            t0 = time.perf_counter()
            registry[name](spark, d).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            row = {"query": name, "scale": label, "sec": round(dt, 2)}
            results.append(row)
            print(json.dumps(row), flush=True)
    print(json.dumps({"summary": results}))
    if "--keep" not in sys.argv:
        shutil.rmtree(BASE, ignore_errors=True)


if __name__ == "__main__":
    main()
