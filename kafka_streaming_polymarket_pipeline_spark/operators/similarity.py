"""Similarity search over embedding columns (array<float>).

Two paths:

- **Brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set against the corpus, fold dot products JVM-side, window top-k.
  O(|queries| x |corpus|); right answer at any scale where the query set
  is small, and the rerank stage for everything else.
- **IVF (inverted file) ANN** — the scale path for top-k over moderate
  similarity: assign every vector to its nearest of C sampled centroids
  (one O(n x C) pass), probe the nprobe nearest centroids per query,
  exact-rerank within. Scans ~nprobe/C of the corpus.
- **Random-hyperplane LSH ANN** — the near-dup regime (cosine >= ~0.9):
  bucket by sign pattern of NUM_PLANES projections + 1-bit multiprobe.
  Sub-linear, but recall collapses when "neighbors" are only ~45 degrees
  apart — use IVF there (see tests/test_similarity.py for the measured
  tradeoff).

No Python UDFs: dot products are JVM-side higher-order-function folds
(interpreted expressions inside the scan stage — no Python round-trip,
no shuffle; see SCALE.md's codegen note on higher-order lambdas).
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F



NUM_PLANES = 12
_DIM = 64
_rng = random.Random(7)
# Fixed random hyperplanes (unit-free; only the sign matters).
_PLANES = [[_rng.gauss(0.0, 1.0) for _ in range(_DIM)] for _ in range(NUM_PLANES)]

NUM_CENTROIDS = 16
NPROBE = 6  # measured: recall@10 ~0.42 at nprobe=4/iters=0 on an isotropic
# corpus vs ~0.64 at nprobe=6 with 2 Lloyd iterations — the production knob
KMEANS_ITERS = 2


def _dot(x: Column, y: Column) -> Column:
    """Sequential-fold dot product (bit-matches DuckDB list_dot_product)."""
    return F.aggregate(F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v)


def _prep(df: DataFrame, id_col: str, vec_col: str, id_out: str, vec_out: str) -> DataFrame:
    """Project to (id, vector, norm): the norm is computed ONCE per vector
    here instead of once per pair inside cosine — at top-k scale that is
    the difference between 3 dot products per pair and 1."""
    v = F.col(vec_col).cast("array<double>")
    return df.select(
        F.col(id_col).alias(id_out),
        v.alias(vec_out),
        F.sqrt(_dot(v, v)).alias(f"{vec_out}_n"),
    )


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector (self excluded).
    Queries are broadcast; ties break on neighbor id for determinism."""
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "_vc")
    q = _prep(queries, id_col, vec_col, "query_id", "_vq")
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("_vq"), F.col("_vc")) / (F.col("_vq_n") * F.col("_vc_n"))).alias("_c"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_c"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_c", 6).alias("cosine"), "rank")
    )


def _centroids(
    corpus: DataFrame, id_col: str, vec_col: str, c: int, kmeans_iters: int = 0
) -> DataFrame:
    """Deterministic centroid build.

    Init: the c vectors with the smallest md5(id) — a uniform pseudo-random
    sample in ONE pass with no driver-side count and no global sort
    (orderBy().limit(c) compiles to TakeOrderedAndProject: per-partition
    top-c, merged at the driver; c is tiny). md5 (not xxhash64) so the
    DuckDB oracle reproduces the same sample, making the whole IVF pipeline
    SQL-checkable. Works for any id type, dense or sparse.

    Refinement: ``kmeans_iters`` Lloyd iterations entirely in DataFrame ops
    (assign -> per-cell per-position mean via posexplode -> rebuild arrays).
    Tightens cells, which is what raises recall at fixed nprobe. The
    registered oracle query pins kmeans_iters=0 because float-mean
    summation order is engine-specific; production knobs default to
    refinement. At 100 TB the centroid table is precomputed offline and
    read as a bucketed table; this is the inline form."""
    cents = (
        corpus.orderBy(F.md5(F.col(id_col).cast("string")))
        .limit(c)
        .select(
            F.col(id_col).alias("centroid_id"),
            F.col(vec_col).cast("array<double>").alias("_vcent"),
        )
    )
    if kmeans_iters <= 0:
        return cents
    v = F.col(vec_col).cast("array<double>")
    prep = corpus.select(F.col(id_col).alias("_id"), v.alias("_v"))
    for _ in range(kmeans_iters):
        sims = prep.crossJoin(F.broadcast(cents)).select(
            "_id", "_v", "centroid_id",
            # vector norm drops out of the per-vector argmax; centroid norm doesn't
            (_dot(F.col("_v"), F.col("_vcent"))
             / F.sqrt(_dot(F.col("_vcent"), F.col("_vcent")))).alias("_s"),
        )
        assigned = sims.groupBy("_id").agg(
            F.max_by(
                "centroid_id",
                F.struct(F.col("_s").alias("cc"), (-F.col("centroid_id")).alias("t")),
            ).alias("centroid_id"),
            F.first("_v").alias("_v"),
        )
        pe = assigned.select("centroid_id", F.posexplode("_v").alias("pos", "val"))
        cents = (
            pe.groupBy("centroid_id", "pos")
            .agg(F.avg("val").alias("m"))
            .groupBy("centroid_id")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .select("centroid_id", F.transform("pm", lambda s: s["m"]).alias("_vcent"))
        )
    # C rows; materialize once — downstream uses this table 2x (corpus
    # assignment + query probing) and would otherwise re-execute the whole
    # Lloyd lineage per use.
    return cents.localCheckpoint(eager=True)


def _cell_similarities(df: DataFrame, cents: DataFrame, id_out: str, vec_out: str) -> DataFrame:
    """(id, vector, norm, centroid_id, _cc): cosine to every centroid via a
    broadcast nested-loop — the O(n x C) pass; norms folded once per vector."""
    return df.crossJoin(F.broadcast(cents)).select(
        id_out,
        vec_out,
        f"{vec_out}_n",
        "centroid_id",
        (_dot(F.col(vec_out), F.col("_vcent"))
         / (F.col(f"{vec_out}_n") * F.sqrt(_dot(F.col("_vcent"), F.col("_vcent"))))).alias("_cc"),
    )


def ivf_ann_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    n_centroids: int = NUM_CENTROIDS, nprobe: int = NPROBE,
    kmeans_iters: int = KMEANS_ITERS,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: corpus vectors live in their nearest-centroid
    cell; each query probes its nprobe nearest cells and exact-reranks the
    union. Work ~ (nprobe/n_centroids) of brute force per query, after one
    O(n x C) assignment pass amortized over the whole query set.

    Physical shape: corpus cell assignment is ``max_by`` aggregation-free —
    argmax folded in the map stage via ``max_by(centroid_id, _cc)`` grouped
    on the vector id would shuffle; instead the crossJoin emits C rows per
    vector and a single groupBy with max_by reduces map-side, so the shuffle
    carries one narrow row per corpus vector. Queries (small side) rank
    their nprobe cells with a window and broadcast to the cells."""
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "_vc")
    q = _prep(queries, id_col, vec_col, "query_id", "_vq")
    cents = _centroids(corpus, id_col, vec_col, n_centroids, kmeans_iters)

    # Corpus side: argmax centroid per vector, narrow shuffle (id -> cell),
    # then re-attach the vector by id (co-partitioned equi-join).
    c_best = (
        _cell_similarities(c, cents, "neighbor_id", "_vc")
        .groupBy("neighbor_id")
        .agg(F.max_by("centroid_id", F.struct(F.col("_cc"), (-F.col("centroid_id")).alias("t"))).alias("centroid_id"))
    )
    c_cells = c_best.join(c, "neighbor_id")

    # Query side: top-nprobe cells per query (tiny; window is fine).
    qs = _cell_similarities(q, cents, "query_id", "_vq")
    wq = Window.partitionBy("query_id").orderBy(F.desc("_cc"), F.asc("centroid_id"))
    q_cells = (
        qs.withColumn("_cr", F.row_number().over(wq))
        .filter(F.col("_cr") <= nprobe)
        .select("query_id", "_vq", "_vq_n", "centroid_id")
    )

    scored = (
        c_cells.join(F.broadcast(q_cells), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("_vq"), F.col("_vc")) / (F.col("_vq_n") * F.col("_vc_n"))).alias("_c"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_c"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_c", 6).alias("cosine"), "rank")
    )


def _bucket(vec: Column) -> Column:
    """LSH bucket id: integer from the sign bits of NUM_PLANES projections."""
    bucket = F.lit(0)
    for i, plane in enumerate(_PLANES):
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(p) for p in plane]), lambda x, w: x * w),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bucket = bucket + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10, multiprobe: bool = True,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket
    (plus 1-bit-flip neighbor buckets when multiprobe), exact cosine rerank
    within. The corpus-side bucket is computed once (one narrow pass) and
    the join is an equi-join on bucket — no quadratic pair blowup."""
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "_vc").withColumn(
        "bucket", _bucket(F.col("_vc"))
    )
    q0 = _prep(queries, id_col, vec_col, "query_id", "_vq").withColumn(
        "_qb", _bucket(F.col("_vq"))
    )
    if multiprobe:
        probes = F.array(
            F.col("_qb"), *[F.col("_qb").bitwiseXOR(F.lit(1 << i)) for i in range(NUM_PLANES)]
        )
    else:
        probes = F.array(F.col("_qb"))
    q = q0.select("query_id", "_vq", "_vq_n", F.explode(probes).alias("bucket"))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot(F.col("_vq"), F.col("_vc")) / (F.col("_vq_n") * F.col("_vc_n"))).alias("_c"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("_c"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("_c", 6).alias("cosine"), "rank")
    )


def quantize_int8(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector symmetric int8 scalar quantization — the compression
    an ANN serving layer applies before the index (4x smaller than f32,
    SIMD-dot-friendly). Returns (id, scale, q, mse_ppm): q_i =
    round(x_i * 127 / amax), reconstruction MSE reported in parts-per-
    million. Map-only at any scale; all arithmetic in double so any
    engine reproduces it bit-for-bit."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    amax = F.array_max(F.transform(v, F.abs))
    scale = F.when(amax > 0, F.lit(127.0) / amax).otherwise(F.lit(0.0))
    q = F.transform(v, lambda x: F.round(x * scale).cast("int"))
    dq = F.when(
        scale > 0, F.transform(q, lambda c: c.cast("double") / scale)
    ).otherwise(F.transform(v, lambda x: F.lit(0.0)))
    sq_err = F.zip_with(v, dq, lambda x, y: (x - y) * (x - y))
    mse = F.aggregate(sq_err, F.lit(0.0), lambda acc, e: acc + e) / F.size(sq_err)
    return df.select(
        F.col(id_col).alias("vec_id"),
        F.round(scale, 6).alias("scale"),
        q.alias("q"),
        F.round(mse * 1e6, 3).alias("mse_ppm"),
    )


# --- Product quantization (PQ) + asymmetric-distance (ADC) search ---------
#
# The memory-bound ANN tier: corpus vectors are stored as PQ_M 5-bit codes
# (PQ_K=32 codewords per subspace) instead of 64 floats — 16x smaller —
# and queries score candidates against codes via per-subspace lookup
# tables (Jegou et al., "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011). ADC picks a candidate pool; an exact-cosine
# rerank over the pool restores precision. No reference counterpart
# (builder's-brief extension, like s1-s3).

PQ_M = 8   # subspaces (64-dim embedding -> 8 x 8-dim subvectors)
PQ_K = 32  # codewords per subspace (5-bit codes)
PQ_POOL = 100  # ADC candidate pool per query before exact rerank
# (measured at sf0.01, seed codebook: recall@10 0.64 at pool=50, 0.83 at
# 100, 0.96 at 200 — the pool is a constant, so at 1B vectors it is a
# vanishing rerank fraction)


def _cb_row_from_codewords(cw_table: DataFrame) -> DataFrame:
    """(_m, _j, _cw) rows -> one broadcastable codebook row (cb, cn2),
    localCheckpointed because corpus encode and query LUT both reuse it."""
    per_m = (
        cw_table.withColumn("_cn2", _dot(F.col("_cw"), F.col("_cw")))
        .groupBy("_m")
        .agg(F.array_sort(F.collect_list(F.struct("_j", "_cw", "_cn2"))).alias("_row"))
        .select(
            "_m",
            F.transform("_row", lambda s: s["_cw"]).alias("_cws"),
            F.transform("_row", lambda s: s["_cn2"]).alias("_cn2s"),
        )
    )
    cb = (
        per_m.groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("_m", "_cws", "_cn2s"))).alias("_all"))
        .select(
            F.transform("_all", lambda s: s["_cws"]).alias("cb"),
            F.transform("_all", lambda s: s["_cn2s"]).alias("cn2"),
        )
    )
    return cb.localCheckpoint(eager=True)


def _pq_codes_col(vec_name: str, m: int, ds: int, n_codewords: int) -> Column:
    """Row-local PQ encode of column ``vec_name`` against the attached
    codebook column ``cb``: for each subspace, an argmin fold over the k
    codewords (first minimum wins -> lowest codeword index on ties) —
    JVM-side, row-local, zero shuffle (higher-order lambdas evaluate
    interpreted, not codegen'd; the win here is no Python and no
    exchange, not codegen)."""

    def _argmin_code(mm: Column) -> Column:
        sub = F.slice(F.col(vec_name), mm * ds + 1, F.lit(ds))
        cws = F.element_at(F.col("cb"), (mm + 1).cast("int"))
        # Materialize (distance, j) structs once, then fold an argmin over
        # them: interpreted lambdas make each _sq_l2 the dominant encode
        # cost, and the when-predicate form evaluated it twice per codeword.
        dists = F.transform(
            cws,
            lambda cw, j: F.struct(_sq_l2(sub, cw).alias("d"), j.cast("int").alias("j")),
        )
        best = F.aggregate(
            dists,
            F.struct(F.lit(float("inf")).alias("d"), F.lit(-1).alias("j")),
            lambda acc, s: F.when(s["d"] < acc["d"], s).otherwise(acc),
        )
        return best["j"]

    return F.transform(F.sequence(F.lit(0), F.lit(m - 1)), _argmin_code)


def _pq_seeds(corpus: DataFrame, id_col: str, vec_col: str, k: int) -> DataFrame:
    """The k deterministic seed vectors, indexed 0..k-1. orderBy().limit(k)
    compiles to TakeOrderedAndProject (per-partition top-k, merged at the
    driver); the row_number window then runs over only the k surviving rows
    — never a global sort of the corpus. Plan-asserted in
    test_plan_shapes.test_pq_seed_window_input_is_bounded."""
    v = F.col(vec_col).cast("array<double>")
    w = Window.orderBy(F.md5(F.col("_sid").cast("string")), F.col("_sid"))
    return (
        corpus.select(F.col(id_col).alias("_sid"), v.alias("_sv"))
        .orderBy(F.md5(F.col("_sid").cast("string")), F.col("_sid"))
        .limit(k)
        .withColumn("_j", F.row_number().over(w) - 1)
    )


def _pq_codebook(
    corpus: DataFrame, id_col: str, vec_col: str, m: int, k: int, dim: int,
    pq_iters: int = 0,
) -> DataFrame:
    """One-row codebook frame (cb: m x k x ds codewords, cn2: m x k squared
    codeword norms). Seed codewords are the subvectors of the k corpus
    vectors with smallest (md5(id), id) — the same deterministic sample
    pattern as IVF's _centroids, so DuckDB reproduces the codebook verbatim
    and the whole PQ pipeline is SQL-checkable.

    ``pq_iters`` Lloyd iterations refine each subspace codebook (assign ->
    per-(subspace, code, position) mean -> rebuild; codewords that attract
    no vectors keep their previous value). The registered oracle query pins
    pq_iters=0 because float-mean summation order is engine-specific —
    exactly the IVF kmeans_iters caveat; refined quality is gated in
    tests. Built without any driver collect."""
    ds = dim // m
    v = F.col(vec_col).cast("array<double>")
    seeds = _pq_seeds(corpus, id_col, vec_col, k)
    subs = seeds.crossJoin(F.broadcast(
        seeds.sparkSession.range(m).select(F.col("id").cast("int").alias("_m"))
    )).select(
        "_j", "_m", F.slice(F.col("_sv"), F.col("_m") * ds + 1, F.lit(ds)).alias("_cw")
    )
    cb = _cb_row_from_codewords(subs)
    if pq_iters <= 0:
        return cb

    prep = corpus.select(v.alias("_v"))
    for _ in range(pq_iters):
        # Assign: row-local encode, then one (subspace, code) shuffle of
        # narrow position/value rows for the element-wise means.
        enc = prep.crossJoin(F.broadcast(cb)).select(
            "_v", _pq_codes_col("_v", m, ds, n_codewords=k).alias("_codes")
        )
        pe = (
            enc.select(F.posexplode("_codes").alias("_m", "_code"), "_v")
            .select(
                "_m", "_code",
                F.posexplode(
                    F.slice(F.col("_v"), F.col("_m") * ds + 1, F.lit(ds))
                ).alias("_pos", "_val"),
            )
        )
        new_cw = (
            pe.groupBy("_m", "_code", "_pos")
            .agg(F.avg("_val").alias("_mv"))
            .groupBy("_m", "_code")
            .agg(F.array_sort(F.collect_list(F.struct("_pos", "_mv"))).alias("_pm"))
            .select(
                "_m",
                F.col("_code").alias("_j"),
                F.transform("_pm", lambda s: s["_mv"]).alias("_new"),
            )
        )
        cur = (
            cb.select(F.posexplode("cb").alias("_m", "_cws"))
            .select("_m", F.posexplode("_cws").alias("_j", "_cw"))
        )
        merged = cur.join(new_cw, ["_m", "_j"], "left").select(
            "_m", "_j", F.coalesce("_new", "_cw").alias("_cw")
        )
        cb = _cb_row_from_codewords(merged)
    return cb


def _sq_l2(x: Column, y: Column) -> Column:
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: (a - b) * (a - b)), F.lit(0.0), lambda acc, d: acc + d
    )


def pq_adc_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    m: int = PQ_M, n_codewords: int = PQ_K, pool: int = PQ_POOL, dim: int = _DIM,
    pq_iters: int = 0,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """PQ-ADC approximate top-k with exact rerank.

    Physical shape (the 100 TB story): the codebook is one broadcast row;
    corpus encoding is MAP-ONLY — codes and reconstructed norms are
    computed row-locally (JVM-side argmin fold, zero shuffle), so a
    100 TB corpus encodes in one pass with zero shuffle and persists 16x
    smaller. ADC scoring is corpus-codes x broadcast(query LUTs): each
    pair costs m=8 table lookups instead of a 64-dim dot product. Only
    the pool survivors (|Q| x pool rows) touch full vectors again, via an
    id equi-join for the exact rerank. Ranks are taken over 6-dp-rounded
    scores on both engine sides so group-sum ordering can't flip them."""
    ds = dim // m
    cbrow = _pq_codebook(corpus, id_col, vec_col, m, n_codewords, dim, pq_iters=pq_iters)
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "_vc")
    q = _prep(queries, id_col, vec_col, "query_id", "_vq")

    # Row-local encode; then the reconstructed norm is a zip_with lookup fold.
    codes_col = _pq_codes_col("_vc", m, ds, n_codewords)
    c_codes = (
        c.crossJoin(F.broadcast(cbrow))
        .withColumn("codes", codes_col)
        .withColumn(
            "_rn2",
            F.aggregate(
                F.zip_with(
                    F.col("codes"), F.col("cn2"),
                    lambda code, arr: F.element_at(arr, (code + 1).cast("int")),
                ),
                F.lit(0.0), lambda acc, x: acc + x,
            ),
        )
        .select("neighbor_id", "codes", F.sqrt("_rn2").alias("_recon_n"))
    )

    # Query LUTs: lut[m][j] = dot(query subvector m, codeword j).
    lut_col = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda mm: F.transform(
            F.element_at(F.col("cb"), (mm + 1).cast("int")),
            lambda cw: _dot(F.slice(F.col("_vq"), mm * ds + 1, F.lit(ds)), cw),
        ),
    )
    q_lut = q.crossJoin(F.broadcast(cbrow)).select(
        "query_id", "_vq", "_vq_n", lut_col.alias("lut")
    )

    adc = (
        c_codes.crossJoin(F.broadcast(q_lut.drop("_vq")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "_adc",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("codes"), F.col("lut"),
                        lambda code, row: F.element_at(row, (code + 1).cast("int")),
                    ),
                    F.lit(0.0), lambda acc, x: acc + x,
                )
                / (F.col("_vq_n") * F.col("_recon_n")),
                6,
            ),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("_adc"), F.asc("neighbor_id"))
    cand = (
        adc.withColumn("_ar", F.row_number().over(wa))
        .filter(F.col("_ar") <= pool)
        .select("query_id", "neighbor_id")
    )

    rerank = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("_vq"), F.col("_vc")) / (F.col("_vq_n") * F.col("_vc_n")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame, queries: DataFrame, k: int = 10,
    n_centroids: int = NUM_CENTROIDS, nprobe: int = NPROBE,
    m: int = PQ_M, n_codewords: int = PQ_K, pool: int = PQ_POOL, dim: int = _DIM,
    kmeans_iters: int = 0, pq_iters: int = 0,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the production billion-vector composition (coarse inverted
    cells + PQ codes inside each cell, ADC scoring, exact rerank) — the
    index structure FAISS calls IVFx,PQy (Jegou et al. 2011 §V).

    Candidate generation is the IVF cell equi-join (scan ~nprobe/C of the
    corpus), but candidates are scored from their 16x-compressed codes (m
    lookup adds per pair) instead of full vectors; only the per-query pool
    survivors are reranked exactly. At scale this is what serves: the cell
    index prunes, the codes keep the scan resident in memory, the rerank
    touches disk/full vectors for |Q| x pool rows only. Deterministic
    (md5-seeded centroids AND codebook) so the whole composition is
    SQL-checkable; kmeans_iters/pq_iters are the production refinement
    knobs (pinned to 0 in the registered oracle query)."""
    cents = _centroids(corpus, id_col, vec_col, n_centroids, kmeans_iters)
    cbrow = _pq_codebook(corpus, id_col, vec_col, m, n_codewords, dim, pq_iters=pq_iters)
    ds = dim // m
    c = _prep(corpus, id_col, vec_col, "neighbor_id", "_vc")
    q = _prep(queries, id_col, vec_col, "query_id", "_vq")

    c_best = (
        _cell_similarities(c, cents, "neighbor_id", "_vc")
        .groupBy("neighbor_id")
        .agg(F.max_by("centroid_id", F.struct(F.col("_cc"), (-F.col("centroid_id")).alias("t"))).alias("centroid_id"))
    )
    c_codes = (
        c.crossJoin(F.broadcast(cbrow))
        .withColumn("codes", _pq_codes_col("_vc", m, ds, n_codewords))
        .withColumn(
            "_rn2",
            F.aggregate(
                F.zip_with(
                    F.col("codes"), F.col("cn2"),
                    lambda code, arr: F.element_at(arr, (code + 1).cast("int")),
                ),
                F.lit(0.0), lambda acc, x: acc + x,
            ),
        )
        .select("neighbor_id", "codes", F.sqrt("_rn2").alias("_recon_n"))
    )
    c_cells = c_best.join(c_codes, "neighbor_id")

    qs = _cell_similarities(q, cents, "query_id", "_vq")
    wq = Window.partitionBy("query_id").orderBy(F.desc("_cc"), F.asc("centroid_id"))
    q_cells = (
        qs.withColumn("_cr", F.row_number().over(wq))
        .filter(F.col("_cr") <= nprobe)
        .select("query_id", "centroid_id")
    )
    lut_col = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda mm: F.transform(
            F.element_at(F.col("cb"), (mm + 1).cast("int")),
            lambda cw: _dot(F.slice(F.col("_vq"), mm * ds + 1, F.lit(ds)), cw),
        ),
    )
    q_lut = q.crossJoin(F.broadcast(cbrow)).select(
        "query_id", "_vq_n", lut_col.alias("lut")
    )
    probes = q_cells.join(q_lut, "query_id")

    adc = (
        c_cells.join(F.broadcast(probes), "centroid_id")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "_adc",
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col("codes"), F.col("lut"),
                        lambda code, row: F.element_at(row, (code + 1).cast("int")),
                    ),
                    F.lit(0.0), lambda acc, x: acc + x,
                )
                / (F.col("_vq_n") * F.col("_recon_n")),
                6,
            ),
        )
    )
    wa = Window.partitionBy("query_id").orderBy(F.desc("_adc"), F.asc("neighbor_id"))
    cand = (
        adc.withColumn("_ar", F.row_number().over(wa))
        .filter(F.col("_ar") <= pool)
        .select("query_id", "neighbor_id")
    )
    rerank = (
        cand.join(c, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("_vq"), F.col("_vc")) / (F.col("_vq_n") * F.col("_vc_n")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def pq_encode(
    vectors: DataFrame, codebook: DataFrame,
    m: int = PQ_M, n_codewords: int = PQ_K, dim: int = _DIM,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to PQ codes against a FROZEN codebook — the
    incremental index-maintenance path (d7's analog for ANN): a standing
    stream of new embeddings encodes map-only against the broadcast
    codebook and appends to the codes table; no rebuild, no shuffle.
    Works identically on batch and streaming inputs because the encode is
    pure column expressions (crossJoin with a 1-row static frame is a
    stream-static join). Returns (id, codes digest, recon_n) — the scalar
    surface the sinks store."""
    ds = dim // m
    v = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    enc = v.crossJoin(F.broadcast(codebook)).withColumn(
        "codes", _pq_codes_col("_v", m, ds, n_codewords)
    )
    return enc.select(
        "vec_id",
        F.md5(F.concat_ws(",", F.col("codes").cast("array<string>"))).alias("codes_md5"),
        F.aggregate(
            F.zip_with(
                F.col("codes"), F.col("cn2"),
                lambda code, arr: F.element_at(arr, (code + 1).cast("int")),
            ),
            F.lit(0.0), lambda acc, x: acc + x,
        ).alias("recon_n2"),
    )


def semantic_decontam(
    corpus: DataFrame, eval_set: DataFrame, threshold: float,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-level train/eval decontamination: for every corpus
    vector, its nearest eval-set vector by cosine and a contaminated
    flag (max cosine >= threshold). The eval-set analog of t8's n-gram
    decontamination — catches paraphrased benchmark leakage that exact
    n-gram overlap misses.

    Scale shape: eval sets are small (benchmark suites, ~1e3–1e5 rows)
    so the eval side broadcasts; scoring is a map-side pass over the
    corpus (O(|corpus| x |eval|) dot products, embarrassingly parallel,
    no corpus shuffle) and the argmax is a window over |eval|-row groups
    keyed by corpus id. Ranked by the 6-dp-ROUNDED cosine (tie -> lower
    eval id) on both engines so libm noise can't flip the argmax.
    """
    c = _prep(corpus, id_col, vec_col, "vec_id", "_vc")
    e = _prep(eval_set, id_col, vec_col, "eval_id", "_ve")
    scored = c.crossJoin(F.broadcast(e)).select(
        "vec_id",
        "eval_id",
        F.round(
            _dot(F.col("_vc"), F.col("_ve")) / (F.col("_vc_n") * F.col("_ve_n")), 6
        ).alias("_cos"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("_cos"), F.asc("eval_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "vec_id",
            F.col("eval_id").alias("nearest_eval_id"),
            F.col("_cos").alias("max_cosine"),
            (F.col("_cos") >= threshold).alias("contaminated"),
        )
    )


# ---------------------------------------------------------------------------
# Binary quantization (1-bit sign codes) + Hamming scan + exact rerank
# ---------------------------------------------------------------------------


def binary_codes(df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """1-bit sign quantization: dim d contributes bit (v[d] > 0), packed
    into two 32-bit halves (two BIGINTs, not one: a 64-bit pack would
    overflow the sign bit, which DuckDB rejects and Java silently wraps —
    the split keeps the fold portable AND overflow-free on both engines).
    512x compression over float64; map-only."""
    v = F.col(vec_col).cast("array<double>")

    def pack(start: int) -> Column:
        idx = F.sequence(F.lit(start + 1), F.lit(start + 32))
        return F.aggregate(
            idx,
            F.lit(0).cast("long"),
            lambda acc, i: acc * 2
            + F.when(F.element_at(v, i.cast("int")) > 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        )

    return df.select(F.col(id_col), pack(0).alias("code_hi"), pack(32).alias("code_lo"))


def binary_hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    pool: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-rescoring ANN tier: Hamming distance over 64-bit sign codes
    picks a `pool`-size candidate set per query (two XOR + popcount per
    pair — the cheapest possible scan, and the codes table is 512x smaller
    than the vectors, so at 1B vectors it stays executor-resident where
    floats cannot); exact cosine reranks only |Q| x pool rows. Candidate
    selection is pure integer arithmetic (engine-exact, no rounding
    needed); only the rerank touches floats. The scan is a broadcast
    non-equi pass like s1's exact baseline — the production variant
    shards the code table and replicates the (tiny) query codes, which is
    the same plan Spark executes here."""
    cc = binary_codes(corpus, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"),
        F.col("code_hi").alias("_ch"),
        F.col("code_lo").alias("_cl"),
    )
    qc = binary_codes(queries, id_col, vec_col).select(
        F.col(id_col).alias("query_id"),
        F.col("code_hi").alias("_qh"),
        F.col("code_lo").alias("_ql"),
    )
    ham = (
        F.bit_count(F.col("_qh").bitwiseXOR(F.col("_ch")))
        + F.bit_count(F.col("_ql").bitwiseXOR(F.col("_cl")))
    ).cast("int")
    cand = (
        cc.join(F.broadcast(qc), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", ham.alias("hamming"))
    )
    wpool = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("neighbor_id"))
    pooled = cand.withColumn("_pr", F.row_number().over(wpool)).filter(F.col("_pr") <= pool)
    c = _prep(corpus, id_col, vec_col, "_nid", "_vc")
    q = _prep(queries, id_col, vec_col, "_qid", "_vq")
    scored = (
        pooled.join(c, pooled.neighbor_id == F.col("_nid"))
        .join(F.broadcast(q), pooled.query_id == F.col("_qid"))
        .select(
            "query_id",
            "neighbor_id",
            "hamming",
            (_dot(F.col("_vq"), F.col("_vc")) / (F.col("_vq_n") * F.col("_vc_n"))).alias("_c"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.desc("_c"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(wk))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "hamming", F.round("_c", 6).alias("cosine"), "rank")
    )
