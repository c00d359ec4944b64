"""Deduplication operators for large-scale training-data pipelines.

Five families, each designed partition-parallel for 100 TB:

- **exact**: content-hash groupBy (one shuffle on the hash).
- **n-gram Jaccard (exact)**: shingle inverted index -> pair intersection
  counts -> |A∩B| / (|A|+|B|-|A∩B|). Quadratic in co-shingled docs; the
  ground truth the approximate methods are measured against.
- **MinHash + LSH**: per-doc signature of NUM_PERM universal-hash minima,
  banded into BANDS buckets; only same-bucket pairs are candidates, then
  exact-Jaccard verified. At J>=0.5 with 64 bands x 2 rows the miss
  probability per true pair is (1-0.5^2)^64 ~ 1e-8, so the verified output
  equals the exact pair set while scaling near-linearly.
- **SimHash**: 64-bit charge/discharge fingerprint over token md5 bits;
  near-dups differ in few bits (compare via hamming distance on the hex
  signature).
- **embedding cosine**: near-dup pairs above a cosine threshold over an
  ``array<float>`` column (brute pairs here; the LSH-bucketed scale path is
  operators/similarity.py).

Everything is built-in-function Spark (no Python UDFs): higher-order
array ops for shingles/signatures, joins + aggregates for pair math.
"""

from __future__ import annotations

import os
import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kafka_streaming_polymarket_pipeline_spark.operators.text import char_shingles

# --- MinHash parameters (fixed seed so signatures are reproducible) -------
NUM_PERM = 128

# Above this many docs the LSH est/verify joins stop broadcasting the
# signature / hashed-shingle projections of the payload and switch to
# shuffle-hash on doc_id (candidate-local either way).  ~1 KB/doc of
# 128-int signatures and a similar hashed-array payload put the
# broadcast budget around a few hundred MB at the default; the 100 TB
# path needs no code edit, only (optionally) this env knob.
BROADCAST_VERIFY_MAX_DOCS = int(os.environ.get("PMPS_BROADCAST_VERIFY_MAX_DOCS", "500000"))


def _doc_side(df: DataFrame, n_docs: int | None) -> DataFrame:
    """Join-strategy selector for the per-doc payload side of the LSH
    est/verify equi-joins: broadcast while the doc count fits the
    budget, shuffle-hash beyond it (the payload side is aggregated and
    thus smaller than the probe side — SHJ, not SMJ, is the right
    fallback; SCALE.md names the swap).  ``n_docs=None`` (size unknown)
    keeps the legacy broadcast hint."""
    if n_docs is None or n_docs <= BROADCAST_VERIFY_MAX_DOCS:
        return F.broadcast(df)
    return df.hint("shuffle_hash")
BANDS = 64  # default banding: 64 bands x r=2 rows (threshold >= 0.5 regime)
_MERSENNE_P = 4_294_967_311  # prime > 2^32
_rng = random.Random(42)
_PERM_A = [_rng.randrange(1, 1 << 30) for _ in range(NUM_PERM)]
_PERM_B = [_rng.randrange(0, _MERSENNE_P) for _ in range(NUM_PERM)]


def exact_duplicate_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Exact dedup: group by content hash; one row per distinct content with
    its canonical (minimum) id and copy count."""
    return df.groupBy(F.md5(F.col(text_col)).alias("content_hash")).agg(
        F.min(id_col).alias("canonical_doc_id"),
        F.count("*").alias("n_copies"),
    )


def shingle_index(df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5) -> DataFrame:
    """(id, shingle) inverted index — distinct character n-grams per doc."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(char_shingles(F.col(text_col), n)).alias("sh"),
    )


def _jaccard_from_index(index: DataFrame, threshold: float) -> DataFrame:
    """Pairwise Jaccard from a shingle inverted index (exact ground truth:
    quadratic only in co-shingled docs). Returns (doc_id_a, doc_id_b, jaccard)."""
    sizes = index.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = index.select(F.col("doc_id").alias("doc_id_a"), "sh")
    b = index.select(F.col("doc_id").alias("doc_id_b"), "sh")
    pair_sh = a.join(b, "sh").filter(F.col("doc_id_a") < F.col("doc_id_b"))
    inter = pair_sh.groupBy("doc_id_a", "doc_id_b").agg(F.count("*").alias("inter"))
    sz_a = sizes.select(F.col("doc_id").alias("doc_id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col("doc_id").alias("doc_id_b"), F.col("sz").alias("sz_b"))
    jac = F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    return (
        inter.join(sz_a, "doc_id_a")
        .join(sz_b, "doc_id_b")
        .filter(jac >= threshold)
        .select("doc_id_a", "doc_id_b", F.round(jac, 6).alias("jaccard"))
    )


def ngram_jaccard_pairs(
    df: DataFrame, threshold: float = 0.5, n: int = 5,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Exact near-dup pairs: character-n-gram Jaccard >= threshold."""
    return _jaccard_from_index(shingle_index(df, id_col, text_col, n), threshold)


def doc_shingle_arrays(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """(doc_id, shingles array, sz): the per-doc distinct shingle *array* —
    map-only, no explode/shuffle; the unit all LSH stages operate on."""
    return df.select(
        F.col(id_col).alias("doc_id"),
        char_shingles(F.col(text_col), n).alias("shingles"),
    ).withColumn("sz", F.size("shingles")).filter(F.col("sz") > 0)


def minhash_signatures(index: DataFrame) -> DataFrame:
    """Per-doc MinHash signature: 128 columns m0..m127, each the min over the
    doc's shingles of (a_i*h + b_i) mod p.

    Shape choice is deliberate: 128 *columns* (not an array) keeps every
    downstream comparison inside whole-stage codegen — higher-order array
    functions evaluate interpreted, measured 4x slower here. The groupBy
    does map-side partial min, so the shuffle carries one 128-value row per
    doc regardless of shingle count."""
    hashed = index.select("doc_id", F.xxhash64("sh").alias("h64"))
    return hashed.groupBy("doc_id").agg(*_perm_mins())


def _perm_mins() -> list[Column]:
    """The 128 permutation min-aggregates over a 64-bit shingle hash
    column ``h64`` (h32 = h64 mod 2^32 exactly as the string path always
    hashed: pmod(xxhash64(sh), 2^32))."""
    h32 = F.pmod(F.col("h64"), F.lit(1 << 32))
    return [
        F.min(
            (F.lit(_PERM_A[i]) * h32 + F.lit(_PERM_B[i])) % F.lit(_MERSENNE_P)
        ).alias(f"m{i}")
        for i in range(NUM_PERM)
    ]


def _hashed_shingle_stream(
    df: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(doc_id, h64): one row per shingle OCCURRENCE (multiset — consumers
    dedupe via min/collect_set), hashed with xxhash64 over the n-char
    substring. Whole-stage-codegen explode+substring+hash — the r10
    optimization replacing the interpreted transform(sequence)+
    array_distinct(string array) path, which materialized every shingle
    STRING per doc before hashing (guide §4.1: built-ins beat interpreted
    higher-order lambdas; measured v0 5.9 s -> v4 5.2 s for the combined
    agg at sf0.1, and the string-array pass it replaces cost another
    ~4 s). The length guard keeps sequence() ascending (an L<n doc would
    otherwise generate a DESCENDING [1,0] range)."""
    return (
        df.filter(F.length(F.col(text_col)) >= n)
        .select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_t"),
            F.explode(
                F.sequence(F.lit(1), F.length(F.col(text_col)) - (n - 1))
            ).alias("_i"),
        )
        .select("doc_id", F.xxhash64(F.expr(f"substring(_t, _i, {n})")).alias("h64"))
    )


def _sig_payload(index_h: DataFrame) -> DataFrame:
    """ONE aggregation producing everything the funnel consumes per doc:
    (doc_id, hsh = distinct shingle-hash set, sz = |hsh|, m0..m127).

    This is the r10 single-pass restructure: the funnel previously ran
    TWO full shingle passes over the corpus — one exploded pass for the
    128-permutation signature aggregation and one array-materializing
    pass for the verify-side hashed shingle arrays (guide §1.2: remove
    whole passes before tuning inside them). Both were the measured
    Ω(shingle-mass) floor; one combined groupBy now computes signatures
    AND verify arrays from a single codegen shingle stream (measured at
    sf0.1: 5.2 s replacing 5.9 s + 4.2 s of separate stages).

    ``sz`` counts DISTINCT 64-bit shingle hashes where the old path
    counted distinct shingle strings; an intra-doc xxhash64 collision
    (odds ~L²/2^64 ≈ 2e-13 per doc) would shrink it by one — the same
    accepted tolerance class as the hashed verify intersections
    (~5e-15/pair), documented there since round 1."""
    return (
        index_h.groupBy("doc_id")
        .agg(F.collect_set("h64").alias("hsh"), *_perm_mins())
        .withColumn("sz", F.size("hsh"))
    )


def _cand_pairs(buckets: DataFrame, min_bands: int) -> DataFrame:
    """Band-bucket self-join -> per-pair band-match count -> k >= min_bands
    cut (the funnel's first exactness-preserving prefilter, factored)."""
    left = buckets.select(F.col("doc_id").alias("doc_id_a"), "band_id", "band_hash")
    right = buckets.select(F.col("doc_id").alias("doc_id_b"), "band_id", "band_hash")
    return (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") >= min_bands)
        .drop("k")
    )


def _est_verify(
    cand: DataFrame,
    payload: DataFrame,
    est_cutoff: int,
    threshold: float,
    n_docs: int | None,
    int_pred: tuple[int, int] | None = None,
) -> DataFrame:
    """Signature-estimate cut, then exact verify, both sides projected
    from ONE persisted payload frame (r10: the per-doc signature and
    hashed-array frames used to be built and persisted separately; one
    combined aggregation now feeds both join stages via column-pruned
    projections of the same cache)."""
    sig_a = payload.select(
        F.col("doc_id").alias("doc_id_a"),
        *[F.col(f"m{i}").alias(f"a{i}") for i in range(NUM_PERM)],
    )
    sig_b = payload.select(
        F.col("doc_id").alias("doc_id_b"),
        *[F.col(f"m{i}").alias(f"b{i}") for i in range(NUM_PERM)],
    )
    est = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(NUM_PERM)
    )
    # Join ORDER is load-bearing: the est joins see every candidate (4.2M
    # at sf0.1) but carry only fixed-width signature columns; the hashed
    # arrays (~1.5 KB/doc) join AFTER the estimate cut, so only the ~1-2%
    # surviving pairs ever copy an array into a joined row.  A merged
    # single-pass variant was measured 4-5x SLOWER here (the broadcast
    # join materializes both arrays into every candidate row before the
    # filter can kill it — 4.2M x 3 KB of memcpy).
    survivors = (
        cand.join(_doc_side(sig_a, n_docs), "doc_id_a")
        .join(_doc_side(sig_b, n_docs), "doc_id_b")
        .filter(est >= F.lit(est_cutoff))
        .select("doc_id_a", "doc_id_b")
    )
    sh_a = payload.select(
        F.col("doc_id").alias("doc_id_a"), F.col("hsh").alias("sh_a"), F.col("sz").alias("sz_a")
    )
    sh_b = payload.select(
        F.col("doc_id").alias("doc_id_b"), F.col("hsh").alias("sh_b"), F.col("sz").alias("sz_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.col("sz_a") + F.col("sz_b") - inter)
    if int_pred is None:
        # unrounded float predicate, same expression as the oracle
        keep = jac >= threshold
    else:
        # d12-family integer cross-multiplication (no float edge)
        num, den = int_pred
        keep = den * inter >= num * (F.col("sz_a") + F.col("sz_b") - inter)
    return (
        survivors.join(_doc_side(sh_a, n_docs), "doc_id_a")
        .join(_doc_side(sh_b, n_docs), "doc_id_b")
        .filter(keep)
        .select("doc_id_a", "doc_id_b", F.round(jac, 6).alias("jaccard"))
    )


def _band_buckets(signatures: DataFrame, rows: int = 2) -> DataFrame:
    r = rows
    n_bands = NUM_PERM // r
    bands = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.xxhash64(*[F.col(f"m{b * r + i}") for i in range(r)]).alias("band_hash"),
        )
        for b in range(n_bands)
    ])
    return signatures.select("doc_id", F.explode(bands).alias("bk")).select(
        "doc_id", F.col("bk.band_id").alias("band_id"), F.col("bk.band_hash").alias("band_hash")
    )


def lsh_candidate_pairs(signatures: DataFrame) -> DataFrame:
    """Band the signature (BANDS bands of r rows), bucket-join within bands.
    Only docs sharing a (band, band-hash) bucket become candidate pairs —
    the step that makes near-dup detection near-linear at 100 TB."""
    buckets = _band_buckets(signatures)
    left = buckets.select(F.col("doc_id").alias("doc_id_a"), "band_id", "band_hash")
    right = buckets.select(F.col("doc_id").alias("doc_id_b"), "band_id", "band_hash")
    return (
        left.join(right, ["band_id", "band_hash"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
        .distinct()
    )


# Prefilter miss budget: each exactness-preserving cut (band-count,
# signature-estimate) is sized so a true J>=threshold pair slips past it
# with probability <= ~3e-6 — the same order as the banding's own inherent
# miss. At threshold=0.5 the derivation below reproduces round-1's
# hand-calibrated constants exactly (min_bands=3, est cutoff 38/128).
_MISS_BUDGET = 3e-6


def _binom_cdf(k: int, n: int, p: float) -> float:
    """Exact P(X <= k) for X ~ Binomial(n, p) (n <= 128 here)."""
    import math

    return sum(math.comb(n, i) * p**i * (1 - p) ** (n - i) for i in range(k + 1))


def _lsh_params(threshold: float) -> tuple[int, int, int]:
    """(rows-per-band, min_bands, est_cutoff) derived from the Jaccard
    threshold so the documented 'output equals ngram_jaccard_pairs'
    contract holds for any legal threshold, not just the 0.5 the module
    constants were once calibrated for.

    - rows r: 2 for threshold >= 0.5, where the banding miss probability
      (1 - t^2)^64 <= 1e-8; 1 for 0.2 <= t < 0.5, where r=2 banding would
      silently miss up to (1-t^2)^64 ~ 2e-4 of true pairs — r=1 restores
      miss <= (1-t)^128 <= 4e-13 at the cost of fatter buckets (the
      correct trade: exactness is the contract, speed is the knob).
    - min_bands: the largest m with P(Binomial(bands, t^r) < m) <= 3e-6 —
      a true pair matches each band independently with prob >= t^r.
    - est_cutoff: 128-column agreement for a true pair is
      Binomial(128, >=t); cutoff = floor(mean - 4.5 sd), one-sided
      P(below) < 4e-6.
    """
    import math

    if threshold < 0.2:
        raise ValueError(
            f"minhash LSH threshold {threshold} < 0.2: even r=1 banding cannot "
            "guarantee the exact-output contract there; use ngram_jaccard_pairs "
            "(exact, quadratic) for very-low-similarity sweeps"
        )
    rows = 2 if threshold >= 0.5 else 1
    bands = NUM_PERM // rows
    p_band = threshold**rows
    min_bands = 1
    for m in range(2, bands + 1):
        if _binom_cdf(m - 1, bands, p_band) <= _MISS_BUDGET:
            min_bands = m
        else:
            break
    mean = NUM_PERM * threshold
    sd = math.sqrt(NUM_PERM * threshold * (1 - threshold))
    est_cutoff = max(1, math.floor(mean - 4.5 * sd))
    return rows, min_bands, est_cutoff


def minhash_lsh_dedup(
    df: DataFrame, threshold: float = 0.5, n: int = 5,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-verified.

    Funnel: band buckets propose candidate pairs (high recall: miss
    ~1e-8/pair at J>=0.5 with 64x2 banding) -> band-match count collapses
    multiplicity and drops pairs matching < min_bands bands (one narrow
    shuffle; a templated corpus's junk mass sits at k=1..2 while true pairs
    have k ~ 16+) -> signature-agreement estimate discards remaining
    low-similarity candidates (128 codegen'd column comparisons, no text
    touched) -> array_intersect of the two hashed-shingle arrays verifies
    true Jaccard. Output equals ngram_jaccard_pairs; no shingle-index
    self-join ever materializes.

    Physical notes (r10 restructure, guide §1.2/§2.4): ONE codegen
    shingle-hash stream (explode+substring+xxhash64 — no interpreted
    transform/array_distinct string pass) feeds ONE combined payload
    aggregation producing signatures AND verify arrays per doc — the
    r09 shape ran the Ω(shingle-mass) pass twice and persisted two
    frames (measured at sf0.1: 5.2 s for the combined agg vs
    5.9 s + 4.2 s separate).  The band-count aggregation still shuffles
    only (doc_id_a, doc_id_b) pairs (25M bucket-co-occurrence rows ->
    4.2M candidates at sf0.1).  The est+verify stages merged into one
    pass over the payload (two joins, not four); est kills ~98% of
    candidates before the array intersection evaluates (codegen
    short-circuit), measured 2.1 s est + 0.8 s verify at sf0.1.  The
    payload is persisted — exchange reuse does NOT fire across its
    three differently-projected consumers (banding + both join sides;
    measured round 1: 0 ReusedExchange, ~2x no-persist).  Payload sides
    broadcast at bench scale; above BROADCAST_VERIFY_MAX_DOCS the joins
    flip to shuffle-hash on doc_id — still candidate-local work.
    """
    return _payload_funnel(
        _sig_payload(_hashed_shingle_stream(df, id_col, text_col, n)), threshold
    )


def _payload_funnel(
    payload: DataFrame, threshold: float, int_pred: tuple[int, int] | None = None
) -> DataFrame:
    """The shared band -> band-count -> merged est+verify funnel over a
    prepared (doc_id, hsh, sz, m0..m{NUM_PERM-1}) payload frame.

    The payload feeds FIVE consumers (banding, est sides a and b, and
    both verify-side hsh/sz projections inside _est_verify — ADVICE r10
    corrected the count) and is persisted: exchange reuse does NOT fire
    across the differently-projected consumers (measured round 1; the
    r10 restructure shrinks what gets persisted to ONE frame where the
    old funnel cached signatures AND hashed arrays separately)."""
    from pyspark.storagelevel import StorageLevel

    rows, min_bands, est_cutoff = _lsh_params(threshold)
    payload = payload.persist(StorageLevel.MEMORY_AND_DISK)
    n_docs = payload.count()  # materializes the persisted payload once
    cand = _cand_pairs(_band_buckets(payload, rows), min_bands)
    return _est_verify(cand, payload, est_cutoff, threshold, n_docs, int_pred)


def oph_signatures(index: DataFrame) -> DataFrame:
    """One-Permutation-Hashing MinHash signature (Li/Owen/Zhang, NIPS 2012)
    with rotation densification (Shrivastava/Li, ICML 2014): ONE hash per
    shingle instead of NUM_PERM multiply-mods.

    Each shingle hashes once; the low 7 bits pick one of NUM_PERM=128 bins
    and the remaining 57 bits are the rank value. The signature is the
    per-bin minimum; an empty bin borrows the nearest non-empty bin to its
    right (circular rotation), so two docs with similar shingle sets —
    hence similar emptiness patterns — borrow the same source bins and the
    densified collision probability still tracks J.

    Two-level aggregation keeps the per-shingle cost O(1):

      stage 1  groupBy(doc_id, bin) -> min(val): map-side combine collapses
               each partition to <= NUM_PERM rows/doc before the shuffle,
               so shuffle volume matches minhash_signatures' while the
               per-shingle compute drops ~NUM_PERM-fold.
      stage 2  groupBy(doc_id) pivots <= NUM_PERM bin rows into the m0..m127
               columns (the conditional-min expressions run over bin rows,
               not shingle rows).
      densify  doc-grain array pass: m_i = first non-null among
               r_i, r_{i+1 mod 128}, ... via slice+filter over a doubled
               array — interpreted higher-order ops, but over docs x 128
               elements only, off the shingle-mass hot path.

    vs minhash_signatures: the Omega(shingles x NUM_PERM) signature floor
    SCALE.md documents for d3 becomes Omega(shingles) + Theta(docs x
    NUM_PERM^2) — at 100 TB (shingle mass >> doc count) that floor is the
    whole game. Downstream banding/est/verify is unchanged and the output
    stays exact-verified, so recall loss shows up as a hash mismatch
    against the exact-Jaccard oracle rather than silent corruption.
    """
    return _oph_signatures_hashed(
        index.select("doc_id", F.xxhash64("sh").alias("h64"))
    )


def _oph_signatures_hashed(index_h: DataFrame) -> DataFrame:
    """:func:`oph_signatures` over an already-hashed (doc_id, h64) stream
    (xxhash64 of the shingle string — identical values either way), so
    the codegen shingle stream feeds OPH without re-materializing
    strings."""
    h = F.col("h64")
    partial = (
        index_h.select(
            "doc_id",
            F.pmod(h, F.lit(NUM_PERM)).alias("bin"),
            F.shiftrightunsigned(h, 7).alias("v"),  # drops the 7 bin bits
        )
        .groupBy("doc_id", "bin")
        .agg(F.min("v").alias("mv"))
    )
    raw = partial.groupBy("doc_id").agg(
        *[F.min(F.when(F.col("bin") == i, F.col("mv"))).alias(f"r{i}") for i in range(NUM_PERM)]
    )
    return _oph_densify(raw)


def _oph_densify(raw: DataFrame, carry: list[str] | None = None) -> DataFrame:
    """Rotation densification of a pivoted (doc_id, r0..r127[, carry...])
    bin-min frame into the funnel's m0..m127 signature columns: m_i =
    first non-null among r_i, r_{i+1 mod NUM_PERM}, ... via slice+filter
    over a doubled array (interpreted higher-order ops, but over docs x
    NUM_PERM elements only — off the shingle-mass hot path)."""
    carry = carry or []
    doubled = raw.select(
        "doc_id",
        *carry,
        F.concat(
            F.array(*[F.col(f"r{i}") for i in range(NUM_PERM)]),
            F.array(*[F.col(f"r{i}") for i in range(NUM_PERM)]),
        ).alias("rr"),
    )
    return doubled.select(
        "doc_id",
        *carry,
        *[
            F.element_at(
                F.filter(F.slice("rr", i + 1, NUM_PERM), lambda x: x.isNotNull()), 1
            ).alias(f"m{i}")
            for i in range(NUM_PERM)
        ],
    )


def _oph_payload(index_h: DataFrame) -> DataFrame:
    """ONE two-level aggregation producing the funnel payload (doc_id,
    hsh, sz, m0..m127) with OPH signatures — the r11 restructure of
    minhash_lsh_dedup_oph's payload build (guide §1.2 and ADVICE r10):
    the r10 shape PERSISTED the Θ(shingle-mass) (doc_id, h64) stream and
    ran two separate aggregations over it (the OPH two-level min and a
    collect_set pass) joined back together — a corpus-sized cache
    (~16 B/char) plus an extra full pass plus a per-doc join. Here
    stage 1's groupBy(doc_id, bin) computes min(v) AND collect_set(h64)
    together; because bin = pmod(h64, NUM_PERM) is a FUNCTION of h64,
    equal hashes land in one bin and distinct hashes never collide
    across bins, so the per-bin distinct sets are disjoint and stage 2's
    flatten(collect_list(hs)) IS the per-doc distinct hash set — no
    array_distinct, no join, no shingle-mass persist anywhere."""
    partial = (
        index_h.select(
            "doc_id",
            F.pmod(F.col("h64"), F.lit(NUM_PERM)).alias("bin"),
            F.shiftrightunsigned(F.col("h64"), 7).alias("v"),
            "h64",
        )
        .groupBy("doc_id", "bin")
        .agg(F.min("v").alias("mv"), F.collect_set("h64").alias("hs"))
    )
    raw = partial.groupBy("doc_id").agg(
        *[
            F.min(F.when(F.col("bin") == i, F.col("mv"))).alias(f"r{i}")
            for i in range(NUM_PERM)
        ],
        F.flatten(F.collect_list("hs")).alias("hsh"),
    )
    return _oph_densify(raw, carry=["hsh"]).withColumn("sz", F.size("hsh"))


def minhash_lsh_dedup_oph(
    df: DataFrame, threshold: float = 0.5, n: int = 5,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """minhash_lsh_dedup with OPH signatures: same banding, same band-count
    and signature-agreement prefilters, same exact-Jaccard verification —
    the only change is the signature stage's per-shingle cost (one hash vs
    NUM_PERM multiply-mods; see oph_signatures). Output contract is
    unchanged: equals ngram_jaccard_pairs at the same threshold.

    r11 physical shape: ONE codegen shingle-hash stream feeds ONE
    two-level payload aggregation (:func:`_oph_payload`) computing the
    OPH bin mins AND the verify hash set in the same stage-1 groupBy —
    no shingle-mass persist, no extra pass, no per-doc join (the r10
    shape carried all three; ADVICE r10 flagged the Θ(shingle-mass)
    cache)."""
    return _payload_funnel(
        _oph_payload(_hashed_shingle_stream(df, id_col, text_col, n)), threshold
    )


def _hashed_shingle_arrays(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Persisted (doc_id, hashed-shingle array, sz) for the verify stage.
    64-bit hashes, not strings: same intersection counts (cross-collision
    odds ~|A||B|/2^64 ~ 5e-15 per pair) at a fraction of the comparison
    cost, and the cached rows are ~6x smaller."""
    from pyspark.storagelevel import StorageLevel

    return doc_shingle_arrays(df, id_col, text_col, n).select(
        "doc_id",
        F.transform("shingles", lambda s: F.xxhash64(s)).alias("hsh"),
        "sz",
    ).persist(StorageLevel.MEMORY_AND_DISK)


def _est_filter(
    cand: DataFrame, sigs: DataFrame, est_cutoff: int, n_docs: int | None = None
) -> DataFrame:
    """Signature-agreement estimate over candidate pairs: keep pairs whose
    128-column agreement >= est_cutoff (codegen'd comparisons, no text);
    the cutoff comes from _lsh_params so it tracks the caller's threshold."""
    sig_a = sigs.select(
        F.col("doc_id").alias("doc_id_a"), *[F.col(f"m{i}").alias(f"a{i}") for i in range(NUM_PERM)]
    )
    sig_b = sigs.select(
        F.col("doc_id").alias("doc_id_b"), *[F.col(f"m{i}").alias(f"b{i}") for i in range(NUM_PERM)]
    )
    est = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0) for i in range(NUM_PERM)
    )
    return (
        cand.join(_doc_side(sig_a, n_docs), "doc_id_a")
        .join(_doc_side(sig_b, n_docs), "doc_id_b")
        .filter(est >= F.lit(est_cutoff))
        .select("doc_id_a", "doc_id_b")
    )


def _verify_jaccard(
    pairs: DataFrame, hashed: DataFrame, threshold: float, n_docs: int | None = None
) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs on hashed shingle arrays."""
    sh_a = hashed.select(
        F.col("doc_id").alias("doc_id_a"), F.col("hsh").alias("sh_a"), F.col("sz").alias("sz_a")
    )
    sh_b = hashed.select(
        F.col("doc_id").alias("doc_id_b"), F.col("hsh").alias("sh_b"), F.col("sz").alias("sz_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    jac = inter / (F.col("sz_a") + F.col("sz_b") - inter)
    return (
        pairs.join(_doc_side(sh_a, n_docs), "doc_id_a")
        .join(_doc_side(sh_b, n_docs), "doc_id_b")
        .filter(jac >= threshold)  # unrounded, same predicate as the oracle
        .select("doc_id_a", "doc_id_b", F.round(jac, 6).alias("jaccard"))
    )


def minhash_lsh_dedup_dfpruned(
    df: DataFrame, threshold: float = 0.5, n: int = 5, max_df_pct: int = 10,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Boilerplate-blind MinHash-LSH near-dup pairs: document-frequency
    pruning, the production lever for template-heavy corpora.

    Shingles present in more than ``max_df_pct``% of documents are dropped
    corpus-wide BEFORE signatures, banding, and verification; the output is
    exact Jaccard >= threshold over the PRUNED shingle sets. This is a
    deliberate, well-defined semantics change vs ``minhash_lsh_dedup``:
    near-duplication driven purely by shared boilerplate (site chrome,
    license headers, template scaffolding) no longer counts — the notion of
    similarity a training-data dedup pass usually *wants* — and the
    candidate mass the funnel must estimate collapses with it. On the
    driver's templated corpus, pruning at 10% leaves the true near-dup
    pair set unchanged (their rare shingles alone keep J >= 0.5) while
    removing ~2/3 of shingle instances and, far more importantly, the
    J in [0.15, 0.5) templated mass whose candidate pairs are the measured
    quadratic floor of the exact funnel (SCALE.md round-4 d3 sweep).

    The DF cut itself is one groupBy on the shingle key (map-side combined)
    plus one shuffle-hash equi-join back to the index — linear, and
    comparison is integer-exact (``df * 100 <= pct * n_docs``) so the
    DuckDB oracle replicates the kept set bit-for-bit. Everything
    downstream reuses the exact funnel's machinery and inherits its
    exactness bounds relative to pruned-set Jaccard.
    """
    idx0 = shingle_index(df, id_col, text_col, n)
    n_docs = df.agg(F.count("*").alias("n_docs"))
    dfreq = idx0.groupBy("sh").agg(F.count("*").alias("dfq"))
    kept_sh = (
        dfreq.crossJoin(F.broadcast(n_docs))
        .filter(F.col("dfq") * 100 <= F.lit(max_df_pct) * F.col("n_docs"))
        .select("sh")
    )
    # Rare shingles are the numerous ones — the kept set does NOT broadcast;
    # plain shuffle-hash equi-join on the shingle key.  The DF cut stays
    # keyed on the shingle STRING (integer-exact kept set, oracle
    # replicates it bit-for-bit; hashing the DF key would merge counts on
    # 64-bit collisions, a real effect at 100 TB's ~1e12 distinct
    # shingles).  Everything AFTER the cut is hashed immediately and the
    # funnel runs on longs: one combined payload aggregation replaces the
    # r09 shape's separately-persisted string index + signature agg +
    # collect_list agg (r10; guide §1.2 — docs whose every shingle was
    # pruned vanish from the stream and therefore from the payload and
    # output, matching the oracle, where such docs have no rows in the
    # pruned CTE).
    idx_h = idx0.join(kept_sh, "sh").select("doc_id", F.xxhash64("sh").alias("h64"))
    return _payload_funnel(_sig_payload(idx_h), threshold)


def minhash_lsh_incremental(
    corpus: DataFrame, new: DataFrame, threshold: float = 0.5, n: int = 5,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """Near-dup pairs *touching a new batch*, against an already-indexed
    corpus — the incremental form a 100 TB pipeline actually runs: the
    corpus's signatures, band buckets, and hashed shingle arrays are
    maintained as bucketed tables across batches (here built inline from
    ``corpus``; at scale they are parquet reads), so per-batch work is
    O(|new|) signature computation + bucket probes of the index, never a
    re-scan of the corpus text.

    Candidates = (new x corpus buckets) ∪ (new x new buckets); each pair
    surfaces exactly once per matching band (corpus buckets hold no new
    docs, and new-new pairs are ordered), so the band-count >= min_bands
    cut has identical exactness to the batch funnel. Output pairs are
    canonicalized doc_id_a < doc_id_b and equal the batch pair set
    restricted to pairs with at least one new doc.
    """
    from pyspark.storagelevel import StorageLevel

    rows, min_bands, est_cutoff = _lsh_params(threshold)
    corpus_pl = _sig_payload(
        _hashed_shingle_stream(corpus, id_col, text_col, n)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    new_pl = _sig_payload(
        _hashed_shingle_stream(new, id_col, text_col, n)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    corpus_buckets = _band_buckets(corpus_pl, rows)
    new_buckets = _band_buckets(new_pl, rows)

    nb = new_buckets.select(F.col("doc_id").alias("nid"), "band_id", "band_hash")
    cb = corpus_buckets.select(F.col("doc_id").alias("cid"), "band_id", "band_hash")
    new_corpus = nb.join(cb, ["band_id", "band_hash"]).select(
        F.least("nid", "cid").alias("doc_id_a"), F.greatest("nid", "cid").alias("doc_id_b")
    )
    nb2 = new_buckets.select(F.col("doc_id").alias("doc_id_b"), "band_id", "band_hash")
    new_new = (
        new_buckets.select(F.col("doc_id").alias("doc_id_a"), "band_id", "band_hash")
        .join(nb2, ["band_id", "band_hash"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b")
    )
    cand = (
        new_corpus.union(new_new)
        .groupBy("doc_id_a", "doc_id_b")
        .agg(F.count("*").alias("k"))
        .filter(F.col("k") >= min_bands)
        .drop("k")
    )

    payload = corpus_pl.unionByName(new_pl)
    n_docs = corpus_pl.count() + new_pl.count()  # materializes both payloads
    return _est_verify(cand, payload, est_cutoff, threshold, n_docs)


# --- Near-dup clustering (connected components) -----------------------------


def neardup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components of the near-dup pair graph: every document gets a
    ``cluster_id`` = the minimum doc_id reachable through near-dup pairs
    (singletons cluster to themselves). This is the step that makes a pair
    list *actionable* for training-data dedup — "keep one doc per cluster"
    — since near-dup similarity is not transitive but its closure is.

    Iterative min-label propagation: each round every node takes the min of
    its own label and its neighbors' labels; converges in <= graph-diameter
    rounds. Near-dup graphs are dense small-diameter clumps (templated docs
    all pair with each other), so propagation finishes in a handful of
    rounds; for adversarial long-chain graphs the alternating large-star /
    small-star algorithm (Kiveris et al., "Connected Components in
    MapReduce") halves diameter per round and is the drop-in upgrade.

    Physical notes per round: one groupBy(min) over the edge list joined to
    current labels (shuffle on node id), one left join back to labels. Each
    round's result is localCheckpoint()ed — without it the lineage (and the
    codegen plan) grows linearly with rounds. The convergence probe is a
    driver-side count of changed labels; the loop is driver-coordinated but
    all data stays distributed.
    """
    # Materialize the edge list once: every propagation round (and each
    # round's convergence count) re-reads it, and without this the entire
    # upstream pair computation (e.g. the LSH funnel) would re-execute
    # per action — measured minutes instead of seconds at sf0.1.
    edges = pairs.select(
        F.col("doc_id_a").alias("src"), F.col("doc_id_b").alias("dst")
    ).union(pairs.select(F.col("doc_id_b").alias("src"), F.col("doc_id_a").alias("dst")))
    edges = edges.localCheckpoint(eager=True)

    labels = docs.select(F.col(id_col).alias("node"), F.col(id_col).alias("lab"))
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        nbr_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("lab").alias("nbr_lab"))
        )
        new_labels = (
            labels.join(nbr_min, labels.node == nbr_min.src, "left")
            .select(
                "node",
                F.least(F.col("lab"), F.coalesce("nbr_lab", "lab")).alias("lab"),
            )
        ).localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.lab") < F.col("o.lab"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(F.col("node").alias(id_col), F.col("lab").alias("cluster_id"))
    raise RuntimeError(f"neardup_clusters did not converge in {max_iter} rounds")


def keep_longest_per_cluster(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Canonical-document selection over a cluster map: one row per
    ``cluster_id`` keeping the LONGEST document (character length;
    ties -> smaller doc id) — the standard keep-the-longest-copy rule
    (C4 / RefinedWeb lineage). Input ``clusters`` is any
    (id_col, cluster_id) map (d6/d6b output, including singletons);
    output schema: (cluster_id, kept_doc_id, n_docs, kept_len).

    Physical notes: one equi-join clusters->docs on the id (to fetch
    lengths — column-pruned to exactly (id, length)), then a single
    window partitioned by cluster_id computing both the count and the
    argmax rank in one shuffle. The window is bounded by construction:
    a partition is one near-dup neighborhood, not the corpus. Length is
    an integer, so the argmax needs no float rounding contract."""
    sized = clusters.join(
        docs.select(id_col, F.length(text_col).cast("long").alias("kept_len")),
        id_col,
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("kept_len"), id_col)
    return (
        sized.withColumn("n_docs", F.count("*").over(Window.partitionBy("cluster_id")))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "cluster_id",
            F.col(id_col).alias("kept_doc_id"),
            F.col("n_docs").cast("long").alias("n_docs"),
            "kept_len",
        )
    )


def neardup_clusters_star(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iter: int = 30,
) -> DataFrame:
    """Connected components via alternating large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond",
    SoCC 2014) — the long-chain-safe variant of ``neardup_clusters``.

    Min-label propagation needs diameter-many rounds: a 1000-doc chain is
    1000 shuffles. Star operations instead rewire the edge list so that
    every round roughly halves component height, converging in
    O(log^2 n) rounds on any graph:

    - large-star: every node's strictly-larger neighbors re-attach to the
      minimum of its closed neighborhood;
    - small-star: its smaller-or-equal neighbors (and itself) do.

    After convergence the edge list IS the component labeling: each
    component is a star rooted at its minimum id. Same output contract and
    oracle as neardup_clusters (cluster_id = min reachable id, singletons
    cluster to themselves).

    Physical notes per round: two groupBy(min) shuffles (one per star op)
    + a distinct on the rewired edges; each result localCheckpoint()ed to
    cut lineage. Convergence probe = count of edges that changed — a
    driver-side scalar, like neardup_clusters's. (r10: the probe is ONE
    job — a union of the two exceptAll legs — and the per-round
    isEmpty() probe moved out of the loop; each removed action saved a
    full driver round-trip per CC round, ~30% of the loop's fixed cost
    on small graphs where scheduling dominates.)"""
    edges = (
        pairs.select(
            F.least("doc_id_a", "doc_id_b").alias("a"),
            F.greatest("doc_id_a", "doc_id_b").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def nbrs(e: DataFrame) -> DataFrame:
        return e.select(F.col("a").alias("u"), F.col("b").alias("v")).union(
            e.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )

    def closed_min(n: DataFrame) -> DataFrame:
        return n.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )

    # Empty graph: skip the loop outright — everyone is a singleton.
    # A separate flag, NOT max_iter=0 (ADVICE r10): reusing max_iter as
    # the sentinel made an explicit caller-passed max_iter=0 on a
    # NON-empty graph silently return labels from the raw unconverged
    # edge list instead of raising non-convergence.
    skip_loop = edges.isEmpty()
    for _ in range(0 if skip_loop else max_iter):
        # large-star
        n = nbrs(edges)
        m = closed_min(n)
        ls = (
            n.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star
        n2 = nbrs(ls)
        m2 = closed_min(n2)
        ss = (
            n2.join(m2, "u")
            .filter(F.col("v") < F.col("u"))
            .select(F.col("m").alias("a"), F.col("v").alias("b"))
            .union(m2.filter(F.col("m") < F.col("u")).select(F.col("m").alias("a"), F.col("u").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .select(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        changed = ss.exceptAll(edges).union(edges.exceptAll(ss)).count()
        edges = ss
        if changed == 0:
            break
    else:
        if not skip_loop:
            raise RuntimeError(
                f"neardup_clusters_star did not converge in {max_iter} rounds"
            )

    # converged edge list is a star forest: (root a) < (child b), one root per child
    labels = edges.groupBy(F.col("b").alias("node")).agg(F.min("a").alias("lab"))
    return (
        docs.select(F.col(id_col).alias("node"))
        .join(labels, "node", "left")
        .select(
            F.col("node").alias(id_col),
            F.coalesce("lab", "node").alias("cluster_id"),
        )
    )


# --- SimHash ---------------------------------------------------------------


def _hex_chars() -> Column:
    # Built lazily: Column literals need an active SparkSession.
    return F.array(*[F.lit(c) for c in "0123456789abcdef"])


def simhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """64-bit SimHash as a 16-char hex string.

    Each distinct token contributes +1/-1 per bit position from its md5's
    leading 64 bits; a signature bit is 1 where the summed charge is
    positive. Near-duplicate documents differ in few bits. md5 keeps the
    token hash engine-portable (the DuckDB oracle reproduces it exactly).
    """
    from kafka_streaming_polymarket_pipeline_spark.operators.text import tokens

    tok = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("t"),
    )
    hx = F.md5("t")
    sums = []
    for j in range(64):
        digit = F.conv(F.substring(hx, 1 + j // 4, 1), 16, 10).cast("int")
        bit = F.shiftright(digit, 3 - (j % 4)) % 2
        sums.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"b{j}"))
    charged = tok.groupBy("doc_id").agg(*sums)
    hex_chars = []
    for pos in range(16):
        d = sum(
            (F.col(f"b{4 * pos + k}") > 0).cast("int") * (1 << (3 - k)) for k in range(4)
        )
        hex_chars.append(F.element_at(_hex_chars(), d + 1))
    return charged.select("doc_id", F.concat(*hex_chars).alias("simhash"))


def hamming_hex(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length hex-string signatures."""
    idx = F.sequence(F.lit(1), F.length(a))
    per_digit = F.transform(
        idx,
        lambda i: F.bit_count(
            F.conv(a.substr(i, F.lit(1)), 16, 10).cast("long")
            .bitwiseXOR(F.conv(b.substr(i, F.lit(1)), 16, 10).cast("long"))
        ),
    )
    return F.aggregate(per_digit, F.lit(0), lambda acc, x: acc + x)


def simhash_near_pairs(df: DataFrame, max_hamming: int = 6, **kw) -> DataFrame:
    """SimHash near-dup pairs: Manku-style blocking then exact verify.

    Recall guarantee by pigeonhole: the 64 signature bits are split into
    ``max_hamming + 1`` blocks, so any pair differing in <= max_hamming bits
    agrees *exactly* on at least one block — however the differing bits are
    spread (Manku, Jain, Sarma, "Detecting Near-Duplicates for Web
    Crawling", WWW 2007). Candidates = same-(block, block-bits) bucket
    equi-join; true hamming distance is then verified, so the output is
    exactly the hamming <= max_hamming pair set. More blocks (higher
    max_hamming) means shorter block keys and fatter buckets — the standard
    recall/candidate-mass trade, but never silent misses.
    """
    return simhash_pairs_from_signatures(simhash_signatures(df, **kw), max_hamming)


def simhash_pairs_from_signatures(sig: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Blocking + verify over a precomputed (doc_id, simhash-hex) frame.
    Split out so planted-signature tests can exercise the recall guarantee
    directly."""
    n_blocks = min(max_hamming + 1, 64)
    # 64-bit binary expansion (conv is unsigned-64 internally, so 16 hex
    # chars round-trip losslessly); block q = its bit substring.
    bits = F.lpad(F.conv(F.col("simhash"), 16, 2), 64, "0")
    base, rem = divmod(64, n_blocks)
    starts, pos = [], 1
    for q in range(n_blocks):
        width = base + (1 if q < rem else 0)
        starts.append((pos, width))
        pos += width
    blocks = F.array(*[
        F.struct(F.lit(q).alias("q"), F.substring(bits, s, w).alias("qh"))
        for q, (s, w) in enumerate(starts)
    ])
    buckets = sig.select("doc_id", "simhash", F.explode(blocks).alias("bk")).select(
        "doc_id", "simhash", F.col("bk.q").alias("q"), F.col("bk.qh").alias("qh")
    )
    left = buckets.select(
        F.col("doc_id").alias("doc_id_a"), F.col("simhash").alias("sig_a"), "q", "qh"
    )
    right = buckets.select(
        F.col("doc_id").alias("doc_id_b"), F.col("simhash").alias("sig_b"), "q", "qh"
    )
    pairs = (
        left.join(right, ["q", "qh"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .select("doc_id_a", "doc_id_b", "sig_a", "sig_b")
        .distinct()
    )
    dist = hamming_hex(F.col("sig_a"), F.col("sig_b"))
    return pairs.select("doc_id_a", "doc_id_b", dist.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


# --- Embedding cosine near-dup ----------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns, sequential-fold dot
    products (bit-matching DuckDB's list_dot_product on the same input)."""
    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
        )

    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def embedding_near_dup_pairs(
    df: DataFrame, threshold: float = 0.45,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs by embedding cosine >= threshold (brute-force pairs;
    for the sub-quadratic scale path see operators/similarity.py LSH)."""
    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
        )

    v = F.col(vec_col).cast("array<double>")
    # norm folded once per vector, not once per pair (n^2/2 pairs downstream)
    base = df.select(
        F.col(id_col).alias("_id"), v.alias("_v"), F.sqrt(dot(v, v)).alias("_n")
    )
    a = base.select(F.col("_id").alias("vec_id_a"), F.col("_v").alias("_va"), F.col("_n").alias("_na"))
    b = base.select(F.col("_id").alias("vec_id_b"), F.col("_v").alias("_vb"), F.col("_n").alias("_nb"))
    pairs = a.join(b, F.col("vec_id_a") < F.col("vec_id_b"))
    c = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return pairs.select("vec_id_a", "vec_id_b", c.alias("_c")).filter(
        F.col("_c") >= threshold
    ).select("vec_id_a", "vec_id_b", F.round("_c", 6).alias("cosine"))


def embedding_neardup_blocked(
    df: DataFrame, threshold: float = 0.45, n_centroids: int = 16,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Exact embedding near-dup pairs via metric cell blocking — the
    first-class scale path (same output as ``embedding_near_dup_pairs``,
    never a broadcast nested-loop).

    Structure (ball-tree-style spherical pruning, one level):

    1. Pick ``n_centroids`` deterministic sample centroids (per-partition
       top-C by id hash: TakeOrderedAndProject — one pass, no count, no
       global sort) and collect them — Spark-ML-style model state, C rows.
    2. Assign every vector to its max-cosine centroid with a pure column
       expression (greatest over C struct(cos, -cell) — no join at all),
       and record its angle to that centroid.
    3. Per-cell radius r_c = max member angle. A pair (x in c1, y in c2)
       can satisfy angle(x,y) <= acos(threshold) only if
       angle(c1,c2) <= acos(threshold) + r_1 + r_2 (spherical triangle
       inequality) — so only *admissible* cell pairs (a tiny <= C^2 list,
       broadcast) generate candidates, via equi-joins on cell id.
    4. Exact cosine verify within admitted pairs.

    Exactness is unconditional: step 3's bound is a theorem, not a
    probability, so the output equals the brute-force pair set for any
    corpus, any threshold. Pruning power is data-dependent: clustered
    corpora (real text/image embeddings) drop most cell pairs; an
    isotropic corpus (this repo's synthetic one — measured mean radius
    ~80 deg) admits everything, and no exact method can prune structure
    that is not there. Even then the shape is right for 100 TB: candidate
    generation is a *shuffle* equi-join on cell ids — distributed,
    skew-bounded by cell size — where the brute-force form broadcasts one
    whole side into a nested loop.

    Hyperplane-LSH banding (cf. similarity.lsh_ann_topk) is NOT used here
    deliberately: at threshold 0.45 a true pair agrees with a random plane
    with prob ~0.65 vs 0.5 for background, and sizing bands for a ~1e-6
    miss bound needs O(100) tables while still admitting ~every background
    pair — all cost, no pruning, and a broken exactness contract. LSH is
    the approximate-top-k tool for the >= 0.8 regime, not an exact-pair
    tool at 0.45.
    """
    import math

    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, v: acc + v
        )

    v = F.col(vec_col).cast("array<double>")
    base = df.select(
        F.col(id_col).alias("_id"), v.alias("_v"), F.sqrt(dot(v, v)).alias("_n")
    )
    cent_rows = base.orderBy(F.xxhash64("_id")).limit(n_centroids).collect()
    if not cent_rows:
        return df.sparkSession.createDataFrame(
            [], "vec_id_a long, vec_id_b long, cosine double"
        )
    cents = []
    for r in cent_rows:
        nrm = r["_n"] or 1.0
        cents.append([x / nrm for x in r["_v"]])

    def cos_to(j: int) -> Column:
        cu = F.array(*[F.lit(x) for x in cents[j]])
        return dot(F.col("_v"), cu) / F.col("_n")

    best = F.greatest(*[
        F.struct(cos_to(j).alias("cc"), F.lit(-j).alias("negcell"))
        for j in range(len(cents))
    ]) if len(cents) > 1 else F.struct(cos_to(0).alias("cc"), F.lit(0).alias("negcell"))
    clamped = F.least(F.lit(1.0), F.greatest(F.lit(-1.0), F.col("_best.cc")))
    assigned = (
        base.withColumn("_best", best)
        .select(
            "_id", "_v", "_n",
            (-F.col("_best.negcell")).alias("_cell"),
            F.acos(clamped).alias("_ang"),
        )
        .localCheckpoint(eager=False)  # reused by radii + both join sides
    )

    radii = {
        r["_cell"]: r["r"]
        for r in assigned.groupBy("_cell").agg(F.max("_ang").alias("r")).collect()
    }
    theta_t = math.acos(threshold)

    def cangle(i: int, j: int) -> float:
        d = sum(a * b for a, b in zip(cents[i], cents[j]))
        return math.acos(max(-1.0, min(1.0, d)))

    adm = [
        (i, j)
        for i in sorted(radii)
        for j in sorted(radii)
        if i <= j and cangle(i, j) <= theta_t + radii[i] + radii[j]
    ]
    adm_df = df.sparkSession.createDataFrame(adm, "cell_a int, cell_b int")

    a = assigned.select(
        F.col("_id").alias("_ida"), F.col("_v").alias("_va"),
        F.col("_n").alias("_na"), F.col("_cell").alias("cell_a"),
    )
    b = assigned.select(
        F.col("_id").alias("_idb"), F.col("_v").alias("_vb"),
        F.col("_n").alias("_nb"), F.col("_cell").alias("cell_b"),
    )
    c = dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    return (
        a.join(F.broadcast(adm_df), "cell_a")
        .join(b, "cell_b")
        .filter((F.col("cell_a") != F.col("cell_b")) | (F.col("_ida") < F.col("_idb")))
        .select(
            F.least("_ida", "_idb").alias("vec_id_a"),
            F.greatest("_ida", "_idb").alias("vec_id_b"),
            c.alias("_c"),
        )
        .filter(F.col("_c") >= threshold)
        .select("vec_id_a", "vec_id_b", F.round("_c", 6).alias("cosine"))
    )


def editdist1_pairs(df: DataFrame, id_col: str, name_col: str) -> DataFrame:
    """All record pairs whose (lowercased) names are exactly Levenshtein
    distance 1 apart — entity-resolution blocking via the SymSpell
    deletion neighborhood (Garbe's symmetric delete, the spell-dedup
    standard). Each name emits itself plus every single-character
    deletion as candidate keys; two strings at distance 1 ALWAYS share a
    key (substitution pairs share the variant deleting the differing
    position; insertion/deletion pairs share the shorter string itself),
    so candidate generation is an equi-join on the key — |name|+1 keys
    per record, never an all-pairs scan. Verification is an exact
    integer ``levenshtein() = 1`` on candidates only, no rounding
    anywhere. Key skew is bounded by the alphabet: a deletion key is
    shared by at most ~|alphabet| names (the possible re-insertions), so
    no bucket explodes regardless of corpus size."""
    nm = F.lower(F.col(name_col))
    base = df.select(F.col(id_col).alias("rid"), nm.alias("nm"))
    keys = base.withColumn(
        "_k",
        F.explode(
            F.array_distinct(
                F.concat(
                    F.array(F.col("nm")),
                    F.expr(
                        "transform(sequence(1, length(nm)),"
                        " i -> concat(substring(nm, 1, i - 1), substring(nm, i + 1)))"
                    ),
                )
            )
        ),
    )
    a, b = keys.alias("a"), keys.alias("b")
    # Verify BEFORE the pair-dedup: levenshtein runs join-local on the
    # candidates (no extra shuffle), so the distinct() then shuffles only
    # TRUE pairs (a pair can meet via several shared deletion keys),
    # never the candidate multiset. A position-tagged key variant that
    # prunes cross-position (distance-2) collisions ahead of levenshtein
    # was built and MEASURED SLOWER (66 s -> 88 s at 100k names): the
    # struct-building lambda is interpreted and runs on both sides of
    # the self-join, costing more than the pruned levenshtein calls
    # saved. See SCALE.md.
    return (
        a.join(b, (F.col("a._k") == F.col("b._k")) & (F.col("a.rid") < F.col("b.rid")))
        .filter(F.levenshtein(F.col("a.nm"), F.col("b.nm")) == 1)
        .select(
            F.col("a.rid").alias("rid_a"),
            F.col("b.rid").alias("rid_b"),
            F.col("a.nm").alias("name_a"),
            F.col("b.nm").alias("name_b"),
        )
        .distinct()
    )


def _df_ordered_docs(
    df: DataFrame, id_col: str, text_col: str, max_df_pct: int | None = None
) -> DataFrame:
    """Stages 1-2 shared by the prefix-filtered set-similarity joins
    (d12 Jaccard, d15 containment): distinct lowercase whitespace tokens
    per doc, each doc's tokens sorted by the global (doc-frequency ASC,
    token ASC) total order — a row-local array sort off one word-count
    shuffle, no global rank/window. Returns (did, toks, sz).

    ``max_df_pct`` applies d3c's corpus-wide document-frequency cut
    BEFORE the per-doc arrays are built: tokens present in more than
    that percentage of documents are dropped everywhere (integer-exact
    ``tdf * 100 <= pct * n_docs``, so an oracle replicates the kept set
    bit-for-bit), and docs whose every token is pruned vanish — the
    d3c contract at word-token grain. The DF table is already computed
    for the prefix ordering, so the cut adds only a broadcast one-row
    count join."""
    from kafka_streaming_polymarket_pipeline_spark.operators.text import tokens

    tok = df.select(
        F.col(id_col).alias("did"),
        F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("t"),
    )
    tok_df = tok.groupBy("t").agg(F.count("*").alias("tdf"))
    if max_df_pct is not None:
        n_docs = df.agg(F.count("*").alias("n_docs"))
        tok_df = tok_df.crossJoin(F.broadcast(n_docs)).filter(
            F.col("tdf") * 100 <= F.lit(max_df_pct) * F.col("n_docs")
        ).drop("n_docs")
    return (
        tok.join(tok_df, "t")
        .groupBy("did")
        .agg(F.sort_array(F.collect_list(F.struct("tdf", "t"))).alias("_o"))
        .select(
            "did",
            F.expr("transform(_o, x -> x.t)").alias("toks"),
            F.size("_o").alias("sz"),
        )
    )


def prefix_jaccard_candidates(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num: int = 7,
    den: int = 10,
    max_df_pct: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Stages 1-3 of :func:`prefix_jaccard_pairs` — returns
    ``(docs, candidates)`` where ``docs`` is (did, toks, sz) with tokens
    in global (df ASC, token ASC) order and ``candidates`` is the
    distinct (doc_id_a, doc_id_b) prefix-collision pairs.  Exposed
    separately so the pigeonhole guarantee (candidates ⊇ qualifying
    pairs) is directly property-testable. ``max_df_pct`` is the d12c
    corpus-wide DF cut (see :func:`_df_ordered_docs`).
    """
    docs = _df_ordered_docs(df, id_col, text_col, max_df_pct)
    pref = docs.select(
        "did",
        "sz",
        F.explode(
            F.expr(f"slice(toks, 1, sz - (({num} * sz + {den} - 1) div {den}) + 1)")
        ).alias("t"),
    )
    a, b = pref.alias("a"), pref.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.t") == F.col("b.t"))
            & (F.col("a.did") < F.col("b.did"))
            & (den * F.col("b.sz") >= num * F.col("a.sz"))
            & (den * F.col("a.sz") >= num * F.col("b.sz")),
        )
        .select(F.col("a.did").alias("doc_id_a"), F.col("b.did").alias("doc_id_b"))
        .distinct()
    )
    return docs, cand


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num: int = 7,
    den: int = 10,
    max_df_pct: int | None = None,
) -> DataFrame:
    """EXACT word-token-set Jaccard >= num/den pairs via prefix filtering
    (the AllPairs / PPJoin family: Bayardo et al. WWW'07, Xiao et al.
    WWW'08) — the scalable *exact* set-similarity join, completing the
    dedup ladder: d2 proves the answer quadratically, d3 approximates
    then verifies, d12 gets the exact answer with near-linear candidate
    generation.

    Algorithm (all equi-joins, no all-pairs stage anywhere):

    1. Distinct lowercase whitespace tokens per doc; doc-frequency per
       token is one groupBy (tokens are distinct within a doc).
    2. Each doc sorts its tokens by the global (df ASC, token ASC) total
       order — a row-local array sort, no global rank/window — and keeps
       the first ``s - ceil(t*s) + 1`` as its *prefix* (rarest first).
       Pigeonhole: a qualifying pair has intersection >= ceil(t*s) on
       each side, which cannot fit entirely outside either prefix, so
       prefix-token equi-join candidates are a superset of the answer.
       Ordering by ascending df makes prefixes the RAREST tokens, so the
       candidate join is hub-free by construction.
    3. Candidates: prefix self-equi-join on the token with id_a < id_b
       and the symmetric length filter den*|b| >= num*|a| (both ways) —
       J >= t forces t*|a| <= |b| <= |a|/t.
    4. Verify exactly: join candidate ids back to the full sorted token
       arrays, i = |array_intersect|, keep den*i >= num*(sa+sb-i).

    The threshold is a RATIONAL (num/den) and every filter is integer
    cross-multiplication — ceil(t*s) is (num*s + den - 1) div den — so
    Spark and the naive DuckDB oracle agree bit-for-bit with no float
    edge anywhere (the j7 band-edge lesson). Output jaccard is the one
    rounded display column.

    100 TB shape: token df is a word-count shuffle; per-doc sort is
    row-local; candidate generation shuffles only prefix tokens (rare by
    construction — the df sort means a token shared by k docs lands in
    at most k prefixes and hub tokens land in almost none); verification
    is an id equi-join. Output is inherently quadratic in duplicate-
    cluster size, as for any exact pair enumeration.

    ``max_df_pct`` (d12c): apply the d3c corpus-wide DF cut first and
    compute exact Jaccard over the PRUNED token sets — boilerplate-blind
    similarity, the production semantics for template-heavy corpora
    where AllPairs candidate mass is exactly the templated token mass.
    On the driver corpus the cut collapses candidate pairs to the
    answer set itself (every pair sharing ANY surviving token
    qualifies at 19/20).
    """
    from pyspark.storagelevel import StorageLevel

    docs, cand = prefix_jaccard_candidates(df, id_col, text_col, num, den, max_df_pct)
    # Persist the ordered-docs frame: FOUR consumers read it (both prefix
    # explode sides inside ``cand`` and both verify array sides below),
    # and exchange reuse does not fire across the differently-projected
    # subtrees — unpersisted, the tokenize+DF-join+collect pipeline
    # re-executes per consumer and the whole query measured 23.5 s at
    # sf0.1 vs 2.4 s with this one persist (r10; the d15/d16
    # _containment_join already carried the same persist for the same
    # reason).
    docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    da = docs.select(
        F.col("did").alias("doc_id_a"), F.col("toks").alias("_ta"), F.col("sz").alias("_sa")
    )
    db = docs.select(
        F.col("did").alias("doc_id_b"), F.col("toks").alias("_tb"), F.col("sz").alias("_sb")
    )
    i = F.size(F.array_intersect("_ta", "_tb"))
    return (
        cand.join(da, "doc_id_a")
        .join(db, "doc_id_b")
        .withColumn("_i", i)
        .filter(den * F.col("_i") >= num * (F.col("_sa") + F.col("_sb") - F.col("_i")))
        .select(
            "doc_id_a",
            "doc_id_b",
            F.round(F.col("_i") / (F.col("_sa") + F.col("_sb") - F.col("_i")), 6).alias(
                "jaccard"
            ),
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num: int = 9,
    den: int = 10,
    min_size: int = 1,
) -> DataFrame:
    """EXACT directed token-set CONTAINMENT pairs: |T(A) ∩ T(B)| / |T(A)|
    >= num/den with a != b — "A is (nearly) a subset of B", the
    ASYMMETRIC near-dup relation Jaccard misses (a tweet quoted inside
    an article scores Jaccard ~0 but containment 1.0; quotes, excerpts
    and boilerplate supersets are what corpus-subsumption dedup removes).
    The prefix-filter generalization for overlap-constrained joins is
    Xiao et al. WWW'08 (PPJoin's framework covers arbitrary overlap
    bounds); this is its containment instantiation:

    1. Docs ordered exactly as d12 (:func:`_df_ordered_docs`): distinct
       tokens, global (df ASC, token ASC) order, row-local sort.
    2. Only the CONTAINED side gets a prefix: overlap must reach
       o = ceil(t*|A|), so A's first ``|A| - o + 1`` tokens (rarest
       first) must witness any qualifying B — pigeonhole on A alone:
       the suffix holds o-1 < o tokens, so all o shared tokens cannot
       avoid the prefix. B is indexed by its FULL token set (containment
       is asymmetric — B may be arbitrarily large, so no symmetric
       length/prefix cut exists on B; the only sound B-side prune is
       |B| >= o).
    3. Candidates: prefix(A) x full(B) token equi-join, a != b,
       den*|B| >= num*|A| (integer form of |B| >= ceil(t*|A|)).
    4. Verify exactly: array_intersect on the full sorted arrays, keep
       den*i >= num*|A|.

    Thresholds are rational; every filter is integer cross-multiplied
    (the d12 discipline) — the rounded ``containment`` is display-only.

    100 TB shape: the B-side full explode is the inverted index (the
    word-count / BM25 shuffle, linear in corpus tokens); the A-side
    explode is only ~(1-t)|A|+1 rare-first tokens per doc, so a token
    shared by k docs joins against at most the few prefixes it appears
    in — hub tokens sit deep in every doc's df-ordered array and almost
    never enter a prefix. Like every exact pair enumeration the OUTPUT
    is quadratic in subsumption-cluster size; ``min_size`` drops tiny
    contained sets (a 2-token doc is "contained" everywhere —
    signal-free rows that dominate the output on template corpora).
    """
    docs = _df_ordered_docs(df, id_col, text_col)
    return _containment_join(docs, docs, num, den, min_size, self_pairs=False)


def _containment_join(
    da_docs: DataFrame,
    db_docs: DataFrame,
    num: int,
    den: int,
    min_size: int,
    self_pairs: bool,
) -> DataFrame:
    """Prefix-filtered directed containment A-in-B over two (did, toks,
    sz) frames sharing one token total order (steps 2-4 of
    :func:`containment_pairs`, factored so the cross-corpus decontam
    form reuses the identical candidate/verify machinery).
    ``self_pairs=False`` adds the a != b guard for the self-join form;
    cross-corpus callers keep identical-id pairs (the same doc present
    in both corpora IS a contamination hit).

    Each ordered frame feeds two consumers (prefix/full explode AND the
    verify-side array lookup), and exchange reuse does not fire across
    the differently-projected join sides (the minhash funnel's measured
    lesson) — so both frames are persisted here; a self-join caller
    passing the same object persists once."""
    from pyspark.storagelevel import StorageLevel

    da_docs = da_docs.persist(StorageLevel.MEMORY_AND_DISK)
    db_docs = db_docs.persist(StorageLevel.MEMORY_AND_DISK)
    pref = da_docs.filter(F.col("sz") >= min_size).select(
        F.col("did").alias("_a"),
        F.col("sz").alias("_sa"),
        F.explode(
            F.expr(f"slice(toks, 1, sz - (({num} * sz + {den} - 1) div {den}) + 1)")
        ).alias("t"),
    )
    full = db_docs.select(
        F.col("did").alias("_b"), F.col("sz").alias("_sb"), F.explode("toks").alias("t")
    )
    cond = (pref["t"] == full["t"]) & (den * F.col("_sb") >= num * F.col("_sa"))
    if not self_pairs:
        cond = cond & (F.col("_a") != F.col("_b"))
    cand = pref.join(full, cond).select("_a", "_b", "_sa").distinct()
    da = da_docs.select(F.col("did").alias("_a"), F.col("toks").alias("_ta"))
    db = db_docs.select(F.col("did").alias("_b"), F.col("toks").alias("_tb"))
    i = F.size(F.array_intersect("_ta", "_tb"))
    return (
        cand.join(da, "_a")
        .join(db, "_b")
        .withColumn("_i", i)
        .filter(den * F.col("_i") >= num * F.col("_sa"))
        .select(
            F.col("_a").alias("doc_id_a"),
            F.col("_b").alias("doc_id_b"),
            F.round(F.col("_i") / F.col("_sa"), 6).alias("containment"),
        )
    )


def cross_containment_pairs(
    bench: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num: int = 9,
    den: int = 10,
    min_size: int = 1,
) -> DataFrame:
    """DECONTAMINATION-shaped directed containment: every benchmark doc
    A whose token set is >= num/den contained in some training-corpus
    doc B — the span-level complement of the 8-gram scan (t8/x10). An
    eval passage quoted inside a long training document scores Jaccard
    ~0 (the big doc's extra tokens swamp the union) but containment 1.0;
    n-gram decontam misses paraphrase-reordered quotes whose token SET
    survives. Same machinery as :func:`containment_pairs`
    (prefix-filter on the contained side only, Xiao WWW'08; integer
    cross-multiplied thresholds) with two inputs: the token
    doc-frequency total order is computed over the UNION of both
    corpora (one shared order keeps each benchmark prefix rare-first
    against the corpus-side index; any fixed order is CORRECT — the
    pigeonhole is on A alone — df order is the performance choice).
    Identical ids on both sides are reported, not skipped: the same doc
    present in both corpora is the strongest contamination hit.

    100 TB shape: B-side full explode is the inverted-index shuffle
    (linear in corpus tokens); the A side is tiny by construction
    (benchmarks are MBs, not TBs) and its prefixes are ~(1-t)|A|+1
    tokens, so this is effectively a broadcast-scale probe against a
    corpus-sized index. Output: (doc_id_a=bench, doc_id_b=corpus,
    containment)."""
    from kafka_streaming_polymarket_pipeline_spark.operators.text import tokens

    def tok_pairs(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(id_col).alias("did"),
            F.explode(F.array_distinct(tokens(F.lower(F.col(text_col))))).alias("t"),
        )

    ta, tb = tok_pairs(bench), tok_pairs(corpus)
    tok_df = ta.unionByName(tb).groupBy("t").agg(F.count("*").alias("tdf"))

    def ordered(tok: DataFrame) -> DataFrame:
        return (
            tok.join(tok_df, "t")
            .groupBy("did")
            .agg(F.sort_array(F.collect_list(F.struct("tdf", "t"))).alias("_o"))
            .select(
                "did",
                F.expr("transform(_o, x -> x.t)").alias("toks"),
                F.size("_o").alias("sz"),
            )
        )

    return _containment_join(
        ordered(ta), ordered(tb), num, den, min_size, self_pairs=True
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
) -> DataFrame:
    """PARAGRAPH-granularity exact dedup — the sub-document pass
    production pipelines run alongside whole-doc dedup (C4's
    three-sentence rule, RefinedWeb's line-level dedup): split each doc
    into non-overlapping ``size``-token paragraphs (t15's splitter with
    stride == size; this corpus has no newline/sentence boundaries, so
    the fixed window IS the paragraph), drop every paragraph occurrence
    except the globally FIRST (min (doc_id, idx) over identical text —
    d1's exact-hash rule at paragraph grain; intra-doc repeats dedup
    too), and reassemble survivors in reading order (t19's rebuild
    shape). One row per INPUT doc — untouched docs hash too, so silent
    over-removal anywhere flips the gate.

    Scale: one groupBy on paragraph text (the d1 shuffle, map-side
    combined), one join back, one per-doc rebuild groupBy. No windows
    over unbounded partitions, no doc x doc anything. Output:
    (doc_id, text_clean, n_paras, n_removed)."""
    from kafka_streaming_polymarket_pipeline_spark.operators.text import passage_chunks

    paras = passage_chunks(
        df, size=size, stride=size, id_col=id_col, text_col=text_col
    ).select("doc_id", "chunk_idx", F.col("chunk_text").alias("_pt"))
    canon = paras.groupBy("_pt").agg(
        F.min(F.struct(F.col("doc_id"), F.col("chunk_idx"))).alias("_k")
    )
    kept = paras.join(canon, "_pt").filter(
        (F.col("doc_id") == F.col("_k")["doc_id"])
        & (F.col("chunk_idx") == F.col("_k")["chunk_idx"])
    )
    return _rebuild_kept_windows(df, id_col, paras, kept)


def boilerplate_scrub(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    max_doc_freq: int = 1,
) -> DataFrame:
    """Corpus-frequency boilerplate removal — the CCNet/RefinedWeb pass
    that deletes EVERY occurrence of a paragraph seen in more than
    ``max_doc_freq`` distinct documents (headers, footers, license
    blocks, navigation chrome). The keep rule is the semantic complement
    of paragraph_dedup/d17: d17 keeps one canonical copy of a repeated
    paragraph; this keeps none — repeated content is treated as
    template noise, not as content that deserves a canonical survivor.
    Intra-doc repeats with doc-frequency 1 survive (they are stylistic,
    not cross-doc boilerplate).

    Scale: one groupBy(paragraph) count-distinct (map-side partials on
    (_pt, doc_id) then _pt), then a LEFT ANTI join of the window table
    against the frequent set — by Zipf the frequent side is a tiny
    fraction of distinct windows (317 of 10,387 at sf0.1), so at corpus
    scale it broadcasts and the scrub is map-side; the reassembly is
    d17's per-doc rebuild. No windows over unbounded partitions, no
    doc x doc anything. Output: (doc_id, text_clean, n_paras,
    n_removed) — one row per INPUT doc so over-removal flips the gate."""
    from kafka_streaming_polymarket_pipeline_spark.operators.text import passage_chunks

    paras = passage_chunks(
        df, size=size, stride=size, id_col=id_col, text_col=text_col
    ).select("doc_id", "chunk_idx", F.col("chunk_text").alias("_pt"))
    frequent = (
        paras.groupBy("_pt")
        .agg(F.countDistinct("doc_id").alias("_df"))
        .filter(F.col("_df") > max_doc_freq)
        .select("_pt")
    )
    kept = paras.join(frequent, "_pt", "left_anti")
    return _rebuild_kept_windows(df, id_col, paras, kept)


def _rebuild_kept_windows(
    df: DataFrame, id_col: str, paras: DataFrame, kept: DataFrame
) -> DataFrame:
    """Reading-order reassembly + removal accounting shared by the exact
    (d17) and fuzzy (d18) paragraph-dedup forms: ``paras`` is every
    window (doc_id, chunk_idx, _pt), ``kept`` its surviving subset.
    One row per INPUT doc so untouched docs hash too."""
    rebuilt = kept.groupBy("doc_id").agg(
        F.array_join(
            F.expr(
                "transform(sort_array(collect_list(struct(chunk_idx, _pt))),"
                " x -> x._pt)"
            ),
            " ",
        ).alias("text_clean"),
        F.count("*").alias("_nk"),
    )
    tot = paras.groupBy("doc_id").agg(F.count("*").alias("_np"))
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(tot, "doc_id", "left")
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("text_clean", F.lit("")).alias("text_clean"),
            F.coalesce("_np", F.lit(0)).cast("long").alias("n_paras"),
            (F.coalesce("_np", F.lit(0)) - F.coalesce("_nk", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


# windows per doc headroom for the fuzzy-grain window id encoding: a doc
# would need > 2^20 windows (32M+ tokens) before (doc_id, chunk_idx)
# stopped packing injectively — far beyond any document.
PARA_WID_MULT = 1 << 20


def paragraph_neardup_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 32,
    threshold: float = 0.5,
    n: int = 5,
    wid_mult: int = PARA_WID_MULT,
) -> DataFrame:
    """FUZZY paragraph-grain dedup — d17's sub-document pass with d3's
    near-dup relation instead of exact equality (the Dolma/RefinedWeb
    combination: fuzzy matching at sub-document granularity, so lightly
    edited boilerplate paragraphs — dates bumped, names swapped — dedup
    where the exact pass misses): split into non-overlapping
    ``size``-token windows, find EXACT-verified Jaccard >= threshold
    window pairs via the d3 MinHash funnel (windows become docs under a
    packed id wid = doc_id * 2^20 + idx, injective and reading-ordered),
    close the pair relation into clusters with large-star/small-star CC,
    keep each cluster's minimum-wid window (= globally first occurrence
    in reading order, d17's rule lifted to the fuzzy closure; singletons
    keep themselves), and reassemble survivors per doc.

    Windows shorter than the shingle width n have no shingles, never
    pair, and always survive — the relation is near-duplicate AT SHINGLE
    GRAIN, exactly d3's contract.

    Scale: the funnel is d3's (banded candidate generation, never
    window x window); CC is O(log^2) star rounds over the pair graph;
    reassembly is d17's per-doc groupBy. Output d17's schema:
    (doc_id, text_clean, n_paras, n_removed).

    Injectivity guard (ADVICE r09): the packed wid is injective and
    reading-ordered ONLY for 0 <= doc_id < 2^63 / wid_mult and
    0 <= chunk_idx < wid_mult; a negative doc_id or a doc with >=
    wid_mult windows (33M+ tokens at the default 2^20 x 32-token
    windows) would silently collide into a neighbouring doc's window
    space — and the oracle shares the formula, so the hash gate could
    not catch it. Out-of-range rows now raise from inside the plan
    (executor-side, no driver scan) instead of corrupting the
    min-wid first-occurrence rule."""
    from kafka_streaming_polymarket_pipeline_spark.operators.text import passage_chunks

    doc_cap = (1 << 63) // wid_mult
    in_range = (
        (F.col("doc_id") >= 0)
        & (F.col("doc_id") < F.lit(doc_cap))
        & (F.col("chunk_idx") < F.lit(wid_mult))
    )
    paras = passage_chunks(
        df, size=size, stride=size, id_col=id_col, text_col=text_col
    ).select(
        "doc_id",
        "chunk_idx",
        F.col("chunk_text").alias("_pt"),
        F.when(
            in_range, F.col("doc_id") * F.lit(wid_mult) + F.col("chunk_idx")
        )
        .otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "paragraph_neardup_dedup: wid packing out of range "
                        f"(need 0 <= doc_id < {doc_cap} and chunk_idx < "
                        f"{wid_mult}); got doc_id="
                    ),
                    F.col("doc_id").cast("string"),
                    F.lit(" chunk_idx="),
                    F.col("chunk_idx").cast("string"),
                )
            )
        )
        .cast("long")
        .alias("wid"),
    )
    wdocs = paras.select(F.col("wid").alias("doc_id"), F.col("_pt").alias("text"))
    # r11 negative result (VERDICT r10 task 4 proposed routing this
    # funnel through OPH signatures): MEASURED SLOWER at window grain —
    # d18 25.0 s -> 29.2 s at sf0.1 (min-of-2, same box/protocol) with
    # the restructured _oph_payload, vs d3d's 22.7 -> 17.5 s gain on
    # doc grain. At window grain the per-group state is small (~150
    # chars/window), so _sig_payload's ONE combined groupBy beats OPH's
    # two aggregation levels: the extra (wid, bin)-grain shuffle +
    # ObjectHashAggregate outweighs replacing 128 multiply-mods/shingle
    # with one hash. Kept on the single-pass exact funnel.
    pairs = minhash_lsh_dedup(wdocs, threshold=threshold, n=n)
    labels = neardup_clusters_star(wdocs, pairs).select(
        F.col("doc_id").alias("wid"), "cluster_id"
    )
    kept = (
        paras.join(labels, "wid")
        .filter(F.col("wid") == F.col("cluster_id"))
        .select("doc_id", "chunk_idx", "_pt")
    )
    return _rebuild_kept_windows(df, id_col, paras, kept)
