"""Text-analysis operators for large-scale training-data pipelines.

Column-level builders (pure ``pyspark.sql.functions`` — JVM-side,
whole-stage-codegen, zero Python UDFs) for:

- tokenization + token statistics
- language identification (stopword-vote n-gram heuristic)
- quality scoring (length / character-class / stopword ratios)
- document fingerprinting (normalized-content hash + polynomial rolling hash)

All are deterministic and engine-portable: each has an exact ANSI-SQL
equivalent used as the DuckDB oracle in plans/text_plans.py.

Scale: every function is row-local (no shuffle); applied to 100 TB of
documents they parallelize embarrassingly across partitions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Stopword vote sets for the language-ID heuristic. Deterministic argmax
# with fixed precedence (en > es > fr > de); all-zero votes -> 'unknown'.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "los", "que", "y", "es"),
    "fr": ("le", "les", "des", "et", "une", "est"),
    "de": ("der", "die", "und", "das", "von", "ist"),
}

FP_MOD = 1_000_000_007
FP_BASE = 31


def tokens(text: Column) -> Column:
    """Non-empty whitespace tokens (single-space split; '' filtered)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def _gram_join(toks: Column, n: int) -> Column:
    """Space-joined n-grams by zip_with-ing n shifted slices — O(n * len)
    per document. The transform+slice(toks, i, n) form re-evaluates the
    whole tokenize expression per gram index (O(len^2) per doc; the t12
    bigram build measured 7.2 s -> 1.3 s at sf0.1 from this same fix)."""
    cnt = F.size(toks) - (n - 1)
    acc = F.slice(toks, 1, cnt)
    for s in range(1, n):
        acc = F.zip_with(
            acc, F.slice(toks, 1 + s, cnt), lambda a, b: F.concat(a, F.lit(" "), b)
        )
    return acc


def token_ngrams(text: Column, n: int = 8) -> Column:
    """Distinct space-joined token n-grams — the unit of benchmark
    decontamination checks (GPT-3-style n-gram collision scanning)."""
    toks = tokens(text)
    return F.when(F.size(toks) >= n, F.array_distinct(_gram_join(toks, n))).otherwise(
        F.array().cast("array<string>")
    )


def char_shingles(text: Column, n: int = 5) -> Column:
    """Distinct overlapping character n-grams of ``text``."""
    idx = F.sequence(F.lit(1), F.length(text) - (n - 1))
    grams = F.transform(idx, lambda i: text.substr(i, F.lit(n)))
    return F.when(F.length(text) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def lang_votes(text: Column) -> dict[str, Column]:
    """Per-language stopword vote counts over the lowercased token list."""
    toks = tokens(F.lower(text))
    return {
        lang: F.size(F.filter(toks, lambda t: t.isin(*words))).cast("long")
        for lang, words in LANG_STOPWORDS.items()
    }


def lang_id(text: Column) -> Column:
    """Argmax language with fixed precedence; 'unknown' when no votes.

    CASE chain in precedence order: a language wins if it has >0 votes and
    >= every other language's votes; the first winner in chain order takes
    ties. Mirrored verbatim by the SQL oracle.
    """
    v = lang_votes(text)
    order = list(LANG_STOPWORDS)
    expr = None
    for lang in order:
        cond = v[lang] > 0
        for other in order:
            if other != lang:
                cond = cond & (v[lang] >= v[other])
        expr = F.when(cond, lang) if expr is None else expr.when(cond, lang)
    return expr.otherwise("unknown")


def quality_features(text: Column) -> dict[str, Column]:
    """Length / character-class / stopword ratio features, all rational
    arithmetic (no transcendentals) so any engine reproduces them bit-for-bit."""
    n_tok = token_count(text)
    n_char = F.length(text).cast("long")
    lower = F.lower(text)
    alpha_chars = F.length(F.regexp_replace(lower, "[^a-z]", "")).cast("long")
    digit_chars = F.length(F.regexp_replace(lower, "[^0-9]", "")).cast("long")
    en_votes = F.size(
        F.filter(tokens(lower), lambda t: t.isin(*LANG_STOPWORDS["en"]))
    ).cast("long")
    safe_tok = F.greatest(n_tok, F.lit(1).cast("long"))
    safe_char = F.greatest(n_char, F.lit(1).cast("long"))
    return {
        "n_tokens": n_tok,
        "n_chars_computed": n_char,
        "avg_token_len": (n_char - (n_tok - 1)) / safe_tok,  # chars minus separators
        "alpha_ratio": alpha_chars / safe_char,
        "digit_ratio": digit_chars / safe_char,
        "stopword_ratio": en_votes / safe_tok,
    }


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: favors stopword presence, alphabetic
    content, and length up to 100 tokens; penalizes digit noise."""
    f = quality_features(text)
    raw = (
        0.3 * f["stopword_ratio"]
        + 0.3 * f["alpha_ratio"]
        + 0.4 * (F.least(f["n_tokens"], F.lit(100).cast("long")) / 100.0)
        - 0.5 * f["digit_ratio"]
    )
    return F.greatest(F.lit(0.0), F.least(F.lit(1.0), raw))


def content_fingerprint(text: Column) -> Column:
    """Normalized-content hash: md5 of lowercased, whitespace-collapsed text.
    Two documents differing only in case/whitespace share a fingerprint."""
    norm = F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))
    return F.md5(norm)


# BPE-ish pre-tokenization: letter runs | digit runs | single non-space
# symbol — the coarse split BPE vocabularies train over. Kept to a regex
# class-subset both Spark (Java regex) and DuckDB (RE2) interpret
# identically.
BPE_TOKEN_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_tokens(text: Column) -> Column:
    """BPE-style pre-tokens (letter runs, digit runs, single symbols)."""
    return F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokens(text)).cast("long")


# Winnowing (Schleimer et al., SIGMOD 2003): from the rolling k-gram hash
# sequence, keep the minimum hash of every w-hash window (rightmost min on
# ties). Guarantees every match of length >= w+k-1 shares a fingerprint
# while storing ~2/(w+1) of the hashes.
WINNOW_POS_LIMIT = 100_000  # > max grams per doc; packs (hash, pos) into one long


def _gram_hash(gram: Column) -> Column:
    """Portable 32-bit k-gram hash: first 8 hex digits of md5 (the DuckDB
    oracle reproduces it exactly; xxhash64 would be Spark-only)."""
    return F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("bigint")


def winnow_fingerprints(
    df, id_col: str = "doc_id", text_col: str = "text", k: int = 5, w: int = 4
):
    """Winnowing fingerprint rows (doc_id, pos, fp) — the selected k-gram
    hashes and their 1-based positions.

    Entirely row-local: k-gram hashes and the per-window minima are array
    expressions over each document, with the (hash, pos) pair packed into
    one long — min gives the smallest hash and, on ties, the rightmost
    position (the robust-winnowing rule). The obvious alternative (explode
    grams, per-doc window min over [current, w-1 following]) produces the
    identical result (measured equal at sf0.1) but exchanges every gram
    row on doc_id for the window sort — ~5 rows shuffled per input char,
    which at corpus scale is the whole job. This form shuffles nothing
    and parallelizes purely by input split.
    """
    n_grams = F.length(text_col) - (k - 1)
    grams = F.transform(
        F.sequence(F.lit(1), n_grams), lambda i: F.col(text_col).substr(i, F.lit(k))
    )
    # i is the 0-based element index -> 1-based gram position is i+1
    hp = F.transform(
        grams,
        lambda g, i: _gram_hash(g) * WINNOW_POS_LIMIT
        + (F.lit(WINNOW_POS_LIMIT - 1) - (i + 1)),
    )
    base = df.filter(F.length(text_col) >= k + w - 1).select(
        F.col(id_col).alias("doc_id"), hp.alias("hp"), n_grams.alias("n_grams")
    )
    sel = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.col("n_grams") - (w - 1)),
            lambda i: F.array_min(F.slice("hp", i, w)),
        )
    )
    return base.select("doc_id", F.explode(sel).alias("hp")).select(
        "doc_id",
        (F.lit(WINNOW_POS_LIMIT - 1) - F.col("hp") % WINNOW_POS_LIMIT).alias("pos"),
        F.expr(f"hp div {WINNOW_POS_LIMIT}").alias("fp"),
    )


def rolling_hash(text: Column) -> Column:
    """Polynomial rolling hash over character codes:
    ``h = fold(chars, 0, (acc, c) -> (acc*31 + ascii(c)) % 1_000_000_007)`` —
    the order-sensitive fingerprint family used for shingling/winnowing."""
    codes = F.transform(F.split(text, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + c) % FP_MOD,
    )


# PII redaction: regex surface scrubbing (emails, SSNs, phones, IPv4),
# the pre-training privacy pass every public-web corpus gets. Patterns
# are kept to the syntax subset Java regex (Spark) and RE2 (DuckDB)
# interpret identically — no lookaround, no backreferences — so the
# redacted output is bit-identical across engines. Applied in a fixed
# order (email, ssn, phone, ip) because order changes what a later
# pattern can still see.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-category PII match counts over the ORIGINAL text (counted
    before any replacement so categories don't mask each other)."""
    return {
        name: F.regexp_count(text, F.lit(pat)).cast("long")
        for name, pat, _ in PII_PATTERNS
    }


def redact_pii(text: Column) -> Column:
    """Replace every PII match with its typed placeholder, fixed order."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


# Repetition statistics (the Gopher/MassiveText repetition filters,
# Rae et al. 2021 §A1.1): excessive word / n-gram repetition marks
# low-quality machine-generated or boilerplate text. All row-local
# rational arithmetic — zero shuffle at any scale.
def token_ngrams_all(text: Column, n: int) -> Column:
    """ALL overlapping token n-grams (duplicates kept — repetition
    analysis needs multiplicity, unlike decontamination's distinct set)."""
    toks = tokens(text)
    return F.when(F.size(toks) >= n, _gram_join(toks, n)).otherwise(
        F.array().cast("array<string>")
    )


def repetition_features(text: Column) -> dict[str, Column]:
    """dup_word_frac, top_word_frac, dup_{2,3}gram_frac — each a ratio of
    duplicate mass to total (0 = no repetition)."""
    toks = tokens(text)
    n_tok = F.size(toks).cast("long")
    safe_tok = F.greatest(n_tok, F.lit(1).cast("long"))
    top_freq = F.coalesce(
        F.array_max(
            F.transform(
                F.array_distinct(toks),
                lambda w: F.size(F.filter(toks, lambda x: x == w)),
            )
        ),
        F.lit(0),
    ).cast("long")

    def dup_frac(grams: Column) -> Column:
        total = F.size(grams).cast("long")
        return (total - F.size(F.array_distinct(grams)).cast("long")) / F.greatest(
            total, F.lit(1).cast("long")
        )

    return {
        "n_tokens": n_tok,
        "dup_word_frac": dup_frac(toks),
        "top_word_frac": top_freq / safe_tok,
        "dup_2gram_frac": dup_frac(token_ngrams_all(text, 2)),
        "dup_3gram_frac": dup_frac(token_ngrams_all(text, 3)),
    }


# ---------------------------------------------------------------------------
# Corpus-level text statistics (TF-IDF, n-gram LM scoring, boilerplate
# coverage). Unlike the row-local features above, these join each document
# against corpus aggregates — the joins are all equi-joins on token/gram
# keys (shuffle on the key, map-side partial counts), never doc×doc.
# ---------------------------------------------------------------------------


def tfidf_top_terms(
    df, id_col: str = "doc_id", text_col: str = "text", n_top: int = 5
):
    """Top-``n_top`` TF-IDF terms per document (sklearn smooth-idf formula:
    ``idf = ln((1+N)/(1+df)) + 1``), ties broken by token ascending.

    Scale shape: one explode → (doc, token) count shuffle for tf; one
    token-key shuffle for df; N rides along as a 1-row frame (crossJoin of
    an aggregate — broadcast by construction, never a driver collect).
    The df side is O(vocab) and joins tf on token — at 100 TB the vocab
    frame is still small enough to broadcast; the hint stays advisory so
    AQE may pick shuffle-hash when it is not.
    """
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    doc_freq = tf.groupBy("token").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(doc_freq), "token")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            # Rank over the ROUNDED score: the DuckDB oracle orders by
            # round(tfidf, 6), and ranking the unrounded value here would let
            # sub-1e-6 score gaps order differently across engines.
            F.round(
                F.col("tf")
                * (F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + F.lit(1.0)),
                6,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= n_top)
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            "tfidf",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def bigram_lm_scores(df, id_col: str = "doc_id", text_col: str = "text"):
    """Per-document average bigram log-probability under an add-one-smoothed
    corpus bigram LM: ``lp(w1 w2) = ln((c(w1,w2)+1) / (c(w1)+V))`` — the
    CCNet/KenLM-style perplexity quality gate, with the LM learned from the
    corpus itself in the same job.

    Scale shape: bigrams are built row-locally (array slide, no
    positional self-join); the LM tables are groupBy counts on token /
    (w1,w2) keys; scoring joins each doc's bigram instances against the
    two count tables on those keys. No stage is ever doc×doc.
    """
    toks = tokens(F.lower(F.col(text_col)))
    # zip_with over two slices, NOT transform+element_at: element_at(toks, i)
    # re-evaluates the tokenize expression per element (O(len^2) per doc —
    # measured 7.2 s vs 1.3 s for the gram build at sf0.1).
    pairs = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, F.size(toks) - 1),
            F.slice(toks, 2, F.size(toks) - 1),
            lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    grams = df.select(
        F.col(id_col).alias("doc_id"), F.explode(pairs).alias("g")
    ).select("doc_id", "g.w1", "g.w2")

    unigrams = df.select(F.explode(toks).alias("token"))
    c1 = unigrams.groupBy("token").agg(F.count("*").alias("c1"))
    vocab = unigrams.agg(F.countDistinct("token").alias("v"))
    c2 = grams.groupBy("w1", "w2").agg(F.count("*").alias("c2"))

    # The count tables are O(vocab) / O(distinct bigrams) — too big to
    # force-broadcast (measured 9.7 s vs 3.4 s at sf0.1); unhinted, AQE
    # broadcasts them only when they are actually small. The one-row
    # vocab frame is always broadcast.
    scored = (
        grams.join(c2, ["w1", "w2"])
        .join(c1, F.col("w1") == F.col("token"))
        .crossJoin(F.broadcast(vocab))
        .withColumn("lp", F.log((F.col("c2") + 1.0) / (F.col("c1") + F.col("v"))))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
    )


def boilerplate_ngram_coverage(
    df, id_col: str = "doc_id", text_col: str = "text", n: int = 8, min_df: int = 3
):
    """Fraction of each document's distinct token ``n``-grams that are
    corpus-boilerplate (appearing in >= ``min_df`` documents) — the
    CCNet-style shared-span detector for template/boilerplate text when
    documents carry no line structure.

    Scale shape: distinct grams per doc are row-local; the document
    frequency is one groupBy on the gram key (grams are distinct within a
    doc, so count(*) IS the doc-frequency); coverage joins each doc's
    grams back on the same key. Gram-key equi-joins only.
    """
    grams = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(token_ngrams(F.lower(F.col(text_col)), n)).alias("g"),
    )
    gram_df = grams.groupBy("g").agg(F.count("*").alias("gdf"))
    per_doc = (
        grams.join(gram_df, "g")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum((F.col("gdf") >= min_df).cast("long")).alias("n_boilerplate"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_grams", F.lit(0).cast("long")).alias("n_grams"),
            F.coalesce("n_boilerplate", F.lit(0).cast("long")).alias("n_boilerplate"),
            F.round(
                F.coalesce("n_boilerplate", F.lit(0).cast("long"))
                / F.greatest(F.coalesce("n_grams", F.lit(0).cast("long")), F.lit(1).cast("long")),
                6,
            ).alias("boilerplate_frac"),
        )
    )


def _hashed_gram_keys(hs: Column, n: int) -> Column:
    """64-bit key per token n-gram start position: per-token xxhash64
    values folded pairwise through ``n`` shifted zip_with passes —
    O(n * len) codegen'd work, O(1) key bytes per position (building
    n-token gram STRINGS measured 25.6 s -> 17.4 s slower at sf0.1 in
    the t14 scrub; same hashed-key precedent and ~5e-15/pair collision
    tolerance as the MinHash funnel's hashed-shingle verify)."""
    cnt = F.size(hs) - (n - 1)
    acc = F.slice(hs, 1, cnt)
    for s in range(1, n):
        acc = F.zip_with(
            acc,
            F.slice(hs, 1 + s, cnt),
            lambda a, b: F.xxhash64(a, b),  # ANSI-safe 64-bit mix
        )
    return acc


def _dup_gram_starts(df, id_col: str, text_col: str, min_len: int, min_count: int):
    """Shared ExactSubstr discovery stage: ``(base, starts)`` where
    ``base`` is (doc_id, toks, grams) over RAW-CASE tokens and
    ``starts`` is (doc_id, gpos) for every ``min_len``-gram window with
    >= ``min_count`` occurrences CORPUS-WIDE (an intra-doc repeat
    qualifies — the occurrence count is over positions, not documents).
    One groupBy on the hashed gram key + one gram-key equi-join."""
    toks = tokens(F.col(text_col))
    tok_hashes = F.transform(toks, lambda t: F.xxhash64(t))
    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("toks"),
        F.when(F.size(tok_hashes) >= min_len, _hashed_gram_keys(tok_hashes, min_len))
        .otherwise(F.array().cast("array<long>"))
        .alias("grams"),
    )
    pos_grams = base.select("doc_id", F.posexplode("grams").alias("gpos", "g"))
    dup = (
        pos_grams.groupBy("g")
        .agg(F.count("*").alias("occ"))
        .filter(F.col("occ") >= min_count)
        .select("g")
    )
    starts = pos_grams.join(dup, "g").select("doc_id", "gpos")
    return base, starts


def exact_substr_spans(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
    min_count: int = 2,
):
    """Maximal duplicated-substring spans — the ExactSubstr accounting of
    Lee et al. 2022 §4.1 ("Deduplicating Training Data Makes Language
    Models Better") at token granularity: one row per MAXIMAL run of
    token positions covered by a duplicated substring of >= ``min_len``
    tokens, i.e. exactly the set ExactSubstr removes.

    Why fixed ``min_len``-grams compute the MAXIMAL-span semantics
    exactly (no over-/under-shoot): a position p lies inside some
    duplicated substring of length >= L iff some L-window containing p
    is duplicated — every L-window of a duplicated span is itself a
    substring of both copies (hence duplicated), and a duplicated
    L-window IS a duplicated span of length L. So the union of
    duplicated L-gram windows equals the union of maximal duplicated
    substrings >= L, and its maximal contiguous runs are this output.
    Lee et al.'s suffix array is the single-machine ENGINE for finding
    that set over raw bytes; the relational form needs no suffix order
    because the L-gram key equi-join discovers the same occurrences.

    Two deliberate deltas from ``scrub_duplicated_spans`` (t14), which
    this COMPLETES rather than replaces: duplication counts OCCURRENCES
    corpus-wide (``min_count`` >= 2 matches a doc repeating a span
    internally — doc-frequency counting is blind to those), and
    matching is case-sensitive on raw tokens (exact substring
    semantics; t14's boilerplate scrub deliberately folds case).

    Scale shape (no doc x doc, no suffix sort): gram keys are 64-bit
    hash folds (O(min_len * len) codegen work per doc, one long per
    position — the shuffle is ONE hashed key per corpus token, the
    word-count shape); occurrence counting is one groupBy with map-side
    partial aggregation; start positions come back on a gram-key
    equi-join; run merging is gaps-and-islands over a window
    PARTITIONED BY doc (state bounded by per-doc start count). At
    100 TB nothing materializes driver-side and the only unbounded
    dimension — the duplicated-gram table — shuffles on the gram key
    like any word count. Output: (doc_id, span_start, span_end,
    span_len), token positions 0-based inclusive.
    """
    from pyspark.sql import Window

    _base, starts = _dup_gram_starts(df, id_col, text_col, min_len, min_count)
    # gaps-and-islands: two duplicated windows [s1, s1+L-1], [s2, s2+L-1]
    # (s1 < s2) belong to one covered run iff s2 <= s1 + L (overlap or
    # adjacency); the window partitions by doc, so its state is bounded
    # by the per-doc duplicated-start count
    w = Window.partitionBy("doc_id").orderBy("gpos")
    brk = (
        F.when(F.col("gpos") - F.lag("gpos").over(w) <= min_len, F.lit(0))
        .otherwise(F.lit(1))
    )
    runs = starts.withColumn("run_id", F.sum(brk).over(w))
    return (
        runs.groupBy("doc_id", "run_id")
        .agg(
            F.min("gpos").cast("int").alias("span_start"),
            (F.max("gpos") + (min_len - 1)).cast("int").alias("span_end"),
        )
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).cast("long").alias("span_len"),
        )
    )


def exact_substr_scrub(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_len: int = 50,
    min_count: int = 2,
):
    """The ExactSubstr REWRITE (Lee et al. 2022 §4.1): drop every token
    position inside a duplicated substring of >= ``min_len`` tokens
    (occurrence-counted corpus-wide — see :func:`exact_substr_spans`
    for the covering-equivalence proof that fixed L-grams compute the
    maximal-span removal set exactly), re-join the survivors in order.
    Completes t18 the way t14 completes t13: t18 is the span AUDIT
    table, this is the mutation a cleaning pipeline applies before
    packing. Same deltas vs ``scrub_duplicated_spans``: occurrences
    not doc-frequency, raw-case matching, paper-default L=50.

    Plan: the shared discovery stage (one hashed-gram-key groupBy +
    one equi-join), then per-doc start lists and the row-local
    covered-range token filter (t14's measured rewrite shape — no
    position explode, no (doc, pos) anti-join). ``base`` persists
    across its discovery and rebuild consumers, the same
    multi-consumer trade t14 measured (7.6 s -> ~4 s at sf0.1)."""
    from pyspark import StorageLevel

    base, starts = _dup_gram_starts(df, id_col, text_col, min_len, min_count)
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    matched = starts.groupBy("doc_id").agg(F.collect_list("gpos").alias("starts"))
    joined = base.join(matched, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce("starts", F.array().cast("array<int>")).alias("starts"),
    )
    kept = F.filter(
        F.col("toks"),
        lambda _t, i: ~F.exists(
            F.col("starts"), lambda s: (i >= s) & (i <= s + (min_len - 1))
        ),
    )
    return joined.select(
        "doc_id",
        F.array_join(kept, " ").alias("text_clean"),
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
    )


def scrub_duplicated_spans(
    df, id_col: str = "doc_id", text_col: str = "text", n: int = 8, min_df: int = 3
):
    """Remove duplicated token spans from each document: any token
    position covered by an ``n``-gram that appears in >= ``min_df``
    documents is dropped, and the surviving tokens are re-joined in
    order — the REWRITE counterpart of ``boilerplate_ngram_coverage``
    (which only measures). This is the span-level dedup of Lee et al.
    2022 ("Deduplicating Training Data Makes Language Models Better"),
    re-expressed relationally: their suffix-array pass finds duplicated
    substrings; here the unit is the token n-gram, which makes every
    step an equi-join on the gram key.

    Gram matching is case-insensitive; the emitted text keeps the
    original-case tokens that survive. Documents whose every position is
    covered come out as '' with n_removed == n_tokens.

    Scale shape (no doc x doc anywhere): positioned grams are row-local;
    doc-frequency is one groupBy on the gram key; matching start
    positions come back to each doc via one equi-join + groupBy(doc);
    the rewrite itself is row-local (covered-range filter over the token
    array). At 100 TB the boilerplate set is the corpus's shared mass —
    it shuffles on the gram key like any word-count, never materializing
    on the driver.

    Two measured choices (sf0.1, fresh sessions):
    - The gram key is a 64-bit hash (per-token xxhash64 folded pairwise
      through ``n`` shifted zip_with passes), not the joined gram
      string — building n-token strings per position dominated the wall
      (25.6 s -> 17.4 s cold from this alone). Same hashed-key
      precedent and collision tolerance as the MinHash funnel's
      hashed-shingle verify.
    - The row-local rewrite replaces an earlier position-explode +
      (doc,pos) anti-join + sort-rebuild groupBy (git history), and
      ``base`` persists across its three consumers: 17.4 s -> 12.0 s
      cold / ~1.5 s warm.
    """
    toks_arr = tokens(F.col(text_col))
    tok_hashes = F.transform(
        tokens(F.lower(F.col(text_col))), lambda t: F.xxhash64(t)
    )

    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks_arr.alias("toks"),
        F.when(F.size(tok_hashes) >= n, _hashed_gram_keys(tok_hashes, n))
        .otherwise(F.array().cast("array<long>"))
        .alias("grams"),
    )
    # base feeds three consumers (boiler pass, matched pass, final
    # rebuild); persisting it turns ~4 recomputes of the tokenize+gram
    # stage into one (measured 7.6 s -> ~4 s at sf0.1). At cluster scale
    # this materializes the tokenized corpus once (MEMORY_AND_DISK) —
    # the standard multi-consumer trade, same rationale as d3's
    # signature persist.
    from pyspark import StorageLevel

    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    pos_grams = base.select("doc_id", F.posexplode("grams").alias("gpos", "g"))
    boiler = (
        pos_grams.select("doc_id", "g")
        .distinct()
        .groupBy("g")
        .agg(F.count("*").alias("gdf"))
        .filter(F.col("gdf") >= min_df)
        .select("g")
    )
    # Per-doc list of matching gram start positions, then a ROW-LOCAL
    # covered-range filter — no position explode, no (doc, pos)
    # anti-join, no sort-rebuild groupBy. Worst case is O(len x starts)
    # interpreted per doc; for pathologically long, pathologically
    # covered documents the exploded anti-join form (git history) is the
    # fallback — on real corpora starts-per-doc is small.
    matched = (
        pos_grams.join(boiler, "g")
        .groupBy("doc_id")
        .agg(F.collect_list("gpos").alias("starts"))
    )
    joined = base.join(matched, "doc_id", "left").select(
        "doc_id",
        "toks",
        F.coalesce("starts", F.array().cast("array<int>")).alias("starts"),
    )
    kept = F.filter(
        F.col("toks"),
        lambda _t, i: ~F.exists(
            F.col("starts"), lambda s: (i >= s) & (i <= s + (n - 1))
        ),
    )
    return joined.select(
        "doc_id",
        F.array_join(kept, " ").alias("text_clean"),
        F.size("toks").cast("long").alias("n_tokens"),
        (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
    )


def passage_chunks(
    df, size: int = 32, stride: int = 24,
    id_col: str = "doc_id", text_col: str = "text",
):
    """Fixed-window passage chunking with overlap — the document splitter
    a RAG index or a pretraining tokenizer feed runs ahead of packing:
    token windows of ``size`` starting every ``stride`` tokens (overlap =
    size - stride), the final window clamped to the document end. Chunk
    count is 1 + max(0, ceil((len - size) / stride)) so every token
    lands in at least one chunk and no all-overlap duplicate windows are
    emitted; empty documents produce no chunks.

    Map-only: tokenize -> sequence of chunk starts -> explode -> slice.
    No shuffle at any corpus size; the explode multiplies rows by
    ~len/stride, the same fan-out the downstream consumer needs anyway.
    The ceil is computed with integer arithmetic ((len - size + stride
    - 1) div stride) so the chunk count is engine-exact.
    """
    if not (0 < stride <= size):
        raise ValueError(f"need 0 < stride <= size, got size={size} stride={stride}")
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    n_extra = F.greatest(
        F.floor((n - F.lit(size) + F.lit(stride - 1)) / F.lit(stride)).cast("int"),
        F.lit(0),
    )
    base = df.select(
        F.col(id_col).alias("doc_id"), toks.alias("_tk"), n.alias("_n"), n_extra.alias("_e")
    ).filter(F.col("_n") > 0)
    out = base.select(
        "doc_id",
        "_tk",
        F.explode(F.sequence(F.lit(0), F.col("_e"))).alias("chunk_idx"),
    )
    sl = F.slice(F.col("_tk"), F.col("chunk_idx") * stride + 1, F.lit(size))
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.array_join(sl, " ").alias("chunk_text"),
        F.size(sl).cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# Hashed-feature linear quality classifier (fastText-style inference)
# ---------------------------------------------------------------------------

CLASSIFIER_WEIGHT_MOD = 2001  # md5-derived stand-in weight table (see below)


def _feature_weight(gram: Column) -> Column:
    """Deterministic weight in [-1, 1] for one hashed feature: the first 8
    md5 hex chars as an integer, mod 2001, recentred. Stands in for a
    trained weight vector — inference cost and plan shape are identical to
    a real fastText/logreg model whose weights would arrive as a broadcast
    lookup or a hash-indexed expression like this one."""
    h = F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
    return (h % CLASSIFIER_WEIGHT_MOD - F.lit(1000)) / 1000.0


def quality_classifier_features(text: Column) -> dict[str, Column]:
    """fastText-style (Joulin et al. 2016) hashed unigram+bigram linear
    scorer, fully row-local: tokenize, build the gram bag, fold the
    md5-hashed feature weights into a mean logit, squash to a probability.

    Zero shuffle, zero UDF — at 100 TB this is a map-only pass inside
    whole-stage codegen, the same plan a learned quality filter (e.g. the
    CCNet/GPT-3 quality classifiers) runs at inference time.
    """
    toks = tokens(F.lower(text))
    bigrams = F.when(F.size(toks) >= 2, _gram_join(toks, 2)).otherwise(
        F.array().cast("array<string>")
    )
    grams = F.concat(toks, bigrams)
    n = F.greatest(F.size(grams).cast("long"), F.lit(1))
    total = F.aggregate(grams, F.lit(0.0), lambda acc, g: acc + _feature_weight(g))
    logit = total / n
    return {
        "n_features": F.size(grams).cast("long"),
        "quality_logit": logit,
        "quality_prob": F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)),
    }


def train_quality_lr(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    lr: float = 1.0,
    iters: int = 2,
    entropy_min: float = 2.0,
):
    """TRAIN a quality classifier in-engine: distributed logistic
    regression over md5-hashed unigram buckets, distilling the
    char-entropy gate (t17's expensive O(len log len) signal) into a
    cheap linear scorer — the CCNet/GPT-3 quality-filter BOOTSTRAP
    (train a fast classifier on labels from a slower oracle), where
    t16 is the inference half of the same story. Extends the
    hash-gated ITERATIVE family (c1 k-means, c2 PageRank, v1 BPE) to
    model training: every gradient step is engine-exact by the same
    rounding discipline, so a DuckDB oracle can unroll the whole
    descent in CTEs.

    Math: features x_db = (tokens of doc d hashing to bucket b) / n_d;
    labels y_d = [rounded char entropy >= entropy_min]; from w = 0,
    each step takes w_b <- round(w_b - lr * round(Σ_d (p_d - y_d) x_db
    / N, 6), 6) with p_d = sigmoid(round(Σ_b x_db w_b, 6)). Rounding at
    the three accumulation boundaries (per-doc logit, per-bucket
    gradient, weight update) is what makes engines agree: sums differ
    across engines only by float association (~1e-15), and exp/log run
    on identical 6-dp inputs (the t16/a31 precedent; iteration 1 needs
    no exp at all — w=0 makes p exactly 0.5 on both engines).

    Scale shape per iteration: one broadcast join of the <= n_buckets
    weight table onto the (doc, bucket, cnt) frame + a groupBy(doc)
    for logits, one groupBy(bucket) for gradients (map-side partial
    sums), one <= n_buckets-row update. The (doc, bucket) frame is
    persisted once and reused by every iteration's two consumers. N
    and the weight table fold in via broadcast — nothing collects.
    Output: (bucket, weight), exactly ``n_buckets`` rows (a literal
    spine keeps never-observed buckets at their running value)."""
    from pyspark import StorageLevel

    spark = df.sparkSession
    toks = tokens(F.lower(F.col(text_col)))
    base = char_entropy_frame(df, text_col).select(
        F.col(id_col).alias("did"),
        toks.alias("toks"),
        (F.round(F.col("char_entropy_bits"), 6) >= entropy_min)
        .cast("double")
        .alias("y"),
    ).withColumn("n", F.greatest(F.size("toks"), F.lit(1)).cast("double"))
    ncnt = base.agg(F.count("*").cast("double").alias("N"))
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long") % n_buckets
    ).cast("int")
    tb = (
        base.select("did", "y", "n", F.explode("toks").alias("t"))
        .select("did", "y", "n", bucket.alias("bucket"))
        .groupBy("did", "y", "n", "bucket")
        .agg(F.count("*").cast("double").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    spine = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    w = spine.select("bucket", F.lit(0.0).alias("weight"))
    for _it in range(iters):
        logits = (
            tb.join(F.broadcast(w), "bucket")
            .groupBy("did", "y", "n")
            .agg(F.sum(F.col("cnt") * F.col("weight")).alias("s"))
            .select(
                "did",
                (
                    F.lit(1.0)
                    / (F.lit(1.0) + F.exp(-F.round(F.col("s") / F.col("n"), 6)))
                ).alias("p"),
            )
        )
        grad = (
            tb.join(logits, "did")
            .groupBy("bucket")
            .agg(
                F.sum((F.col("p") - F.col("y")) * F.col("cnt") / F.col("n")).alias(
                    "gsum"
                )
            )
        )
        w = (
            spine.join(F.broadcast(grad), "bucket", "left")
            .join(F.broadcast(w.withColumnRenamed("weight", "w_old")), "bucket")
            .crossJoin(F.broadcast(ncnt))
            .select(
                "bucket",
                F.round(
                    F.col("w_old")
                    - lr * F.round(F.coalesce("gsum", F.lit(0.0)) / F.col("N"), 6),
                    6,
                ).alias("weight"),
            )
        )
        # Materialize the <= n_buckets-row weight table as a LITERAL frame
        # per iteration (r10): left lazy, every broadcast consumer of w —
        # the next iteration's logits, its gradient, and the final apply —
        # re-executes the full descent lineage (tb scans + both groupBys
        # per prior iteration), turning 2 iterations into ~6 pipeline
        # runs. A 64-row model-table collect is this repo's standing
        # bounded-state pattern (k-means centroids, IVF codebooks);
        # doubles round-trip the driver exactly, so the values — and the
        # hash gate — are unchanged.
        w = spark.createDataFrame(
            w.collect(), "bucket int, weight double"
        )
    return w


def apply_quality_lr(
    df,
    weights,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
):
    """Inference with TRAINED weights — the consumer of
    :func:`train_quality_lr`'s output (t16 runs the same shape over a
    stand-in hash-derived vector; this closes the train->apply loop a
    real pipeline runs). The <= n_buckets weight table folds in as one
    broadcast join on the hashed bucket key; scoring is the mean bucket
    weight over the doc's tokens, the exact linear form the gradient
    optimized. Returns (doc_id, quality_logit, quality_prob, keep) with
    the t16 rounding contract (sigmoid over the 6-dp-rounded logit)."""
    bucket = (
        F.conv(F.substring(F.md5("t"), 1, 8), 16, 10).cast("long") % n_buckets
    ).cast("int")
    toks = tokens(F.lower(F.col(text_col)))
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).withColumn(
        "n", F.greatest(F.size("toks"), F.lit(1)).cast("double")
    )
    scored = (
        base.select("doc_id", "n", F.explode_outer("toks").alias("t"))
        .withColumn("bucket", bucket)
        .join(F.broadcast(weights), "bucket", "left")
        .groupBy("doc_id", "n")
        .agg(F.coalesce(F.sum("weight"), F.lit(0.0)).alias("s"))
    )
    logit = F.round(F.col("s") / F.col("n"), 6)
    return scored.select(
        "doc_id",
        logit.alias("quality_logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("quality_prob"),
        (logit >= 0).alias("keep"),
    )


def quality_lr_eval(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    entropy_min: float = 2.0,
):
    """Close t20's train loop with MODEL SELECTION: train the hashed-bucket
    logistic regression on the x1 'train' split, score the held-out
    (validation + test) docs, and report confusion counts at the keep
    threshold (logit >= 0) plus exact rank-sum AUC — the engine-native
    evaluation primitive every quality-filter pipeline needs before it
    trusts a classifier (the CCNet/fastText-era selection step).

    Engine-exactness: scores are apply_quality_lr's 6-dp-rounded logits,
    so ranks are deterministic given the tie-break — row_number over
    (logit, doc_id). AUC = (Σ ranks of positives - P(P+1)/2) / (P*N),
    all-integer numerator over 6-dp-identical orderings; baseline AUC
    ranks by doc_id alone (exactly what a zero-weight model's constant
    scores + the same tie-break produce), giving the in-query control a
    test can assert the trained model beats.

    Scale shape: train/score reuse t20's broadcast-join shapes; the only
    global operation is the rank over the HELD-OUT docs — a bounded
    evaluation sample by construction (an eval set you can't rank on one
    task is an eval set too big to be one). Output: ONE row
    (n_held, n_pos, n_neg, tp, fp, tn, fn, auc, auc_baseline)."""
    from pyspark.sql import Window

    from kafka_streaming_polymarket_pipeline_spark.operators.sampling import hash_split

    split = hash_split(df, id_col=id_col).select(id_col, "split")
    train = df.join(split.filter(F.col("split") == "train").select(id_col), id_col)
    held = df.join(split.filter(F.col("split") != "train").select(id_col), id_col)
    w = train_quality_lr(
        train, id_col=id_col, text_col=text_col, n_buckets=n_buckets,
        entropy_min=entropy_min,
    )
    scored = apply_quality_lr(
        held, w, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    )
    labels = char_entropy_frame(held, text_col).select(
        F.col(id_col).alias("doc_id"),
        (F.round(F.col("char_entropy_bits"), 6) >= entropy_min).alias("y"),
    )
    j = scored.join(labels, "doc_id").select(
        "doc_id", "y", "quality_logit", (F.col("quality_logit") >= 0).alias("pred")
    )
    ranked = j.select(
        "*",
        F.row_number()
        .over(Window.orderBy("quality_logit", "doc_id"))
        .cast("long")
        .alias("r"),
        F.row_number().over(Window.orderBy("doc_id")).cast("long").alias("r0"),
    )
    yl = F.col("y").cast("long")
    pl = F.col("pred").cast("long")
    agg = ranked.agg(
        F.count("*").alias("n_held"),
        F.sum(yl).alias("n_pos"),
        F.sum(F.lit(1) - yl).alias("n_neg"),
        F.sum(pl * yl).alias("tp"),
        F.sum(pl * (1 - yl)).alias("fp"),
        F.sum((1 - pl) * (1 - yl)).alias("tn"),
        F.sum((1 - pl) * yl).alias("fn"),
        F.sum(yl * F.col("r")).alias("_rsum"),
        F.sum(yl * F.col("r0")).alias("_rsum0"),
    )

    def _auc(rsum):
        p, n = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
        return F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round((rsum - p * (p + 1) / 2) / (p * n), 6),
        )

    return agg.select(
        "n_held", "n_pos", "n_neg", "tp", "fp", "tn", "fn",
        _auc(F.col("_rsum")).alias("auc"),
        _auc(F.col("_rsum0")).alias("auc_baseline"),
    )


def quality_lr_calibration(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    entropy_min: float = 2.0,
):
    """Reliability diagram for t20's classifier — the CALIBRATION check
    that complements t21's discrimination check (AUC says the ranking is
    right; a quality-threshold pipeline also needs the probabilities to
    mean what they say before 'keep if p >= 0.x' is a defensible knob).
    Train on the x1 'train' split, score the held-out docs, convert each
    6-dp logit to an integer micro-probability
    p_micro = round(1e6 * sigmoid(logit)) — rounded ONCE; every
    downstream step (decile binning by integer division, per-bin sums)
    is exact BIGINT, the x9/DSIR discipline — and report one row per
    occupied probability decile: doc count, positive count, mean
    predicted probability, empirical positive rate, and |gap| (the
    per-bin term of expected calibration error).

    Scale shape: train/score reuse t20's broadcast-join shapes; the only
    aggregation is a groupBy over <= 10 bin keys (map-side combined) —
    no global window at all, unlike the AUC rank. Output: (bin, n_docs,
    n_pos, avg_p, pos_rate, gap), bin ascending."""
    from kafka_streaming_polymarket_pipeline_spark.operators.sampling import hash_split

    split = hash_split(df, id_col=id_col).select(id_col, "split")
    train = df.join(split.filter(F.col("split") == "train").select(id_col), id_col)
    held = df.join(split.filter(F.col("split") != "train").select(id_col), id_col)
    w = train_quality_lr(
        train, id_col=id_col, text_col=text_col, n_buckets=n_buckets,
        entropy_min=entropy_min,
    )
    scored = apply_quality_lr(
        held, w, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    )
    labels = char_entropy_frame(held, text_col).select(
        F.col(id_col).alias("doc_id"),
        (F.round(F.col("char_entropy_bits"), 6) >= entropy_min)
        .cast("long")
        .alias("y"),
    )
    p_micro = F.round(
        F.lit(1e6) / (F.lit(1.0) + F.exp(-F.col("quality_logit"))), 0
    ).cast("long")
    pm = scored.join(labels, "doc_id").select("doc_id", "y", p_micro.alias("_pm"))
    # Range-adaptive bins: the trained logits cluster tightly around 0,
    # so fixed [0,1] deciles collapse to one bin — bin over the OBSERVED
    # micro-probability range instead. All-integer: (pm-mn)*10 div
    # (mx-mn+1) lands in 0..9 with no float boundary anywhere (numerator
    # <= 1e7), and the two scalars broadcast (x11's cutpoint shape).
    stats = pm.agg(F.min("_pm").alias("_mn"), F.max("_pm").alias("_mx"))
    binned = (
        pm.crossJoin(F.broadcast(stats))
        .select(
            "doc_id", "y", "_pm",
            F.expr("((_pm - _mn) * 10) div (_mx - _mn + 1)").cast("int").alias("bin"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("y").cast("long").alias("n_pos"),
            F.sum("_pm").alias("_spm"),
        )
    )
    nd = F.col("n_docs").cast("double")
    avg_p = F.col("_spm") / nd / F.lit(1e6)
    pos_rate = F.col("n_pos") / nd
    return binned.select(
        "bin", "n_docs", "n_pos",
        F.round(avg_p, 6).alias("avg_p"),
        F.round(pos_rate, 6).alias("pos_rate"),
        F.round(F.abs(avg_p - pos_rate), 6).alias("gap"),
    ).orderBy("bin")


def char_entropy_frame(df, text_col: str = "text"):
    """Attach `n_chars_split`, `n_distinct_chars`, `char_entropy_bits`
    (unrounded) for the Shannon character entropy of ``text_col`` — the
    low-entropy/gibberish quality filter (binary junk scores near 0 bits;
    natural language sits ~4 bits/char).

    O(len log len) per document: ONE run-length fold over ONE sorted
    char array. The r10 shape materialized the sorted array as a column
    and scanned run boundaries through positional get() lambdas — but
    CollapseProject inlines single-consumer columns back into the
    consuming lambdas, so inside the e2e compositions every per-element
    get() re-evaluated the interpreted ArraySort (jstack r11:
    TimSort -> If/LessThan.eval under ArrayFilter), O(len^2 log len)
    per doc on an AQE-coalesced single task — the e2e_g/e2e_r >150 s
    sf0.1 tail. This form has exactly one reference to the sorted
    array (the aggregate's input, evaluated once per row however the
    optimizer inlines it), uses sort_array (native type ordering) over
    array_sort (interpreted per-comparison lambda), and carries
    (prev char, run length, run count, entropy acc) through a single
    aggregate state. Terms accumulate run-by-run in sorted-char order —
    the SAME order and float association as before (each run's
    (cnt/n)*log2(cnt/n) joins the sum when the next run starts; the
    last at the finish step) and the SAME order the oracle's
    sorted-alphabet transform uses, so the hash gate is unchanged."""
    chars = F.split(F.col(text_col), "")
    size = F.size(chars)
    n = F.greatest(size.cast("long"), F.lit(1))
    st = F.aggregate(
        F.sort_array(chars),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("cnt"),
            F.lit(0).cast("long").alias("runs"),
            F.lit(0.0).alias("acc"),
        ),
        lambda acc, ch: F.when(
            acc["cnt"] == 0,
            F.struct(
                ch.alias("prev"), F.lit(1).alias("cnt"),
                F.lit(1).cast("long").alias("runs"), acc["acc"].alias("acc"),
            ),
        )
        .when(
            ch == acc["prev"],
            F.struct(
                ch.alias("prev"), (acc["cnt"] + F.lit(1)).alias("cnt"),
                acc["runs"].alias("runs"), acc["acc"].alias("acc"),
            ),
        )
        .otherwise(
            F.struct(
                ch.alias("prev"), F.lit(1).alias("cnt"),
                (acc["runs"] + F.lit(1)).cast("long").alias("runs"),
                (acc["acc"] + (acc["cnt"] / n) * F.log2(acc["cnt"] / n)).alias("acc"),
            ),
        ),
        lambda acc: F.struct(
            (
                -F.when(
                    acc["cnt"] > 0,
                    acc["acc"] + (acc["cnt"] / n) * F.log2(acc["cnt"] / n),
                ).otherwise(acc["acc"])
            ).alias("bits"),
            acc["runs"].alias("runs"),
        ),
    )
    return (
        df.withColumn("_t17_st", st)
        .withColumn("n_chars_split", size.cast("long"))
        .withColumn("n_distinct_chars", F.col("_t17_st")["runs"])
        .withColumn("char_entropy_bits", F.col("_t17_st")["bits"])
        .drop("_t17_st")
    )
