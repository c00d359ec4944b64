"""Distributed BPE (byte-pair-encoding) vocabulary learning.

The scale shape production tokenizer trainers use: one corpus pass
aggregates word frequencies (the only data-sized shuffle), then the k
merge iterations run entirely over the DISTINCT-WORD vocabulary table —
orders of magnitude smaller than the corpus and broadcastable — so at
100 TB the iterative part costs k tiny jobs, not k corpus scans
(Sennrich et al. 2016, "Neural Machine Translation of Rare Words with
Subword Units", learns merges from exactly this word-frequency dict).

Merge semantics (engine-portable, deterministic):

- a word's segmentation is its symbols joined by a single space (words
  are whitespace tokens, so a space can never occur inside a symbol);
- each iteration picks the adjacent symbol pair with the highest
  frequency-weighted count, ties broken by (pair_a ASC, pair_b ASC);
- the pair is merged by a greedy left-to-right fold: scanning symbols,
  a trailing `a` followed by `b` concatenates — so `a a a` under merge
  (a,a) becomes `aa a`, and `a b a b` under (a,b) becomes `ab ab` —
  reproduced bit-for-bit by DuckDB ``list_reduce`` in the oracle;
- per-iteration state is ``localCheckpoint``-ed (the d6 pattern) so
  lineage stays flat; the top-pair scalar per round is the only
  driver-side value, same as d6's convergence counter.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def word_vocab(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wc) frequency table — the single corpus-sized aggregation."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    return (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
    )


def initial_segmentation(word: Column) -> Column:
    """Characters joined by ' ' (symbol = single char to start)."""
    chars = F.transform(
        F.sequence(F.lit(1), F.length(word)), lambda i: word.substr(i, F.lit(1))
    )
    return F.concat_ws(" ", chars)


def _adjacent_pairs(seg: Column) -> Column:
    s = F.split(seg, " ")
    idx = F.sequence(F.lit(1), F.size(s) - 1)
    return F.when(
        F.size(s) >= 2,
        F.transform(
            idx,
            lambda i: F.struct(
                F.element_at(s, i).alias("a"), F.element_at(s, i + 1).alias("b")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))


def merge_pair(seg: Column, a: str, b: str) -> Column:
    """Greedy left-to-right merge of adjacent (a, b) into a||b."""
    syms = F.split(seg, " ")
    init = F.element_at(syms, 1)
    rest = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
    sep_a = F.lit(" " + a)
    return F.aggregate(
        rest,
        init,
        lambda acc, x: F.when(
            (x == F.lit(b)) & ((acc == F.lit(a)) | acc.endswith(sep_a)),
            F.concat(acc, x),
        ).otherwise(F.concat(acc, F.lit(" "), x)),
    )


def learn_bpe(
    vocab: DataFrame, n_merges: int
) -> tuple[DataFrame, list[tuple[str, str, int]]]:
    """Run ``n_merges`` BPE iterations over a (word, wc) vocab table.

    Returns (segmented vocab with columns word/wc/seg/n_symbols, learned
    merge rules as (a, b, weighted_count) in order). Stops early if no
    adjacent pair remains.
    """
    state = vocab.select(
        "word", "wc", initial_segmentation(F.col("word")).alias("seg")
    ).localCheckpoint(eager=True)
    rules: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            state.select("wc", F.explode(_adjacent_pairs(F.col("seg"))).alias("p"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("wc").alias("c"))
            .orderBy(F.desc("c"), F.asc("a"), F.asc("b"))
            .first()
        )
        if top is None:
            break
        rules.append((top["a"], top["b"], top["c"]))
        state = state.select(
            "word", "wc", merge_pair(F.col("seg"), top["a"], top["b"]).alias("seg")
        ).localCheckpoint(eager=True)
    out = state.withColumn(
        "n_symbols", F.size(F.split("seg", " ")).cast("long")
    )
    return out, rules


def bpe_token_counts(
    docs: DataFrame, segmented_vocab: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Tokenize the corpus with the learned segmentation: per doc, the
    number of BPE symbols. The vocab side is broadcast (it is small by
    construction), so this is a map-side join + one groupBy shuffle."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda t: t != "")
    return (
        docs.select("doc_id", F.explode(toks).alias("word"))
        .join(F.broadcast(segmented_vocab.select("word", "n_symbols")), "word")
        .groupBy("doc_id")
        .agg(F.sum("n_symbols").alias("n_bpe_tokens"))
    )


# --- Unigram-LM tokenizer E-step (SentencePiece lineage, Kudo 2018) ---

UNI_OFF = 1 << 40  # shifts DP keys nonnegative so div/mod never see a sign
UNI_MAX_PIECE = 4
UNI_MIN_COUNT = 2


def _uni_words(docs: DataFrame, text_col: str) -> DataFrame:
    from kafka_streaming_polymarket_pipeline_spark.operators.text import tokens

    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("wc"))
        .withColumn("L", F.length("word").cast("int"))
    )


def _uni_pos(w: DataFrame, max_piece: int) -> DataFrame:
    """(word, wc, i, j, piece): every substring occurrence of length
    <= max_piece, the substrate of both the seed vocab and the per-word
    candidate lists."""
    return (
        w.select(
            "word", "wc", "L", F.explode(F.sequence(F.lit(1), F.col("L"))).alias("i")
        )
        .select(
            "word",
            "wc",
            "i",
            F.explode(
                F.sequence(F.greatest(F.col("i") - max_piece, F.lit(0)), F.col("i") - 1)
            ).alias("j"),
        )
        .withColumn(
            "piece", F.col("word").substr(F.col("j") + 1, F.col("i") - F.col("j"))
        )
    )


def _uni_renorm(counts: DataFrame) -> DataFrame:
    """(piece, lp): integer micro-log-probs from a (piece, cnt) table."""
    tot = counts.agg(F.sum("cnt").cast("double").alias("tot"))
    return counts.crossJoin(F.broadcast(tot)).select(
        "piece",
        F.round(F.log(F.col("cnt") / F.col("tot")) * 1e6).cast("long").alias("lp"),
    )


def _uni_viterbi_segment(
    w: DataFrame, pos: DataFrame, vlp: DataFrame
) -> DataFrame:
    """(word, wc, pieces): Viterbi-segment every distinct word under the
    (piece, lp) model, pieces in READING order — the E-step core shared
    by every EM iteration and by the v4 apply form. Exact BIGINT DP with
    the tie-break encoded in the comparison key (see
    :func:`unigram_viterbi_estep`)."""
    cand = pos.join(vlp, "piece").select("word", "i", "j", "lp")
    cmap = (
        cand.groupBy("word", "i")
        .agg(F.collect_list(F.struct(F.col("j"), F.col("lp"))).alias("cl"))
        .groupBy("word")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct(F.col("i"), F.col("cl")))),
                lambda x: x["cl"],
            ).alias("cands")
        )
    )
    dp_in = w.join(cmap, "word")
    off = F.lit(UNI_OFF)

    def dp_step(acc, i):
        cl = F.element_at(F.col("cands"), i)
        feas = F.filter(
            cl, lambda c: F.element_at(acc["prevs"], i - c["j"]).isNotNull()
        )
        # slot = 64 - piece length (i - j), bounded to 60..63 by
        # max_piece <= 4, so it NEVER spills into the total slot no matter
        # how long the word is (absolute j overflowed 6 bits for 65+ char
        # words); ties still break toward the larger slot = shorter final
        # piece = larger j, exactly the old semantics for short words.
        key = F.array_max(
            F.transform(
                feas,
                lambda c: (F.element_at(acc["prevs"], i - c["j"]) + c["lp"] + off)
                * 64
                + (F.lit(64) - (i - c["j"])).cast("long"),
            )
        )
        tot = (key / 64).cast("long") - off  # key nonneg: / then cast == div
        bj = (i - (F.lit(64) - key % 64)).cast("int")
        return F.struct(
            F.concat(F.array(tot), F.slice(acc["prevs"], 1, 3)).alias("prevs"),
            F.concat(acc["backs"], F.array(bj)).alias("backs"),
        )

    null_long = F.lit(None).cast("long")
    dp = dp_in.withColumn(
        "_dp",
        F.aggregate(
            F.sequence(F.lit(1), F.col("L")),
            F.struct(
                F.array(
                    F.lit(0).cast("long"), null_long, null_long, null_long
                ).alias("prevs"),
                F.array().cast("array<int>").alias("backs"),
            ),
            dp_step,
        ),
    )

    def walk_step(acc, _):
        j = F.element_at(F.col("_dp")["backs"], acc["pos"])
        piece = F.col("word").substr(j + 1, acc["pos"] - j)
        return F.when(
            acc["pos"] > 0,
            F.struct(
                j.alias("pos"),
                F.concat(acc["pieces"], F.array(piece)).alias("pieces"),
            ),
        ).otherwise(acc)

    # backtrace emits pieces END-first; reading order is the reverse
    segged = dp.withColumn(
        "_pieces",
        F.reverse(
            F.aggregate(
                F.sequence(F.lit(1), F.col("L")),
                F.struct(
                    F.col("L").alias("pos"),
                    F.array().cast("array<string>").alias("pieces"),
                ),
                walk_step,
            )["pieces"]
        ),
    )
    return segged.select("word", "wc", F.col("_pieces").alias("pieces"))


def _uni_viterbi_counts(
    w: DataFrame, pos: DataFrame, vlp: DataFrame
) -> DataFrame:
    """(piece, new_count): piece uses weighted by word counts — the
    E-step statistic, off the shared segmentation."""
    return (
        _uni_viterbi_segment(w, pos, vlp)
        .select("wc", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("wc").alias("new_count"))
    )


def unigram_viterbi_estep(
    docs: DataFrame,
    text_col: str = "text",
    max_piece: int = UNI_MAX_PIECE,
    min_count: int = UNI_MIN_COUNT,
) -> DataFrame:
    """One EM E-step of unigram-LM tokenizer training (Kudo 2018, the
    SentencePiece unigram model): seed a piece vocabulary from substring
    counts, Viterbi-segment every distinct word under the seed
    log-probabilities, and return the re-estimated piece counts — the
    statistics the M-step renormalizes. Extends the hash-gated iterative
    family (BPE merges v1, Lloyd c1, power iteration c2, gradient
    descent t20) with its last missing member: EXPECTATION-MAXIMIZATION,
    dynamic program included.

    Engine-exactness is the x9 integer discipline applied to a DP: seed
    log-probs round ONCE to integer micro-units (ln(cnt/total) * 1e6,
    one rounding site per vocab piece on identical doubles), and the
    entire Viterbi recurrence — best[i] = max_j best[j] + lp(w[j..i]) —
    is exact BIGINT arithmetic. The argmax tie-break is encoded in the
    comparison key itself: key = (total + 2^40) * 64 + (64 - (i - j)),
    so equal totals break toward the shorter final piece (larger j) on
    every engine, the 2^40 offset keeps div/mod away from negative
    operands, and the slot stays in 60..63 (piece length <= max_piece
    <= 4) so it cannot spill into the total for ANY word length —
    encoding absolute j would overflow the 6-bit slot on 65+ char words
    (long URLs, hashes). The DuckDB oracle replays the same DP as a rolling-window
    recursive CTE (best[i] needs only best[i-4..i-1], so the recursion
    carries 4 values + the backpointer string) and the same backtrace
    walk.

    Scale shape: everything after the word count is per-DISTINCT-WORD
    (v1's insight — corpus size stops mattering once words are counted):
    the substring explode is O(words x len x max_piece), the vocab fold
    is two tiny aggregates broadcast back, and the DP + backtrace are
    row-local array folds (F.aggregate over the word's positions — no
    shuffle, no UDF, pure codegen). Output: (piece, new_count,
    new_lp_micro), one row per piece used by any Viterbi segmentation.
    """
    w = _uni_words(docs, text_col)
    pos = _uni_pos(w, max_piece)
    occ = pos.groupBy("piece").agg(F.sum("wc").alias("cnt"))
    vocab = occ.filter((F.col("cnt") >= min_count) | (F.length("piece") == 1))
    vlp = _uni_renorm(vocab)
    used = _uni_viterbi_counts(w, pos, vlp)
    utot = used.agg(F.sum("new_count").cast("double").alias("tot"))
    return used.crossJoin(F.broadcast(utot)).select(
        "piece",
        "new_count",
        F.round(F.log(F.col("new_count") / F.col("tot")) * 1e6)
        .cast("long")
        .alias("new_lp_micro"),
    )


def _uni_vocab2(w: DataFrame, pos: DataFrame, min_count: int) -> DataFrame:
    """Round-2 vocabulary (piece, cnt): round 1's used-piece counts plus
    every single character at count 1 — SentencePiece's chars-always-
    survive rule, shared by every consumer of the two-iteration model
    (v3b's M-step, v4's apply, v5's scoring)."""
    occ = pos.groupBy("piece").agg(F.sum("wc").alias("cnt"))
    vocab = occ.filter((F.col("cnt") >= min_count) | (F.length("piece") == 1))
    used1 = _uni_viterbi_counts(w, pos, _uni_renorm(vocab))
    chars = pos.filter(F.col("i") - F.col("j") == 1).select("piece").distinct()
    return used1.select("piece", F.col("new_count").alias("cnt")).unionByName(
        chars.join(used1, "piece", "left_anti").select(
            "piece", F.lit(1).cast("long").alias("cnt")
        )
    )


def unigram_em2(
    docs: DataFrame,
    text_col: str = "text",
    max_piece: int = UNI_MAX_PIECE,
    min_count: int = UNI_MIN_COUNT,
) -> DataFrame:
    """TWO EM iterations — the loop v3's single E-step opens, closed the
    way t20 closes gradient descent (both steps under one hash gate):
    round 2 re-segments every word under the ROUND-1 re-estimated
    probabilities. Vocabulary for round 2 = round 1's used pieces plus
    every single character at count 1 (SentencePiece's
    chars-always-survive rule — a word whose round-1 path used only
    multi-char pieces must stay segmentable when its neighbors shrink
    the vocab). Returns round 2's (piece, new_count, new_lp_micro).

    Every stage is the same exact-BIGINT machinery as round 1; the
    oracle unrolls BOTH Viterbi recursions (two rolling-window recursive
    CTEs, two backtrace walks) in one statement. The per-word frames
    (words, positions) are persisted once and reused by both rounds."""
    from pyspark import StorageLevel

    w = _uni_words(docs, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    pos = _uni_pos(w, max_piece).persist(StorageLevel.MEMORY_AND_DISK)
    used2 = _uni_viterbi_counts(w, pos, _uni_renorm(_uni_vocab2(w, pos, min_count)))
    utot = used2.agg(F.sum("new_count").cast("double").alias("tot"))
    return used2.crossJoin(F.broadcast(utot)).select(
        "piece",
        "new_count",
        F.round(F.log(F.col("new_count") / F.col("tot")) * 1e6)
        .cast("long")
        .alias("new_lp_micro"),
    )


def unigram_tokenize(
    docs: DataFrame,
    text_col: str = "text",
    max_piece: int = UNI_MAX_PIECE,
    min_count: int = UNI_MIN_COUNT,
) -> DataFrame:
    """APPLY the EM-trained unigram model to the corpus — the trainer's
    missing half (v2 applies v1's BPE merges; apply_quality_lr applies
    t20's weights; this applies v3b's round-2 probabilities): every
    document's tokens are Viterbi-segmented under the two-iteration
    model and materialized as one piece stream per document. Returns
    (doc_id, n_pieces, pieces_fp) where pieces_fp = md5 of the
    space-joined reading-order piece stream — the whole segmentation is
    under the hash, not just its length.

    Scale shape: segmentation stays per-DISTINCT-WORD (the DP never
    touches the corpus); the corpus-side work is one posexplode to
    preserve token order, one broadcast-sized join word -> pieces, and
    one groupBy(doc) re-assembly — the v2 apply shape."""
    from pyspark import StorageLevel

    from kafka_streaming_polymarket_pipeline_spark.operators.text import tokens

    w = _uni_words(docs, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    pos = _uni_pos(w, max_piece).persist(StorageLevel.MEMORY_AND_DISK)
    vocab2 = _uni_vocab2(w, pos, min_count)
    seg = _uni_viterbi_segment(w, pos, _uni_renorm(vocab2)).select("word", "pieces")
    toks = docs.select(
        F.col("doc_id"), F.posexplode(tokens(F.col(text_col))).alias("tp", "word")
    )
    per_doc = (
        toks.join(seg, "word")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct(F.col("tp"), F.col("pieces")))),
                    lambda x: x["pieces"],
                )
            ).alias("stream")
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.size("stream"), F.lit(0)).cast("long").alias("n_pieces"),
            F.md5(F.concat_ws(" ", F.coalesce("stream", F.array().cast("array<string>")))).alias(
                "pieces_fp"
            ),
        )
    )


def unigram_doc_logprob(
    docs: DataFrame,
    text_col: str = "text",
    max_piece: int = UNI_MAX_PIECE,
    min_count: int = UNI_MIN_COUNT,
) -> DataFrame:
    """Per-document log-probability under the two-iteration EM unigram
    model — the CCNet recipe (Wenzek et al. 2020) with the LM trained
    IN-ENGINE instead of imported: documents are scored by the mean
    per-piece log-prob of their Viterbi segmentation, the statistic
    CCNet thresholds into head/middle/tail quality buckets. Complements
    t12 (word-bigram LM score): this is the subword model an actual
    tokenizer-training pipeline already has in hand, so quality scoring
    costs one extra broadcast join, not a second corpus model.

    Exactness discipline: per-piece log-probs are v3's integer
    micro-units, so a word's score is an exact BIGINT sum and a doc's
    (total_lp_micro, n_pieces) are exact BIGINT sums of those — the only
    floating point is the final mean (one division on identical doubles)
    and ppl = exp(-mean) computed on the ALREADY-ROUNDED mean (the t16
    pattern: libm exp differences operate on identical inputs).

    Scale shape: the DP stays per-DISTINCT-WORD; per-word scores
    (np_w, lp_w) are one explode + broadcast-model join over the tiny
    word table; the corpus side is one token explode + word-key join +
    groupBy(doc) — v2's apply shape, no doc×doc, no corpus-sized
    sort. Returns (doc_id, n_pieces, total_lp_micro, mean_lp, ppl).
    """
    from pyspark import StorageLevel

    w = _uni_words(docs, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    pos = _uni_pos(w, max_piece).persist(StorageLevel.MEMORY_AND_DISK)
    vlp2 = _uni_renorm(_uni_vocab2(w, pos, min_count)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    return _uni_score_docs(docs, w, pos, vlp2, text_col)


def _uni_score_docs(
    docs: DataFrame, w: DataFrame, pos: DataFrame, vlp: DataFrame, text_col: str
) -> DataFrame:
    """Score every document under a (piece, lp) model given prebuilt
    word/position frames: Viterbi-segment the distinct words, sum exact
    integer per-piece log-probs per word, then per doc — the shared tail
    of v5 (model from the corpus itself) and the frozen-model streaming
    scorer. Returns (doc_id, n_pieces, total_lp_micro, mean_lp, ppl)."""
    from kafka_streaming_polymarket_pipeline_spark.operators.text import tokens

    word_lp = (
        _uni_viterbi_segment(w, pos, vlp)
        .select("word", F.explode("pieces").alias("piece"))
        .join(F.broadcast(vlp), "piece")
        .groupBy("word")
        .agg(
            F.count("*").cast("long").alias("np_w"),
            F.sum("lp").cast("long").alias("lp_w"),
        )
    )
    toks = docs.select(
        F.col("doc_id"), F.explode(tokens(F.col(text_col))).alias("word")
    )
    per_doc = (
        toks.join(word_lp, "word")
        .groupBy("doc_id")
        .agg(
            F.sum("np_w").cast("long").alias("n_pieces"),
            F.sum("lp_w").cast("long").alias("total_lp_micro"),
        )
    )
    np_ = F.coalesce(F.col("n_pieces"), F.lit(0).cast("long"))
    tot = F.coalesce(F.col("total_lp_micro"), F.lit(0).cast("long"))
    mean_lp = F.round(
        F.when(np_ > 0, F.col("total_lp_micro") / F.lit(1e6) / F.col("n_pieces"))
        .otherwise(F.lit(0.0)),
        6,
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            np_.alias("n_pieces"),
            tot.alias("total_lp_micro"),
            mean_lp.alias("mean_lp"),
            F.round(F.exp(-mean_lp), 6).alias("ppl"),
        )
    )


def unigram_lm_model(
    docs: DataFrame,
    text_col: str = "text",
    max_piece: int = UNI_MAX_PIECE,
    min_count: int = UNI_MIN_COUNT,
) -> DataFrame:
    """FIT the two-iteration EM unigram model and return it as a frozen
    (piece, lp) table — the artifact a standing scorer ships to
    production (the dsir_model/reference_histogram pattern: fit once on
    an exemplar corpus, freeze, apply per batch). lp is v3's integer
    micro-units; the table is tokenizer-vocab-sized (bounded by the
    seed-vocab min-count rule), hence broadcastable."""
    from pyspark import StorageLevel

    w = _uni_words(docs, text_col).persist(StorageLevel.MEMORY_AND_DISK)
    pos = _uni_pos(w, max_piece).persist(StorageLevel.MEMORY_AND_DISK)
    return _uni_renorm(_uni_vocab2(w, pos, min_count))


def unigram_score_with_model(
    docs: DataFrame,
    vlp: DataFrame,
    unk_lp_micro: int | None = None,
    text_col: str = "text",
    max_piece: int = UNI_MAX_PIECE,
) -> DataFrame:
    """Score documents under a FROZEN (piece, lp) unigram model — the
    apply half that makes the trained LM a standing quality gate: new
    text is Viterbi-segmented under the shipped probabilities, never
    refit (CCNet's deployment shape: the KenLM is trained once on
    Wikipedia and applied to every crawl snapshot).

    New text can contain characters the frozen model never saw, which
    would make a word unsegmentable (training guarantees char coverage
    only over its own corpus); those chars enter the model at
    ``unk_lp_micro`` — the SentencePiece UNK-penalty move. Default:
    (min model lp) - 1e6 micro, one bounded 1-row aggregate at call
    time, so an OOV char always scores strictly worse than every real
    piece and identical inputs give identical floors.

    Scale shape: the per-batch DP is per-DISTINCT-WORD of the batch;
    the model join is broadcast; scoring is v5's explode + word-key
    join + groupBy(doc). Returns v5's schema."""
    if unk_lp_micro is None:
        row = vlp.agg(F.min("lp").alias("m")).collect()[0]
        if row["m"] is None:
            raise ValueError("unigram_score_with_model needs a non-empty model")
        unk_lp_micro = int(row["m"]) - 1_000_000
    w = _uni_words(docs, text_col)
    pos = _uni_pos(w, max_piece)
    chars = pos.filter(F.col("i") - F.col("j") == 1).select("piece").distinct()
    vfull = vlp.unionByName(
        chars.join(vlp, "piece", "left_anti").select(
            "piece", F.lit(unk_lp_micro).cast("long").alias("lp")
        )
    ).localCheckpoint(eager=False)
    return _uni_score_docs(docs, w, pos, vfull, text_col)
