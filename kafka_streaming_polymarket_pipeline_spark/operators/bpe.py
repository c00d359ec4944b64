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
