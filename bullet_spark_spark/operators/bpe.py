"""Byte-pair-encoding vocabulary induction — distributed tokenizer
training, the step a training-data pipeline runs between curation and
packing (Sennrich et al. 2016, "Neural Machine Translation of Rare Words
with Subword Units"; the word-count formulation is the original
algorithm's, which never rescans the corpus during merges).

Reference analog: none — bullet-spark has no tokenizer induction; this is
part of the LLM-pipeline extension surface (BASELINE.json north star).

Scale shape (100 TB corpus):

- The corpus is tokenized ONCE into a word-count frame — one map-side
  combinable shuffle; everything after runs on DISTINCT words weighted by
  count (vocab-sized, ≪ corpus — the classic BPE-on-counts trick).
- Each merge round is one aggregation over the word frame (adjacent
  symbol pairs explode → sum of word counts per pair) and a
  TakeOrdered(1): the driver only ever sees ONE (pair, count) row per
  round — bounded, never data.
- The pair merge itself is a left-to-right fold over each word's symbol
  array (``F.aggregate``) — pure column expressions, no UDF. Within one
  round only the fixed pair (a, b) merges, and a freshly formed ``a+b``
  token can never string-equal ``a`` (b is non-empty), so the fold is
  exactly the sequential left-to-right merge.
- The word frame is localCheckpoint'ed (eager) every round — caching
  it AND truncating the fold lineage, so plan depth and compile time
  stay flat over hundreds of merges (nested per-round plans are the
  same compounding-tree hazard that overflowed the JVM stack in
  connected_components before its fix).

Encoding applies the trained merge table with the standard rank-priority
loop inside an Arrow-batched pandas UDF — tokenizer application is
inherently sequential per word (HF tokenizers ship native code for the
same loop); training above stays 100% JVM-side.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _chars(word: Column) -> Column:
    """Word -> array of single characters (split on the empty pattern;
    Spark emits no trailing empty element for non-empty input)."""
    return F.filter(F.split(word, ""), lambda c: F.length(c) > 0)


def _merge_pair(syms: Column, a: str, b: str) -> Column:
    """One left-to-right, non-overlapping merge of adjacent (a, b) into
    a+b over a symbol array — the inner step of a BPE round."""
    la, lb = F.lit(a), F.lit(b)
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == la) & (x == lb),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(F.concat(la, lb)),
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def word_count_frame(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, n) distinct-word counts — the only corpus-sized pass."""
    from bullet_spark_spark.operators.text import tokens

    return (
        df.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 30,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``num_merges`` BPE merges from a corpus. Returns
    (merges, segmented) where ``merges`` is the ordered merge table
    [(left, right), ...] and ``segmented`` is the word frame
    (word, n, syms) with each distinct word's final subword segmentation.

    Deterministic: the winning pair each round is the max total count
    with ties broken lexicographically on (left, right) — a total order,
    so the merge table is reproducible across partitionings and engines.
    Stops early if no adjacent pair remains (fully merged corpus)."""
    from pyspark import StorageLevel

    words = word_count_frame(df, text_col).withColumn(
        "syms", _chars(F.col("word"))
    ).persist(StorageLevel.MEMORY_AND_DISK)

    merges: list[tuple[str, str]] = []
    prev = words
    for round_no in range(num_merges):
        pairs = prev.select(
            F.col("n"),
            F.explode(
                F.when(
                    F.size("syms") >= 2,
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda i: F.struct(
                            F.element_at("syms", i).alias("a"),
                            F.element_at("syms", i + 1).alias("b"),
                        ),
                    ),
                ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
            ).alias("p"),
        )
        top = (
            pairs.groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.desc("cnt"), F.col("p.a"), F.col("p.b"))
            .limit(1)
            .collect()  # bounded: exactly one row reaches the driver
        )
        if not top:
            break
        a, b = top[0]["p"]["a"], top[0]["p"]["b"]
        merges.append((a, b))

        # eager localCheckpoint every round: caches the (vocab-sized) word
        # frame AND truncates the fold lineage — nested per-round plans
        # are the same compounding-tree hazard connected_components hit
        # (JVM stack overflow during analysis once deep enough)
        nxt = prev.withColumn(
            "syms", _merge_pair(F.col("syms"), a, b)
        ).localCheckpoint(eager=True)
        prev.unpersist()
        prev = nxt

    return merges, prev.select("word", "n", "syms")


def bpe_vocab(segmented: DataFrame) -> DataFrame:
    """(token, n_words, total) subword vocabulary of a trained
    segmentation — token frequency weighted by word count."""
    return (
        segmented.select(
            "n", F.explode("syms").alias("token")
        )
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n").alias("total"),
        )
    )


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Segment each document's words with a trained merge table — the
    standard rank-priority merge loop (always merge the lowest-rank pair
    present) inside ONE Arrow-batched pandas UDF; merge ranks broadcast
    via closure. Narrow (no shuffle): tokenization is per-row."""
    from pyspark.sql.functions import pandas_udf

    ranks = {pair: i for i, pair in enumerate(merges)}

    def seg_word(word: str) -> list[str]:
        syms = list(word)
        while len(syms) >= 2:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    @pandas_udf("array<string>")
    def encode(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}
        out = []
        for t in texts:
            toks: list[str] = []
            for w in (t or "").lower().strip().split():
                if w not in cache:
                    cache[w] = seg_word(w)
                toks.extend(cache[w])
            out.append(toks)
        return pd.Series(out)

    return df.withColumn(out_col, encode(F.col(text_col)))
