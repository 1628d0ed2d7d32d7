"""Byte-pair-encoding tokenizer: train merges on a corpus, encode at
scale — the token-accounting layer of a training-data pipeline (packing
budgets, per-source token quotas, tokens-per-doc quality cuts all want
REAL subword counts, not whitespace proxies).

Scale split mirrors every trained operator in this engine (k-means
centroids, PQ codebooks, IVF centers):

- **word-frequency extraction is distributed** — one groupBy over the
  exploded corpus, truncated to the ``max_words`` most frequent words
  (standard practice: BPE training operates on the word-frequency
  table, not the raw text, and a Zipfian corpus concentrates almost all
  mass in the head). This is the only corpus-size-dependent pass.
- **merge training is driver-side** over that bounded table (classic
  Sennrich et al. 2016 algorithm): repeatedly merge the most frequent
  adjacent symbol pair, ties broken lexicographically so the merge list
  is deterministic for a given corpus — engine-portable, no RNG.
- **encoding is executor-side** via an Arrow-batched pandas_udf: the
  merge list broadcasts (a few KB), each word applies merges in rank
  order (the standard greedy BPE apply), and a per-batch word cache
  exploits Zipf again (each distinct word is encoded once per batch).

End-of-word marker ``</w>`` keeps "low" in "lowest" distinct from the
word "low", as in the original paper.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: end-of-word marker (Sennrich et al. 2016)
EOW = "</w>"


def word_frequencies(
    df: DataFrame,
    text_col: str = "text",
    max_words: int = 50_000,
) -> list[tuple[str, int]]:
    """The distributed pass: (word, count) for the ``max_words`` most
    frequent whitespace words, deterministic order (count desc, word)."""
    freq = (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.col(text_col), r"\s+"), lambda t: t != F.lit("")
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("w"))
        .limit(max_words)
        .collect()
    )
    return [(r["w"], r["n"]) for r in freq]


def train_bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 200,
    max_words: int = 50_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus word-frequency
    table. Deterministic: the most frequent pair wins each round, ties
    to the lexicographically smallest pair."""
    vocab: dict[tuple[str, ...], int] = {}
    for word, n in word_frequencies(df, text_col, max_words):
        symbols = tuple(word) + (EOW,)
        vocab[symbols] = vocab.get(symbols, 0) + n

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for symbols, n in vocab.items():
            for a, b in zip(symbols, symbols[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + n
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pair_counts[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for symbols, n in vocab.items():
            out = []
            i = 0
            while i < len(symbols):
                if (
                    i + 1 < len(symbols)
                    and symbols[i] == best[0]
                    and symbols[i + 1] == best[1]
                ):
                    out.append(merged)
                    i += 2
                else:
                    out.append(symbols[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + n
        vocab = new_vocab
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy BPE apply: repeatedly merge the best-ranked adjacent pair."""
    symbols = list(word) + [EOW]
    while len(symbols) > 1:
        best_rank, best_i = None, None
        for i, pair in enumerate(zip(symbols, symbols[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        symbols[best_i : best_i + 2] = [symbols[best_i] + symbols[best_i + 1]]
    return symbols


def bpe_token_counts(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "n_bpe",
) -> DataFrame:
    """Add the trained-BPE token count per row — Arrow-batched, merge
    list broadcast, per-batch word cache (Zipf: each distinct word
    encodes once per batch)."""
    from pyspark.sql.functions import pandas_udf

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(
        {pair: i for i, pair in enumerate(merges)}
    )

    @pandas_udf("bigint")
    def counter(texts: pd.Series) -> pd.Series:
        ranks = bc.value
        cache: dict[str, int] = {}

        def count_one(t: str | None) -> int | None:
            if t is None:
                return None
            total = 0
            for w in t.split():
                hit = cache.get(w)
                if hit is None:
                    hit = len(_encode_word(w, ranks))
                    cache[w] = hit
                total += hit
            return total

        return texts.map(count_one)

    return df.withColumn(out_col, counter(F.col(text_col)))
