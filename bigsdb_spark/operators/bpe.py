"""Byte-pair-encoding tokenizer: distributed training statistics, a
driver-side merge loop, and Arrow-vectorized application.

Real token counting for a training-data pipeline (packing budgets,
per-example token costs, length filtering) needs a subword
tokenizer, not the whitespace/regex approximation in
operators/textstats.py.  This is the published BPE algorithm
(Sennrich et al. 2016, arXiv:1508.07909) with the standard division
of labor at scale:

* the corpus-sized work — word frequency counting — is a combinable
  groupBy (map-side partial aggregation; the shuffle carries one row
  per distinct word per partition, not per token), truncated to the
  ``max_words`` most frequent words by TakeOrderedAndProject;
* the merge LOOP runs on the driver over that bounded word-frequency
  table (vocab-sized, independent of corpus size — the same split
  sentencepiece/HF trainers use);
* APPLICATION is an Arrow-batched pandas UDF whose closure carries
  the merge ranks (vocab-sized broadcast) and memoizes per-word
  segmentations within each batch — Zipf's law makes the memo hit
  rate dominate, so the per-row cost is a dict lookup for all but
  first-seen words.

No SQL oracle by design (the merge loop is iterative/greedy, not
relational); tests pin the merges against the worked example family
of the BPE paper and a pure-Python re-implementation, plus the
roundtrip invariant (concatenating a word's tokens reproduces the
word) and repartition invariance of training.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, IntegerType, StringType

END = "</w>"


def word_frequencies(
    df: DataFrame, text_col: str, max_words: int = 100_000
) -> list[tuple[str, int]]:
    """The ``max_words`` most frequent whitespace words with counts,
    descending, ties broken by word (deterministic under any
    partitioning).  This is the only corpus-sized stage of training;
    the result is vocab-sized and collect-safe."""
    counts = (
        df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    rows = counts.orderBy(F.desc("c"), F.asc("w")).limit(max_words).collect()
    return [(r["w"], r["c"]) for r in rows]


def bpe_train_from_frequencies(
    freqs: Iterable[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """The Sennrich et al. merge loop over a word-frequency table:
    repeatedly merge the most frequent adjacent symbol pair (ties by
    lexicographic pair order — fully deterministic).  Pure Python on
    purpose: the input is vocab-sized, never corpus-sized."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in freqs:
        sym = tuple(w) + (END,)
        vocab[sym] = vocab.get(sym, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == best[0] and sym[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_vocab[key] = new_vocab.get(key, 0) + c
        vocab = new_vocab
    return merges


def bpe_train(
    df: DataFrame, text_col: str, n_merges: int, max_words: int = 100_000
) -> list[tuple[str, str]]:
    """Train BPE merges on a corpus: distributed word counting +
    driver-side merge loop (see module docstring for the scale
    contract)."""
    return bpe_train_from_frequencies(
        word_frequencies(df, text_col, max_words), n_merges
    )


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word, lowest-rank pair first (the standard
    greedy application; identical output to replaying the training
    merges in order)."""
    sym = list(word) + [END]
    while len(sym) > 1:
        best_rank, best_i = None, -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def _make_tokenize_udf(merges: list[tuple[str, str]]):
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(ArrayType(StringType()))
    def tok(texts: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def run(text):
            if text is None:
                return []
            out: list[str] = []
            for w in text.split(" "):
                if not w:
                    continue
                seg = memo.get(w)
                if seg is None:
                    seg = segment_word(w, ranks)
                    memo[w] = seg
                out.extend(seg)
            return out

        return texts.map(run)

    return tok


def bpe_tokenize(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """(id, bpe_tokens): Arrow-batched subword tokenization.  The
    merge-rank table rides in the UDF closure (vocab-sized); per-word
    segmentations are memoized per batch."""
    return df.select(
        F.col(id_col),
        _make_tokenize_udf(merges)(F.col(text_col)).alias("bpe_tokens"),
    )


def bpe_token_count(
    df: DataFrame, id_col: str, text_col: str, merges: list[tuple[str, str]]
) -> DataFrame:
    """(id, n_bpe_tokens): token-budget counting without materializing
    the token arrays in the plan output (the common packing input)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(IntegerType())
    def cnt(texts: pd.Series) -> pd.Series:
        memo: dict[str, int] = {}

        def run(text):
            if text is None:
                return 0
            n = 0
            for w in text.split(" "):
                if not w:
                    continue
                c = memo.get(w)
                if c is None:
                    c = len(segment_word(w, ranks))
                    memo[w] = c
                n += c
            return n

        return texts.map(run)

    return df.select(
        F.col(id_col), cnt(F.col(text_col)).alias("n_bpe_tokens")
    )
