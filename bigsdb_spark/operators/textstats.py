"""Text-analysis operators (training-data pipeline family).

Language-ID (stopword-ratio heuristic), quality scoring, token counting
— all expression-only so they run vectorized JVM-side and have DuckDB
oracles. Tokenization is shared with the dedup family
(``normalized_text``: lowercase, strip punctuation, collapse
whitespace) so corpus stats and dedup agree on what a token is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigsdb_spark.operators.dedup import normalized_text

EN_STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "for", "on", "it")


def _tokens(text_col) -> Column:
    return F.split(normalized_text(text_col), " ")


def mean_token_length(text_col) -> Column:
    """Non-space chars per token — SHARED Column builder (also consumed
    by the one-scan inventory text suite; the oracle spelling must track
    this expression)."""
    return F.round(
        F.length(F.regexp_replace(text_col, r"\s", "")) / F.size(_tokens(text_col)),
        4,
    )


def unique_token_ratio(text_col) -> Column:
    toks = _tokens(text_col)
    return F.round(F.size(F.array_distinct(toks)) / F.size(toks), 4)


def length_band_ok(text_col, lo: int = 100, hi: int = 20000) -> Column:
    return (F.length(text_col) >= lo) & (F.length(text_col) <= hi)


def composite_quality(text_col) -> Column:
    """sw*0.4 + uniq*0.4 + 0.2·len_ok — the single source of the
    quality formula for both quality_score and the inventory suite."""
    return F.round(
        stopword_ratio(text_col) * 0.4
        + unique_token_ratio(text_col) * 0.4
        + F.when(length_band_ok(text_col), 0.2).otherwise(0.0),
        4,
    )


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace token count, char count, mean token length (non-space
    chars per token), vocabulary size."""
    toks = _tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        mean_token_length(F.col(text_col)).alias("mean_token_len"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_unique_tokens"),
    )


def stopword_ratio(text_col, stopwords=EN_STOPWORDS) -> Column:
    toks = _tokens(text_col)
    stops = F.filter(toks, lambda t: t.isin(*stopwords))
    return F.round(F.size(stops) / F.size(toks), 4)


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Heuristic quality features: length band, stopword ratio, unique
    ratio, and a composite score — the usual pre-training corpus filters."""
    toks = _tokens(F.col(text_col))
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        stopword_ratio(F.col(text_col)).alias("stop_ratio"),
        unique_token_ratio(F.col(text_col)).alias("unique_ratio"),
        length_band_ok(F.col(text_col)).cast("int").alias("len_ok"),
        composite_quality(F.col(text_col)).alias("quality"),
    )


def lang_heuristic(
    df: DataFrame, id_col: str, text_col: str, threshold: float = 0.08
) -> DataFrame:
    """N-gram/stopword language-ID heuristic: predict 'en' when the
    English stopword ratio clears the threshold. (A real model would be a
    pandas UDF; the heuristic keeps the plumbing oracle-checkable.)"""
    sw = stopword_ratio(F.col(text_col))
    return df.select(
        F.col(id_col),
        sw.alias("stop_ratio"),
        F.when(sw >= threshold, F.lit("en")).otherwise(F.lit("other")).alias(
            "pred_lang"
        ),
    )
