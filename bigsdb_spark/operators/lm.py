"""Character n-gram language-model perplexity scoring — the classic
corpus quality filter (CCNet-style: score each document against an
in-domain LM, keep the low-perplexity head / resample the tail).

No reference counterpart (the reference is a genomics warehouse);
public-knowledge design: add-k-smoothed char-level n-gram model, both
phases as single groupBy/join plans.

Scale notes: training is one explode + groupBy count over the corpus
(map-side partial aggregation does most of the work); the model is a
(history, next_char, logp) table bounded by the char vocabulary
(|V|^n rows worst-case, far less in practice) — broadcastable for
n<=3 on a typical vocabulary, an equi-join otherwise.  Scoring joins
each document's n-gram multiset against the model on the (history,
next_char) key — uniform hash keys, no skew beyond natural character
frequency, and AQE handles the hot ' e' buckets.
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

__all__ = ["train_char_lm", "perplexity", "perplexity_filter"]

# normalization shared by train + score: lowercase, collapse whitespace
# runs, strip chars outside a printable core so vocabulary is bounded
def _norm(col):
    c = F.lower(col)
    c = F.regexp_replace(c, r"[^a-z0-9 .,;:!?'\"()\-]", " ")
    return F.regexp_replace(c, r"\s+", " ")


def _gram_rows(df: DataFrame, keep: list[str], text_col: str, n: int) -> DataFrame:
    """One row per char n-gram, split as (hist, nxt).

    Deliberately NOT an array ``transform`` over an inline expression:
    Catalyst collapses projections, so a substring lambda whose input
    is the normalization chain re-evaluates the full regex stack per
    ELEMENT — quadratic per document (measured 8.1 s vs 0.3 s on the
    sf0.001 corpus; same trap word_shingles documents).  Exploding the
    index range first makes the normalized text a materialized column
    of the Generate's child row, so each substring is O(n)."""
    normed = df.select(*keep, _norm(F.col(text_col)).alias("_t")).filter(
        F.length("_t") >= n
    )
    return normed.select(
        *keep,
        "_t",
        F.explode(F.sequence(F.lit(1), F.length("_t") - (n - 1))).alias("_i"),
    ).select(
        *keep,
        F.substring(F.col("_t"), F.col("_i").cast("int"), n - 1).alias("hist"),
        F.substring(F.col("_t"), (F.col("_i") + (n - 1)).cast("int"), 1).alias("nxt"),
    )


def train_char_lm(
    corpus: DataFrame,
    text_col: str = "text",
    n: int = 3,
    k: float = 0.1,
    vocab_size: int = 40,
    broadcast_totals: bool | None = None,
) -> DataFrame:
    """Train an add-k char n-gram model: one row per observed
    (history, next_char) with its smoothed log-probability, plus the
    per-history total needed by scorers for unseen continuations
    (history_count).  logp = log((c(h,x)+k) / (c(h)+k*|V|)).

    The totals join broadcasts when histories are bounded small —
    |V|^(n-1) rows, safe through n=4 on a printable-core vocabulary —
    and falls back to a shuffle join for larger n (|V|^5 histories
    would OOM the driver).  Override with ``broadcast_totals``."""
    grams = _gram_rows(corpus, [], text_col, n)
    counts = grams.groupBy("hist", "nxt").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.groupBy("hist").agg(F.sum("c").alias("hc"))
    if broadcast_totals is None:
        broadcast_totals = n <= 4
    if broadcast_totals:
        totals = F.broadcast(totals)
    return (
        counts.join(totals, "hist")
        .select(
            "hist",
            "nxt",
            F.log(
                (F.col("c") + F.lit(k)) / (F.col("hc") + F.lit(k * vocab_size))
            ).alias("logp"),
            F.col("hc").alias("history_count"),
        )
    )


def perplexity(
    docs: DataFrame,
    model: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: float = 0.1,
    vocab_size: int = 40,
    broadcast_model: bool = True,
) -> DataFrame:
    """Per-document char-level perplexity under the model:
    exp(mean negative log-prob over the doc's n-grams).

    Unseen (history, next) pairs with a KNOWN history back off to the
    smoothed floor k/(c(h)+k|V|); a wholly unseen history scores the
    uniform 1/|V|.  Documents shorter than ``n`` normalized chars have
    no n-grams and produce NO output row (callers joining back should
    left-join; ``perplexity_filter`` drops them, documented there).
    """
    grams = _gram_rows(docs, [id_col], text_col, n)
    m = model
    hist_totals = m.select("hist", "history_count").distinct()
    if broadcast_model:
        m = F.broadcast(m)
        hist_totals = F.broadcast(hist_totals)
    scored = (
        grams.join(m.select("hist", "nxt", "logp"), ["hist", "nxt"], "left")
        .join(hist_totals, ["hist"], "left")
        .select(
            id_col,
            F.coalesce(
                F.col("logp"),
                # known history, unseen char -> smoothing floor
                F.when(
                    F.col("history_count").isNotNull(),
                    F.log(
                        F.lit(k)
                        / (F.col("history_count") + F.lit(k * vocab_size))
                    ),
                ),
                # unknown history -> uniform
                F.lit(math.log(1.0 / vocab_size)),
            ).alias("_lp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.exp(-F.avg("_lp")).alias("perplexity"),
        F.count(F.lit(1)).alias("n_grams"),
    )


def perplexity_filter(
    docs: DataFrame,
    model: DataFrame,
    max_perplexity: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    k: float = 0.1,
    vocab_size: int = 40,
    broadcast_model: bool = True,
) -> DataFrame:
    """Keep documents scoring at or below the perplexity cutoff — the
    head of the quality distribution. One semi-join.  Pass the SAME
    ``k``/``vocab_size`` the model was trained with (they set the
    unseen-continuation floors).  Documents shorter than ``n``
    normalized chars have no score and are dropped."""
    ppl = perplexity(
        docs, model, id_col, text_col, n, k, vocab_size, broadcast_model
    )
    keep = ppl.filter(F.col("perplexity") <= max_perplexity).select(id_col)
    return docs.join(keep, id_col, "left_semi")
