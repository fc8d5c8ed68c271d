"""Char n-gram LM training + perplexity scoring (operators/lm.py)."""

import math

import pyspark.sql.functions as F

from bigsdb_spark.operators.lm import perplexity, perplexity_filter, train_char_lm

ENGLISH = [
    "the cat sat on the mat and the dog sat on the log",
    "the quick brown fox jumps over the lazy dog every day",
    "a stitch in time saves nine and practice makes perfect",
    "all that glitters is not gold but the early bird gets the worm",
]


def test_model_probabilities_normalize(spark):
    corpus = spark.createDataFrame([(t,) for t in ENGLISH], "text string")
    model = train_char_lm(corpus, n=3, k=0.1, vocab_size=40)
    # for each history: sum of exp(logp) over SEEN continuations plus
    # the smoothed mass of the (40 - seen) unseen ones must be 1
    rows = model.groupBy("hist", "history_count").agg(
        F.sum(F.exp("logp")).alias("seen_mass"), F.count(F.lit(1)).alias("n_seen")
    ).collect()
    for r in rows:
        unseen = (40 - r["n_seen"]) * 0.1 / (r["history_count"] + 0.1 * 40)
        assert abs(r["seen_mass"] + unseen - 1.0) < 1e-9


def test_perplexity_orders_text_quality(spark):
    corpus = spark.createDataFrame([(t,) for t in ENGLISH], "text string")
    model = train_char_lm(corpus)
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the log and the dog jumps over the mat"),
            (2, "zqxj wvk qzzt xjqv kkwz vxqj ttqz jxqv zzkw qvxj"),
        ],
        "doc_id long, text string",
    )
    ppl = {r["doc_id"]: r["perplexity"] for r in perplexity(docs, model).collect()}
    assert ppl[1] < ppl[2]            # in-domain beats gibberish
    assert ppl[1] < 15                # tight fit on training-like text
    kept = perplexity_filter(docs, model, max_perplexity=15).collect()
    assert [r["doc_id"] for r in kept] == [1]


def test_perplexity_unseen_history_floor(spark):
    corpus = spark.createDataFrame([("abababab",)], "text string")
    model = train_char_lm(corpus, n=3, vocab_size=40)
    docs = spark.createDataFrame([(1, "zzzz")], "doc_id long, text string")
    row = perplexity(docs, model).collect()[0]
    # every history unseen -> uniform 1/40 per gram -> perplexity == 40
    assert abs(row["perplexity"] - 40.0) < 1e-6
    assert row["n_grams"] == 2


def test_short_doc_yields_no_rows(spark):
    corpus = spark.createDataFrame([("abcabc",)], "text string")
    model = train_char_lm(corpus)
    docs = spark.createDataFrame([(1, "ab")], "doc_id long, text string")
    assert perplexity(docs, model).collect() == []
