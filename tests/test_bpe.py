"""BPE tokenizer (operators/bpe.py): training against the published
algorithm's hand-worked behavior, application roundtrip, memoized
counting, and partitioning invariance."""

from __future__ import annotations

import pytest

from bigsdb_spark.operators.bpe import (
    END,
    bpe_token_count,
    bpe_tokenize,
    bpe_train,
    bpe_train_from_frequencies,
    segment_word,
)


def test_merge_loop_matches_hand_computation():
    """Sennrich et al. worked-example family: with 'ab' dominating the
    pair counts, the first merge is (a, b); ties break
    lexicographically; merges chain into longer units."""
    freqs = [("abab", 10), ("abc", 5), ("bc", 3)]
    merges = bpe_train_from_frequencies(freqs, n_merges=3)
    # pair counts round 1: (a,b)=25, (b,a)=10, (b,c)=8, (c,</w>)=8,
    # (b,</w>)=10 -> (a,b) wins
    assert merges[0] == ("a", "b")
    # round 2: words are (ab ab </w>)x10, (ab c </w>)x5, (b c </w>)x3:
    # (ab,ab)=10, (ab,</w>)=10, (ab,c)=5, (c,</w>)=8, (b,c)=3 ->
    # tie 10/10 between (ab,</w>) and (ab,ab); lexicographic: (ab,</w>)
    assert merges[1] == ("ab", END)
    assert len(merges) == 3


def test_training_exhausts_cleanly():
    merges = bpe_train_from_frequencies([("aa", 1)], n_merges=50)
    # 'a a </w>' has only 2 mergeable pairs before collapsing to one
    # symbol; the loop must stop, not pad
    assert len(merges) == 2


def test_segment_word_replays_training_merges():
    """Greedy lowest-rank application reproduces the training-time
    segmentation for every trained word."""
    freqs = [("hugging", 10), ("hug", 12), ("jugs", 4), ("hugs", 5)]
    merges = bpe_train_from_frequencies(freqs, n_merges=8)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w, _ in freqs:
        seg = segment_word(w, ranks)
        assert "".join(seg) == w + END  # roundtrip, always
    # the most frequent word ends fully merged
    assert segment_word("hug", ranks) == ["hug" + END]


@pytest.mark.slow
def test_spark_train_apply_and_count(spark):
    texts = [
        (0, "low low low lower lower"),
        (1, "newest newest newest widest widest"),
        (2, "low newest"),
        (3, ""),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    merges = bpe_train(df, "text", n_merges=20)
    # repartition invariance: training sees aggregated counts only
    assert merges == bpe_train(df.repartition(7), "text", n_merges=20)

    toks = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_tokenize(df, "doc_id", "text", merges).collect()
    }
    # roundtrip: concatenation restores the text's words
    for doc_id, text in texts:
        joined = "".join(toks[doc_id]).replace(END, " ").rstrip()
        assert joined == " ".join(w for w in text.split(" ") if w)
    assert toks[3] == []
    # python-side equivalence (same ranks, no Spark)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    expect0 = []
    for w in texts[0][1].split(" "):
        expect0.extend(segment_word(w, ranks))
    assert toks[0] == expect0

    counts = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in bpe_token_count(df, "doc_id", "text", merges).collect()
    }
    assert counts == {d: len(t) for d, t in toks.items()}


def test_spark_training_truncates_to_max_words(spark):
    """max_words bounds the driver-side table: rare words fall out of
    the trainer but common ones keep their counts."""
    rows = [(i, "common common rare%d" % i) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    from bigsdb_spark.operators.bpe import word_frequencies

    top = word_frequencies(df, "text", max_words=1)
    assert top == [("common", 100)]


# ---- Hypothesis properties over the pure-Python core (no Spark) ----

from hypothesis import given, settings, strategies as st  # noqa: E402

_words = st.lists(
    st.text(alphabet="abcd", min_size=1, max_size=6),
    min_size=1,
    max_size=8,
)


def _replay_merges(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Apply the trained merges strictly in training order — the
    definitional segmentation; segment_word's greedy-lowest-rank must
    coincide with it."""
    sym = list(word) + [END]
    for a, b in merges:
        out: list[str] = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


@settings(max_examples=200, deadline=None)
@given(_words, st.integers(min_value=0, max_value=30))
def test_property_roundtrip_and_replay_equivalence(words, n_merges):
    freqs = [(w, i + 1) for i, w in enumerate(dict.fromkeys(words))]
    merges = bpe_train_from_frequencies(freqs, n_merges)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    for w, _ in freqs:
        seg = segment_word(w, ranks)
        # roundtrip: tokens concatenate back to the word
        assert "".join(seg) == w + END
        # greedy-by-rank == replay-in-training-order
        assert seg == _replay_merges(w, merges)
    # merges are unique pairs (no pair is ever learned twice)
    assert len(set(merges)) == len(merges)


@settings(max_examples=100, deadline=None)
@given(_words)
def test_property_training_is_frequency_weighted_not_order_dependent(words):
    freqs = [(w, 3) for w in dict.fromkeys(words)]
    merges = bpe_train_from_frequencies(freqs, 10)
    assert merges == bpe_train_from_frequencies(list(reversed(freqs)), 10)
