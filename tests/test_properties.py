"""Property-based checks (SURVEY §5 plan #3) with hypothesis:
predicate complement laws, distance symmetry/containment relations,
minhash containment."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
import pytest
from pyspark.sql import functions as F

from bigsdb_spark.operators.profiles import matching_profiles, profile_pair_distances
from bigsdb_spark.predicates import build_predicate

VALUES = st.lists(
    st.one_of(st.none(), st.text(alphabet="abcXYZ ", min_size=0, max_size=6)),
    min_size=1,
    max_size=12,
)


@pytest.fixture(scope="module")
def mk_df(spark):
    def make(values):
        return spark.createDataFrame(
            [(i, v) for i, v in enumerate(values)], "id int, v string"
        )
    return make


@settings(max_examples=12, deadline=None)
@given(values=VALUES, term=st.text(alphabet="abcX", min_size=1, max_size=3))
@pytest.mark.slow
def test_not_is_complement_over_all_rows(mk_df, values, term):
    """BIGSdb NOT partitions the table: match(v) and NOT(v) together
    cover every row exactly once (NULLs land in NOT) — unlike SQL 3VL
    where NULL rows vanish from both."""
    df = mk_df(values)
    pos = df.filter(build_predicate(F.col("v"), "=", term)).count()
    neg = df.filter(build_predicate(F.col("v"), "NOT", term)).count()
    assert pos + neg == len(values)
    posc = df.filter(build_predicate(F.col("v"), "contains", term)).count()
    negc = df.filter(build_predicate(F.col("v"), "NOT contain", term)).count()
    assert posc + negc == len(values)


def test_distance_relations(spark):
    """D1 symmetry is structural (id1<id2 canonical); check D2(k) ⊆
    D2(k+1) and absolute ⊆ relative at equal k over a random-ish long
    table."""
    import random

    rng = random.Random(7)
    rows = [
        (i, f"L{j}", str(rng.randint(1, 3)))
        for i in range(1, 31)
        for j in range(7)
    ]
    long_df = spark.createDataFrame(rows, "iso int, locus string, allele string")
    pd = profile_pair_distances(long_df, "iso", "locus", "allele").cache()
    k1 = {(r.id1, r.id2) for r in matching_profiles(pd, 7, 1).collect()}
    k2 = {(r.id1, r.id2) for r in matching_profiles(pd, 7, 2).collect()}
    assert k1 <= k2
    rel = {(r.id1, r.id2) for r in matching_profiles(pd, 7, 2, relative=True).collect()}
    # with all loci shared, relative and absolute coincide
    assert k2 == rel
    # hamming + matched == shared always
    bad = pd.filter(F.col("hamming") + F.col("matched") != F.col("shared")).count()
    assert bad == 0


DNA = st.text(alphabet="ACGT", min_size=1, max_size=40)


@settings(max_examples=10, deadline=None)
@given(seq=DNA)
@pytest.mark.slow
def test_reverse_complement_involution(spark, seq):
    from bigsdb_spark.functions.sequence import reverse_complement

    df = spark.createDataFrame([(seq,)], "s string")
    got = df.select(
        reverse_complement(reverse_complement(F.col("s"))).alias("rr")
    ).head()["rr"]
    assert got == seq


@settings(max_examples=8, deadline=None)
@given(
    seq=st.text(alphabet="ACGT", min_size=10, max_size=30),
    positions=st.sets(st.integers(min_value=0, max_value=9), max_size=3),
)
@pytest.mark.slow
def test_banded_align_agrees_with_sequence_diffs(spark, seq, positions):
    """Cross-validation of two independent implementations on
    same-length substitution-only pairs. The aligner minimizes edit
    cost, and planted substitutions can make a GAPPED alignment
    strictly cheaper (hypothesis found 'AAAAAAACGA' with flips at
    {6,7,8}: the flipped run re-aligns with 2 gaps / 0 mismatches,
    cost 2 < 3 substitutions) — so the sound properties are the
    optimality bound (edit cost never exceeds the substitution count,
    since the ungapped alignment is one candidate) plus exact
    agreement with sequence_diffs whenever the optimum is ungapped."""
    from bigsdb_spark.operators.seqmatch import banded_align, sequence_diffs

    flip = {"A": "C", "C": "G", "G": "T", "T": "A"}
    mutated = list(seq)
    for p in positions:
        mutated[p] = flip[mutated[p]]
    mutated = "".join(mutated)
    pairs = spark.createDataFrame(
        [("p", seq, mutated)], "pair string, qseq string, aseq string"
    )
    aligned = banded_align(pairs, q_col="qseq", a_col="aseq").head()
    n_diffs = sequence_diffs(
        pairs, seq1="qseq", seq2="aseq"
    ).count()
    assert n_diffs == len(positions)
    assert aligned["mismatches"] + aligned["gaps"] <= len(positions)
    # equal-length global alignment: insertions == deletions, each gap
    # column lengthens the alignment by half a gap pair
    assert aligned["alignment"] == len(seq) + aligned["gaps"] // 2
    if aligned["gaps"] == 0:
        assert aligned["mismatches"] == n_diffs
        assert aligned["alignment"] == len(seq)


# ---------------------------------------------------------------------------
# corpus-policy invariants (operators/corpus.py)

PII_TEXT = st.text(
    alphabet="abc @.-0123456789\n", min_size=0, max_size=60
)


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(PII_TEXT, min_size=1, max_size=8))
@pytest.mark.slow
def test_redact_pii_idempotent_and_clean(spark, texts):
    """Redaction is idempotent (a second pass changes nothing) and the
    redacted text never counts residual PII — whatever adversarial
    near-PII strings hypothesis generates."""
    from bigsdb_spark.operators.corpus import pii_counts, redact_pii

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    once = df.select(
        "doc_id", redact_pii(F.col("text")).alias("text")
    )
    twice = once.select("doc_id", redact_pii(F.col("text")).alias("text2"))
    joined = once.join(twice.withColumnRenamed("text2", "t2"), on="doc_id")
    for r in joined.collect():
        assert r["text"] == r["t2"]
    residual = (
        pii_counts(once, "doc_id", "text")
        .agg(F.sum(F.col("n_email") + F.col("n_ipv4") + F.col("n_phone")))
        .head()[0]
    )
    assert residual == 0


def test_hash_sample_partition_and_nesting(spark):
    """rate=1 keeps everything; complementary-looking rates partition
    nothing (hash buckets are shared, so a 0.3 sample is a SUBSET of
    the 0.7 sample at the same seed — nesting, the property that makes
    growing a sample reproducible)."""
    from bigsdb_spark.operators.corpus import hash_sample

    df = spark.range(0, 5000).withColumnRenamed("id", "k")
    assert hash_sample(df, "k", 1.0, seed=11).count() == 5000
    assert hash_sample(df, "k", 0.0, seed=11).count() == 0
    small = {r["k"] for r in hash_sample(df, "k", 0.3, seed=11).collect()}
    big = {r["k"] for r in hash_sample(df, "k", 0.7, seed=11).collect()}
    assert small <= big


def test_decontaminate_partitions_corpus(spark):
    """decontaminate(docs) ∪ hit-docs == docs, disjointly — no document
    is both kept and flagged, none vanishes."""
    from bigsdb_spark.operators.corpus import (
        benchmark_ngram_hits,
        decontaminate,
    )
    from bigsdb_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    bench = docs.filter(F.col("doc_id") % 25 == 0)
    hits = {
        r["doc_id"]
        for r in benchmark_ngram_hits(docs, bench, "doc_id", "text", n=5).collect()
    }
    kept = {r["doc_id"] for r in decontaminate(docs, bench, "doc_id", "text", n=5).collect()}
    everything = {r["doc_id"] for r in docs.collect()}
    assert kept | hits == everything
    assert not (kept & hits)


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=6
    )
)
@pytest.mark.slow
def test_repetition_fractions_bounded(spark, texts):
    """Both repetition fractions live in [0, 1] for arbitrary token
    streams (repeated words, empty docs, single tokens)."""
    from bigsdb_spark.operators.corpus import gopher_repetition_flags

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    for r in gopher_repetition_flags(df, "doc_id", "text").collect():
        assert 0.0 <= r["top2_frac"] <= 1.0, r
        assert 0.0 <= r["dup5_frac"] <= 1.0, r


def test_np_round_half_up_matches_spark_tie_rule():
    """Pure-numpy unit for the GEMM scorers' rounding helper (r7):
    exact-representable ties round HALF AWAY FROM ZERO like F.round
    (np.round would give half-to-even), non-ties round normally, NaN
    propagates, and vectorized input keeps shape."""
    import math

    import numpy as np

    from bigsdb_spark.operators.similarity import np_round_half_up

    # .5-in-the-7th-digit ties that ARE exactly representable at 1e6
    # scale: use k + 0.5 over 1e6 constructed in float space
    assert np_round_half_up(np.float64(0.1234565)) == pytest.approx(
        math.floor(0.1234565 * 1e6 + 0.5) / 1e6
    )
    assert float(np_round_half_up(np.float64(1.5), decimals=0)) == 2.0
    assert float(np_round_half_up(np.float64(2.5), decimals=0)) == 3.0
    assert float(np_round_half_up(np.float64(-1.5), decimals=0)) == -2.0
    assert float(np_round_half_up(np.float64(-2.5), decimals=0)) == -3.0
    # np.round would give 2.0 / 2.0 / -2.0 / -2.0 for the above
    got = np_round_half_up(np.array([0.1234561, np.nan, -0.9999995]))
    assert got.shape == (3,)
    assert got[0] == pytest.approx(0.123456)
    assert np.isnan(got[1])
    assert got[2] == pytest.approx(-1.0)


def test_arrow_mat_guards_contract_violations():
    """r11 (ADVICE r10): _arrow_mat must raise on null rows and ragged
    lists instead of silently reshaping a shrunken buffer into a
    garbled matrix (ListArray.flatten skips null slots, so a null-row
    violation whose element count still divides n_rows used to degrade
    from a crash to wrong cosines)."""
    import numpy as np
    import pyarrow as pa
    import pytest as _pytest

    from bigsdb_spark.operators.similarity import _arrow_mat

    ok = pa.array([[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]])
    m = _arrow_mat(ok, 3)
    assert m.shape == (3, 2) and m.dtype == np.float64
    assert m[2, 1] == 6.0

    # null row whose removal still divides n_rows (4 elements, 2 rows)
    nulled = pa.array([[1.0, 2.0], None, [3.0, 4.0]])
    with _pytest.raises(ValueError, match="null"):
        _arrow_mat(nulled, 3)

    # ragged lengths that do NOT divide
    ragged = pa.array([[1.0, 2.0], [3.0], [4.0, 5.0]])
    with _pytest.raises(ValueError, match="ragged"):
        _arrow_mat(ragged, 3)

    # ragged lengths whose TOTAL divides n_rows (r12, ADVICE r11: the
    # divisibility guard alone reshaped [1, 3] over 2 rows silently)
    divisible_ragged = pa.array([[1.0], [2.0, 3.0, 4.0]])
    with _pytest.raises(ValueError, match="ragged"):
        _arrow_mat(divisible_ragged, 2)
