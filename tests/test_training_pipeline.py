"""Training-corpus assembly: packing invariants, shard determinism and
incremental dedup against a corpus index (operators/training.py)."""

import pyspark.sql.functions as F
import pytest

from bigsdb_spark.operators.training import (
    build_corpus_index,
    dedup_against_index,
    pack_documents,
    shard_assignments,
    split_oversized,
    write_training_shards,
)


@pytest.fixture()
def docs(spark):
    rows = [(i, (i % 7 + 1) * 137) for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_split_oversized(spark):
    df = spark.createDataFrame(
        [(1, 100), (2, 2048), (3, 2049), (4, 5000)], "doc_id long, n_tokens long"
    )
    got = {
        (r["doc_id"], r["part"]): r["n_tokens"]
        for r in split_oversized(df, "doc_id", "n_tokens", 2048).collect()
    }
    assert got == {
        (1, 0): 100,
        (2, 0): 2048,
        (3, 0): 2048, (3, 1): 1,
        (4, 0): 2048, (4, 1): 2048, (4, 2): 904,
    }


def test_pack_documents_invariants(spark, docs):
    max_len = 2048
    packed = pack_documents(docs, "doc_id", "n_tokens", max_len, partitions=8)
    rows = packed.collect()
    # every doc chunk appears exactly once
    assert sorted(r["doc_id"] for r in rows) == sorted(range(200))
    by_example = {}
    for r in rows:
        by_example.setdefault(r["example_id"], []).append(r)
    for ex in by_example.values():
        ex.sort(key=lambda r: r["offset"])
        total = 0
        for r in ex:
            assert r["offset"] == total  # offsets tile the example
            total += r["n_tokens"]
        assert total <= max_len
    # packing is efficient: all but the final example of each partition
    # must be > half full under next-fit with items <= max_len/2... the
    # fixture's largest doc is 959 < 2048, so every closed example holds
    # >= 2 docs -> fill > 1096/2048. Check mean fill of closed examples.
    closed = [
        sum(r["n_tokens"] for r in ex)
        for ex in by_example.values()
        if len(ex) > 1
    ]
    assert closed and sum(closed) / len(closed) > max_len * 0.55


def test_pack_documents_deterministic(spark, docs):
    a = pack_documents(docs, "doc_id", "n_tokens", 2048, partitions=8).collect()
    b = pack_documents(docs, "doc_id", "n_tokens", 2048, partitions=8).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_shard_assignments_balanced_and_stable(spark, docs):
    s1 = shard_assignments(docs, "doc_id", 8, seed=3)
    counts = {r["shard"]: r["n"] for r in s1.groupBy("shard").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= set(range(8))
    assert max(counts.values()) <= 3 * min(counts.values())  # rough uniformity at n=200
    s2 = shard_assignments(docs, "doc_id", 8, seed=3)
    assert sorted(map(tuple, s1.collect())) == sorted(map(tuple, s2.collect()))
    # a different seed produces a different permutation
    s3 = shard_assignments(docs, "doc_id", 8, seed=4)
    assert sorted(map(tuple, s1.collect())) != sorted(map(tuple, s3.collect()))


def test_write_training_shards_roundtrip(spark, docs, tmp_path):
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, "doc_id", n_shards=4, seed=1)
    back = spark.read.parquet(path)
    assert back.count() == 200
    assert {r["shard"] for r in back.select("shard").distinct().collect()} == {0, 1, 2, 3}
    # within-shard order column survives and matches recomputation
    expect = shard_assignments(docs, "doc_id", 4, seed=1)
    assert sorted(map(tuple, back.select("doc_id", "shard").collect())) == sorted(
        map(tuple, expect.select("doc_id", "shard").collect())
    )


TEXTS = [
    "the quick brown fox jumps over the lazy dog again and again today",
    "pack my box with five dozen liquor jugs for the long journey home",
    "sphinx of black quartz judge my vow while the night is still young",
]


@pytest.mark.slow
def test_dedup_against_index(spark):
    corpus = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    index = build_corpus_index(corpus, "doc_id", "text")
    new = spark.createDataFrame(
        [
            (100, TEXTS[0]),                       # exact dup of corpus
            (101, TEXTS[1] + " extra words"),      # near dup of corpus
            (102, "a completely different document about spark shuffle joins"),
            (103, "a completely different document about spark shuffle joins"),  # intra exact dup
            (104, "totally unrelated content mentioning nothing shared at all"),
        ],
        "doc_id long, text string",
    )
    out = dedup_against_index(new, index, "doc_id", "text")
    kept = sorted(r["doc_id"] for r in out["kept"].collect())
    assert kept == [102, 104]
    # updated index covers the kept docs: re-running the same batch keeps nothing
    again = dedup_against_index(new, {"md5": out["md5"], "bands": out["bands"]}, "doc_id", "text")
    assert again["kept"].count() == 0


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    sizes=st.lists(st.integers(min_value=1, max_value=6000), min_size=1, max_size=60),
    max_len=st.sampled_from([512, 2048]),
)
def test_pack_documents_property(spark, sizes, max_len):
    """Packing invariants over random size mixes: exact chunk coverage
    (total packed tokens == total input tokens), no example overflow,
    and chunking only for docs longer than max_len."""
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "doc_id long, n_tokens long"
    )
    from bigsdb_spark.operators.training import pack_documents

    rows = pack_documents(df, "doc_id", "n_tokens", max_len, partitions=4).collect()
    assert sum(r["n_tokens"] for r in rows) == sum(sizes)
    per_doc = {}
    per_ex = {}
    for r in rows:
        assert 1 <= r["n_tokens"] <= max_len
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tokens"]
        per_ex[r["example_id"]] = per_ex.get(r["example_id"], 0) + r["n_tokens"]
    assert per_doc == {i: s for i, s in enumerate(sizes)}
    assert all(total <= max_len for total in per_ex.values())


@settings(max_examples=10, deadline=None)
@given(
    sizes=st.lists(
        st.one_of(
            st.sampled_from([0, 511, 512, 513, 1024, 1025]),  # boundaries
            st.integers(min_value=0, max_value=3000),
        ),
        min_size=1,
        max_size=80,
    ),
)
def test_pack_documents_adversarial_lengths(spark, sizes):
    """VERDICT r3 #9: adversarial packing — zero-token docs, docs
    exactly at/over max_len, and pathological mixes.  Invariants:
    exact token coverage; every doc represented (zero-token docs yield
    ONE empty chunk, never a phantom part); no example overflow; and
    chunk offsets exactly TILE each example (offset_{i+1} =
    offset_i + n_tokens_i from 0)."""
    max_len = 512
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sizes)], "doc_id long, n_tokens long"
    )
    from bigsdb_spark.operators.training import pack_documents

    rows = pack_documents(df, "doc_id", "n_tokens", max_len, partitions=4).collect()
    assert sum(r["n_tokens"] for r in rows) == sum(sizes)
    per_doc = {}
    per_ex = {}
    for r in rows:
        assert 0 <= r["n_tokens"] <= max_len
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["n_tokens"]
        per_ex.setdefault(r["example_id"], []).append(
            (r["offset"], r["n_tokens"])
        )
    # every doc appears, including zero-token ones (exactly one chunk)
    assert set(per_doc) == set(range(len(sizes)))
    assert per_doc == {i: s for i, s in enumerate(sizes)}
    zero_docs = {i for i, s in enumerate(sizes) if s == 0}
    zero_chunks = [r for r in rows if r["doc_id"] in zero_docs]
    assert len(zero_chunks) == len(zero_docs)
    # offsets tile each example and sums never overflow
    for chunks in per_ex.values():
        chunks.sort()
        expect = 0
        for off, n in chunks:
            assert off == expect
            expect += n
        assert expect <= max_len
    # a doc exactly max_len long is exactly one full chunk
    for i, s in enumerate(sizes):
        if s == max_len:
            parts = [r for r in rows if r["doc_id"] == i]
            assert len(parts) == 1 and parts[0]["n_tokens"] == max_len
