"""Dedup family: exact, minhash/LSH (duplicate docs MUST collide),
n-gram Jaccard, simhash vs a pure-python reference; similarity search
brute-force vs bucketed recall."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from bigsdb_spark.operators.dedup import (
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard,
    simhash,
    word_shingles,
)
from bigsdb_spark.operators.similarity import cosine_topk_pairs, nearest_neighbor

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "The quick brown fox jumps over the lazy dog near the river bank!"),  # ~dup of 1
    (3, "completely different content about spark query engines and shuffles"),
    (4, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup
    (5, "short doc"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_duplicates_normalized(spark, docs):
    got = exact_duplicates(docs, "doc_id", "text").collect()
    # 1 and 2 differ only by case/punctuation -> same fingerprint
    assert len(got) == 1 and got[0].n_docs == 2 and got[0].min_id == 1


def test_exact_duplicate_pairs_star_shape(spark, docs):
    from bigsdb_spark.operators.dedup import exact_duplicate_pairs

    tripled = docs.unionByName(
        docs.filter(F.col("doc_id") == 1).select(
            (F.col("doc_id") + 100).alias("doc_id"), "text"
        )
    )
    got = {
        (r.id1, r.id2)
        for r in exact_duplicate_pairs(tripled, "doc_id", "text").collect()
    }
    # group {1, 2, 101}: keeper 1, star pairs to every other member
    assert got == {(1, 2), (1, 101)}


def test_embedding_near_duplicates_threshold(spark):
    from bigsdb_spark.operators.dedup import embedding_near_duplicates

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.2, 0.1, 0.0]),
            (2, [0.5, 0.1, 0.05, 0.0]),  # same direction as 1 -> cosine 1.0
            (3, [0.9, 0.3, 0.2, 0.1]),  # close but below 0.999
            (4, [-1.0, 0.2, 0.1, 0.0]),  # different sign bucket
        ],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r.id1, r.id2): r.cosine
        for r in embedding_near_duplicates(
            emb, "vec_id", "embedding", dims=3, min_cosine=0.999
        ).collect()
    }
    assert set(got) == {(1, 2)} and got[(1, 2)] == 1.0


def test_minhash_lsh_finds_neardups(spark, docs):
    sh = word_shingles(docs, "doc_id", "text", k=3)
    sig = minhash_signatures(sh, n_hashes=8)
    cand = {(r.doc1, r.doc2) for r in lsh_candidate_pairs(sig).collect()}
    assert (1, 2) in cand  # identical shingle sets -> all bands collide
    assert (3, 5) not in cand


def test_ngram_jaccard_values(spark, docs):
    sh = word_shingles(docs, "doc_id", "text", k=3)
    got = {(r.doc1, r.doc2): r.jaccard for r in ngram_jaccard(sh).collect()}
    assert got[(1, 2)] == 1.0  # identical after normalization
    assert 0 < got[(1, 4)] < 1.0


def test_simhash_against_python_reference(spark, docs):
    def py_simhash(text: str, bits: int = 16) -> int:
        import re

        norm = re.sub(r"\s+", " ", re.sub(r"[^a-z0-9 ]", " ", text.lower())).strip()
        votes = [0] * bits
        for tok in [t for t in norm.split(" ") if t]:
            h = int(hashlib.md5(tok.encode()).hexdigest()[: bits // 4], 16)
            for i in range(bits):
                votes[i] += 1 if (h >> i) & 1 else -1
        return sum((1 << i) for i in range(bits) if votes[i] > 0)

    got = {r.doc: r.simhash for r in simhash(docs, "doc_id", "text").collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == py_simhash(text), doc_id


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0]),   # close to 1
        (3, [0.0, 1.0, 0.0]),
        (4, [-1.0, 0.0, 0.0]),  # opposite of 1
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.mark.slow
def test_cosine_topk(spark, vectors):
    top = cosine_topk_pairs(vectors, "vec_id", "embedding", k=1).collect()
    assert (top[0].id1, top[0].id2) == (1, 2)


@pytest.mark.slow
def test_nearest_neighbor(spark, vectors):
    q = vectors.filter(F.col("vec_id") == 1)
    c = vectors.filter(F.col("vec_id") != 1)
    nn = nearest_neighbor(q, c, "vec_id", "embedding").collect()[0]
    assert nn.nn_id == 2 and nn.cosine > 0.98


def test_non_latin_documents_are_not_mutual_duplicates(spark):
    """Regression: an ASCII-only keep-set normalized every non-Latin
    document to '' — all of them md5-equal. Unicode letters survive."""
    docs = spark.createDataFrame(
        [(1, "完全不同的文档内容"), (2, "другой текст совсем"), (3, "完全不同的文档内容")],
        "doc_id long, text string",
    )
    got = exact_duplicates(docs, "doc_id", "text").collect()
    assert len(got) == 1 and got[0].n_docs == 2  # only the true pair 1&3


@pytest.mark.slow
def test_np_topk_supports_string_ids(spark):
    from bigsdb_spark.operators.similarity import (
        cosine_topk_pairs,
        cosine_topk_pairs_np,
    )

    emb = spark.createDataFrame(
        [(f"iso_{i}", [float(i % 5) + 0.1, float(i % 3), 1.0]) for i in range(30)],
        "vec_id string, embedding array<double>",
    )
    want = {
        (r.id1, r.id2): r.cosine for r in cosine_topk_pairs(emb, "vec_id", "embedding", k=5).collect()
    }
    got = {
        (r.id1, r.id2): r.cosine
        for r in cosine_topk_pairs_np(emb, "vec_id", "embedding", k=5, block_size=8).collect()
    }
    assert got == want


def test_ngram_jaccard_reports_zero_overlap_candidates(spark, docs):
    sh = word_shingles(docs, "doc_id", "text", k=3)
    pairs = spark.createDataFrame([(1, 3)], "doc1 long, doc2 long")  # disjoint docs
    got = ngram_jaccard(sh, pairs=pairs).collect()
    assert len(got) == 1 and got[0].jaccard == 0.0 and got[0].n_common == 0


def test_ngram_jaccard_keeps_shingleless_candidate(spark, docs):
    """A candidate doc whose text is shorter than the shingle width has
    no rows in the shingle frame at all; the pair must still come back
    as jaccard=0 (the size lookups are left joins), not vanish."""
    from bigsdb_spark.operators.dedup import word_shingles as ws

    tiny = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the dog"), (99, "too short")],
        "doc_id long, text string",
    )
    sh = ws(tiny, "doc_id", "text", k=3)
    assert sh.filter(F.col("doc") == 99).count() == 0  # premise
    pairs = spark.createDataFrame([(1, 99)], "doc1 long, doc2 long")
    got = ngram_jaccard(sh, pairs=pairs).collect()
    assert len(got) == 1
    assert got[0].jaccard == 0.0 and got[0].n_common == 0 and got[0].n2 == 0


@pytest.mark.slow
def test_np_topk_deterministic_under_ties(spark):
    """Many exact-duplicate vectors tie at cosine 1.0 across block-pair
    tasks; the np path must keep boundary ties and resolve them by
    (id1, id2) so it matches the expression path's deterministic
    ordering instead of emitting an arbitrary k per task."""
    from bigsdb_spark.operators.similarity import (
        cosine_topk_pairs,
        cosine_topk_pairs_np,
    )

    # 12 identical vectors -> 66 pairs all at cosine 1.0, plus noise
    rows = [(i, [1.0, 2.0, 3.0]) for i in range(12)]
    rows += [(100 + i, [float(i + 1), 1.0, 0.5]) for i in range(8)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    want = [
        (r.id1, r.id2, r.cosine)
        for r in cosine_topk_pairs(emb, "vec_id", "embedding", k=10).collect()
    ]
    got = [
        (r.id1, r.id2, r.cosine)
        for r in cosine_topk_pairs_np(
            emb, "vec_id", "embedding", k=10, block_size=4
        ).collect()
    ]
    assert got == want


def test_np_topk_zero_norm_vectors_do_not_drop_pairs(spark):
    """Regression (ADVICE r2): a zero-norm vector yields NaN cosines in
    a block-pair task; an unmasked NaN landing in the top partition made
    vk NaN and `vals >= vk` all-False — the task silently emitted
    NOTHING, dropping real pairs. NaNs must be masked before ranking."""
    from bigsdb_spark.operators.similarity import cosine_topk_pairs_np

    rows = [(i, [float(i % 4) + 1.0, 2.0, 1.0]) for i in range(12)]
    rows += [(100 + i, [0.0, 0.0, 0.0]) for i in range(4)]  # zero-norm
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = cosine_topk_pairs_np(
        emb, "vec_id", "embedding", k=5, block_size=4
    ).collect()
    assert len(got) == 5
    assert all(r.cosine == r.cosine for r in got)  # no NaN emitted
    # the duplicate-direction pairs (i, i+4, i+8 share a vector) top out
    assert got[0].cosine == 1.0


def test_minhash_multiset_shingles_identical_signatures(spark):
    """distinct=False shingles (no dedup shuffle) must give BIT-identical
    minhash signatures and candidate pairs: min over a multiset equals
    min over its set.  This is the scale path for minhash-only
    pipelines (the distinct shuffle of every shingle occurrence was the
    dominant exchange at 1e6+ docs)."""
    from bigsdb_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat the cat sat on the mat"),  # repeats
            (2, "the cat sat on the mat again and again and again"),
            (3, "completely different words about spark parquet files"),
        ],
        "doc_id long, text string",
    )
    sig_set = {
        tuple(r) for r in minhash_signatures(
            word_shingles(docs, "doc_id", "text"), 8
        ).collect()
    }
    sig_multi = {
        tuple(r) for r in minhash_signatures(
            word_shingles(docs, "doc_id", "text", distinct=False), 8
        ).collect()
    }
    assert sig_set == sig_multi
    pairs_set = {
        (r["doc1"], r["doc2"]) for r in lsh_candidate_pairs(
            minhash_signatures(word_shingles(docs, "doc_id", "text"), 8), 8
        ).collect()
    }
    pairs_multi = {
        (r["doc1"], r["doc2"]) for r in lsh_candidate_pairs(
            minhash_signatures(
                word_shingles(docs, "doc_id", "text", distinct=False), 8
            ),
            8,
        ).collect()
    }
    assert pairs_set == pairs_multi


def test_minhash_xxhash_family_finds_planted_dups(spark):
    """The xxhash64 hash family (the no-SQL-oracle serving variant) is
    a uniform minhash family like md5: exact dups always collide on
    every band; near-dups surface as candidates; distinct docs don't."""
    import pytest

    from bigsdb_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    t = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, t),
            (2, t),                              # exact dup
            (3, t + " with a small tail"),       # near dup
            (4, "sphinx of black quartz judge my vow tonight quietly now"),
        ],
        "doc_id long, text string",
    )
    sigs = minhash_signatures(
        word_shingles(docs, "doc_id", "text", distinct=False),
        8,
        hash_family="xxhash64",
    )
    assert dict(sigs.dtypes)["h0"] == "bigint"  # longs, not hex strings
    pairs = {
        (r["doc1"], r["doc2"])
        for r in lsh_candidate_pairs(sigs, 8).collect()
    }
    assert (1, 2) in pairs          # exact dup: all bands collide
    assert (1, 3) in pairs or (2, 3) in pairs  # near dup surfaces
    assert not any(4 in p for p in pairs)      # distinct doc stays out
    with pytest.raises(ValueError, match="unknown hash_family"):
        minhash_signatures(sigs, 8, hash_family="sha1")


def test_fused_minhash_zero_shuffle_and_recall(spark):
    """The fused signature (one projection, no explode/shuffle) is a
    valid minhash family: exact dups collide on every band, near-dups
    surface, distinct docs don't; short docs yield NULL components and
    never produce pairs.  The plan is pinned shuffle-free."""
    from bigsdb_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures_fused,
    )

    t = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [
            (1, t),
            (2, t),                        # exact dup
            (3, t + " with a small tail"),  # near dup
            (4, "sphinx of black quartz judge my vow tonight quietly now"),
            (5, "too short"),               # < k words: dropped
            (6, "also short"),              # 5+6 must NOT pair
        ],
        "doc_id long, text string",
    )
    sigs = minhash_signatures_fused(docs, "doc_id", "text")
    plan = sigs._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero-shuffle signature generation
    rows = {r["doc"]: r for r in sigs.collect()}
    assert rows[1]["h0"] == rows[2]["h0"] and rows[1]["h7"] == rows[2]["h7"]
    assert 5 not in rows  # < k words: dropped like the exploded pipeline
    pairs = {
        (r["doc1"], r["doc2"])
        for r in lsh_candidate_pairs(sigs, 8).collect()
    }
    assert (1, 2) in pairs
    assert (1, 3) in pairs or (2, 3) in pairs
    assert not any(4 in p or 5 in p or 6 in p for p in pairs)


def test_grouped_lsh_pairs_equal_selfjoin_and_cap_skips_hot_bucket(spark):
    """The one-exchange grouped band join returns the SAME pair set as
    the self-join form; max_bucket skips an over-common bucket (the
    boilerplate guard) while normal buckets keep their pairs."""
    from bigsdb_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_candidate_pairs_grouped,
        minhash_signatures,
        word_shingles,
    )

    boiler = "this page is intentionally left blank for legal reasons ok"
    rows = [(i, boiler) for i in range(20)]  # one hot bucket: 20 docs
    t = "the quick brown fox jumps over the lazy dog again and again"
    rows += [(100, t), (101, t)]             # a normal duplicate pair
    rows += [(200 + i, f"unique text number {i} about spark and arrow files")
             for i in range(5)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = minhash_signatures(word_shingles(docs, "doc_id", "text"), 8)
    plain = {(r["doc1"], r["doc2"])
             for r in lsh_candidate_pairs(sigs, 8).collect()}
    grouped = {(r["doc1"], r["doc2"])
               for r in lsh_candidate_pairs_grouped(sigs, 8).collect()}
    assert grouped == plain and len(plain) >= 190  # 20*19/2 + 1
    capped = {(r["doc1"], r["doc2"])
              for r in lsh_candidate_pairs_grouped(
                  sigs, 8, max_bucket=10).collect()}
    assert (100, 101) in capped          # normal pair survives
    assert not any(p[0] < 100 for p in capped)  # boilerplate cluster skipped


def test_semantic_dedup_groups_and_survivors(spark):
    """SemDeDup composition: planted near-identical embedding groups
    collapse to one survivor each (min id), distinct vectors survive
    as their own singletons."""
    import numpy as np

    from bigsdb_spark.operators.dedup import semantic_dedup

    rng = np.random.RandomState(5)
    base_a = rng.randn(16); base_b = rng.randn(16)
    rows = []
    for i, v in enumerate(
        [base_a + rng.randn(16) * 0.01 for _ in range(3)]
    ):
        rows.append((10 + i, [float(x) for x in v]))      # group A: 10,11,12
    for i, v in enumerate(
        [base_b + rng.randn(16) * 0.01 for _ in range(2)]
    ):
        rows.append((20 + i, [float(x) for x in v]))      # group B: 20,21
    for i in range(4):                                     # distinct
        rows.append((30 + i, [float(x) for x in rng.randn(16)]))
    rows.append((40, [0.0] * 16))  # zero-norm: undefined cosine
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            emb, "vec_id", "embedding", n_cells=4, min_cosine=0.95,
            sample=16,
        ).collect()
    }
    assert [out[i]["group_id"] for i in (10, 11, 12)] == [10, 10, 10]
    assert [out[i]["keep"] for i in (10, 11, 12)] == [True, False, False]
    assert [out[i]["group_id"] for i in (20, 21)] == [20, 20]
    for i in range(30, 34):
        assert out[i]["group_id"] == i and out[i]["keep"] is True
    # zero-norm vector never pairs (NaN cosine compares False in the
    # GEMM scorer — documented semantics): singleton group, kept
    assert out[40]["group_id"] == 40 and out[40]["keep"] is True
    # exactly one survivor per group
    assert sum(1 for r in out.values() if r["keep"]) == 2 + 4 + 1


def test_semantic_dedup_hierarchical_quantizer(spark):
    """Two-level SemDeDup cells (train_hierarchical_cells): the planted
    near-identical groups must still collapse to one survivor each —
    members of a tight group land in the SAME fine cell because every
    quantizer level picks the nearest center and the group's diameter
    (~0.01) is far below inter-center distances on random data."""
    import numpy as np

    from bigsdb_spark.operators.dedup import (
        semantic_dedup,
        train_hierarchical_cells,
    )

    rng = np.random.RandomState(5)
    base_a = rng.randn(16); base_b = rng.randn(16)
    rows = []
    for i in range(3):
        v = base_a + rng.randn(16) * 0.01
        rows.append((10 + i, [float(x) for x in v]))
    for i in range(2):
        v = base_b + rng.randn(16) * 0.01
        rows.append((20 + i, [float(x) for x in v]))
    for i in range(4):
        rows.append((30 + i, [float(x) for x in rng.randn(16)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    h = train_hierarchical_cells(emb, "embedding", n_cells=4, branch=2,
                                 sample=16)
    assert len(h["coarse"]) == 2 and len(h["fine"]) == 2
    assert all(len(f) == 2 for f in h["fine"])  # branch fine centers each
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            emb, "vec_id", "embedding", min_cosine=0.95, hierarchy=h
        ).collect()
    }
    assert [out[i]["group_id"] for i in (10, 11, 12)] == [10, 10, 10]
    assert [out[i]["group_id"] for i in (20, 21)] == [20, 20]
    assert sum(1 for r in out.values() if r["keep"]) == 2 + 4


def test_semantic_dedup_hierarchy_degenerates_to_flat(spark):
    """A 1-coarse-cell hierarchy whose fine level IS the flat codebook
    must reproduce the flat ``centroids`` path row for row (the two
    assignment kernels are then the same argmax over the same centers,
    and everything downstream is shared code)."""
    import numpy as np

    import pytest

    from bigsdb_spark.operators.dedup import semantic_dedup

    rng = np.random.RandomState(9)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[float(x) for x in rng.randn(8)] for _ in range(4)]
    flat = semantic_dedup(
        emb, "vec_id", "embedding", min_cosine=0.9, centroids=cents
    )
    hier = semantic_dedup(
        emb, "vec_id", "embedding", min_cosine=0.9,
        hierarchy={"coarse": [[0.0] * 8], "fine": [cents]},
    )
    assert sorted(map(tuple, flat.collect())) == sorted(
        map(tuple, hier.collect())
    )
    with pytest.raises(ValueError, match="not both"):
        semantic_dedup(
            emb, "vec_id", "embedding", centroids=cents,
            hierarchy={"coarse": [[0.0] * 8], "fine": [cents]},
        )


def test_bucketed_ann_sq_prescreen_identical_pairs(spark):
    """Equality pin (VERDICT r4 task 3): the int8-screened variant must
    return EXACTLY the plain path's pair set — the screen's error bound
    is sound, so no pair above the threshold is lost, and the exact
    stage reapplies the same rounded-cosine filter.  Includes planted
    near-threshold pairs (the dangerous band for an unsound screen),
    exact duplicates, and a ZERO vector (r6 ADVICE): its cosine is
    0/0 = NaN, which Spark's NaN-is-greatest ordering would admit
    through ``>= min_cosine`` — all three forms must instead drop
    every pair touching it (plain/sq via the norm > 0 pre-filter,
    GEMM via numpy's NaN-compares-False), so the pinned equality
    holds on degenerate input too."""
    import numpy as np

    from bigsdb_spark.operators.similarity import (
        bucketed_ann_pairs,
        bucketed_ann_pairs_sq,
    )

    rng = np.random.RandomState(11)
    rows = []
    for i in range(120):
        rows.append((i, [float(x) for x in rng.randn(32)]))
    # planted: exact dup, near dup, and near-threshold pairs around 0.8
    base = rng.randn(32)
    rows.append((200, [float(x) for x in base]))
    rows.append((201, [float(x) for x in base]))                 # cosine 1.0
    rows.append((202, [float(x) for x in base + rng.randn(32) * 0.05]))
    for j, t in enumerate((0.795, 0.799, 0.800, 0.801, 0.805)):
        v = t * base / np.linalg.norm(base) + np.sqrt(1 - t * t) * (
            lambda w: w / np.linalg.norm(w)
        )(rng.randn(32))
        rows.append((210 + j, [float(x) for x in v * 3.7]))
    rows.append((300, [0.0] * 32))  # zero-norm: must never pair
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    plain = {
        tuple(r)
        for r in bucketed_ann_pairs(
            emb, "vec_id", "embedding", dims=3, min_cosine=0.8
        ).collect()
    }
    screened = {
        tuple(r)
        for r in bucketed_ann_pairs_sq(
            emb, "vec_id", "embedding", dims=3, min_cosine=0.8
        ).collect()
    }
    assert screened == plain
    assert len(plain) > 0  # the pin is not vacuous
    # the planted exact-dup pair is present (same sign bucket always)
    assert any(p[1] == 200 and p[2] == 201 for p in plain)
    # the zero vector pairs with NOTHING on any path (min_cosine=0.8 is
    # positive; with a NaN-admitting filter it would pair with its
    # whole sign-bucket)
    assert not any(300 in (p[1], p[2]) for p in plain)
    # the per-bucket GEMM variant: identical (bucket, id1, id2) set AND
    # cosines equal after the shared 6dp rounding (numpy GEMM vs the
    # interpreted fold may differ in the last ulp pre-rounding; assert
    # to 1e-6 so a genuine formula error still fails loudly)
    from bigsdb_spark.operators.similarity import bucketed_ann_pairs_gemm

    gemm = {
        tuple(r)
        for r in bucketed_ann_pairs_gemm(
            emb, "vec_id", "embedding", dims=3, min_cosine=0.8
        ).collect()
    }
    assert {g[:3] for g in gemm} == {p[:3] for p in plain}
    pc = {p[:3]: p[3] for p in plain}
    assert all(abs(g[3] - pc[g[:3]]) <= 1e-6 for g in gemm)
    # the opt-in occupancy guard fails FAST, naming the dims knob, when
    # a bucket materializes beyond the bound (r6 ADVICE: 2**dims must
    # scale with the corpus)
    from pyspark.errors import PythonException

    with pytest.raises(PythonException, match="max_bucket_rows"):
        bucketed_ann_pairs_gemm(
            emb, "vec_id", "embedding", dims=3, min_cosine=0.8,
            max_bucket_rows=5,
        ).collect()
