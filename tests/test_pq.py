"""Product quantization (operators/pq.py): encoding validity, exact
reconstruction when data IS the codebook, and recall vs brute force on
driver testdata embeddings."""

import pytest
import numpy as np
import pyspark.sql.functions as F

from bigsdb_spark.operators.pq import pq_encode, pq_topk, train_pq
from bigsdb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_pq_encode_exact_on_codebook_points(spark):
    """Vectors that coincide with centroids encode to those centroids
    and ADC distance to themselves is 0."""
    rng = np.random.RandomState(7)
    pts = rng.randn(16, 8).round(3)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in pts[i]]) for i in range(16)],
        "vec_id long, embedding array<double>",
    )
    books = train_pq(emb, m=2, k=16, iters=25, seed=1)
    codes = pq_encode(emb, books)
    # with k == n_points each sub-block clusters to the points
    # themselves: ADC distance of each vector to itself must be ~0
    top = pq_topk(codes, books, [float(v) for v in pts[3]], top_k=1)
    r = top.collect()[0]
    assert r["vec_id"] == 3
    assert r["adc_dist"] < 1e-9


def test_pq_codes_shape_and_range(spark):
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    books = train_pq(emb, m=8, k=16)
    codes = pq_encode(emb, books)
    row = codes.first()
    assert len(row["codes"]) == 8
    stats = codes.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
    ).collect()[0]
    assert stats["lo"] >= 0 and stats["hi"] <= 15


def test_pq_recall_vs_brute_force(spark):
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding").cache()
    rows = emb.collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    # the synthetic embeddings are near-uniform random — PQ's worst
    # case (no cluster structure to exploit) — so use the finer
    # m=16/k=32 layout (measured 0.63 recall@10 vs 0.33 at m=8/k=16)
    books = train_pq(emb, m=16, k=32)
    codes = pq_encode(emb, books).cache()
    hits = total = 0
    for qi in (0, 7, 23):
        q = x[qi]
        true = set(ids[np.argsort(((x - q) ** 2).sum(axis=1))[:10]])
        got = {
            r["vec_id"]
            for r in pq_topk(codes, books, [float(v) for v in q], top_k=10).collect()
        }
        hits += len(true & got)
        total += 10
    assert hits / total >= 0.5
    emb.unpersist()
    codes.unpersist()


def test_ivf_pq_probe_monotone_recall(spark):
    """IVF-PQ: probing all cells recovers exactly the plain-PQ result,
    and recall grows (weakly) with n_probe."""
    from bigsdb_spark.operators.pq import ivf_pq_encode, ivf_pq_topk, train_ivf_pq

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding").cache()
    rows = emb.collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    model = train_ivf_pq(emb, n_cells=8, m=16, k=32)
    enc = ivf_pq_encode(emb, model).cache()
    assert enc.count() == len(rows)

    q = [float(v) for v in x[7]]
    full = {r["vec_id"] for r in ivf_pq_topk(enc, model, q, top_k=10, n_probe=8).collect()}
    # probing every cell == scanning everything == plain PQ over all codes
    from bigsdb_spark.operators.pq import pq_topk

    plain = {
        r["vec_id"]
        for r in pq_topk(enc.select("vec_id", "codes"), model["books"], q, top_k=10).collect()
    }
    assert full == plain

    true = set(ids[np.argsort(((x - x[7]) ** 2).sum(axis=1))[:10]])
    r1 = {r["vec_id"] for r in ivf_pq_topk(enc, model, q, top_k=10, n_probe=1).collect()}
    r4 = {r["vec_id"] for r in ivf_pq_topk(enc, model, q, top_k=10, n_probe=4).collect()}
    assert len(true & r1) <= len(true & r4) + 2  # weakly monotone (ADC ties)
    assert len(r4) == 10
    emb.unpersist()
    enc.unpersist()


def test_ivf_pq_refine_restores_exact_order(spark):
    """r9: the exact refine stage (keep_vec=True + refine_factor) must
    return the TRUE L2 top-k whenever the ADC shortlist contains it —
    at full probe with a generous factor the refined result equals the
    exact brute-force set, regardless of how badly raw ADC ranks it
    (the production-n study measured ADC-only recall 0.002: PQ
    distortion >> intra-cluster distances).  Refining without the
    stored vector must raise."""
    import pytest as _pytest

    from bigsdb_spark.operators.pq import (
        ivf_pq_encode,
        ivf_pq_topk,
        train_ivf_pq,
    )

    emb = (
        load_table(spark, SF, "embeddings")
        .select("vec_id", "embedding")
        .limit(400)
        .cache()
    )
    rows = emb.collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    model = train_ivf_pq(emb, n_cells=4, m=8, k=16)
    enc = ivf_pq_encode(emb, model, keep_vec=True).cache()
    q = [float(v) for v in x[3]]
    d2 = ((x - x[3]) ** 2).sum(axis=1)
    true = [int(i) for i in ids[np.lexsort((ids, d2))[:10]]]
    got = ivf_pq_topk(
        enc, model, q, top_k=10, n_probe=4, refine_factor=40
    ).collect()
    assert [int(r["vec_id"]) for r in got] == true
    # refined rows carry both distances, ranked by the exact one
    l2s = [r["l2_dist"] for r in got]
    assert l2s == sorted(l2s)
    bare = ivf_pq_encode(emb, model).cache()
    with _pytest.raises(ValueError, match="keep_vec"):
        ivf_pq_topk(bare, model, q, top_k=10, refine_factor=4)
    emb.unpersist()
    enc.unpersist()
    bare.unpersist()


@pytest.mark.slow
def test_ivf_pq_residual_beats_raw_on_clustered(spark):
    """r9: residual PQ (codes over x - cell_centroid, faiss-classic)
    must rank clustered data better than raw-vector PQ with the same
    code budget — the production-n study showed raw ADC collapses to
    noise when quantization error exceeds intra-cluster distances.
    Pinned as: residual ADC recall@10 >= raw ADC recall@10 on a tight
    40-cluster corpus, and the residual model round-trips through
    encode/topk with the per-cell lookup tables."""
    import random as _random

    from bigsdb_spark.operators.pq import (
        ivf_pq_encode,
        ivf_pq_topk,
        train_ivf_pq,
    )

    rng = _random.Random(11)
    rows = []
    vid = 0
    for c in range(40):
        center = [rng.uniform(-1, 1) for _ in range(16)]
        for _ in range(50):
            rows.append(
                (vid, [x + rng.gauss(0, 0.02) for x in center])
            )
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()
    x = np.array([r[1] for r in rows], dtype=np.float64)
    ids = np.array([r[0] for r in rows])

    def recall(residual, refine):
        # n_cells ~ cluster count: the regime residual encoding is FOR
        # (cell centroid ~ cluster center, so the residual is pure
        # intra-cluster offset); with cells spanning several clusters
        # the residual keeps the inter-cluster structure and gains
        # nothing — same finding as the production table's occupancy row
        model = train_ivf_pq(
            emb, n_cells=40, m=8, k=16, sample=2000, residual=residual
        )
        enc = ivf_pq_encode(emb, model, keep_vec=True).cache()
        hits = 0
        queries = [3, 777, 1503]
        for qi in queries:
            d2 = ((x - x[qi]) ** 2).sum(axis=1)
            d2[qi] = np.inf
            true = {int(i) for i in ids[np.lexsort((ids, d2))[:10]]}
            got = ivf_pq_topk(
                enc, model, [float(v) for v in x[qi]],
                top_k=11, n_probe=8, refine_factor=refine,
            ).collect()
            got_ids = [int(r["vec_id"]) for r in got
                       if int(r["vec_id"]) != qi][:10]
            hits += len(set(got_ids) & true)
        enc.unpersist()
        return hits / (10 * len(queries))

    raw, res = recall(False, None), recall(True, None)
    # residual codes carry intra-cluster signal raw codes cannot (ADC
    # ties still cap standalone recall — codes coarser than neighbour
    # gaps tie, id-ascending picks arbitrarily)
    assert res >= raw
    # the full serving config — residual ADC shortlist + exact refine —
    # is what restores recall (raw ADC + refine CANNOT: its shortlist
    # is noise-selected, the r9 production table's 0.03 row)
    assert recall(True, 4) >= 0.9
    emb.unpersist()


def test_sq_roundtrip_and_ranking(spark):
    """Int8 SQ: codes bounded, reconstruction within scale/2 per dim,
    and top-k ranking near-exact vs float dot product."""
    from bigsdb_spark.operators.pq import sq_encode, sq_topk

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding").cache()
    enc = sq_encode(emb).cache()
    row = enc.join(emb, "vec_id").first()
    recon = [c * row["scale"] for c in row["codes"]]
    assert max(abs(c) for c in row["codes"]) <= 127
    assert max(
        abs(a - b) for a, b in zip(recon, row["embedding"])
    ) <= row["scale"] / 2 + 1e-9

    rows = emb.collect()
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    hits = total = 0
    for qi in (0, 11, 42):
        q = x[qi]
        true = set(ids[np.argsort(-(x @ q))[:10]])
        got = {
            r["vec_id"]
            for r in sq_topk(enc, [float(v) for v in q], top_k=10).collect()
        }
        hits += len(true & got)
        total += 10
    assert hits / total >= 0.9  # int8 is near-lossless for ranking
    emb.unpersist()
    enc.unpersist()


def test_sq_topk_pure_scan(spark):
    from bigsdb_spark.operators.pq import sq_topk

    enc = spark.createDataFrame(
        [(1, 0.01, [1, 2]), (2, 0.02, [-3, 4])],
        "vec_id long, scale double, codes array<int>",
    )
    plan = sq_topk(enc, [0.1, 0.2], top_k=1)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "TakeOrderedAndProject" in plan
    # r12: the scan is an Arrow kernel, not row-at-a-time Python
    assert "BatchEvalPython" not in plan


@pytest.mark.slow
def test_sq_kernel_matches_expression_form(spark):
    """r12 regression pin: sq_encode/sq_topk moved from interpreted
    HOF expressions (aggregate + transform + zip_with — never enter
    whole-stage codegen; JIT-warm-up-fragile, measured 0.5 -> 5.5 s
    session-dependent swings at sf0.1) to one vectorized Arrow pass.
    The kernel must stay BIT-IDENTICAL to the expression form, which
    is inlined here as the reference — including Spark round()'s
    HALF_UP on exact-.5 quotients, where naive floor(|q|+0.5) flips a
    code when the float add ties across the integer."""
    from bigsdb_spark.operators.pq import sq_encode, sq_topk

    def ref_encode(emb, id_col="vec_id", vec_col="embedding"):
        absmax = F.aggregate(
            F.col(vec_col),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
        )
        scale = F.when(absmax > 0, absmax / F.lit(127.0)).otherwise(F.lit(1.0))
        codes = F.element_at(
            F.transform(
                F.array(scale),
                lambda s: F.transform(
                    F.col(vec_col),
                    lambda x: F.round(x.cast("double") / s).cast("int"),
                ),
            ),
            1,
        )
        return emb.select(
            F.col(id_col), scale.alias("scale"), codes.alias("codes")
        )

    def ref_topk(encoded, query, top_k=10, id_col="vec_id"):
        q = np.asarray(query, dtype=np.float64)
        q_scale = (
            float(np.abs(q).max() / 127.0) if np.abs(q).max() > 0 else 1.0
        )
        q_codes = F.array(*[F.lit(int(round(v / q_scale))) for v in q])
        int_dot = F.aggregate(
            F.zip_with("codes", q_codes, lambda a, b: (a * b).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, v: acc + v,
        )
        score = (
            int_dot.cast("double") * F.col("scale") * F.lit(q_scale)
        ).alias("dot")
        return (
            encoded.select(id_col, score)
            .orderBy(F.desc("dot"), id_col)
            .limit(top_k)
        )

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    # adversarial rows: exact-.5 quotients (|x|/scale lands on k.5),
    # all-zero and denormal-small vectors (scale floor), mixed signs
    d = len(emb.first()["embedding"])
    adv_rows = [
        (100001, [2.54, -2.54, 1.27, -1.27, 0.635, -0.635, 127.0, -127.0]
         + [0.0] * (d - 8)),
        (100002, [0.0] * d),
        (100003, [1e-300] * d),
        (100004, [-5.08, 5.08, 2.54, -0.3175, 0.3175, 63.5, -63.5, 0.0]
         + [1.0] * (d - 8)),
    ]
    adv = spark.createDataFrame(
        adv_rows, "vec_id long, embedding array<double>"
    )
    both = emb.withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    ).unionByName(adv)

    got = sq_encode(both).orderBy("vec_id").collect()
    want = ref_encode(both).orderBy("vec_id").collect()
    assert len(got) == len(want)
    for g, w in zip(got, want):
        assert g["vec_id"] == w["vec_id"]
        assert g["scale"] == w["scale"]  # bit equality, no tolerance
        assert g["codes"] == w["codes"]

    query = [((h * 37 + 11) % 2001 - 1000) / 1000.0 for h in range(d)]
    got_t = sq_topk(sq_encode(both), query, top_k=10).collect()
    want_t = ref_topk(ref_encode(both), query, top_k=10).collect()
    assert [(r["vec_id"], r["dot"]) for r in got_t] == [
        (r["vec_id"], r["dot"]) for r in want_t
    ]


def test_training_sample_is_order_independent(spark):
    """Regression (ADVICE r3 / VERDICT r4 #1): codebook training used
    limit(sample), which takes whichever partitions list first — an
    adversarially sorted/clustered input trained biased codebooks.
    Sampling now ranks by content hash, so the SAME rows are chosen
    under any input ordering: identical codebooks, bit for bit."""
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    books_a = train_pq(emb, m=8, k=16, sample=256)
    adversarial = emb.orderBy(F.desc("vec_id")).repartition(7)
    books_b = train_pq(adversarial, m=8, k=16, sample=256)
    assert books_a == books_b

    from bigsdb_spark.operators.pq import train_ivf_pq

    model_a = train_ivf_pq(emb, n_cells=8, m=8, k=16, sample=256)
    model_b = train_ivf_pq(adversarial, n_cells=8, m=8, k=16, sample=256)
    assert model_a == model_b


def test_training_sample_cutoff_path_matches_global_topk(spark):
    """Regression (r6 scale ladder): _sample_np's original
    orderBy(hash).limit(k) is a TakeOrderedAndProject — every task
    ships its own top-k, so driver bytes grow with partitions x k and
    sample=131072 over a 4e6-row tier tripped
    spark.driver.maxResultSize.  The fix pre-filters to a hash cutoff
    sized for ~4x the sample (driver receives O(k) bytes at any corpus
    size).  Pin the equivalence: the cutoff path must select the
    IDENTICAL rows the global top-k would."""
    from bigsdb_spark.operators.pq import _sample_np

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    k = max(8, n // 16)  # forces the n > 4*k cutoff branch
    assert n > 4 * k
    got = _sample_np(emb, "embedding", k)
    want_rows = (
        emb.select("embedding")
        .orderBy(F.xxhash64(F.col("embedding")), F.col("embedding").cast("string"))
        .limit(k)
        .collect()
    )
    import numpy as np

    assert np.array_equal(got, np.array([r[0] for r in want_rows]))

@pytest.mark.slow
def test_ivf_pq_residual_lut_broadcast_dispatch(spark, monkeypatch):
    """r10 (ADVICE r9): residual ADC past RESIDUAL_ADC_MAX_LITERALS
    total literals must NOT fold a Catalyst CASE chain (plan/codegen
    blowup) — it ships the per-cell LUTs as a tiny broadcast (cell,
    luts) table instead.  Both physical forms return identical rows,
    ADC-only and refined, pinned by forcing the dispatch with a zero
    ceiling."""
    import random as _random

    import bigsdb_spark.operators.pq as pqmod
    from bigsdb_spark.operators.pq import (
        ivf_pq_encode,
        ivf_pq_topk,
        train_ivf_pq,
    )

    rng = _random.Random(23)
    rows = []
    vid = 0
    for c in range(8):
        center = [rng.uniform(-1, 1) for _ in range(16)]
        for _ in range(40):
            rows.append((vid, [x + rng.gauss(0, 0.05) for x in center]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    model = train_ivf_pq(
        emb, n_cells=8, m=8, k=16, sample=320, residual=True
    )
    enc = ivf_pq_encode(emb, model, keep_vec=True).cache()
    q = [float(v) for v in rows[5][1]]

    def run():
        adc = ivf_pq_topk(enc, model, q, top_k=10, n_probe=4).collect()
        ref = ivf_pq_topk(
            enc, model, q, top_k=10, n_probe=4, refine_factor=3
        ).collect()
        return adc, ref

    lit_adc, lit_ref = run()
    monkeypatch.setattr(pqmod, "RESIDUAL_ADC_MAX_LITERALS", 0)
    bc_adc, bc_ref = run()
    assert [tuple(r) for r in bc_adc] == [tuple(r) for r in lit_adc]
    assert [tuple(r) for r in bc_ref] == [tuple(r) for r in lit_ref]
    assert len(lit_adc) == 10 and len(lit_ref) == 10
    enc.unpersist()

@pytest.mark.slow
def test_ivf_pq_m32k256_residual_memory_tier(spark):
    """r10 (VERDICT r9 task 2): the m=32/k=256 residual + exact-refine
    layout is the shipped memory-tier quality config (recall@10 0.938
    at n_probe=2 on the 1e6 production corpus, BASELINE.md r10).  Pin
    at test scale: (a) the config round-trips encode/topk and reaches
    >= 0.9 recall on a tight clustered corpus, and (b) its LUT volume
    (n_probe*m*k = 4*32*256 = 32768 literals) exceeds
    RESIDUAL_ADC_MAX_LITERALS, so this exercises the broadcast-LUT
    dispatch in the serving shape."""
    import random as _random

    from bigsdb_spark.operators.pq import (
        RESIDUAL_ADC_MAX_LITERALS,
        ivf_pq_encode,
        ivf_pq_topk,
        train_ivf_pq,
    )

    assert 4 * 32 * 256 > RESIDUAL_ADC_MAX_LITERALS
    rng = _random.Random(31)
    rows = []
    vid = 0
    for c in range(40):
        center = [rng.uniform(-1, 1) for _ in range(64)]
        for _ in range(50):
            rows.append((vid, [x + rng.gauss(0, 0.02) for x in center]))
            vid += 1
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).cache()
    x = np.array([r[1] for r in rows], dtype=np.float64)
    ids = np.array([r[0] for r in rows])
    model = train_ivf_pq(
        emb, n_cells=40, m=32, k=256, sample=2000, residual=True
    )
    enc = ivf_pq_encode(emb, model, keep_vec=True).cache()
    hits = 0
    queries = [7, 801, 1490]
    for qi in queries:
        d2 = ((x - x[qi]) ** 2).sum(axis=1)
        d2[qi] = np.inf
        true = {int(i) for i in ids[np.lexsort((ids, d2))[:10]]}
        got = ivf_pq_topk(
            enc, model, [float(v) for v in x[qi]],
            top_k=11, n_probe=4, refine_factor=10,
        ).collect()
        got_ids = [int(r["vec_id"]) for r in got
                   if int(r["vec_id"]) != qi][:10]
        hits += len(set(got_ids) & true)
    assert hits / (10 * len(queries)) >= 0.9
    enc.unpersist()
    emb.unpersist()
