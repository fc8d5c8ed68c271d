"""Product quantization (PQ) for embedding search at corpus scale.

Public-knowledge design (Jégou et al., "Product Quantization for
Nearest Neighbor Search", TPAMI 2011): split each d-dim vector into
``m`` sub-blocks, k-means each sub-space to ``k`` centroids, store a
vector as m small codes (m bytes at k<=256 — a 32x compression of a
64-dim float32 embedding at m=8), and answer queries with asymmetric
distance computation (ADC): per-query lookup tables of
query-sub-block-to-centroid distances, so scoring a candidate is m
table lookups instead of d multiplications and never touches the raw
vector.

Scale shape: training samples a bounded set to the driver (standard —
codebooks are tiny and training needs a few thousand points);
ENCODING is a vectorized Arrow pass (argmin over k centroids per
block, the numerically heavy step, batched in numpy); SCORING is pure
column expressions over the codes table — the 100 TB scan reads m
bytes per row and folds m array lookups, fully codegen'd, with the
per-query table broadcast as a literal.  Combine with the IVF cell
routing in operators/similarity.py for the standard IVF-PQ layout.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# Ceiling on the residual-ADC literal CASE chain (n_probe * m * k
# float literals folded into one Catalyst plan).  16 probes * m=32 *
# k=16 = 8192 still plans in seconds; a full-probe request over a
# realistic cell count (256 cells * m=8 * k=16 = 32k+) does not.
# Past this, ivf_pq_topk ships the LUTs as a broadcast-join table
# instead of literals — same values, O(m)-expression plan.
RESIDUAL_ADC_MAX_LITERALS = 8192

__all__ = [
    "train_pq",
    "pq_encode",
    "pq_topk",
    "train_ivf_pq",
    "ivf_pq_encode",
    "ivf_pq_topk",
    "sq_encode",
    "sq_topk",
]


def _kmeans_np(x: np.ndarray, k: int, iters: int, seed: int) -> np.ndarray:
    """Tiny deterministic Lloyd's k-means for sub-space codebooks
    (numpy; k and dims are small by construction)."""
    rng = np.random.RandomState(seed)
    centers = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].astype(np.float64)
    if len(centers) < k:  # degenerate tiny input: pad by repetition
        centers = np.vstack([centers] * (k // len(centers) + 1))[:k]
    for _ in range(iters):
        d2 = ((x[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(k):
            mask = assign == c
            if mask.any():
                centers[c] = x[mask].mean(axis=0)
    return centers


def _train_pq_np(
    x: np.ndarray, m: int, k: int, iters: int, seed: int
) -> list[list[list[float]]]:
    d = x.shape[1]
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    sub = d // m
    return [
        _kmeans_np(x[:, b * sub : (b + 1) * sub], k, iters, seed + b).tolist()
        for b in range(m)
    ]


def _sample_np(emb: DataFrame, vec_col: str, sample: int) -> np.ndarray:
    """Deterministic ORDER-INDEPENDENT training sample: rank rows by a
    content hash of the vector and take the smallest ``sample``, so the
    SAME rows are chosen however the input is partitioned, ordered, or
    clustered.  A bare ``limit(sample)`` takes whichever partitions list
    first, so ingest-ordered data (one domain first) would train biased
    codebooks and silently degrade recall.

    A plain ``orderBy(hash).limit(sample)`` is a TakeOrderedAndProject:
    every task ships its own top-``sample`` to the driver, so driver
    bytes grow with partitions x sample — at sample=131072 over a
    4e6-row/64-dim tier that is >1 GiB of task results and trips
    spark.driver.maxResultSize.  Pre-filter to a hash cutoff sized for
    ~4x the sample first (hash is uniform over the int64 range, so the
    cutoff admits ~4*sample rows whatever n is); the exact top-k then
    runs over O(sample) rows and the driver receives O(sample) bytes no
    matter how large or how partitioned the corpus is.  Widen the
    cutoff and retry in the (Chernoff-improbable) event the margin
    under-fills."""
    # tiebreak on an INDEPENDENT second hash, not the stringified
    # vector (r8): the TakeOrdered projection ships every candidate row
    # to the driver, and a ~600-byte decimal rendering of 64 floats per
    # row tripled the result size — at sample=1e6 (the sample-scales-
    # with-k codebooks) that alone tripped driver.maxResultSize.  Two
    # simultaneous 64-bit collisions are negligible, and even then the
    # difference is one swapped sample row.
    src = emb.select(
        F.col(vec_col).alias("v"),
        F.xxhash64(F.col(vec_col)).alias("h"),
        F.xxhash64(F.col(vec_col), F.lit(1)).alias("h2"),
    )
    n = src.count()
    oversample = 4
    while True:
        cand = src
        if n > oversample * sample:
            frac = (oversample * sample) / n
            cutoff = -(2**63) + int(frac * 2**64)
            cand = src.filter(F.col("h") < F.lit(cutoff))
        rows = cand.orderBy("h", "h2").limit(sample).collect()
        if len(rows) >= min(sample, n) or oversample * sample >= n:
            return np.array([r[0] for r in rows], dtype=np.float64)
        oversample *= 4


def _block_codes(x: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    """Per-block nearest-centroid codes for a batch — shared by the PQ
    and IVF-PQ encoders.  argmin ||x-c||^2 via the expanded identity
    (||x||^2 dropped: constant per row)."""
    m = len(books)
    sub = books[0].shape[1]
    codes = np.empty((len(x), m), dtype=np.int32)
    for b in range(m):
        xb = x[:, b * sub : (b + 1) * sub]
        scores = xb @ books[b].T - 0.5 * (books[b] ** 2).sum(axis=1)
        codes[:, b] = scores.argmax(axis=1)
    return codes


def train_pq(
    emb: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    k: int = 16,
    sample: int = 4096,
    iters: int = 10,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train the m sub-space codebooks on a bounded sample.
    Returns ``codebooks[m][k][d/m]`` as plain lists (broadcastable,
    JSON-serializable — store beside the codes table)."""
    return _train_pq_np(_sample_np(emb, vec_col, sample), m, k, iters, seed)


def pq_encode(
    emb: DataFrame,
    codebooks: list,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>) — each vector's per-block nearest
    centroid, computed as one vectorized Arrow pass (batch×k×sub
    numpy argmin per block; the heavy step, so NOT per-row Python)."""
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    id_type = dict(emb.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, codes array<int>"

    def _enc(batches):
        # Arrow-native (r10): flat-buffer vector extraction + codes as
        # offsets+values — no per-row ndarray/list objects
        import pyarrow as pa

        from bigsdb_spark.operators.similarity import (
            _arrow_int_lists,
            _arrow_mat,
        )

        for rb in batches:
            if rb.num_rows == 0:
                continue
            x = _arrow_mat(rb.column(1), rb.num_rows)
            codes = _block_codes(x, books)
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), _arrow_int_lists(codes)],
                names=[id_col, "codes"],
            )

    return emb.select(id_col, vec_col).mapInArrow(_enc, schema=out_schema)


def pq_topk(
    codes: DataFrame,
    codebooks: list,
    query: list[float],
    top_k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance top-k: build the per-query (m x k) distance
    table on the driver, inline it as a literal, and fold m array
    lookups per row — a pure whole-stage-codegen scan of the CODES
    table (the raw vectors are never read).  Returns (id, adc_dist)
    ascending."""
    q = np.array(query, dtype=np.float64)
    books = [np.array(b, dtype=np.float64) for b in codebooks]
    m = len(books)
    sub = books[0].shape[1]
    tables = [
        ((books[b] - q[b * sub : (b + 1) * sub]) ** 2).sum(axis=1).tolist()
        for b in range(m)
    ]
    lut = [F.array(*[F.lit(float(v)) for v in t]) for t in tables]
    dist = None
    for b in range(m):
        term = F.element_at(lut[b], F.col("codes")[b] + 1)
        dist = term if dist is None else dist + term
    return (
        codes.select(id_col, dist.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), id_col)
        .limit(top_k)
    )


def train_ivf_pq(
    emb: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    m: int = 8,
    k: int = 16,
    sample: int = 4096,
    iters: int = 10,
    seed: int = 42,
    residual: bool = False,
) -> dict:
    """Train the composed IVF-PQ layout: a coarse quantizer (k-means
    over whole vectors — the same tiny deterministic Lloyd's used for
    the sub-space codebooks, so the whole model is reproducible without
    MLlib seeding caveats) plus PQ codebooks.  Returns {'cells',
    'books', 'residual'}.  One driver sample feeds both quantizers.

    ``residual=True`` trains the codebooks over x - nearest_cell(x)
    (the classic faiss IVF-PQ encoding).  The r9 production-n study
    (tools/pq_recall.py, BASELINE.md r9) showed WHY this is the
    quality-critical choice on clustered corpora: raw-vector PQ at
    m=8/k=16 has quantization error larger than intra-cluster
    distances, so ADC order within a cluster is noise (recall@10 =
    0.002 at full probe, and even a 10x exact-refine shortlist only
    reaches ~0.03 because the shortlist itself is noise-selected);
    residual PQ spends the same code budget on the intra-cluster
    scale, where the neighbours actually differ.

    Deployment guidance (r10 code-budget study, n=1e6 clustered,
    refine 10x — BASELINE.md r10): the MEMORY-TIER quality config is
    **m=32, k=256, residual** — recall@10 = 0.874/0.938/0.946 at
    n_probe 1/2/4 (0.946 is the quantization ceiling: full probe is
    identical), i.e. >= 0.9 from n_probe=2 at 32 codes/vector (8x
    smaller than raw float32 at d=64, 1-byte codes).  m=16/k=64
    residual PLATEAUS at 0.702 from n_probe=4 through FULL probe —
    a shortlist-quality ceiling, not routing; it cannot reach 0.9 at
    this corpus tightness.  Below that budget, serve quality with the
    exact-vector GEMM path (similarity.ivf_kmeans_ann_gemm)."""
    x = _sample_np(emb, vec_col, sample)
    cells = _kmeans_np(x, n_cells, iters, seed)
    if residual:
        assign = (
            x @ cells.T - 0.5 * (cells**2).sum(axis=1)
        ).argmax(axis=1)
        books = _train_pq_np(x - cells[assign], m, k, iters, seed + 1000)
    else:
        books = _train_pq_np(x, m, k, iters, seed + 1000)
    return {"cells": cells.tolist(), "books": books, "residual": residual}


def ivf_pq_encode(
    emb: DataFrame,
    model: dict,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """(id, cell, codes) — coarse cell assignment + PQ codes in ONE
    Arrow pass.  Write partitioned by ``cell`` for partition-pruned
    probing at scale.

    ``keep_vec=True`` stores the raw vector NEXT TO the codes (faiss
    IndexRefineFlat layout): the r9 production-n recall study
    (tools/pq_recall.py, BASELINE.md r9) measured recall@10 = 0.002 at
    n=1e6 on a clustered corpus EVEN AT FULL PROBE — on real clustered
    embeddings the PQ quantization error exceeds intra-cluster
    distances, so ADC order within a cluster is noise and an exact
    refine pass over the ADC shortlist is REQUIRED for quality serving
    (``ivf_pq_topk(refine_factor=...)``).  Storing the vector with the
    codes keeps the refine read partition-pruned to the probed cells."""
    cells = np.array(model["cells"], dtype=np.float64)
    books = [np.array(b, dtype=np.float64) for b in model["books"]]
    id_type = dict(emb.dtypes)[id_col]
    vec_type = dict(emb.dtypes)[vec_col]
    out_schema = f"{id_col} {id_type}, cell int, codes array<int>"
    if keep_vec:
        out_schema += f", {vec_col} {vec_type}"

    residual = bool(model.get("residual"))

    def _enc(batches):
        # Arrow-native (r10): id and (with keep_vec) the raw vector
        # pass through as the SAME Arrow buffers
        import pyarrow as pa

        from bigsdb_spark.operators.similarity import (
            _arrow_int_lists,
            _arrow_mat,
        )

        for rb in batches:
            if rb.num_rows == 0:
                continue
            x = _arrow_mat(rb.column(1), rb.num_rows)
            cscore = x @ cells.T - 0.5 * (cells**2).sum(axis=1)
            cell = cscore.argmax(axis=1).astype(np.int32)
            codes = _block_codes(x - cells[cell] if residual else x, books)
            arrays = [rb.column(0), pa.array(cell), _arrow_int_lists(codes)]
            names = [id_col, "cell", "codes"]
            if keep_vec:
                arrays.append(rb.column(1))
                names.append(vec_col)
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return emb.select(id_col, vec_col).mapInArrow(_enc, schema=out_schema)


def ivf_pq_topk(
    encoded: DataFrame,
    model: dict,
    query: list[float],
    top_k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    refine_factor: int | None = None,
    vec_col: str = "embedding",
) -> DataFrame:
    """Probe the ``n_probe`` nearest cells and ADC-score only their
    codes: the scan touches |probed cells|/|cells| of the corpus (a
    partition-pruned read when the codes table is written partitioned
    by cell) and stays joinless — cell routing is a driver-side numpy
    argsort over the tiny coarse codebook, the probe list an IN filter.

    ``refine_factor=R`` adds the exact refine stage (faiss
    IndexRefineFlat): the ADC pass keeps a shortlist of R*top_k
    candidates, which is broadcast-joined back to the SAME probed
    (partition-pruned) slice carrying its raw vectors
    (``ivf_pq_encode(keep_vec=True)``), exact squared-L2 to the query
    is folded per shortlist row as a pure expression, and the final
    top_k is ranked by (l2_dist asc, id asc).  Required for quality
    serving at production n: the r9 recall study measured ADC-only
    recall@10 = 0.002 on a 1e6 clustered corpus at FULL probe (PQ
    distortion >> intra-cluster distances — BASELINE.md r9); the
    refined path restores recall at R*top_k exact distance folds per
    query.  Returns (id, adc_dist) ascending, plus l2_dist when
    refined (ordered by l2_dist).

    Assumes ids are UNIQUE in the encoded table (same contract as the
    similarity operators): the refine stage broadcast-joins the ADC
    shortlist back on ``id_col``, so a duplicated id multiplies its
    shortlist rows and can crowd the final ``limit(top_k)`` with
    copies of one id — dedupe ids upstream if they can repeat.

    Residual models need a PER-CELL lookup table: small models
    (n_probe*m*k <= ``RESIDUAL_ADC_MAX_LITERALS``) fold it as a CASE
    chain of float literals (joinless codegen scan); larger ones
    would blow up Catalyst planning, so the LUTs dispatch as a tiny
    (cell, luts) broadcast-join table instead — identical adc_dist,
    plan size O(m) expressions regardless of n_probe and k."""
    q = np.array(query, dtype=np.float64)
    cells = np.array(model["cells"], dtype=np.float64)
    d2 = ((cells - q) ** 2).sum(axis=1)
    probes = [int(c) for c in np.argsort(d2)[:n_probe]]
    probed = encoded.filter(F.col("cell").isin(probes))
    short_k = top_k * refine_factor if refine_factor else top_k
    if model.get("residual"):
        # residual ADC: the lookup table is PER PROBED CELL (the query
        # residual q - centroid_c differs per cell), built driver-side.
        # Two physical dispatches (r10, ADVICE r9): a small model folds
        # it as a cell-dispatched CASE of array literals (joinless,
        # partition-pruned whole-stage-codegen scan); past
        # RESIDUAL_ADC_MAX_LITERALS total literals the CASE chain would
        # blow up Catalyst planning/codegen, so the LUTs ship as a tiny
        # (cell, luts) broadcast table instead — plan size O(m)
        # expressions regardless of n_probe*k, one broadcast hash join
        # on the probed slice, same adc_dist values by construction
        # (equality pinned in tests/test_pq.py).
        books = [np.array(b, dtype=np.float64) for b in model["books"]]
        m = len(books)
        sub = books[0].shape[1]
        n_lits = n_probe * m * books[0].shape[0]

        def _cell_luts(c: int) -> list[list[float]]:
            qr = q - cells[c]
            return [
                ((books[b] - qr[b * sub : (b + 1) * sub]) ** 2)
                .sum(axis=1)
                .tolist()
                for b in range(m)
            ]

        if n_lits <= RESIDUAL_ADC_MAX_LITERALS:
            luts_by_cell = {c: _cell_luts(c) for c in probes}
            dist = None
            for b in range(m):
                arm = None
                for c in probes:
                    t = luts_by_cell[c][b]
                    lut = F.array(*[F.lit(float(v)) for v in t])
                    arm = (
                        F.when(F.col("cell") == c, lut)
                        if arm is None
                        else arm.when(F.col("cell") == c, lut)
                    )
                term = F.element_at(arm, F.col("codes")[b] + 1)
                dist = term if dist is None else dist + term
            scored = probed.select(
                id_col, "cell", "codes", dist.alias("adc_dist")
            )
        else:
            spark = encoded.sparkSession
            lut_df = spark.createDataFrame(
                [(int(c), _cell_luts(c)) for c in probes],
                "cell int, _luts array<array<double>>",
            )
            dist = None
            for b in range(m):
                term = F.element_at(
                    F.col("_luts")[b], F.col("codes")[b] + 1
                )
                dist = term if dist is None else dist + term
            scored = probed.join(F.broadcast(lut_df), "cell").select(
                id_col, "cell", "codes", dist.alias("adc_dist")
            )
        short = (
            scored.select(id_col, "adc_dist")
            .orderBy(F.asc("adc_dist"), id_col)
            .limit(short_k)
        )
    else:
        short = pq_topk(
            probed,
            model["books"],
            query,
            top_k=short_k,
            id_col=id_col,
        )
    if not refine_factor:
        return short
    if vec_col not in encoded.columns:
        raise ValueError(
            "refine_factor needs the raw vector stored beside the codes: "
            "encode with ivf_pq_encode(..., keep_vec=True)"
        )
    qlit = F.array(*[F.lit(float(v)) for v in query])
    l2 = F.aggregate(
        F.zip_with(
            F.col(vec_col),
            qlit,
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return (
        probed.join(F.broadcast(short), id_col)
        .select(id_col, "adc_dist", l2.alias("l2_dist"))
        .orderBy(F.asc("l2_dist"), id_col)
        .limit(top_k)
    )


def _round_half_up_np(q: np.ndarray) -> np.ndarray:
    """Spark ``round(col)`` on doubles is HALF_UP on the shortest
    decimal repr, which equals round-half-away-from-zero on the binary
    value (the 0.5 boundary is exactly representable, and a shortest
    repr can never cross it).  ``floor(|q|) + (frac >= 0.5)`` computes
    that exactly: the naive ``floor(|q| + 0.5)`` can round ACROSS an
    integer when |q| sits 1 ulp below an odd multiple of 0.5 (the
    float add ties to even), flipping the code by one."""
    a = np.abs(q)
    af = np.floor(a)
    return (np.sign(q) * (af + (a - af >= 0.5))).astype(np.int32)


def sq_encode(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Int8 scalar quantization — the simple compression tier between
    raw float32 and PQ (4x smaller, near-lossless ranking): per-vector
    symmetric scale = max|x|/127, codes = round(x/scale) in [-127,127].
    Returns (id, scale, codes).

    One vectorized Arrow pass, like ``pq_encode`` (r12 optimization
    round).  The original form was pure HOF expressions (aggregate +
    nested transform) on the theory that it rides whole-stage codegen
    inside any scan — but higher-order functions NEVER enter codegen
    (the r12 a5 finding): they run on the interpreted eval path, whose
    JIT warm-up is session-state-dependent.  Measured at sf0.1 under
    the bench reset protocol: the HOF form read 5.5 -> 0.8 s over ten
    reps in one fresh JVM, was instantly warm in another, and sat at
    ~4 s for EVERY rep of one full bench run (vs 0.47-0.6 s in the
    runs around it); the Arrow kernel reads a flat ~0.6-0.9 s from
    rep 1 of a cold JVM with bit-identical output (incl. adversarial
    exact-.5 quotients; equivalence pinned in test_pq.py)."""
    import pyarrow as pa

    id_type = dict(emb.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, scale double, codes array<int>"

    def _enc(batches):
        from bigsdb_spark.operators.similarity import (
            _arrow_int_lists,
            _arrow_mat,
        )

        for rb in batches:
            if rb.num_rows == 0:
                continue
            x = _arrow_mat(rb.column(1), rb.num_rows)
            absmax = np.abs(x).max(axis=1) if x.shape[1] else np.zeros(
                rb.num_rows
            )
            scale = np.where(absmax > 0, absmax / 127.0, 1.0)
            codes = _round_half_up_np(x / scale[:, None])
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0),
                    pa.array(scale, type=pa.float64()),
                    _arrow_int_lists(codes),
                ],
                names=[id_col, "scale", "codes"],
            )

    return emb.select(id_col, vec_col).mapInArrow(_enc, schema=out_schema)


def sq_topk(
    encoded: DataFrame,
    query: list[float],
    top_k: int = 10,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by approximate dot product over int8 codes: the query
    quantizes driver-side, one Arrow pass computes the integer dot as
    a (batch x d) @ (d,) numpy matvec scaled back by scale_q *
    scale_v, and the top-k itself stays in Spark
    (TakeOrderedAndProject) — joinless, like pq_topk.

    Same HOF -> Arrow-kernel conversion (and the same measured
    rationale) as ``sq_encode`` above; the zip_with + aggregate fold
    was the other half of the interpreted expression chain.  Codes
    rows must be null-free and query-length (the expression form
    yielded a null dot for mismatched rows; the kernel raises — both
    are out-of-contract for ``sq_encode`` output)."""
    import pyarrow as pa

    q = np.asarray(query, dtype=np.float64)
    q_scale = float(np.abs(q).max() / 127.0) if np.abs(q).max() > 0 else 1.0
    # driver-side query quantization, unchanged from the expression
    # form (Python round: half-even — the query-side contract since r6)
    qc = np.asarray(
        [int(round(v / q_scale)) for v in q], dtype=np.int64
    )
    id_type = dict(encoded.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, dot double"

    def _dot(batches):
        for rb in batches:
            if rb.num_rows == 0:
                continue
            codes_col = rb.column(2)
            if codes_col.null_count:
                raise ValueError("sq_topk: null codes rows")
            vl = codes_col.value_lengths().to_numpy(zero_copy_only=False)
            if len(vl) and (vl.min() != len(qc) or vl.max() != len(qc)):
                raise ValueError(
                    f"sq_topk: codes length {int(vl.min())}-{int(vl.max())}"
                    f" != query length {len(qc)}"
                )
            flat = codes_col.flatten().to_numpy(zero_copy_only=False)
            mat = flat.astype(np.int64).reshape(rb.num_rows, -1)
            int_dot = mat @ qc
            scale = rb.column(1).to_numpy(zero_copy_only=False)
            # same fp order as the expression form:
            # (double(int_dot) * scale) * q_scale
            dot = (int_dot.astype(np.float64) * scale) * q_scale
            yield pa.RecordBatch.from_arrays(
                [rb.column(0), pa.array(dot, type=pa.float64())],
                names=[id_col, "dot"],
            )

    return (
        encoded.select(id_col, "scale", "codes")
        .mapInArrow(_dot, schema=out_schema)
        .orderBy(F.desc("dot"), id_col)
        .limit(top_k)
    )
