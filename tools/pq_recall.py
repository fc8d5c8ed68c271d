"""Production-n recall for the PQ/IVF-PQ serving paths (VERDICT r8 #6).

The PQ recall pins in tests/test_pq.py run at test scale (2-5k rows);
the r8 IVF study proved small-n recall does NOT transfer (flat IVF went
0.998 -> 0.217 at production n because the codebook started splitting
natural clusters).  This tool measures recall@k of ``ivf_pq_topk`` at
n=1e6 on the SAME clustered corpus ivf_recall.py uses, against an
exact L2 baseline (ADC approximates squared-L2, so L2 — not cosine —
is the honest reference), for the ladder's own deployment shape
(n_cells=256, m=8, k=16, sample 16/cell) and the denser PQ layout
(m=16, k=32).

Probing at n_probe = 1/2/4/8 AND full (256) separates the two loss
terms: full-probe recall is the PQ quantization loss alone; the gap
from full-probe down to small n_probe is the IVF routing loss.

Queries are hash-sampled corpus vectors; the query itself is excluded
from both the exact set and the served set (its ADC distance is just
its own quantization error, which would flatter recall).

Usage: python tools/pq_recall.py [n] [top_k] [n_queries]
                                 [--layouts m8k16,m16k32r,...]
Layout spec m{m}k{k}[r] (r = residual encoding).  r10: the default
battery adds the faiss-defaults code-budget study (VERDICT r9 task 2)
— m16k64r and m32k256r; with the broadcast-LUT dispatch
(RESIDUAL_ADC_MAX_LITERALS) residual layouts can now probe FULL cell
counts, so the quantization-loss-only row is measurable for them too.
Prints one JSON line per (layout, n_probe).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from bigsdb_spark.session import get_spark  # noqa: E402


def _exact_l2_sets(emb_pdf, sample_ids, top_k):
    """Driver-side exact L2 top-k (excluding self) for the sampled
    queries, ties broken by id ascending (the operator's own rule)."""
    ids = emb_pdf["vec_id"].to_numpy()
    x = np.array(list(emb_pdf["embedding"]), dtype=np.float64)
    pos = {int(v): i for i, v in enumerate(ids)}
    x2 = (x * x).sum(axis=1)
    exact = {}
    for q in sample_ids:
        qi = pos[q]
        d2 = x2 - 2.0 * (x @ x[qi]) + x2[qi]
        d2[qi] = np.inf  # exclude self
        order = np.lexsort((ids, d2))
        exact[q] = {int(ids[j]) for j in order[:top_k]}
    return exact


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if len(args) > 0 else 1_000_000
    top_k = int(args[1]) if len(args) > 1 else 10
    n_queries = int(args[2]) if len(args) > 2 else 50
    import re as _re

    layouts = None
    refines = (None, 10)
    for a in sys.argv[1:]:
        if a.startswith("--refines="):
            refines = tuple(
                None if r in ("none", "adc") else int(r)
                for r in a.split("=", 1)[1].split(",")
            )
        if a.startswith("--layouts="):
            layouts = []
            for spec in a.split("=", 1)[1].split(","):
                mm = _re.fullmatch(r"m(\d+)k(\d+)(r?)", spec)
                if not mm:
                    raise SystemExit(f"bad layout spec: {spec}")
                layouts.append(
                    (int(mm.group(1)), int(mm.group(2)), mm.group(3) == "r")
                )

    from bigsdb_spark.operators.pq import (
        ivf_pq_encode,
        ivf_pq_topk,
        train_ivf_pq,
    )

    spark = get_spark("pq_recall")
    spark.sparkContext.setLogLevel("ERROR")

    # same 200-center clustered corpus as tools/ivf_recall.py --hier
    center = F.pmod(F.xxhash64(F.col("id"), F.lit(99)), F.lit(200))
    clustered = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: (
            (F.pmod(F.xxhash64(center, i), F.lit(2001)) - 1000) / 1000.0
            + (F.pmod(F.xxhash64(F.col("id"), i), F.lit(301)) - 150) / 1000.0
        ).cast("float"),
    )
    emb = (
        spark.range(n, numPartitions=32)
        .select(F.col("id").alias("vec_id"), clustered.alias("embedding"))
        .cache()
    )
    sample_ids = sorted(
        int(r.vec_id)
        for r in emb.select("vec_id")
        .filter(
            F.pmod(F.xxhash64("vec_id", F.lit(123)), F.lit(n // n_queries))
            == 0
        )
        .collect()
    )[:n_queries]
    emb_pdf = emb.toPandas()
    qvecs = {
        int(r["vec_id"]): list(r["embedding"])
        for _, r in emb_pdf[emb_pdf["vec_id"].isin(sample_ids)].iterrows()
    }
    exact = _exact_l2_sets(emb_pdf, sample_ids, top_k)
    del emb_pdf

    n_cells = 256
    # (m, k, residual): raw-vector layouts reproduce the r9 finding
    # (ADC order is noise on clustered data); the residual layouts are
    # the faiss-classic fix measured against the same baseline —
    # m16k64r / m32k256r are the r10 code-budget study (faiss-default
    # k=256 tier)
    default_layouts = (
        (8, 16, False), (16, 32, False),
        (8, 16, True), (16, 32, True),
        (16, 64, True), (32, 256, True),
    )
    for m, k, residual in (layouts or default_layouts):
        model = train_ivf_pq(
            emb, n_cells=n_cells, m=m, k=k, sample=16 * n_cells,
            residual=residual,
        )
        enc = ivf_pq_encode(emb, model, keep_vec=True).cache()
        enc.count()  # materialize once; every probe reuses the codes
        # refine_factor=None is the ADC-only serving path; 10 adds the
        # exact refine stage over the 10*top_k ADC shortlist (r9).
        # r10: residual full probe is no longer capped at 16 — past
        # RESIDUAL_ADC_MAX_LITERALS the per-cell LUTs dispatch as a
        # broadcast table instead of a literal CASE chain, so the
        # quantization-loss-only row is measurable for residual too
        top = n_cells
        for refine in refines:
            for n_probe in (1, 2, 4, 8, top):
                hits = 0
                for q in sample_ids:
                    got = ivf_pq_topk(
                        enc, model, qvecs[q], top_k=top_k + 1,
                        n_probe=n_probe, refine_factor=refine,
                    ).collect()
                    ids = [
                        int(r.vec_id) for r in got if int(r.vec_id) != q
                    ]
                    hits += len(set(ids[:top_k]) & exact[q])
                print(
                    json.dumps(
                        {
                            "corpus": "clustered",
                            "n": n,
                            "layout": f"m{m}k{k}" + ("r" if residual else ""),
                            "n_cells": n_cells,
                            "occupancy": round(n / n_cells),
                            "top_k": top_k,
                            "n_probe": n_probe,
                            "refine_factor": refine,
                            "sampled_queries": len(sample_ids),
                            "recall": round(
                                hits / (len(sample_ids) * top_k), 4
                            ),
                        }
                    ),
                    flush=True,
                )
        enc.unpersist()


if __name__ == "__main__":
    main()
