"""Kernel-under-contention probe: run the bucketed scatter kernel vs a
sequential-streaming elementwise int8 kernel in 32 CONCURRENT
processes (the real task shape), compare aggregate throughput.
Pure numpy/multiprocessing — no Spark.
"""
import multiprocessing as mp
import sys
import time

import duckdb
import numpy as np

sys.path.insert(0, "/root/repo")
from bigsdb_spark.operators.lincodes import (  # noqa: E402
    _block_dist,
    _encode_codes,
    _pad_profiles,
    _pos_groups,
)


def elementwise8(pm, plen, bm, blen, bmiss_cnt, w2):
    n, q = pm.shape[0], bm.shape[0]
    wb = bm.shape[1]
    matches = np.zeros((n, q), dtype=np.int8)
    both = np.zeros((n, q), dtype=np.int8)
    eq = np.empty((n, q), dtype=bool)
    pm_missmat = pm == -1
    bm_missmat = bm == -1
    for p in range(wb):
        np.equal(pm[:, p][:, None], bm[None, :, p], out=eq)
        eq &= ~pm_missmat[:, p][:, None]
        matches += eq
        np.logical_and(pm_missmat[:, p][:, None], bm_missmat[None, :, p], out=eq)
        both += eq
    for p in range(wb, w2):
        mi = pm_missmat[:, p]
        both[mi, :] += 1  # batch rows are all-missing past wb
    pmiss = pm_missmat.sum(axis=1, dtype=np.int32)
    bmiss = bmiss_cnt if w2 <= wb else bmiss_cnt + np.int32(w2 - wb)
    miss_or = pmiss[:, None] + bmiss[None, :] - both.astype(np.int32)
    d = w2 - miss_or - matches.astype(np.int32)
    mie = miss_or - (w2 - np.maximum(plen[:, None], blen[None, :]))
    return d, mie


def load(n=100_000):
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT profile_key, profile FROM '/tmp/scale_bench/profiles_{n}/*.parquet' ORDER BY profile_key"
    ).fetchall()
    profs = [r[1] for r in rows]
    mid = len(rows) // 2
    return profs[mid : mid + 1024], profs[:mid]


def worker(args):
    kind, batch, chunk_rows, reps = args
    width = 32
    chars = 8
    bmat_str, blen = _pad_profiles(batch, width, chars)
    vocab = {}
    bm = _encode_codes(bmat_str, vocab)
    bgroups = [_pos_groups(bm[:, p]) for p in range(width)]
    bmc = (bm == -1).sum(axis=1, dtype=np.int32)
    pmat_str, plen = _pad_profiles(chunk_rows, width, chars)
    pm = _encode_codes(pmat_str, vocab)
    t0 = time.time()
    for _ in range(reps):
        if kind == "bucketed":
            d, m = _block_dist(pm, plen, bm, blen, bgroups, bmc, width)
        else:
            d, m = elementwise8(pm, plen, bm, blen, bmc, width)
    return time.time() - t0


def main():
    batch, coded = load()
    chunk = coded[:2048]
    # correctness cross-check once
    width, chars = 32, 8
    bmat_str, blen = _pad_profiles(batch, width, chars)
    vocab = {}
    bm = _encode_codes(bmat_str, vocab)
    bg = [_pos_groups(bm[:, p]) for p in range(width)]
    bmc = (bm == -1).sum(axis=1, dtype=np.int32)
    pmat_str, plen = _pad_profiles(chunk, width, chars)
    pm = _encode_codes(pmat_str, vocab)
    d0, m0 = _block_dist(pm, plen, bm, blen, bg, bmc, width)
    d1, m1 = elementwise8(pm, plen, bm, blen, bmc, width)
    assert (d0 == d1).all() and (m0 == m1).all(), "kernel mismatch"
    print("kernels agree", flush=True)

    reps = 3
    for nproc in (1, 8, 32):
        for kind in ("bucketed", "elementwise8"):
            args = [(kind, batch, chunk, reps)] * nproc
            t0 = time.time()
            with mp.Pool(nproc) as pool:
                ts = pool.map(worker, args)
            wall = time.time() - t0
            pairs = nproc * reps * len(chunk) * len(batch)
            print(
                f"{kind} x{nproc}: wall {wall:.2f}s agg {pairs/wall/1e6:.0f} M pairs/s"
                f" (per-proc {min(ts):.2f}-{max(ts):.2f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
