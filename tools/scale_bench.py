"""Data-dominated-regime scale bench (VERDICT r3 #3).

The per-round bench at sf0.1 (5k docs / 2k vectors) sits on Spark's
fixed task/codegen floor — flat across 100x data growth, which proves
plan shape but not the data term.  This tool synthesizes corpora of
1e6-1.6e7 rows (pure column expressions, written to parquet once per
tier) and times the SERVING-PATH operator family reading them back,
so the measured regime is the one that extrapolates to a cluster:
wall-clock dominated by data volume, not scheduling.

Synthesis (all deterministic, order-independent):
- documents: 48 hash-picked words from a 4096-word vocab per doc; 1%
  planted exact duplicates (doc_id % 100 == 0 copies its predecessor's
  seed) so the dedup paths have real work;
- embeddings: 64-dim hash-uniform vectors in [-1, 1]^64 — distinct and
  bucket-uniform (replicating identical sf0.1 vectors would pile
  replicas into the same LSH/sign buckets and measure a synthetic
  quadratic, not the serving path);
- graph: 2 hash-random edges per node (giant component, ~log-n
  diameter — the expensive shape for label propagation).

Paths timed per tier (each skippable via --skip):
  dedup_exact        hash-groupBy duplicate groups + star pairs
  minhash_lsh        shingle -> minhash -> banded candidate join (md5)
  minhash_lsh_xx     same, xxhash64 hash family
  minhash_lsh_fused  zero-shuffle fused signatures + grouped band join
  repeated_spans     cross-doc repeated-substring spans (Lee et al.)
  dsir               DSIR importance resampling end to end (10k-bucket
                     hashed-gram fit + broadcast scoring + Gumbel
                     top-10% selection; md5 oracle family)
  dsir_xx            same pipeline on xxhash64 buckets (JVM-native
                     serving family)
  bucketed_ann       sign-bucket pair mining, bucket count scaled with
                     n (occupancy held ~64) as a real deployment would
  bucketed_ann_sq    same pair set via the int8 pre-screen (codes in
                     the quadratic join, full vectors only for
                     survivors) — the shuffle-bytes fix for the r4 tail
  sq_topk            int8 scalar-quantized top-k (pure codegen scan)
  ivf_pq_encode      Arrow encode pass (cell + PQ codes)
  ivf_pq_topk        ADC top-k over the probed cells
  ivf_topk           exact-cosine IVF top-k, join+fold scorer, k = n/256
                     two-level codebook injected (serve-from-index)
  ivf_topk_gemm      same search via one tiled BLAS product per cell
                     (+ ivf_topk_equality: persisted-output symmetric
                     difference between the two forms)
  ivf_topk_gemm_q8   the QUALITY serving config (r9): same occ-256
                     codebook, n_probe=8 (recall 0.818 at 1e6)
  ivf_topk_occ1024   occupancy-1024 codebook probed at n_probe=2 and 4
                     (cells sized so natural clusters stop splitting)
  asof               as-of join over an event-stream shape (n probes,
                     n/4 state rows, n/1000 keys) — one union+window
                     shuffle, no join operator
  asof_skew          same join, adversarial key distribution: ONE key
                     holds 50% of both sides (one-task window sort)
  asof_skew_salted   same input through asof_join_salted (r9): the hot
                     key's timeline range-bucketed over 32 tasks,
                     output pinned identical to the plain path
  kll                KLL quantile rollup (n rows -> n/1000 per-key
                     sketches) + grand-total quantiles served by
                     MERGING the stored rollup
  sketch             HLL distinct rollup (n rows -> n/1000 per-key
                     sketches) + the grand total served by MERGING the
                     stored rollup instead of rescanning
  semantic_dedup     SemDeDup with MLlib-trained centroids (tier 0)
  semantic_dedup_hier SemDeDup with a two-level hierarchical codebook
                     (k ~ n/256 at O(n*sqrt(k)*d) assignment — the
                     feasible occupancy-constant path past 1e6 rows)
  bpe                BPE train (distributed freq agg + driver merges)
                     and the Arrow token-count pass
  lincode            assign_lincodes (sequential-by-reference batches;
                     the distributed nearest-profile scan is the term
                     that grows — per-batch wall tracks the coded set)
  ann_equality       symmetric difference of the persisted plain /
                     int8-screened ann pair sets (must be 0)
  incremental_ingest four 250k-doc deltas vs a growing corpus index
  corpus_assembly    token stats + packing + shard assignment
  single_linkage     connected components by label propagation
  star_cc            Kiveris et al. star contraction (comparison)

Usage:
  python tools/scale_bench.py [--doc-tiers 1000000,4000000]
                              [--emb-tiers 1000000,4000000,16000000]
                              [--graph-tiers 1000000,4000000]
                              [--out /tmp/scale_bench]
Prints one JSON line per (path, tier) and a final summary JSON.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bigsdb_spark.session import get_spark  # noqa: E402


def _gen_documents(spark, n: int, path: str) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    seed = F.when(
        (F.col("id") % 100 == 0) & (F.col("id") > 0), F.col("id") - 1
    ).otherwise(F.col("id"))
    words = F.transform(
        F.sequence(F.lit(1), F.lit(48)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("_seed"), i), F.lit(4096)).cast("string"),
        ),
    )
    (
        spark.range(n, numPartitions=max(32, n // 500_000))
        .withColumn("_seed", seed)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
        )
        .write.mode("overwrite")
        .parquet(path)
    )


def _gen_embeddings(spark, n: int, path: str) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    vec = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: (
            (F.pmod(F.xxhash64(F.col("id"), i), F.lit(2001)) - 1000) / 1000.0
        ).cast("float"),
    )
    (
        spark.range(n, numPartitions=max(32, n // 250_000))
        .select(F.col("id").alias("vec_id"), vec.alias("embedding"))
        .write.mode("overwrite")
        .parquet(path)
    )


def _gen_asof(spark, n: int, path: str) -> None:
    """Event-stream shape for the as-of join: n left probes and n/4
    right state rows over n/1000 keys (~1000 left / 250 right rows per
    key — deep enough per-key history that the window sort is the
    measured term), hash-uniform int timestamps."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    keys = max(1, n // 1000)
    base = spark.range(n, numPartitions=max(32, n // 500_000))
    (
        base.select(
            F.pmod(F.xxhash64(F.col("id"), F.lit(3)), F.lit(keys)).alias("k"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(4)), F.lit(10_000_000)).alias(
                "ts"
            ),
            F.col("id").alias("lid"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(path, "left"))
    )
    (
        spark.range(n // 4, numPartitions=max(32, n // 500_000))
        .select(
            F.pmod(F.xxhash64(F.col("id"), F.lit(5)), F.lit(keys)).alias("k"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(6)), F.lit(10_000_000)).alias(
                "ts"
            ),
            (F.col("id") * 10).alias("v"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(path, "right"))
    )
    open(os.path.join(path, "_SUCCESS"), "w").close()


def _gen_asof_skew(spark, n: int, path: str) -> None:
    """Adversarial hot-key variant of _gen_asof (VERDICT r7 task 2):
    ONE key holds 50% of both sides (id % 2 == 0 -> key 0), the rest
    hash-uniform over the other n/1000 keys — the pathological shape
    for a per-key window sort (one key = one task)."""
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    keys = max(2, n // 1000)
    hot = lambda seed: F.when(  # noqa: E731
        F.col("id") % 2 == 0, F.lit(0)
    ).otherwise(
        1 + F.pmod(F.xxhash64(F.col("id"), F.lit(seed)), F.lit(keys - 1))
    )
    base = spark.range(n, numPartitions=max(32, n // 500_000))
    (
        base.select(
            hot(3).alias("k"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(4)), F.lit(10_000_000)).alias(
                "ts"
            ),
            F.col("id").alias("lid"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(path, "left"))
    )
    (
        spark.range(n // 4, numPartitions=max(32, n // 500_000))
        .select(
            hot(5).alias("k"),
            F.pmod(F.xxhash64(F.col("id"), F.lit(6)), F.lit(10_000_000)).alias(
                "ts"
            ),
            (F.col("id") * 10).alias("v"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(path, "right"))
    )
    open(os.path.join(path, "_SUCCESS"), "w").close()


def _gen_edges(spark, n: int, path: str) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    e1 = F.pmod(F.xxhash64(F.col("id"), F.lit(7)), F.lit(n))
    e2 = F.pmod(F.xxhash64(F.col("id"), F.lit(8)), F.lit(n))
    base = spark.range(n, numPartitions=max(32, n // 500_000))
    (
        base.select(F.col("id").alias("id1"), e1.alias("id2"))
        .unionAll(base.select(F.col("id").alias("id1"), e2.alias("id2")))
        .filter(F.col("id1") != F.col("id2"))
        .write.mode("overwrite")
        .parquet(path)
    )


def _timed(fn):
    t0 = time.perf_counter()
    result = fn()
    return time.perf_counter() - t0, result


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--doc-tiers", default="1000000,4000000")
    ap.add_argument("--emb-tiers", default="1000000,4000000,16000000")
    ap.add_argument("--graph-tiers", default="1000000,4000000")
    ap.add_argument(
        "--semdedup-tiers",
        default="1000000",
        help="semantic_dedup tiers (must be a subset of --emb-tiers; "
        "k scales with n at ~256 vectors/cell)",
    )
    ap.add_argument(
        "--lincode-tiers",
        default="25000,100000",
        help="assign_lincodes tiers (sequential-by-reference profile "
        "coding; the distributed term is the per-batch nearest scan)",
    )
    ap.add_argument("--out", default="/tmp/scale_bench")
    ap.add_argument("--skip", default="", help="comma list of paths to skip")
    args = ap.parse_args()
    doc_tiers = [int(x) for x in args.doc_tiers.split(",") if x]
    emb_tiers = [int(x) for x in args.emb_tiers.split(",") if x]
    graph_tiers = [int(x) for x in args.graph_tiers.split(",") if x]
    semdedup_tiers = [int(x) for x in args.semdedup_tiers.split(",") if x]
    lincode_tiers = [int(x) for x in args.lincode_tiers.split(",") if x]
    skip = set(args.skip.split(",")) if args.skip else set()

    spark = get_spark("scale_bench")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(args.out, exist_ok=True)
    results: dict[str, dict[str, float]] = {}

    # WARMUP: run every path family once on a small tier so the timed
    # tiers measure the data term, not first-call JIT/codegen/Arrow
    # initialization (a cold first path measured 10-50x its warm cost)
    if "warmup" not in skip:
        from bigsdb_spark.operators.clustering import single_linkage as _sl
        from bigsdb_spark.operators.dedup import (
            exact_duplicate_pairs as _edp,
            lsh_candidate_pairs as _lcp,
            minhash_signatures as _ms,
            word_shingles as _ws,
        )
        from bigsdb_spark.operators.pq import (
            ivf_pq_encode as _enc,
            sq_encode as _sqe,
            sq_topk as _sqt,
            train_ivf_pq as _tr,
        )
        from bigsdb_spark.operators.similarity import (
            bucketed_ann_pairs as _bap,
        )

        wn = 100_000
        t0 = time.perf_counter()
        _gen_documents(spark, wn, f"{args.out}/docs_w")
        _gen_embeddings(spark, wn, f"{args.out}/emb_w")
        _gen_edges(spark, wn, f"{args.out}/edges_w")
        wd = spark.read.parquet(f"{args.out}/docs_w")
        we = spark.read.parquet(f"{args.out}/emb_w")
        _edp(wd, "doc_id", "text").count()
        _lcp(_ms(_ws(wd, "doc_id", "text"), 8), 8).count()
        _sqt(_sqe(we), [0.1] * 64, top_k=5).collect()
        wm = _tr(we, n_cells=16, m=8, k=16, sample=1024)
        _enc(we, wm).count()
        _bap(we, "vec_id", "embedding", dims=8, min_cosine=0.5).count()
        _sl(
            spark.read.parquet(f"{args.out}/edges_w"),
            spark.range(wn).select(F.col("id")),
        ).count()
        print(f"# warmup done in {time.perf_counter() - t0:.1f}s", flush=True)

    def record(path_name: str, n: int, secs: float, detail: str = "") -> None:
        results.setdefault(path_name, {})[str(n)] = round(secs, 2)
        print(
            json.dumps(
                {"path": path_name, "n": n, "sec": round(secs, 2), "detail": detail}
            ),
            flush=True,
        )

    # ---- document paths ----
    from bigsdb_spark.operators.dedup import (
        exact_duplicate_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
        word_shingles,
    )

    for n in doc_tiers:
        p = f"{args.out}/docs_{n}"
        t_gen, _ = _timed(lambda: _gen_documents(spark, n, p))
        print(f"# docs_{n} generated in {t_gen:.1f}s", flush=True)
        docs = spark.read.parquet(p)
        if "dedup_exact" not in skip:
            sec, cnt = _timed(
                lambda: exact_duplicate_pairs(docs, "doc_id", "text").count()
            )
            record("dedup_exact", n, sec, f"{cnt} star pairs")
        if "minhash_lsh" not in skip:
            sec, cnt = _timed(
                lambda: lsh_candidate_pairs(
                    minhash_signatures(
                        word_shingles(
                            docs, "doc_id", "text", distinct=False
                        ),
                        8,
                    ),
                    8,
                ).count()
            )
            record("minhash_lsh", n, sec, f"{cnt} candidate pairs")
        if "minhash_lsh_xx" not in skip:
            sec, cnt = _timed(
                lambda: lsh_candidate_pairs(
                    minhash_signatures(
                        word_shingles(
                            docs, "doc_id", "text", distinct=False
                        ),
                        8,
                        hash_family="xxhash64",
                    ),
                    8,
                ).count()
            )
            record("minhash_lsh_xx", n, sec, f"{cnt} candidate pairs")
        if "repeated_spans" not in skip:
            from bigsdb_spark.operators.corpus import repeated_spans

            sec, cnt = _timed(
                lambda: repeated_spans(
                    docs, "doc_id", "text", min_gram=10
                ).count()
            )
            record("repeated_spans", n, sec, f"{cnt} spans")
        if "dsir" not in skip:
            from bigsdb_spark.operators.corpus import (
                dsir_log_ratios,
                dsir_scores,
                gumbel_topk,
                hashed_gram_buckets,
            )

            def _dsir():
                # full pipeline: hashed-gram explode -> fit (two
                # bucket-sized aggs) -> broadcast-join scoring ->
                # Gumbel top-10% (TakeOrderedAndProject); target
                # domain = every 10th doc
                grams = hashed_gram_buckets(
                    docs, "doc_id", "text", buckets=10_000
                )
                ratios = dsir_log_ratios(
                    grams,
                    docs.filter(F.col("doc_id") % 10 == 0).select("doc_id"),
                    "doc_id",
                    buckets=10_000,
                )
                scored = dsir_scores(grams, ratios, "doc_id")
                return gumbel_topk(
                    scored, "doc_id", "dsir_logw", k=n // 10
                ).count()

            sec, cnt = _timed(_dsir)
            record("dsir", n, sec, f"{cnt} selected of {n}")
        if "dsir_xx" not in skip:
            from bigsdb_spark.operators.corpus import (
                dsir_log_ratios,
                dsir_scores,
                gumbel_topk,
                hashed_gram_buckets,
            )

            def _dsir_xx():
                # serving family: xxhash64 buckets (JVM-native, no md5
                # string allocs) — same pipeline, engine-specific ids
                grams = hashed_gram_buckets(
                    docs, "doc_id", "text", buckets=10_000,
                    hash_family="xxhash64",
                )
                ratios = dsir_log_ratios(
                    grams,
                    docs.filter(F.col("doc_id") % 10 == 0).select("doc_id"),
                    "doc_id",
                    buckets=10_000,
                )
                scored = dsir_scores(grams, ratios, "doc_id")
                return gumbel_topk(
                    scored, "doc_id", "dsir_logw", k=n // 10
                ).count()

            sec, cnt = _timed(_dsir_xx)
            record("dsir_xx", n, sec, f"{cnt} selected of {n}")
        if "minhash_lsh_fused" not in skip:
            from bigsdb_spark.operators.dedup import (
                minhash_signatures_fused,
            )

            sec, cnt = _timed(
                lambda: lsh_candidate_pairs(
                    minhash_signatures_fused(docs, "doc_id", "text"), 8
                ).count()
            )
            record("minhash_lsh_fused", n, sec, f"{cnt} candidate pairs")
        if "bpe" not in skip:
            from bigsdb_spark.operators.bpe import bpe_token_count, bpe_train

            # train = distributed word-frequency agg (capped at the
            # 50k most frequent words, a TakeOrderedAndProject) + the
            # vocab-sized driver merge loop; apply = one Arrow pass
            sec, merges = _timed(
                lambda: bpe_train(docs, "text", n_merges=200, max_words=50_000)
            )
            record("bpe_train", n, sec, "200 merges over 50k word cap")
            sec, total = _timed(
                lambda: bpe_token_count(docs, "doc_id", "text", merges)
                .agg(F.sum("n_bpe_tokens"))
                .collect()[0][0]
            )
            record("bpe_token_count", n, sec, f"{total} tokens")

    # ---- embedding paths ----
    from bigsdb_spark.operators.pq import (
        ivf_pq_encode,
        ivf_pq_topk,
        sq_encode,
        sq_topk,
        train_ivf_pq,
    )
    from bigsdb_spark.operators.similarity import bucketed_ann_pairs

    model = None
    query = [((h * 37 + 11) % 2001 - 1000) / 1000.0 for h in range(64)]
    for n in emb_tiers:
        p = f"{args.out}/emb_{n}"
        t_gen, _ = _timed(lambda: _gen_embeddings(spark, n, p))
        print(f"# emb_{n} generated in {t_gen:.1f}s", flush=True)
        emb = spark.read.parquet(p)
        if "sq_topk" not in skip:
            enc = sq_encode(emb)
            sec, rows = _timed(lambda: sq_topk(enc, query, top_k=10).collect())
            record("sq_topk", n, sec, "quantize+scan+topk, joinless")
        if "ivf_pq" not in skip:
            if model is None:
                t_train, model = _timed(
                    lambda: train_ivf_pq(
                        emb, n_cells=256, m=8, k=16, sample=4096
                    )
                )
                print(f"# ivf_pq trained once in {t_train:.1f}s", flush=True)
            codes_path = f"{args.out}/codes_{n}"
            if not os.path.exists(os.path.join(codes_path, "_SUCCESS")):
                sec, _ = _timed(
                    lambda: ivf_pq_encode(emb, model)
                    .write.mode("overwrite")
                    .parquet(codes_path)
                )
                record("ivf_pq_encode", n, sec, "Arrow cell+code pass")
            codes = spark.read.parquet(codes_path)
            sec, rows = _timed(
                lambda: ivf_pq_topk(
                    codes, model, query, top_k=10, n_probe=8
                ).collect()
            )
            record("ivf_pq_topk", n, sec, "8/256 cells probed")
        # both ann paths are forced by WRITING the (tiny: ~1e4-row)
        # pair set to parquet instead of count() — the plan is the
        # same, the write adds <1 s, and pair-set EQUALITY between the
        # plain and int8-screened variants (the r4/r5 soundness claim)
        # can then be checked from the persisted outputs without
        # re-running the expensive joins
        dims = max(3, int(math.log2(max(n, 64) / 64)))
        if "bucketed_ann" not in skip:
            sec, _ = _timed(
                lambda: bucketed_ann_pairs(
                    emb, "vec_id", "embedding", dims=dims, min_cosine=0.5
                )
                .select("id1", "id2")
                .write.mode("overwrite")
                .parquet(f"{args.out}/ann_pairs_{n}")
            )
            cnt = spark.read.parquet(f"{args.out}/ann_pairs_{n}").count()
            record("bucketed_ann", n, sec, f"dims={dims}, {cnt} pairs")
        if "bucketed_ann_gemm" not in skip:
            from bigsdb_spark.operators.similarity import (
                bucketed_ann_pairs_gemm,
            )

            sec, _ = _timed(
                lambda: bucketed_ann_pairs_gemm(
                    emb, "vec_id", "embedding", dims=dims, min_cosine=0.5
                )
                .select("id1", "id2")
                .write.mode("overwrite")
                .parquet(f"{args.out}/ann_pairs_gemm_{n}")
            )
            cnt = spark.read.parquet(f"{args.out}/ann_pairs_gemm_{n}").count()
            record(
                "bucketed_ann_gemm", n, sec,
                f"dims={dims}, {cnt} pairs (per-bucket GEMM)",
            )
            if "bucketed_ann" not in skip:
                plain = spark.read.parquet(f"{args.out}/ann_pairs_{n}")
                g = spark.read.parquet(f"{args.out}/ann_pairs_gemm_{n}")
                sec, diff = _timed(
                    lambda: plain.exceptAll(g).count()
                    + g.exceptAll(plain).count()
                )
                record(
                    "ann_gemm_equality", n, sec,
                    f"symmetric difference {diff} (0 = identical pair sets)",
                )
        if "bucketed_ann_sq" not in skip:
            from bigsdb_spark.operators.similarity import bucketed_ann_pairs_sq

            sec, _ = _timed(
                lambda: bucketed_ann_pairs_sq(
                    emb, "vec_id", "embedding", dims=dims, min_cosine=0.5
                )
                .select("id1", "id2")
                .write.mode("overwrite")
                .parquet(f"{args.out}/ann_pairs_sq_{n}")
            )
            cnt = spark.read.parquet(f"{args.out}/ann_pairs_sq_{n}").count()
            record(
                "bucketed_ann_sq", n, sec,
                f"dims={dims}, {cnt} pairs (int8 screen)",
            )
        if (
            "bucketed_ann" not in skip
            and "bucketed_ann_sq" not in skip
            and "ann_equality" not in skip
        ):
            plain = spark.read.parquet(f"{args.out}/ann_pairs_{n}")
            sq = spark.read.parquet(f"{args.out}/ann_pairs_sq_{n}")
            sec, diff = _timed(
                lambda: plain.exceptAll(sq).count() + sq.exceptAll(plain).count()
            )
            record(
                "ann_pair_equality", n, sec,
                f"symmetric difference {diff} (0 = identical pair sets)",
            )
        # ---- IVF top-k serving: join+fold vs per-cell GEMM (r7) ----
        # Same serve-from-a-saved-index framing as ivf_pq: the codebook
        # (two-level, k = n/256 occupancy-constant) is trained once per
        # tier and injected into both forms, so the measured delta is
        # purely the scorer — shuffle-both-sides + interpreted cosine
        # folds vs one union shuffle + one tiled BLAS product per cell.
        if "ivf_topk" not in skip or "ivf_topk_gemm" not in skip:
            from bigsdb_spark.operators.dedup import train_hierarchical_cells
            from bigsdb_spark.operators.similarity import (
                ivf_kmeans_ann,
                ivf_kmeans_ann_gemm,
            )

            k = max(64, n // 256)
            # sample ∝ k (r8): a FIXED 131072-point sample at k=62500
            # leaves ~2 training points per fine cell — 43% of cells
            # come out empty, max occupancy 25728 vs the nominal 256,
            # and sum(occ^2) (the scorer's flop count) lands 10.6x the
            # uniform value with one 25k-row cell as a single-worker
            # straggler (the r8 probe isolated this as the residual
            # superlinear term).  16 points/cell keeps the codebook
            # honest as k grows; training stays OUTSIDE the timing
            # (serve-from-a-saved-index framing).
            t_train, h = _timed(
                lambda: train_hierarchical_cells(
                    emb, "embedding", n_cells=k,
                    sample=max(131072, 16 * k), iters=10,
                )
            )
            print(
                f"# ivf hier codebook (k={k}, sample={max(131072, 16 * k)}) "
                f"trained in {t_train:.1f}s",
                flush=True,
            )
            if "ivf_topk" not in skip:
                sec, _ = _timed(
                    lambda: ivf_kmeans_ann(
                        emb, "vec_id", "embedding",
                        top_k=10, n_probe=1, hierarchy=h,
                    )
                    .select("qid", "nn_id", "cosine")
                    .write.mode("overwrite")
                    .parquet(f"{args.out}/ivf_topk_{n}")
                )
                cnt = spark.read.parquet(f"{args.out}/ivf_topk_{n}").count()
                record(
                    "ivf_topk", n, sec,
                    f"k={k} cells, n_probe=1, {cnt} result rows (join+fold)",
                )
            if "ivf_topk_gemm" not in skip:
                sec, _ = _timed(
                    lambda: ivf_kmeans_ann_gemm(
                        emb, "vec_id", "embedding",
                        top_k=10, n_probe=1, hierarchy=h,
                    )
                    .select("qid", "nn_id", "cosine")
                    .write.mode("overwrite")
                    .parquet(f"{args.out}/ivf_topk_gemm_{n}")
                )
                cnt = spark.read.parquet(
                    f"{args.out}/ivf_topk_gemm_{n}"
                ).count()
                record(
                    "ivf_topk_gemm", n, sec,
                    f"k={k} cells, n_probe=1, {cnt} result rows "
                    "(per-cell GEMM)",
                )
            if "ivf_topk" not in skip and "ivf_topk_gemm" not in skip:
                jn = spark.read.parquet(f"{args.out}/ivf_topk_{n}")
                gm = spark.read.parquet(f"{args.out}/ivf_topk_gemm_{n}")
                j_ids = jn.select("qid", "nn_id")
                g_ids = gm.select("qid", "nn_id")
                sec, diff = _timed(
                    lambda: j_ids.exceptAll(g_ids).count()
                    + g_ids.exceptAll(j_ids).count()
                )
                record(
                    "ivf_topk_equality", n, sec,
                    f"symmetric difference {diff} (0 = identical top-k)",
                )
            # ---- quality serving configs (r9, VERDICT r8 lead item) ----
            # The n_probe=1 rows above are the TIMING config; recall@10
            # at production n (clustered corpus, tools/ivf_recall.py
            # --hier) is 0.22 there.  These rows time the configs a
            # deployment would actually serve: (a) the same occupancy-
            # 256 codebook probed at n_probe=8 (recall 0.818), and (b)
            # an occupancy-1024 codebook whose cells stop splitting the
            # ~5000-point natural clusters (recall re-measured with
            # --occ=1024), probed shallow.
            if "ivf_topk_gemm_q8" not in skip:
                sec, _ = _timed(
                    lambda: ivf_kmeans_ann_gemm(
                        emb, "vec_id", "embedding",
                        top_k=10, n_probe=8, hierarchy=h,
                    )
                    .select("qid", "nn_id", "cosine")
                    .write.mode("overwrite")
                    .parquet(f"{args.out}/ivf_topk_gemm_q8_{n}")
                )
                cnt = spark.read.parquet(
                    f"{args.out}/ivf_topk_gemm_q8_{n}"
                ).count()
                record(
                    "ivf_topk_gemm_q8", n, sec,
                    f"k={k} cells, n_probe=8 (QUALITY config: recall "
                    f"0.818 at n=1e6 clustered), {cnt} result rows",
                )
                # output only needed for the count; at 1.6e7 the tier's
                # parquet outputs + two live shuffles squeezed the disk
                shutil.rmtree(
                    f"{args.out}/ivf_topk_gemm_q8_{n}", ignore_errors=True
                )
            if "ivf_topk_occ1024" not in skip:
                k2 = max(64, n // 1024)
                t2, h2 = _timed(
                    lambda: train_hierarchical_cells(
                        emb, "embedding", n_cells=k2,
                        sample=max(131072, 16 * k2), iters=10,
                    )
                )
                print(
                    f"# ivf occ-1024 codebook (k={k2}, "
                    f"sample={max(131072, 16 * k2)}) trained in {t2:.1f}s",
                    flush=True,
                )
                for np_ in (2, 4):
                    sec, _ = _timed(
                        lambda: ivf_kmeans_ann_gemm(
                            emb, "vec_id", "embedding",
                            top_k=10, n_probe=np_, hierarchy=h2,
                        )
                        .select("qid", "nn_id", "cosine")
                        .write.mode("overwrite")
                        .parquet(f"{args.out}/ivf_topk_occ1024_p{np_}_{n}")
                    )
                    cnt = spark.read.parquet(
                        f"{args.out}/ivf_topk_occ1024_p{np_}_{n}"
                    ).count()
                    record(
                        f"ivf_topk_occ1024_p{np_}", n, sec,
                        f"k={k2} cells (occupancy 1024), n_probe={np_}, "
                        f"{cnt} result rows",
                    )
                    shutil.rmtree(
                        f"{args.out}/ivf_topk_occ1024_p{np_}_{n}",
                        ignore_errors=True,
                    )
        if "asof" not in skip:
            from bigsdb_spark.operators.asof import asof_join

            ap = f"{args.out}/asof_{n}"
            t_gen, _ = _timed(lambda: _gen_asof(spark, n, ap))
            print(f"# asof_{n} generated in {t_gen:.1f}s", flush=True)
            al = spark.read.parquet(f"{ap}/left")
            ar = spark.read.parquet(f"{ap}/right")
            sec, cnt = _timed(
                lambda: asof_join(al, ar, on="k")
                .filter(F.col("v").isNotNull())
                .count()
            )
            record(
                "asof", n, sec,
                f"{cnt} matched of {n} probes over {max(1, n // 1000)} keys",
            )
        if "asof_skew" not in skip:
            from bigsdb_spark.operators.asof import asof_join

            ap = f"{args.out}/asof_skew_{n}"
            t_gen, _ = _timed(lambda: _gen_asof_skew(spark, n, ap))
            print(f"# asof_skew_{n} generated in {t_gen:.1f}s", flush=True)
            al = spark.read.parquet(f"{ap}/left")
            ar = spark.read.parquet(f"{ap}/right")
            sec, cnt = _timed(
                lambda: asof_join(al, ar, on="k")
                .filter(F.col("v").isNotNull())
                .count()
            )
            record(
                "asof_skew", n, sec,
                f"{cnt} matched; key 0 holds 50% of {n} probes "
                f"+ {n // 4} state rows (one-task window sort)",
            )
            if "asof_skew_salted" not in skip:
                # r9: the shipped skew fix — the hot key's timeline is
                # range-bucketed so its window sort spreads over 32
                # tasks; output must be row-identical to the plain path
                from bigsdb_spark.operators.asof import asof_join_salted

                sec, cnt2 = _timed(
                    lambda: asof_join_salted(
                        al, ar, on="k",
                        hot_threshold=max(1_000_000, n // 100),
                    )
                    .filter(F.col("v").isNotNull())
                    .count()
                )
                sec_d, diff = _timed(
                    lambda: asof_join_salted(
                        al, ar, on="k",
                        hot_threshold=max(1_000_000, n // 100),
                    )
                    .exceptAll(asof_join(al, ar, on="k"))
                    .count()
                )
                record(
                    "asof_skew_salted", n, sec,
                    f"{cnt2} matched (plain: {cnt}); hot-key timeline "
                    f"bucketed x32; one-sided exceptAll diff {diff} "
                    f"(row counts equal + diff 0 = identical output; "
                    f"checked in {sec_d:.1f}s)",
                )
        if "kll" not in skip:
            from bigsdb_spark.operators.sketches import (
                merge_quantile_sketches,
                quantile_sketch_rollup,
                with_quantiles,
            )

            ap = f"{args.out}/asof_{n}"
            _gen_asof(spark, n, ap)
            al = spark.read.parquet(f"{ap}/left")
            sec, nk = _timed(
                lambda: quantile_sketch_rollup(al, ["k"], "ts").count()
            )
            record("kll_rollup", n, sec, f"{nk} per-key KLL sketches")
            rollup_path = f"{args.out}/kll_rollup_{n}"
            quantile_sketch_rollup(al, ["k"], "ts").write.mode(
                "overwrite"
            ).parquet(rollup_path)
            stored = spark.read.parquet(rollup_path)
            sec, row = _timed(
                lambda: with_quantiles(
                    merge_quantile_sketches(stored, []), [0.5, 0.95]
                ).collect()[0]
            )
            record(
                "kll_merge", n, sec,
                f"grand-total q50={row.q50:.0f} q95={row.q95:.0f} over "
                f"{row.n_values} values via stored-sketch merge",
            )
        if "sketch" not in skip:
            from bigsdb_spark.operators.sketches import (
                distinct_sketch_rollup,
                merge_sketches,
                with_estimate,
            )

            ap = f"{args.out}/asof_{n}"
            _gen_asof(spark, n, ap)
            al = spark.read.parquet(f"{ap}/left")
            # finest-grain rollup (n rows -> n/1000 sketch rows) ...
            sec, nk = _timed(
                lambda: distinct_sketch_rollup(al, ["k"], "lid").count()
            )
            record("sketch_rollup", n, sec, f"{nk} per-key sketches")
            # ... then the grand total from MERGING the stored rollup —
            # the no-rescan path a dashboard takes
            rollup_path = f"{args.out}/sketch_rollup_{n}"
            distinct_sketch_rollup(al, ["k"], "lid").write.mode(
                "overwrite"
            ).parquet(rollup_path)
            stored = spark.read.parquet(rollup_path)
            sec, est = _timed(
                lambda: with_estimate(merge_sketches(stored, []))
                .collect()[0]
                .distinct_est
            )
            record(
                "sketch_merge", n, sec,
                f"total distinct ~{est} of {n} via stored-sketch merge",
            )

    # ---- semantic dedup at scale (MLlib-trained centroids) ----
    # Exercises the injectable-centroids path: occupancy-constant cell
    # count needs k-means|| (the numpy trainer caps at the sample), so
    # train with MLlib once and hand the centers to the operator.
    if "semantic_dedup" not in skip and emb_tiers:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        from bigsdb_spark.operators.dedup import semantic_dedup

        # occupancy-constant scaling: k grows proportionally with n
        # (cells hold ~256 vectors at every tier), exactly how a real
        # deployment holds the per-cell pair expansion bounded
        for n in semdedup_tiers:
            emb = spark.read.parquet(f"{args.out}/emb_{n}")
            k = max(64, n // 256)
            feat = emb.select(
                "vec_id", "embedding",
                array_to_vector(F.col("embedding").cast("array<double>")).alias(
                    "features"
                ),
            )
            t_train, model = _timed(
                lambda: KMeans(k=k, seed=7, maxIter=5, featuresCol="features")
                .fit(feat)
            )
            print(
                f"# semantic_dedup kmeans k={k} trained in {t_train:.1f}s",
                flush=True,
            )
            centers = [c.tolist() for c in model.clusterCenters()]
            sec, kept = _timed(
                lambda: semantic_dedup(
                    emb, "vec_id", "embedding", min_cosine=0.95,
                    centroids=centers,
                )
                .filter("keep")
                .count()
            )
            record(
                "semantic_dedup", n, sec,
                f"k={k} cells, {kept} survivors of {n}",
            )

    # ---- semantic dedup with HIERARCHICAL cells (the k ~ n path) ----
    # Occupancy-constant k = n/256 makes a flat codebook infeasible
    # past ~1e6 rows (assignment is O(n*k*d): 4e15 flops at 4e6) — the
    # two-level codebook assigns in O(n*sqrt(k)*d).  Training is
    # sample-bounded driver numpy (like faiss); the measured pass is
    # assignment + within-cell pair join + grouping.
    if "semantic_dedup_hier" not in skip:
        from bigsdb_spark.operators.dedup import (
            semantic_dedup,
            train_hierarchical_cells,
        )

        for n in semdedup_tiers:
            emb = spark.read.parquet(f"{args.out}/emb_{n}")
            k = max(64, n // 256)
            t_train, h = _timed(
                lambda: train_hierarchical_cells(
                    emb, "embedding", n_cells=k, sample=131072, iters=10
                )
            )
            nc, br = len(h["coarse"]), len(h["fine"][0])
            print(
                f"# hier codebook {nc}x{br} (k={k}) trained in "
                f"{t_train:.1f}s",
                flush=True,
            )
            sec, kept = _timed(
                lambda: semantic_dedup(
                    emb, "vec_id", "embedding", min_cosine=0.95, hierarchy=h
                )
                .filter("keep")
                .count()
            )
            record(
                "semantic_dedup_hier", n, sec,
                f"{nc}x{br} cells, {kept} survivors of {n}",
            )

    # ---- LIN codes: sequential-by-reference driver loop at scale ----
    # assign_lincodes is order-dependent by construction (each profile
    # is coded against all PREVIOUSLY coded profiles:
    # reference scripts/maintenance/lincodes.pl:177) — the claim under
    # test is that the driver loop is NOT the bottleneck: per-batch
    # wall tracks the distributed nearest-profile scan (which grows
    # with the coded set), not a fixed driver overhead, so total time
    # follows the O(n^2/2) pair count, not the O(n/batch) batch count.
    # Profiles: 32 loci in families of 4 (parent + 3 single-locus
    # mutants) so the threshold hierarchy has real structure.
    if "lincode" not in skip and lincode_tiers:
        from bigsdb_spark.operators.lincodes import assign_lincodes

        for n in lincode_tiers:
            p = f"{args.out}/profiles_{n}"
            if not os.path.exists(os.path.join(p, "_SUCCESS")):
                fam = F.col("id") - F.pmod(F.col("id"), F.lit(4))
                mut_locus = F.pmod(F.xxhash64(F.col("id"), F.lit(99)), F.lit(32)) + 1
                prof = F.transform(
                    F.sequence(F.lit(1), F.lit(32)),
                    lambda i: F.when(
                        (F.pmod(F.col("id"), F.lit(4)) != 0) & (mut_locus == i),
                        (F.pmod(F.xxhash64(F.col("id"), i), F.lit(30)) + 31),
                    )
                    .otherwise(F.pmod(F.xxhash64(fam, i), F.lit(30)) + 1)
                    .cast("string"),  # allele ids are strings ('N'/'0' = missing)
                )
                (
                    spark.range(n, numPartitions=max(8, n // 25_000))
                    .select(
                        F.format_string("p%08d", F.col("id")).alias(
                            "profile_key"
                        ),
                        prof.alias("profile"),
                    )
                    .write.mode("overwrite")
                    .parquet(p)
                )
            profiles = spark.read.parquet(p)
            bs = 1024  # the per-batch Spark-job floor is ~4 s; batch
            # size is the documented knob that amortizes it (reference
            # codes one profile per query; any batch size preserves
            # the sequential insertion-order semantics within batches)
            sec, codes = _timed(
                lambda: assign_lincodes(
                    spark, profiles, thresholds=[8, 4, 2, 1],
                    locus_count=32, batch_size=bs,
                )
            )
            n_batches = (n + bs - 1) // bs
            record(
                "lincode_assign", n, sec,
                f"{n_batches} batches of {bs}, {sec / n_batches:.2f}s/batch, "
                f"{codes.count()} coded",
            )

    # ---- incremental ingest: per-delta cost vs a growing index ----
    # The claim under test: dedup_against_index scales with the DELTA,
    # not the corpus — four successive 250k-doc batches against an
    # index that grows 0 -> 750k docs must cost ~the same per batch.
    # Index snapshots are persisted to parquet between rounds exactly
    # as run_corpus_ingest_stream persists them.
    if "incremental_ingest" not in skip and doc_tiers:
        from bigsdb_spark.operators.training import (
            build_corpus_index,
            dedup_against_index,
        )

        n = doc_tiers[0]
        delta = n // 4
        docs = spark.read.parquet(f"{args.out}/docs_{n}")
        index = build_corpus_index(docs.limit(0), "doc_id", "text")
        for r in range(4):
            batch = docs.filter(
                (F.col("doc_id") >= r * delta)
                & (F.col("doc_id") < (r + 1) * delta)
            )
            sec, out = _timed(
                lambda: (lambda o: (
                    o["kept"].count(),
                    o["md5"].write.mode("overwrite").parquet(
                        f"{args.out}/ing_idx/v{r}/md5"
                    ),
                    o["bands"].write.mode("overwrite").parquet(
                        f"{args.out}/ing_idx/v{r}/bands"
                    ),
                    o,
                ))(dedup_against_index(batch, index, "doc_id", "text"))
            )
            kept = out[0]
            index = {
                "md5": spark.read.parquet(f"{args.out}/ing_idx/v{r}/md5"),
                "bands": spark.read.parquet(f"{args.out}/ing_idx/v{r}/bands"),
            }
            record(
                "incremental_ingest",
                (r + 1) * delta,
                sec,
                f"round {r + 1}: {kept} kept, index now {(r + 1) * delta}",
            )

    # ---- corpus assembly at scale ----
    if "corpus_assembly" not in skip and doc_tiers:
        from bigsdb_spark.operators.textstats import token_stats
        from bigsdb_spark.operators.training import (
            pack_documents,
            shard_assignments,
        )

        for n in doc_tiers:
            docs = spark.read.parquet(f"{args.out}/docs_{n}")
            sec, cnt = _timed(
                lambda: shard_assignments(
                    pack_documents(
                        token_stats(docs, "doc_id", "text").select(
                            "doc_id", "n_tokens"
                        ),
                        "doc_id",
                        "n_tokens",
                        max_len=2048,
                    ),
                    "example_id",
                    n_shards=256,
                ).count()
            )
            record("corpus_assembly", n, sec, f"{cnt} packed chunks")

    # ---- graph path ----
    from bigsdb_spark.operators.clustering import single_linkage

    for n in graph_tiers:
        if "single_linkage" in skip:
            break
        p = f"{args.out}/edges_{n}"
        t_gen, _ = _timed(lambda: _gen_edges(spark, n, p))
        print(f"# edges_{n} generated in {t_gen:.1f}s", flush=True)
        edges = spark.read.parquet(p)
        nodes = spark.range(n).select(F.col("id"))
        sec, cnt = _timed(
            lambda: single_linkage(edges, nodes)
            .select(F.countDistinct("group_id"))
            .collect()[0][0]
        )
        record("single_linkage", n, sec, f"{cnt} components")
        if "star_cc" not in skip:
            from bigsdb_spark.operators.clustering import (
                connected_components_star,
            )

            sec, cnt = _timed(
                lambda: connected_components_star(edges, nodes)
                .select(F.countDistinct("group_id"))
                .collect()[0][0]
            )
            record("star_cc", n, sec, f"{cnt} components")

    print(json.dumps({"scale_bench": results}), flush=True)


if __name__ == "__main__":
    main()
