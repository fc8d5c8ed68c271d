"""r13 decomposition probe: time named sub-frames of the round's
target entries with the noop sink, and count the driver jobs each
launches (statusTracker before/after).

Usage: python tools/r13_probe.py <target>...   (default: all)
Targets: f10, dedup_exact, minhash, bucketed, a11, d4
Protocol: one untimed warm-up per frame, then best-of-3 timed reps
(reset between reps) — same discipline as bench.py.
"""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigsdb_spark.inventory import QUERIES  # noqa: F401
from bigsdb_spark.inventory.registry import tbl
from bigsdb_spark.inventory.typing import _pairs_memo
from bigsdb_spark.session import get_spark


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def probe(spark, name, build, reps=3):
    sc = spark.sparkContext
    sc.setJobDescription(f"r13probe:{name}")
    _noop(build())  # warm-up
    _reset(spark)
    best, jobs_best = None, None
    for _ in range(reps):
        n0 = sc._jsc.sc().dagScheduler().nextJobId().get() if hasattr(sc._jsc.sc().dagScheduler().nextJobId(), "get") else sc._jsc.sc().dagScheduler().nextJobId()
        t0 = time.time()
        _noop(build())
        dt = time.time() - t0
        n1 = sc._jsc.sc().dagScheduler().nextJobId().get() if hasattr(sc._jsc.sc().dagScheduler().nextJobId(), "get") else sc._jsc.sc().dagScheduler().nextJobId()
        if best is None or dt < best:
            best, jobs_best = dt, n1 - n0
        _reset(spark)
    print(f"  {name}: {best:.3f}s  jobs={jobs_best}")
    sc.setJobDescription(None)
    return best


def _reset(spark):
    spark.catalog.clearCache()
    _pairs_memo.clear()
    spark.sparkContext._jvm.System.gc()


def main():
    targets = set(sys.argv[1:]) or {
        "f10", "dedup_exact", "minhash", "bucketed", "a11", "d4"
    }
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r13_probe")
    spark.sparkContext.setLogLevel("ERROR")
    print("loadavg", [round(x, 2) for x in os.getloadavg()])
    # session warm-up (parquet footers, python workers)
    QUERIES["s1_view_scan"](spark, sf_dir).count()
    spark.range(1000).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()

    if "f10" in targets:
        from bigsdb_spark.inventory.sequenceq import f10_partial
        from bigsdb_spark.operators.seqmatch import kmer_candidates
        from bigsdb_spark.inventory.registry import dna_expr

        def _parts(spark, sf_dir):
            docs = tbl(spark, sf_dir, "documents")
            d = docs.select(
                "doc_id", dna_expr("text").alias("seq")
            ).filter(F.length("seq") >= 60)
            alleles = d.select(
                F.lit("locus1").alias("locus"),
                F.col("doc_id").cast("string").alias("allele_id"),
                F.substring("seq", 1, 60).alias("sequence"),
            )
            mut = F.concat(
                F.substring("sequence", 1, 4),
                F.translate(F.substring("sequence", 5, 1), "ACGT", "CGTA"),
                F.substring("sequence", 6, 14),
                F.translate(F.substring("sequence", 20, 1), "ACGT", "CGTA"),
                F.expr("substring(sequence, 21)"),
            )
            queries = alleles.filter(
                F.col("allele_id").cast("long") % 10 == 0
            ).select(
                F.col("allele_id").cast("long").alias("query_id"),
                mut.alias("sequence"),
            )
            return queries, alleles

        q, a = _parts(spark, sf_dir)
        probe(spark, "f10/alleles_build", lambda: a)
        probe(spark, "f10/kmer_candidates",
              lambda: kmer_candidates(q, a, 10))
        probe(spark, "f10/full", lambda: f10_partial(spark, sf_dir))

    if "dedup_exact" in targets:
        from bigsdb_spark.inventory.llm import dedup_exact_tiers
        from bigsdb_spark.operators.dedup import (
            exact_duplicate_pairs, normalized_text,
        )

        docs = tbl(spark, sf_dir, "documents").select("doc_id", "text")
        corpus = docs.unionByName(
            docs.filter(F.col("doc_id") % 17 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
        probe(spark, "exact/norm_only",
              lambda: corpus.select(
                  "doc_id", F.md5(normalized_text(F.col("text"))).alias("fp")
              ))
        probe(spark, "exact/full",
              lambda: exact_duplicate_pairs(corpus, "doc_id", "text"))
        probe(spark, "emb_tier/full",
              lambda: dedup_exact_tiers(spark, sf_dir)["embedding_cosine"])
        probe(spark, "semantic/full",
              lambda: dedup_exact_tiers(spark, sf_dir)["semantic"])

    if "minhash" in targets:
        from bigsdb_spark.operators.dedup import (
            lsh_candidate_pairs, minhash_signatures, word_shingles,
        )

        docs = tbl(spark, sf_dir, "documents")
        sh = word_shingles(docs, "doc_id", "text", k=3, distinct=False)
        probe(spark, "minhash/shingles", lambda: sh)
        sig = minhash_signatures(sh, n_hashes=8)
        probe(spark, "minhash/signatures", lambda: sig)
        probe(spark, "minhash/full",
              lambda: lsh_candidate_pairs(sig, n_hashes=8, band_size=2))

    if "bucketed" in targets:
        from bigsdb_spark.operators.similarity import bucketed_ann_pairs

        emb = tbl(spark, sf_dir, "embeddings")
        probe(spark, "bucketed/full",
              lambda: bucketed_ann_pairs(
                  emb, "vec_id", "embedding", dims=3, min_cosine=0.2))

    if "a11" in targets:
        from bigsdb_spark.inventory.temporal import a11_daily

        probe(spark, "a11/full", lambda: a11_daily(spark, sf_dir))

    if "d4" in targets:
        probe(spark, "d4/full",
              lambda: QUERIES["d4_single_linkage_groups"](spark, sf_dir))
        probe(spark, "d2/full",
              lambda: QUERIES["d2_matching_profiles"](spark, sf_dir))

    print("loadavg_end", [round(x, 2) for x in os.getloadavg()])
    spark.stop()


if __name__ == "__main__":
    main()
