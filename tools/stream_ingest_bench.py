"""Sustained-rate / latency evidence for the streaming corpus ingest
path (VERDICT r8 #7: every streaming op has stream==batch equality but
no measured throughput row).

Measures ``run_corpus_ingest_stream`` (streaming/events.py) — the
100 TB-relevant path: availableNow micro-batches through foreachBatch,
each batch deduplicated (exact md5 + LSH bands) against the PERSISTED
corpus index, corpus append + SnapshotLog index advance per batch.

Protocol: one source file per batch (maxFilesPerTrigger=1, mtimes
staggered so file order is batch order), the SAME checkpoint across
calls so each invocation drains exactly the newly added file, and the
index/corpus persist between batches — so per-batch wall clock as the
batch counter climbs IS the delta-scaling evidence: flat latency while
the index grows from 0 to n_batches x batch_rows docs means the
per-batch cost tracks the DELTA, not the corpus (the index probes are
hash-keyed equi-joins).  The first batch is reported but flagged as
warm-up (JVM/Python-worker spin-up — the measurement-protocol note in
BASELINE.md).

Workload realism: 1% intra-batch exact duplicates (id % 100 == 0
copies its predecessor) and, from batch 1 on, 0.5% cross-batch
re-sends (id % 200 == 1 copies the same slot one batch earlier) so the
index join always has real matches to reject.

Usage:
  python tools/stream_ingest_bench.py [--batch-rows 250000]
      [--batches 8] [--out /tmp/stream_ingest_bench]
Prints one JSON line per batch and a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from bigsdb_spark.session import get_spark  # noqa: E402


def _write_batch(spark, b: int, rows: int, src: str) -> None:
    lo = b * rows
    seed = (
        F.when(
            (F.col("id") % 200 == 1) & (F.col("id") >= rows),
            F.col("id") - rows,  # cross-batch re-send
        )
        .when(
            (F.col("id") % 100 == 0) & (F.col("id") % 200 != 1)
            & (F.col("id") > lo),
            F.col("id") - 1,  # intra-batch duplicate
        )
        .otherwise(F.col("id"))
    )
    words = F.transform(
        F.sequence(F.lit(1), F.lit(48)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(F.col("_seed"), i), F.lit(4096)).cast("string"),
        ),
    )
    (
        spark.range(lo, lo + rows, numPartitions=8)
        .withColumn("_seed", seed)
        .select(
            F.col("id").alias("doc_id"),
            F.array_join(words, " ").alias("text"),
        )
        .coalesce(1)
        .write.mode("append")
        .parquet(src)
    )
    # stagger mtimes so FileStreamSource's file ordering is batch order
    now = time.time()
    age = (100 - b) * 10
    for root, _, files in os.walk(src):
        for f in files:
            p = os.path.join(root, f)
            if os.path.getmtime(p) > now - 5:
                os.utime(p, (now - age, now - age))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-rows", type=int, default=250_000)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--out", default="/tmp/stream_ingest_bench")
    args = ap.parse_args()

    from bigsdb_spark.streaming.events import (
        read_event_stream,
        run_corpus_ingest_stream,
    )

    spark = get_spark("stream_ingest_bench")
    spark.sparkContext.setLogLevel("ERROR")
    if os.path.exists(args.out):
        shutil.rmtree(args.out)
    src = os.path.join(args.out, "src")
    corpus = os.path.join(args.out, "corpus")
    index = os.path.join(args.out, "index")
    ckpt = os.path.join(args.out, "ckpt")

    results = []
    schema = "doc_id long, text string"
    for b in range(args.batches):
        t_gen0 = time.perf_counter()
        _write_batch(spark, b, args.batch_rows, src)
        t_gen = time.perf_counter() - t_gen0
        stream = read_event_stream(
            spark, src, schema=spark.read.parquet(src).schema, max_files=1
        )
        t0 = time.perf_counter()
        run_corpus_ingest_stream(stream, corpus, index, ckpt)
        sec = time.perf_counter() - t0
        corpus_docs = spark.read.parquet(corpus).count()
        rec = {
            "batch": b,
            "batch_rows": args.batch_rows,
            "sec": round(sec, 1),
            "docs_per_sec": round(args.batch_rows / sec),
            "corpus_docs_after": corpus_docs,
            "gen_sec": round(t_gen, 1),
            "warmup": b == 0,
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    steady = [r["sec"] for r in results[1:]]
    print(
        json.dumps(
            {
                "stream_ingest_bench": {
                    "batches": args.batches,
                    "batch_rows": args.batch_rows,
                    "steady_sec_min": min(steady) if steady else None,
                    "steady_sec_max": max(steady) if steady else None,
                    "final_corpus_docs": results[-1]["corpus_docs_after"],
                    "flat_latency": (
                        max(steady) / min(steady) < 1.5 if steady else None
                    ),
                }
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
