"""Planted-skew measurement for the LSH band join.

The scale story for `lsh_candidate_pairs_salted`
(operators/dedup.py) is that a hot band bucket — boilerplate docs all
hashing to one (band, bucket) key — concentrates that bucket's
quadratic pair expansion in ONE task, which AQE cannot fix (skew
split cannot divide a single join key), and that salting spreads the
same expansion over `salt_buckets` tasks with an identical pair set.
That claim has equality tests but no measurement.  This probe plants
the skew and times the three serving options:

  join      the plain self-join band join (`lsh_candidate_pairs`)
  salted    the salted self-join (`lsh_candidate_pairs_salted`)
  capped    the grouped one-exchange join with `max_bucket` skipping
            the hot bucket entirely (the production recall-trade)

Corpus: `--n` docs of unique text plus `--hot` docs sharing ONE
template (identical shingles -> identical signature -> one hot bucket
per band).  The hot cluster alone contributes hot*(hot-1)/2 pairs per
the dedup contract; unique docs contribute background pairs only.

Prints one JSON line:
    {"skew_probe": {"n": ..., "hot": ..., "sec_join": ...,
     "sec_salted": ..., "sec_capped": ..., "pairs_join": ...,
     "pairs_salted": ..., "pairs_capped": ..., "sets_equal": true}}

Usage:
    python tools/skew_probe.py --n 4000000 --hot 10000 --out /tmp/scale_bench
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_TOOLS = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_TOOLS))
sys.path.insert(0, _TOOLS)

from pyspark.sql import functions as F  # noqa: E402

from bigsdb_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4_000_000)
    ap.add_argument("--hot", type=int, default=10_000)
    ap.add_argument("--out", default="/tmp/scale_bench")
    ap.add_argument("--salt", type=int, default=8)
    args = ap.parse_args()

    from bigsdb_spark.operators.dedup import (
        lsh_candidate_pairs,
        lsh_candidate_pairs_grouped,
        lsh_candidate_pairs_salted,
        minhash_signatures,
        word_shingles,
    )

    spark = get_spark("skew_probe")
    spark.sparkContext.setLogLevel("ERROR")

    path = f"{args.out}/docs_skew_{args.n}_{args.hot}"
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        # unique tail: per-doc pseudo-random words; hot head: one
        # shared template (identical shingle set -> one bucket/band)
        words = F.concat_ws(
            " ",
            *[
                F.conv(
                    F.abs(F.xxhash64(F.col("id"), F.lit(i))) % 100_000_000,
                    10,
                    36,
                )
                for i in range(12)
            ],
        )
        hot_text = F.lit(
            "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
            "eiusmod tempor incididunt ut labore"
        )
        (
            spark.range(args.n, numPartitions=max(32, args.n // 250_000))
            .select(
                F.col("id").alias("doc_id"),
                F.when(F.col("id") < args.hot, hot_text)
                .otherwise(words)
                .alias("text"),
            )
            .write.mode("overwrite")
            .parquet(path)
        )
    docs = spark.read.parquet(path)

    shingles = word_shingles(docs, "doc_id", "text", k=3)
    sigs = minhash_signatures(shingles, n_hashes=8).localCheckpoint()
    sigs.count()  # materialize once so every variant starts equal

    def timed(label, fn):
        """Wall seconds + (count, sum-of-pair-hashes) fingerprint.

        The fingerprint doubles as the set-equality check: a
        full exceptAll between two 5e7-pair frames re-runs both LSH
        pipelines inside one plan and OOMs a 16g heap; equal counts +
        equal xxhash64 bit_xor folds over (doc1, doc2) certify multiset
        equality to collision probability ~n^2/2^64, plenty for a
        probe (the operator equality itself is exactly pinned by
        pytest on small data)."""
        t0 = time.monotonic()
        row = fn().agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-independent, cannot overflow under ANSI
            # (sum of 5e7 xxhash64 longs does)
            F.expr("bit_xor(xxhash64(doc1, doc2))").alias("hs"),
        ).collect()[0]
        sec = round(time.monotonic() - t0, 2)
        print(
            f"# {label}: {sec}s, {row['n']} pairs, hashsum {row['hs']}",
            file=sys.stderr,
            flush=True,
        )
        return sec, row["n"], row["hs"]

    sec_j, n_j, h_j = timed("join", lambda: lsh_candidate_pairs(sigs))
    sec_s, n_s, h_s = timed(
        "salted", lambda: lsh_candidate_pairs_salted(sigs, salt_buckets=args.salt)
    )
    sec_c, n_c, _ = timed(
        "capped", lambda: lsh_candidate_pairs_grouped(sigs, max_bucket=1024)
    )

    eq = 0 if (n_j == n_s and h_j == h_s) else 1

    print(
        json.dumps(
            {
                "skew_probe": {
                    "n": args.n,
                    "hot": args.hot,
                    "salt": args.salt,
                    "sec_join": sec_j,
                    "sec_salted": sec_s,
                    "sec_capped": sec_c,
                    "pairs_join": n_j,
                    "pairs_salted": n_s,
                    "pairs_capped": n_c,
                    "sets_equal": eq == 0,
                }
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
