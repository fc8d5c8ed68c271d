"""DSIR hash-family agreement: md5 vs xxhash64 selection overlap.

The xxhash64 bucket family (operators/corpus.py:hashed_gram_buckets,
hash_family='xxhash64') is the JVM-native serving path; md5 is the
oracle-portable gate family. Both hash the same gram stream into the
same bucket count, so their fitted importance models — and therefore
the Gumbel top-k selections — should agree up to bucket-collision
noise. This probe quantifies that agreement at scale: fit + score +
select with each family on the same corpus tier, then report
|A ∩ B| / k plus the Spearman-ish sanity signal of how many of one
family's top-k land in the other's top-2k (selection-boundary noise
vs genuine model disagreement).

    python tools/dsir_overlap.py --n 1000000 --out /tmp/scale_bench

Prints one JSON line:
    {"dsir_overlap": {"n": ..., "k": ..., "topk_overlap": ...,
     "top2k_containment": ..., "sec_md5": ..., "sec_xx": ...}}
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
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--out", default="/tmp/scale_bench")
    ap.add_argument("--buckets", type=int, default=10_000)
    args = ap.parse_args()

    from bigsdb_spark.operators.corpus import (
        dsir_log_ratios,
        dsir_scores,
        gumbel_topk,
        hashed_gram_buckets,
    )

    spark = get_spark("dsir_overlap")
    spark.sparkContext.setLogLevel("ERROR")

    p = f"{args.out}/docs_{args.n}"
    if not os.path.exists(os.path.join(p, "_SUCCESS")):
        from scale_bench import _gen_documents

        _gen_documents(spark, args.n, p)
    docs = spark.read.parquet(p)
    target = docs.filter(F.col("doc_id") % 10 == 0).select("doc_id")
    k = args.n // 10

    sels: dict[str, object] = {}
    secs: dict[str, float] = {}
    for fam in ("md5", "xxhash64"):
        t0 = time.monotonic()
        grams = hashed_gram_buckets(
            docs, "doc_id", "text", buckets=args.buckets, hash_family=fam
        )
        ratios = dsir_log_ratios(grams, target, "doc_id", buckets=args.buckets)
        scored = dsir_scores(grams, ratios, "doc_id")
        # localCheckpoint: the top-2k containment check below re-reads
        # the scored frame; don't recompute the gram explode twice
        scored = scored.localCheckpoint(eager=True)
        sel = gumbel_topk(scored, "doc_id", "dsir_logw", k=k).select("doc_id")
        sel = sel.localCheckpoint(eager=True)
        secs[fam] = round(time.monotonic() - t0, 2)
        sels[fam] = (scored, sel)
        print(f"# {fam}: fit+score+select {secs[fam]}s", file=sys.stderr, flush=True)

    (scored_md5, sel_md5), (scored_xx, sel_xx) = sels["md5"], sels["xxhash64"]
    inter = sel_md5.join(sel_xx, "doc_id").count()
    # boundary-noise view: md5's top-k inside xxhash64's top-2k
    top2k_xx = gumbel_topk(scored_xx, "doc_id", "dsir_logw", k=2 * k).select(
        "doc_id"
    )
    contain = sel_md5.join(top2k_xx, "doc_id").count()

    print(
        json.dumps(
            {
                "dsir_overlap": {
                    "n": args.n,
                    "k": k,
                    "topk_overlap": round(inter / k, 4),
                    "top2k_containment": round(contain / k, 4),
                    "sec_md5": secs["md5"],
                    "sec_xx": secs["xxhash64"],
                }
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
