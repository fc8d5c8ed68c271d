"""LIN code assignment (SURVEY §2.5 D5).

Reference: scripts/maintenance/lincodes.pl:177-330. LIN codes are
hierarchical multi-threshold lineage codes. Profiles are processed in a
FIXED order (profile id ascending, lincodes.pl:362-368); each new
profile finds its closest already-coded profile and inherits a code
prefix. Reference semantics reproduced exactly:

- missing alleles ('N') are mapped to 0 (lincodes.pl:186 ``%missing``);
- diffs between two profiles count positions where both sides are
  non-missing and differ: ``sum((p1!=p2)&(p1!=0)&(p2!=0))``
  (lincodes.pl:249);
- the distance is NORMALIZED by the non-missing denominator:
  ``100*diffs/(locus_count - missing_in_either)`` (lincodes.pl:251);
- ties go to the earliest-coded profile (strict ``<`` on distance,
  lincodes.pl:252);
- ``diffs == 0`` reuses the closest profile's code verbatim — identical
  profiles share a LIN code, nothing else does (lincodes.pl:258-260);
- the FIRST profile gets all zeros (lincodes.pl:194);
- identity = 100 - min_distance is binned against the scheme's identity
  thresholds ``100*(L-d)/L`` per diff threshold d (lincodes.pl:499-517);
  threshold_index = number of identity thresholds passed in order;
- threshold_index == 0 -> new top-level lineage (max first component
  + 1); otherwise inherit the closest code's first threshold_index
  components and increment the component AT threshold_index among codes
  sharing that prefix (lincodes.pl increment_lincode:300-330).

The assignment loop is inherently sequential (each result depends on
all previous ones), so codes are resolved in order — but the expensive
part, the distance scan of each new profile against every already-coded
profile, runs in Spark per micro-batch: the (small) batch rides in an
Arrow UDF closure over the coded-profile DataFrame, each partition
computes the vectorized pairwise distances and emits a per-partition
partial argmin (one candidate row per batch member), and the driver
merges n_partitions x batch candidates. The driver never holds the
full profile corpus — only the running code list (ids + small int
arrays) and one batch of profiles at a time.

This operator is driver-orchestrated by design; the gate records a
rows-only check (hand fixtures in tests/test_stats_clustering.py pin
the reference semantics).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MISSING = ("N", "0")


def lincode_prefix_counts(
    assignments: DataFrame,
    id_col: str = "profile_key",
    code_col: str = "lincode",
) -> DataFrame:
    """LIN-code prefix rollup — the hierarchy the reference's LINvis
    plugin assembles node-by-node on the driver
    (Plugins/LINvis.pm:238-307: prefixes joined with '_', one tree node
    per prefix at every depth, value = isolate count under the prefix).

    Spark shape: each code explodes into its ``depth`` prefixes, then
    ONE groupBy counts members per (depth, prefix) — map-side combined,
    no tree walking. ``parent`` links each node to its depth-1 prefix
    (NULL at the root level), which is all a sunburst/circle-packing
    renderer needs. Returns (depth, prefix, parent, n_members).
    """
    code = F.col(code_col)
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(code)),
        lambda d: F.array_join(F.slice(code, F.lit(1), d), "_"),
    )
    exploded = assignments.select(
        F.col(id_col), F.posexplode(prefixes).alias("_d0", "prefix")
    ).select(
        F.col(id_col),
        (F.col("_d0") + 1).alias("depth"),
        "prefix",
        F.when(
            F.col("_d0") > 0,
            F.expr("substring_index(prefix, '_', _d0)"),
        ).alias("parent"),
    )
    return exploded.groupBy("depth", "prefix", "parent").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )


def lincode_hierarchy(counts: DataFrame) -> dict:
    """Assemble the LINvis nested-JSON hierarchy (root -> children with
    name/value) from the prefix-count frame. The aggregated node set is
    download-sized (it feeds a browser visualization), so assembly is
    driver-side; the counting above is the distributed part."""
    rows = sorted(
        counts.collect(), key=lambda r: (r["depth"], str(r["prefix"]))
    )
    root: dict = {"name": "root", "children": []}
    by_prefix: dict[str, dict] = {}
    for r in rows:
        node = {"name": r["prefix"], "value": r["n_members"], "children": []}
        by_prefix[r["prefix"]] = node
        parent = by_prefix.get(r["parent"]) if r["parent"] else root
        (parent if parent is not None else root)["children"].append(node)
    return root


def _pad_profiles(profiles: list, width: int, chars: int):
    """Profiles -> a fixed-width numpy string matrix padded with 'N'
    (missing), plus the per-profile true lengths."""
    import numpy as np

    mat = np.full((len(profiles), width), "N", dtype=f"<U{max(chars, 1)}")
    lens = np.zeros(len(profiles), dtype=np.int64)
    for i, p in enumerate(profiles):
        mat[i, : len(p)] = ["N" if a is None else a for a in p]
        lens[i] = len(p)
    return mat, lens


def nearest_coded(
    batch_rows: dict,
    coded: DataFrame,
    locus_count: int,
) -> list:
    """One Spark job: for every batch profile, the nearest profile in
    ``coded`` by normalized distance (ties -> earliest insertion order).

    ``batch_rows``: {profile_key: profile} — small; rides to every task
    as padded numpy matrices in the UDF closure.
    ``coded``: (ins_idx, profile) DataFrame — all previously coded,
    scanned distributed.  Each partition computes vectorized pairwise
    diff / missing counts against the whole batch (fixed-width numpy
    string matrices, coded side in <=2048-row blocks to bound the
    boolean temporaries) and emits ONE candidate row per batch profile
    — a per-partition partial argmin — so the driver merge sees only
    n_partitions x |batch| rows.  An expression-level
    zip_with/aggregate fold here stays INTERPRETED (higher-order
    functions don't enter whole-stage codegen) and measured ~2e5
    pairs/s; this Arrow pass does the same scan at numpy speed.

    Distance semantics (reference lincodes.pl:249-252): diffs count
    slots where both sides are non-missing ('N'/'0') and differ;
    missing_in_either counts missing slots over max(len(p1), len(p2))
    zip slots (a shorter profile's tail is missing);
    distance = 100*diffs/(locus_count - missing_in_either), or 100.0
    when the denominator is zero (the reference's inf can never win
    its strict '<' argmin — 100.0 is the same "never the closest",
    without the division).

    Returns dict rows (profile_key, ins_idx, diffs, distance).
    """
    import numpy as np
    import pandas as pd

    keys = list(batch_rows)
    bprofiles = [batch_rows[k] for k in keys]
    bchars = max(
        (len(a) for p in bprofiles for a in p if a is not None), default=1
    )
    width = max(locus_count, max((len(p) for p in bprofiles), default=0))
    bmat, blen = _pad_profiles(bprofiles, width, bchars)
    bmiss = (bmat == "N") | (bmat == "0")
    q = len(keys)

    def _scan(pdfs):
        best_dist = np.full(q, np.inf)
        best_ins = np.full(q, np.iinfo(np.int64).max, dtype=np.int64)
        best_diffs = np.zeros(q, dtype=np.int64)
        seen = False
        for pdf in pdfs:
            for lo in range(0, len(pdf), 2048):
                chunk = pdf.iloc[lo : lo + 2048]
                profs = chunk["profile"].tolist()
                if not profs:
                    continue
                seen = True
                chars = max(
                    bchars,
                    max(
                        (len(a) for p in profs for a in p if a is not None),
                        default=1,
                    ),
                )
                w2 = max(width, max(len(p) for p in profs))
                pmat, plen = _pad_profiles(profs, w2, chars)
                if w2 > width:
                    bm = np.full((q, w2), "N", dtype=pmat.dtype)
                    bm[:, :width] = bmat
                    bms = (bm == "N") | (bm == "0")
                else:
                    bm, bms = bmat, bmiss
                miss = (
                    (pmat == "N") | (pmat == "0")
                )[:, None, :] | bms[None, :, :]
                d = ((pmat[:, None, :] != bm[None, :, :]) & ~miss).sum(
                    axis=2
                )
                mie = miss.sum(axis=2) - (
                    w2 - np.maximum(plen[:, None], blen[None, :])
                )
                denom = locus_count - mie
                dist = np.where(
                    denom > 0, 100.0 * d / np.where(denom > 0, denom, 1), 100.0
                )
                ins = chunk["ins_idx"].to_numpy(dtype=np.int64)
                # chunk argmin per batch column, ties -> lowest ins_idx
                # (partition row order is NOT ins order: the coded
                # frame comes from a join)
                colmin = dist.min(axis=0)
                ins_masked = np.where(
                    dist == colmin, ins[:, None], np.iinfo(np.int64).max
                )
                jrow = ins_masked.argmin(axis=0)
                cols = np.arange(q)
                c_ins = ins_masked[jrow, cols]
                c_d = d[jrow, cols]
                better = (colmin < best_dist) | (
                    (colmin == best_dist) & (c_ins < best_ins)
                )
                best_dist = np.where(better, colmin, best_dist)
                best_ins = np.where(better, c_ins, best_ins)
                best_diffs = np.where(better, c_d, best_diffs)
        if seen:
            yield pd.DataFrame(
                {
                    "qi": np.arange(q, dtype=np.int32),
                    "ins_idx": best_ins,
                    "diffs": best_diffs,
                    "distance": best_dist,
                }
            )

    partial = coded.mapInPandas(
        _scan, schema="qi int, ins_idx long, diffs long, distance double"
    ).collect()
    best: dict[int, tuple] = {}
    for r in partial:
        cand = (r["distance"], r["ins_idx"], r["diffs"])
        cur = best.get(r["qi"])
        if cur is None or (cand[0], cand[1]) < (cur[0], cur[1]):
            best[r["qi"]] = cand
    return [
        {
            "profile_key": keys[qi],
            "ins_idx": int(b[1]),
            "diffs": int(b[2]),
            "distance": float(b[0]),
        }
        for qi, b in best.items()
    ]


def assign_lincodes(
    spark: SparkSession,
    profiles: DataFrame,
    thresholds: list[int],
    id_col: str = "profile_key",
    profile_col: str = "profile",
    locus_count: int | None = None,
    batch_size: int = 256,
) -> DataFrame:
    """Returns (profile_key, lincode array<int>) per the reference
    algorithm above. ``thresholds`` are the scheme's diff thresholds in
    scheme order (largest first, e.g. [4, 2, 1, 0])."""
    n_comp = len(thresholds)

    # stream ordered id BATCHES through toLocalIterator — the driver
    # holds one partition of keys at a time, never the full O(n) id
    # list (sorted output arrives in partition order = global order)
    def _id_batches():
        batch: list = []
        for r in (
            profiles.select(F.col(id_col).alias("k"))
            .orderBy("k")
            .toLocalIterator()
        ):
            batch.append(r[0])
            if len(batch) == batch_size:
                yield batch
                batch = []
        if batch:
            yield batch

    if profiles.isEmpty():
        return spark.createDataFrame(
            [], schema=f"{id_col} string, lincode array<int>"
        )
    if locus_count is None:
        # the scheme's locus count: with ragged profile vectors the max
        # length is the deterministic analog (head() on an unordered
        # frame would make the normalized distances — and therefore the
        # codes — depend on partition order)
        locus_count = profiles.agg(
            F.max(F.size(profile_col))
        ).head()[0]
    identity_thresholds = [
        100.0 * (locus_count - d) / locus_count for d in thresholds
    ]
    prof = profiles.select(
        F.col(id_col).alias("profile_key"), F.col(profile_col).alias("profile")
    ).cache()
    prof.count()

    codes: list[list[int]] = []
    coded_ids: list = []
    # incremental allocation counters — the naive forms ("max first
    # component over all codes", "max component t among codes sharing
    # my prefix": lincodes.pl:300-330 runs SQL max() queries for these)
    # would be an O(total codes) driver scan PER profile, i.e. O(n^2)
    # interpreter time that measured 30+ s/batch at 1e4 profiles.
    # top_max tracks the first component; next_at[prefix] tracks the
    # max used component right after that prefix.
    top_max = 0
    next_at: dict[tuple, int] = {}

    def note_code(code: list[int]) -> list[int]:
        nonlocal top_max
        top_max = max(top_max, code[0])
        for t in range(1, n_comp):
            key = tuple(code[:t])
            if code[t] > next_at.get(key, 0):
                next_at[key] = code[t]
        return code

    def new_code(nearest_idx: int | None, diffs: int, distance: float):
        if nearest_idx is not None and diffs == 0:
            return list(codes[nearest_idx])  # identical -> same code
        identity = 100.0 - distance
        t_idx = 0
        for t_ident in identity_thresholds:
            if identity >= t_ident:
                t_idx += 1
            else:
                break
        # identity can pass EVERY threshold with diffs > 0 (d <= the
        # tightest diff threshold). The reference's unchecked array
        # indexing appends an extra component there (lincodes.pl:304
        # reads one slot past the scheme's length); we cap at the last
        # component so codes keep the scheme's declared length.
        t_idx = min(t_idx, n_comp - 1) if n_comp > 0 else 0
        if t_idx == 0 or nearest_idx is None:
            return [top_max + 1] + [0] * (n_comp - 1)
        prefix = codes[nearest_idx][:t_idx]
        nxt = next_at.get(tuple(prefix), 0) + 1
        code = prefix + [nxt]
        while len(code) < n_comp:
            code.append(0)
        return code

    import numpy as np

    for batch_ids in _id_batches():
        lst = spark.createDataFrame([(i,) for i in batch_ids], ["profile_key"])
        batch_rows = {
            r[0]: r[1]
            for r in prof.join(F.broadcast(lst), on="profile_key").collect()
        }
        # Spark-side scan vs all profiles coded BEFORE this batch
        pre_nearest: dict = {}
        if codes:
            coded_src = prof.join(
                F.broadcast(
                    spark.createDataFrame(
                        list(enumerate(coded_ids)), ["ins_idx", "profile_key"]
                    )
                ),
                on="profile_key",
            ).select("ins_idx", "profile")
            for r in nearest_coded(batch_rows, coded_src, locus_count):
                pre_nearest[r["profile_key"]] = (
                    int(r["ins_idx"]), int(r["diffs"]), float(r["distance"])
                )
        # sequential resolution inside the (bounded) batch, vectorized:
        # each profile compares against the batch members coded before
        # it in ONE numpy pass (the old per-pair python loop was
        # O(batch^2 * loci) of interpreter time — at batch 1024 it cost
        # more than the Spark scan it complements). Profiles are padded
        # to a common width with 'N'; the zip_longest semantics (slots
        # beyond the longer profile don't count as missing) are
        # restored by subtracting the per-pair padding from mie.
        width = max(
            locus_count,
            max((len(v) for v in batch_rows.values()), default=0),
        )
        # dtype width = longest allele string in the batch (a fixed
        # width would silently truncate long allele identifiers)
        chars = max(
            (len(a) for v in batch_rows.values() for a in v if a is not None),
            default=1,
        )
        sdt = f"<U{max(chars, 1)}"
        bmat = np.full((len(batch_ids), width), "N", dtype=sdt)
        blen = np.zeros(len(batch_ids), dtype=np.int64)
        base_idx = len(codes)
        k = 0  # batch members coded so far
        for key in batch_ids:
            cur = batch_rows[key]
            arr = np.full(width, "N", dtype=sdt)
            arr[: len(cur)] = ["N" if a is None else a for a in cur]
            amiss = (arr == "N") | (arr == "0")
            if not codes:
                codes.append(note_code([0] * n_comp))
                coded_ids.append(key)
                bmat[k], blen[k] = arr, len(cur)
                k += 1
                continue
            best = pre_nearest.get(key)  # (ins_idx, diffs, distance)
            if k:
                sub, sublen = bmat[:k], blen[:k]
                miss = (sub == "N") | (sub == "0") | amiss
                d = ((sub != arr) & ~miss).sum(axis=1)
                mie = miss.sum(axis=1) - (
                    width - np.maximum(sublen, len(cur))
                )
                denom = locus_count - mie
                dist = np.where(
                    denom > 0, 100.0 * d / np.where(denom > 0, denom, 1), 100.0
                )
                j = int(np.argmin(dist))  # ties -> earliest batch member
                cand = (base_idx + j, int(d[j]), float(dist[j]))
                if (
                    best is None
                    or cand[2] < best[2]
                    or (cand[2] == best[2] and cand[0] < best[0])
                ):
                    best = cand
            nearest_idx, diffs, distance = best
            codes.append(note_code(new_code(nearest_idx, diffs, distance)))
            coded_ids.append(key)
            bmat[k], blen[k] = arr, len(cur)
            k += 1

    out = [(coded_ids[i], codes[i]) for i in range(len(coded_ids))]
    prof.unpersist()
    return spark.createDataFrame(out, schema=f"{id_col} string, lincode array<int>")
