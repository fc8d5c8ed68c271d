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
profile, runs in Spark per micro-batch: the (small) batch is broadcast
against the coded-profile DataFrame, distances are computed with
zip_with expressions, and a window argmin returns one nearest-candidate
row per batch member. The driver never holds the full profile corpus —
only the running code list (ids + small int arrays) and one batch of
profiles at a time.

This operator is driver-orchestrated by design; the gate records a
rows-only check (hand fixtures in tests/test_stats_clustering.py pin
the reference semantics).
"""

from __future__ import annotations

from itertools import zip_longest

from pyspark.sql import DataFrame, SparkSession, Window
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


def _diffs_and_denom(p1, p2, locus_count: int):
    """diffs / missing_in_either as codegen expressions over two aligned
    allele arrays ('N'/'0' = missing). NULL slots (zip_with padding when
    profile lengths differ) count as missing, so ragged inputs degrade
    to distance-100 instead of propagating NULL through the argmin."""
    miss = lambda x: x.isNull() | x.isin(*MISSING)  # noqa: E731
    diffs = F.aggregate(
        F.zip_with(
            p1, p2,
            lambda a, b: ((a != b) & ~miss(a) & ~miss(b)).cast("int"),
        ),
        F.lit(0), lambda acc, v: acc + v,
    )
    missing_in_either = F.aggregate(
        F.zip_with(p1, p2, lambda a, b: (miss(a) | miss(b)).cast("int")),
        F.lit(0), lambda acc, v: acc + v,
    )
    return diffs, F.lit(locus_count) - missing_in_either


def nearest_coded(
    batch: DataFrame,
    coded: DataFrame,
    locus_count: int,
) -> list:
    """One Spark job: for every batch profile, the nearest profile in
    ``coded`` by normalized distance (ties -> earliest insertion order).

    ``batch``:  (profile_key, profile)        — small, broadcast side.
    ``coded``:  (ins_idx, profile)            — all previously coded.
    Returns rows (profile_key, ins_idx, diffs, distance).
    """
    b = F.broadcast(batch.select(
        F.col("profile_key"), F.col("profile").alias("p2")
    ))
    pairs = coded.select(
        "ins_idx", F.col("profile").alias("p1")
    ).crossJoin(b)
    diffs, denom = _diffs_and_denom(F.col("p1"), F.col("p2"), locus_count)
    # denom == 0 (no shared non-missing loci): the reference's PDL
    # division yields inf, which its strict `< min_distance=100` can
    # never select — 100.0 here is the same "never the closest" value
    # (and avoids ANSI-mode DIVIDE_BY_ZERO).
    scored = pairs.select(
        "profile_key", "ins_idx",
        diffs.alias("diffs"),
        F.when(denom > 0, F.lit(100.0) * diffs / denom)
        .otherwise(F.lit(100.0))
        .alias("distance"),
    )
    w = Window.partitionBy("profile_key").orderBy(
        F.asc("distance"), F.asc("ins_idx")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("profile_key", "ins_idx", "diffs", "distance")
        .collect()
    )


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
            top = max((c[0] for c in codes), default=0) + 1
            return [top] + [0] * (n_comp - 1)
        prefix = codes[nearest_idx][:t_idx]
        nxt = max(
            (c[t_idx] for c in codes
             if c[:t_idx] == prefix and len(c) > t_idx),
            default=0,
        ) + 1
        code = prefix + [nxt]
        while len(code) < n_comp:
            code.append(0)
        return code

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
            for r in nearest_coded(
                prof.join(F.broadcast(lst), on="profile_key"),
                coded_src, locus_count,
            ):
                pre_nearest[r["profile_key"]] = (
                    int(r["ins_idx"]), int(r["diffs"]), float(r["distance"])
                )
        # sequential resolution inside the (bounded) batch: compare the
        # Spark-computed nearest-vs-coded candidate with batch-local
        # earlier members (at most batch_size-1 comparisons per profile)
        for key in batch_ids:
            cur = batch_rows[key]
            if not codes:
                codes.append([0] * n_comp)
                coded_ids.append(key)
                continue
            best = pre_nearest.get(key)  # (ins_idx, diffs, distance)
            for j in range(len(coded_ids) - 1, -1, -1):
                if coded_ids[j] not in batch_rows:
                    break  # older than this batch -> covered by Spark scan
                other = batch_rows[coded_ids[j]]
                d = sum(
                    1 for a, b in zip_longest(other, cur, fillvalue="N")
                    if a != b and a not in MISSING and b not in MISSING
                )
                mie = sum(
                    1 for a, b in zip_longest(other, cur, fillvalue="N")
                    if a in MISSING or b in MISSING
                )
                dist = 100.0 * d / (locus_count - mie) if locus_count > mie else 100.0
                if best is None or dist < best[2] or (
                    dist == best[2] and j < best[0]
                ):
                    best = (j, d, dist)
            nearest_idx, diffs, distance = best
            codes.append(new_code(nearest_idx, diffs, distance))
            coded_ids.append(key)

    out = [(coded_ids[i], codes[i]) for i in range(len(coded_ids))]
    prof.unpersist()
    return spark.createDataFrame(out, schema=f"{id_col} string, lincode array<int>")
