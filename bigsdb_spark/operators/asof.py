"""As-of join (nearest-earlier / nearest-later match per key).

Beyond-reference extension for the event-stream side of the corpus
(TESTDATA ``events``): join each left row to the single right row with
the largest ``right_ts <= left_ts`` (backward, the default) or the
smallest ``right_ts >= left_ts`` (forward) within the same key — the
time-series primitive Spark has no built-in operator for (DuckDB/kdb/
pandas ``merge_asof`` semantics; generalizes the reference's
interval-containment join, SURVEY J10, from stabbing an interval table
to stabbing the most recent state row).

Scale shape — ONE shuffle, NO join: a range/theta join (``l.key = r.key
AND r.ts <= l.ts`` + argmax) would shuffle both sides into a join whose
within-key cost is O(|L|·|R|) before the argmax window prunes it.
Instead both sides are unioned and sorted once per key, and the match
is a running ``last(..., ignorenulls=True)`` carry-forward window — the
classic sort-merge formulation: cost O((|L|+|R|) log) in the per-key
sort, memory O(1) per row (the running frame is
``rowsBetween(unboundedPreceding, currentRow)``, which Spark evaluates
incrementally, never materializing the frame).  Skewed keys are the
caveat at 100 TB: one key = one task for the window sort, so salt the
key upstream if a single key's history exceeds a task (the same
contract as every windowed operator in this repo).

Tie rule: a right row AT the left row's timestamp matches in both
directions (DuckDB ASOF ``>=`` / pandas ``allow_exact_matches=True``);
among right rows tied on ``right_ts`` the greatest payload struct
(field-wise order) wins deterministically.  ``tolerance`` bounds the
match distance —
a matched row farther than ``tolerance`` (in the ts column's own
units) yields the unmatched (NULL) result instead, exactly pandas
``merge_asof(tolerance=...)``.

NULL timestamps never participate (DuckDB ASOF / pandas ``merge_asof``
semantics): NULL-ts right rows are filtered before the union, and
NULL-ts left rows come back unmatched — without the guard the sort
default (nulls-first asc / nulls-last desc) would hand them spurious
matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    direction: str = "backward",
    tolerance=None,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row comes back exactly once, with
    the matched right row's payload columns (suffixed on collision) or
    NULLs when no right row qualifies.

    ``on``: equi-key column(s) present on both sides.  ``tolerance``:
    max allowed ``|left_ts - right_ts|`` in the ts column's units
    (e.g. an interval literal for timestamps, a number for numerics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    payload = [c for c in right.columns if c not in keys and c != right_ts]
    out_names = {
        c: (c + suffix if c in left.columns else c) for c in payload
    }
    matched_ts = (
        right_ts + suffix if right_ts in left.columns else right_ts
    )

    # union frame: left rows carry a marker struct NULL, right rows pack
    # (ts, payload...) into it.  Sorting right-before-left on ts ties
    # makes an equal-ts right row visible to the left row in BACKWARD
    # mode (and left-before-right in forward mode, via the reversed
    # ordering below).
    r_struct = F.struct(
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(c) for c in payload],
    )
    r_rows = right.filter(F.col(right_ts).isNotNull()).select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__is_left"),
        r_struct.alias("__r"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
          for c in left.columns],
    )
    l_rows = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r_rows.schema["__r"].dataType).alias("__r"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    both = r_rows.unionByName(l_rows)

    # the trailing __r sort makes the winner among right rows TIED on
    # ts deterministic (greatest payload struct, field-wise order);
    # left rows sort after every tied right row via __is_left either way
    if direction == "backward":
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.asc("__t"), F.asc("__is_left"), F.asc_nulls_last("__r"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        w = (
            Window.partitionBy(*keys)
            .orderBy(F.desc("__t"), F.asc("__is_left"), F.asc_nulls_last("__r"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    carried = F.when(
        F.col("__t").isNotNull(), F.last("__r", ignorenulls=True).over(w)
    )
    out = both.withColumn("__m", carried).filter(F.col("__is_left") == 1)
    if tolerance is not None:
        gap = (
            F.col("__t") - F.col("__m.__ts")
            if direction == "backward"
            else F.col("__m.__ts") - F.col("__t")
        )
        out = out.withColumn(
            "__m", F.when(gap <= tolerance, F.col("__m"))
        )
    return out.select(
        *[F.col(f"__l_{c}").alias(c) for c in left.columns],
        F.col("__m.__ts").alias(matched_ts),
        *[F.col(f"__m.{c}").alias(out_names[c]) for c in payload],
    )
