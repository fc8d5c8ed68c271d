"""Geography point lookup + reverse containment (SURVEY §2 P12 family).

Reference: the ``geography_point_lookup`` table maps (country_code,
field, value) -> a PostGIS point (sql/isolatedb_geocoding.sql:7-21,
UNIQUE on the key), and ``Datastore.pm:3977-4004``
(``lookup_geography_point``) resolves a record's field value to that
point by exact match OR case-insensitive match on the value, after
translating the record's country to its iso2 code.
``convert_coordinates_to_geography`` / ``get_geography_coordinates``
(:3955-3975) are the (lat, long) <-> point conversions — here a point
is simply a ``struct<lat:double, long:double>`` column, so those two
are ``F.struct`` / field access and need no functions.

Spark shape: the lookup table is curator-maintained and tiny (one row
per named place) — a BROADCAST join against the isolate frame, never a
shuffle of the big side. The reference's single-row OR query is
nondeterministic when an exact-case row and a different-case row both
exist; here exact match wins, then the case-insensitive candidate
(deduplicated to the lexicographically first value per key, so the
result is stable).
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def lookup_geography_points(
    isolates: DataFrame,
    lookup: DataFrame,
    field: str,
    country_col: str = "country",
    iso2: dict[str, str] | None = None,
) -> DataFrame:
    """Adds ``latitude`` / ``longitude`` columns resolved from the
    geocoding lookup (NULL where no match — the reference logs and
    skips those).

    ``lookup``: (country_code, field, value, latitude, longitude) —
    the geography_point_lookup table with the point split into its
    coordinates. ``iso2``: country-name -> iso2 map (the reference's
    COUNTRIES constant); pass None when ``country_col`` already holds
    codes.
    """
    if iso2:
        code = F.create_map(
            *[F.lit(x) for x in chain.from_iterable(iso2.items())]
        )[F.col(country_col)]
    else:
        code = F.col(country_col)
    src = isolates.withColumn("_cc", code)
    lk = lookup.filter(F.col("field") == field).select(
        F.col("country_code").alias("_cc"),
        F.col("value").alias("_val"),
        F.col("latitude").alias("_lat"),
        F.col("longitude").alias("_long"),
    )
    # case-insensitive tier, deduplicated for a deterministic winner
    w = Window.partitionBy("_cc", F.upper(F.col("_val"))).orderBy("_val")
    lk_ci = (
        lk.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "_cc",
            F.upper(F.col("_val")).alias("_uval"),
            F.col("_lat").alias("_lat_ci"),
            F.col("_long").alias("_long_ci"),
        )
    )
    out = (
        src.join(
            F.broadcast(lk),
            (src["_cc"] == lk["_cc"]) & (F.col(field) == F.col("_val")),
            "left",
        )
        .drop(lk["_cc"])
        .drop("_val")
        .join(
            F.broadcast(lk_ci),
            (src["_cc"] == lk_ci["_cc"])
            & (F.upper(F.col(field)) == F.col("_uval")),
            "left",
        )
        .drop(lk_ci["_cc"])
        .drop("_uval")
    )
    return (
        out.withColumn("latitude", F.coalesce("_lat", "_lat_ci"))
        .withColumn("longitude", F.coalesce("_long", "_long_ci"))
        .drop("_cc", "_lat", "_long", "_lat_ci", "_long_ci")
    )


def reverse_geocode_bbox(
    points: DataFrame,
    boxes: DataFrame,
    id_col: str,
    lat_col: str = "latitude",
    lon_col: str = "longitude",
) -> DataFrame:
    """Inverse lookup for dashboard maps: point -> containing region by
    bounding box (the reference renders dashboard maps by aggregating
    per country/region; without PostGIS the box test is the containment
    primitive). ``boxes``: (region, min_lat, max_lat, min_lon, max_lon)
    — a broadcast dimension, so the containment join is a broadcast
    nested-loop over a tiny side, never a cartesian of two big frames.
    Overlapping boxes resolve to the SMALLEST area (most specific
    region); unmatched points keep a NULL region.
    """
    b = F.broadcast(
        boxes.withColumn(
            "_area",
            (F.col("max_lat") - F.col("min_lat"))
            * (F.col("max_lon") - F.col("min_lon")),
        )
    )
    j = points.join(
        b,
        F.col(lat_col).between(F.col("min_lat"), F.col("max_lat"))
        & F.col(lon_col).between(F.col("min_lon"), F.col("max_lon")),
        "left",
    )
    w = Window.partitionBy(id_col).orderBy(
        F.asc_nulls_last("_area"), F.asc("region")
    )
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_area", "min_lat", "max_lat", "min_lon", "max_lon")
    )
