"""Grid-blocked spatial neighbor join.

A spatial self-join ("which points lie within radius r of each
other") is the geometric sibling of the near-dup joins in
`operators/dedup.py`: the naive form is O(n²), and the scalable form
blocks space into cells of side r so every qualifying pair shares a
3×3 cell neighborhood. The join is then a plain EQUI-join on cell
coordinates — shuffle-partitioned, AQE-skew-splittable, never a
nested-loop — and each unordered pair is produced exactly once (the
left side stays in its own cell, the right side explodes to its nine
neighbor cells, and `id_left < id_right` keeps one orientation; a
cell can equal at most one of a point's nine neighbor cells, so no
dedup pass is needed).

Distances are computed in degree space (squared-degree threshold +
one IEEE-exact sqrt) rather than haversine: sin/cos are libm calls
whose last ulp differs across engines, which would break the
differential oracle. For production kilometers, substitute the
haversine expression at the marked line — the blocking logic is
metric-agnostic as long as the cell side ≥ the radius (in degrees,
that means cell = r / cos(max|lat|) when using a great-circle
metric).

At 100 TB: the explode is 9×, constant; everything downstream is an
equi-join whose key (cell) has bounded density for any physically
distributed point set. Hot cells (urban cores) split under AQE skew
join; for pathological single-cell density, sub-block the hot cell
by salting exactly as `operators/skew.py` does for hot aggregation
keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from stream_processing_system_spark.functions.scalar import (
    det_round,
    md5_prefix_long,
)


def derive_points(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic synthetic geolocation per id: two independent
    md5-derived uniforms over [-90, 90) lat x [-180, 180) lon at
    1e-4 degree resolution. Byte-identical in DuckDB (same md5-hex
    parse), so geospatial operators stay differentially testable
    without a real coordinates column in the test tables."""
    sid = F.col(id_col).cast("string")
    lat = (
        (md5_prefix_long(sid, salt="lat|") % F.lit(1_800_000)).cast("double")
        / F.lit(10000.0)
        - F.lit(90.0)
    )
    lon = (
        (md5_prefix_long(sid, salt="lon|") % F.lit(3_600_000)).cast("double")
        / F.lit(10000.0)
        - F.lit(180.0)
    )
    return df.select(F.col(id_col), lat.alias("lat"), lon.alias("lon"))


def neighbor_pairs(
    points: DataFrame, id_col: str, radius_deg: float = 5.0
) -> DataFrame:
    """All unordered point pairs within `radius_deg` (euclidean in
    degree space), via 3x3 grid blocking with cell side = radius.
    Output (id_a, id_b, dist_deg) with the distance det-rounded to
    6dp."""
    cell = float(radius_deg)
    cx = F.floor(F.col("lon") / F.lit(cell)).cast("long")
    cy = F.floor(F.col("lat") / F.lit(cell)).cast("long")
    left = points.select(
        F.col(id_col).alias("_ida"),
        F.col("lat").alias("_lata"),
        F.col("lon").alias("_lona"),
        cx.alias("_cx"),
        cy.alias("_cy"),
    )
    offsets = F.expr(
        "array(-1L, 0L, 1L)"
    )
    right = (
        points.select(
            F.col(id_col).alias("_idb"),
            F.col("lat").alias("_latb"),
            F.col("lon").alias("_lonb"),
            cx.alias("_bx"),
            cy.alias("_by"),
        )
        .withColumn("_dx", F.explode(offsets))
        .withColumn("_dy", F.explode(offsets))
        .select(
            "_idb",
            "_latb",
            "_lonb",
            (F.col("_bx") + F.col("_dx")).alias("_cx"),
            (F.col("_by") + F.col("_dy")).alias("_cy"),
        )
    )
    dlat = F.col("_lata") - F.col("_latb")
    dlon = F.col("_lona") - F.col("_lonb")
    # swap in haversine here for great-circle kilometers (see module
    # docstring for the cell-size consequence)
    d2 = dlat * dlat + dlon * dlon
    return (
        left.join(right, ["_cx", "_cy"])
        .where(F.col("_ida") < F.col("_idb"))
        .where(d2 <= F.lit(float(radius_deg) * float(radius_deg)))
        .select(
            F.col("_ida").alias("id_a"),
            F.col("_idb").alias("id_b"),
            det_round(F.sqrt(d2)).alias("dist_deg"),
        )
    )


#: Geohash base32 alphabet (public algorithm, Niemeyer 2008).
GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_expr(lat, lon, precision: int = 2):
    """Geohash encode as a pure codegen'd integer expression — the
    standard public algorithm (bisection bits of lon and lat
    interleaved MSB-first starting with lon, grouped into 5-bit
    base32 chars), with the bisections collapsed into one floor per
    axis: `precision` chars carry 5p bits, lon gets ceil(5p/2), lat
    gets floor(5p/2), and k successive bisections of an interval
    are exactly `floor(fraction * 2^k)`. No UDF: at 100 TB the
    encode rides the parquet scan inside whole-stage codegen. The
    expression tree (shift/mask interleave, element_at alphabet
    lookup) is mirrored as integer arithmetic in the SQL oracles."""
    nbits = 5 * precision
    lon_bits = (nbits + 1) // 2
    lat_bits = nbits // 2
    lon_int = F.floor(
        (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(2**lon_bits))
    ).cast("long")
    lat_int = F.floor(
        (lat + F.lit(90.0)) / F.lit(180.0) * F.lit(float(2**lat_bits))
    ).cast("long")
    combined = F.lit(0).cast("long")
    for i in range(lon_bits):  # lon bit i (MSB first) → position 2i
        combined = combined + F.shiftright(lon_int, lon_bits - 1 - i).bitwiseAND(
            F.lit(1)
        ) * F.lit(2 ** (nbits - 1 - 2 * i))
    for i in range(lat_bits):  # lat bit i (MSB first) → position 2i+1
        combined = combined + F.shiftright(lat_int, lat_bits - 1 - i).bitwiseAND(
            F.lit(1)
        ) * F.lit(2 ** (nbits - 2 - 2 * i))
    alpha = F.array(*[F.lit(c) for c in GEOHASH32])
    chars = [
        F.element_at(
            alpha,
            F.shiftright(combined, nbits - 5 * (g + 1))
            .bitwiseAND(F.lit(31))
            .cast("int")
            + F.lit(1),
        )
        for g in range(precision)
    ]
    return F.concat(*chars)
