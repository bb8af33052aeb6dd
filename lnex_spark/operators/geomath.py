"""Geo math (X1): haversine distance + point-in-bbox, as pure column
expressions (reference: LNEx/geo_calculations.py — mount empty; the
formulas are textbook). Whole-stage-codegen'd built-ins, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EARTH_RADIUS_KM = 6371.0


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = (
        F.sin(dlat / 2) ** 2
        + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * F.sin(dlon / 2) ** 2
    )
    return F.lit(2 * EARTH_RADIUS_KM) * F.asin(F.sqrt(a))


def in_bbox(lat: Column, lon: Column, bbox: list[float]) -> Column:
    mn_lat, mn_lon, mx_lat, mx_lon = bbox
    return lat.between(mn_lat, mx_lat) & lon.between(mn_lon, mx_lon)


def grid_nearest_join(
    points,
    sites,
    cell_deg: float = 8.0,
    point_id: str = "pid",
    site_id: str = "site_id",
):
    """Grid-bucketed nearest-neighbor spatial join: for each point the
    closest site (haversine) *within its 3x3 cell neighborhood* — the
    reverse-geocoding step that attaches every extracted mention's
    coordinates to its nearest gazetteer entry.

    Scale shape: the naive form is a cross join (|points| x |sites|).
    Here each site is replicated into its 9 neighbor cells (build side
    grows 9x — still dimension-sized) and each point probes exactly
    its own cell, so per-point candidates are bounded by neighborhood
    density, independent of |sites|; the join is broadcast and the
    fact side never shuffles.  argmin is a struct-min AGGREGATION
    (map-side partials), not a ranking window.  Sites beyond one cell
    are out of scope by construction — choose cell_deg >= the maximum
    match radius, the standard contract of a bounded spatial join.

    Expects ``points(point_id, lat, lon)`` and
    ``sites(site_id, lat, lon)``; returns (point_id, site, dist_km).
    """
    from pyspark.sql import functions as F

    offs = F.array(*[F.lit(i) for i in (-1, 0, 1)])
    s9 = (
        sites.select(
            F.col(site_id).alias("site"),
            F.col("lat").alias("slat"),
            F.col("lon").alias("slon"),
            F.floor(F.col("lat") / cell_deg).cast("int").alias("c0lat"),
            F.floor(F.col("lon") / cell_deg).cast("int").alias("c0lon"),
        )
        .withColumn("dlat", F.explode(offs))
        .withColumn("dlon", F.explode(offs))
        .select(
            "site",
            "slat",
            "slon",
            (F.col("c0lat") + F.col("dlat")).alias("cell_lat"),
            (F.col("c0lon") + F.col("dlon")).alias("cell_lon"),
        )
    )
    p = points.select(
        F.col(point_id).alias("pid_"),
        F.col("lat").alias("plat"),
        F.col("lon").alias("plon"),
        F.floor(F.col("lat") / cell_deg).cast("int").alias("cell_lat"),
        F.floor(F.col("lon") / cell_deg).cast("int").alias("cell_lon"),
    )
    d = haversine_km(F.col("plat"), F.col("plon"), F.col("slat"), F.col("slon"))
    return (
        p.join(F.broadcast(s9), ["cell_lat", "cell_lon"])
        .select("pid_", F.struct(d.alias("dist"), F.col("site")).alias("ds"))
        .groupBy("pid_")
        .agg(F.min("ds").alias("m"))
        .select(
            F.col("pid_").alias(point_id),
            F.col("m.site").alias("site"),
            F.round(F.col("m.dist"), 4).alias("dist_km"),
        )
    )
