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
