"""J1: spatial point-in-polygon zone join (SURVEY.md §2.3 J1, §2.10 F6).

Behavioral reference: ckpronto/datamine_v2.0 ``telemetry LEFT JOIN zones ON
ST_Intersects(...)`` + ``COALESCE(zone_name, 'Haul Road / Other')``
(``STEP 4 - Feature Engineering/04_worker_script.sql:12-16``), with planar
shapely semantics normative (``STEP 3 - EDA Analysis/run_advanced_eda.py:55-70``).

Scale design: the zone list is tiny (7 polygons) and immutable — it rides
into every task as a Python closure (equivalent to a broadcast variable for
KB-scale data), and classification is a vectorized Arrow-batched pandas UDF.
No join, no shuffle: cost is a map-side scan, which is the optimal plan for
point-in-small-polygon-set at any scale.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from datamine_v2_0_spark.functions import geo as _geo
from datamine_v2_0_spark.functions.geo import classify_zones
from datamine_v2_0_spark.shipping import ship_by_value

ship_by_value(_geo)

ZONE_DEFAULT = "Haul Road / Other"


def zone_classifier(
    zones: list[tuple[int, str, list[tuple[float, float]]]],
    default: str = ZONE_DEFAULT,
):
    """Build a pandas UDF ``(lon, lat) -> zone_name`` over a fixed zone list."""

    @pandas_udf("string")
    def _classify(lon: pd.Series, lat: pd.Series) -> pd.Series:
        names = classify_zones(
            lon.to_numpy(dtype="float64", na_value=float("nan")),
            lat.to_numpy(dtype="float64", na_value=float("nan")),
            zones,
            default=default,
        )
        return pd.Series(names)

    return _classify


def movement_speed(
    lat: Column, lon: Column, ts: str | Column, w
) -> Column:
    """Planar displacement speed between consecutive rows:
    ``sqrt(dlat² + dlon²) / dt`` (the reference's haversine-free velocity,
    database_pipeline.py:288-291,500-516). Pure Column algebra over a lag
    window — no Python."""
    dlat = lat - F.lag(lat, 1).over(w)
    dlon = lon - F.lag(lon, 1).over(w)
    c = F.col(ts) if isinstance(ts, str) else ts
    micros = F.unix_micros(c)
    dt = (micros - F.lag(micros, 1).over(w)).cast("double") / F.lit(1_000_000.0)
    return F.when(dt > 0, F.sqrt(dlat * dlat + dlon * dlon) / dt)


def point_in_polygon_join(
    df: DataFrame,
    lon: str | Column,
    lat: str | Column,
    zones: list[tuple[int, str, list[tuple[float, float]]]],
    out: str = "location_type",
    default: str = ZONE_DEFAULT,
) -> DataFrame:
    """Label every row with its containing zone (default for no match)."""
    loncol = F.col(lon) if isinstance(lon, str) else lon
    latcol = F.col(lat) if isinstance(lat, str) else lat
    return df.withColumn(out, zone_classifier(zones, default)(loncol, latcol))


def grid_radius_join(
    df: DataFrame,
    lat_col: Column,
    lon_col: Column,
    id_col: str,
    radius: float,
    round_to: int = 6,
) -> DataFrame:
    """All point pairs within ``radius`` (planar coordinate units) —
    the spatial radius self-join, bucketed so it is NEVER all-pairs:
    points land in square grid cells of side ``radius``; any pair within
    the radius must then sit in the same or an adjacent cell, so
    candidates come from an equi join of one side against the other
    side's 3×3 neighborhood (a 9× explode of keys, not rows of payload),
    followed by the exact distance verify. Returns (id_a, id_b, dist)
    with id_a < id_b; full recall is guaranteed by the cell-size ≥
    radius construction (the geohash-style spatial analog of the LSH
    band join).

    Distances are planar Euclidean in the coordinate units — for
    geographic degrees over small extents, pre-scale longitude by
    cos(latitude); true spherical distances need a haversine verify,
    which the same candidate structure supports (with the lon cell width
    widened by the max |cos(lat)| factor of the data).
    """
    if radius <= 0:
        raise ValueError("radius must be positive")
    r = F.lit(float(radius))
    base = df.select(
        F.col(id_col).alias("__id"),
        lat_col.cast("double").alias("__lat"),
        lon_col.cast("double").alias("__lon"),
    ).filter(F.col("__lat").isNotNull() & F.col("__lon").isNotNull())
    cx = F.floor(F.col("__lon") / r)
    cy = F.floor(F.col("__lat") / r)
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
        ]
    )
    a = base.select(
        F.col("__id").alias("id_a"),
        F.col("__lat").alias("__lata"),
        F.col("__lon").alias("__lona"),
        cx.alias("__cx"),
        cy.alias("__cy"),
        F.explode(offsets).alias("__o"),
    ).select(
        "id_a",
        "__lata",
        "__lona",
        (F.col("__cx") + F.col("__o.dx")).alias("__kx"),
        (F.col("__cy") + F.col("__o.dy")).alias("__ky"),
    )
    b = base.select(
        F.col("__id").alias("id_b"),
        F.col("__lat").alias("__latb"),
        F.col("__lon").alias("__lonb"),
        cx.alias("__kx"),
        cy.alias("__ky"),
    )
    dlat = F.col("__lata") - F.col("__latb")
    dlon = F.col("__lona") - F.col("__lonb")
    dist = F.sqrt(dlat * dlat + dlon * dlon)
    return (
        a.join(b, ["__kx", "__ky"])
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(dist <= r)
        .select("id_a", "id_b", F.round(dist, round_to).alias("dist"))
    )
