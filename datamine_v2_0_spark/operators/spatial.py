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
