"""WKT point render/parse helpers (Column-level, no UDFs).

The reference stores positions as PostGIS ``GEOGRAPHY(POINTZ, 4326)`` and
round-trips them through text: ``ST_AsText(position)`` on export
(``STEP 5 - CPD/05_export_features_to_parquet.py:199``) and
``ST_GeogFromText`` on load (``00_database_setup.sql:16-22``), consuming
coordinates via ``ST_X/ST_Y/ST_Z`` (``database_pipeline.py:101-103``).
Here the storage form is a plain struct; these helpers provide the same
text boundary: fixed-precision render (deterministic across engines,
unlike bare double→string casts) and regexp parse back to a struct.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_NUM = r"(-?\d+\.?\d*)"


def wkt_point(
    lon: Column, lat: Column, alt: Column | None = None, precision: int = 6
) -> Column:
    """Render ``POINT (x y)`` / ``POINT Z (x y z)`` at fixed precision.
    NULL in any coordinate → NULL (matching ST_AsText on NULL)."""
    p = f"%.{precision}f"
    if alt is None:
        out = F.format_string(f"POINT ({p} {p})", lon, lat)
        nulls = lon.isNull() | lat.isNull()
    else:
        out = F.format_string(f"POINT Z ({p} {p} {p})", lon, lat, alt)
        nulls = lon.isNull() | lat.isNull() | alt.isNull()
    return F.when(nulls, F.lit(None)).otherwise(out)


def parse_wkt_point(col: Column) -> Column:
    """Parse ``POINT (x y)`` or ``POINT Z (x y z)`` text into a
    struct(lon, lat, alt); alt is NULL for 2-D points, malformed text
    parses to NULL fields (regexp_extract misses → empty → try_cast
    NULL, never a throw under ANSI mode)."""
    pat2 = rf"POINT\s*\(\s*{_NUM}\s+{_NUM}\s*\)"
    pat3 = rf"POINT\s*Z\s*\(\s*{_NUM}\s+{_NUM}\s+{_NUM}\s*\)"
    is3 = col.rlike(r"POINT\s*Z")
    part = lambda pat, i: F.regexp_extract(col, pat, i).try_cast("double")
    lon = F.when(is3, part(pat3, 1)).otherwise(part(pat2, 1))
    lat = F.when(is3, part(pat3, 2)).otherwise(part(pat2, 2))
    alt = F.when(is3, part(pat3, 3))
    return F.struct(lon.alias("lon"), lat.alias("lat"), alt.alias("alt"))
