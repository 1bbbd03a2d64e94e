"""Planar point-in-polygon (NumPy ray casting) + geo helpers.

The reference mixes PostGIS geography ``ST_Intersects`` with shapely's
planar ``Polygon.contains`` (`STEP 3 - EDA Analysis/run_advanced_eda.py:55-70`);
for the tiny quarry polygons the two agree, and SURVEY.md §7 fixes planar
semantics as normative. shapely is not in this container, so the kernel is
a vectorized even-odd ray cast — a standard public algorithm.
"""

from __future__ import annotations

import numpy as np


def points_in_polygon(lon: np.ndarray, lat: np.ndarray, ring: list[tuple[float, float]]) -> np.ndarray:
    """Vectorized even-odd rule. ``ring`` is a closed lon/lat ring.
    Returns a boolean array; NaN coordinates → False."""
    x = np.asarray(lon, dtype=np.float64)
    y = np.asarray(lat, dtype=np.float64)
    inside = np.zeros(x.shape, dtype=bool)
    pts = np.asarray(ring, dtype=np.float64)
    x1, y1 = pts[:-1, 0], pts[:-1, 1]
    x2, y2 = pts[1:, 0], pts[1:, 1]
    for ax, ay, bx, by in zip(x1, y1, x2, y2):
        if ay == by:
            continue
        cond = ((ay > y) != (by > y)) & (x < (bx - ax) * (y - ay) / (by - ay) + ax)
        inside ^= cond
    inside[np.isnan(x) | np.isnan(y)] = False
    return inside


def classify_zones(
    lon: np.ndarray,
    lat: np.ndarray,
    zones: list[tuple[int, str, list[tuple[float, float]]]],
    default: str = "Haul Road / Other",
) -> np.ndarray:
    """First matching zone wins (zones are disjoint in the reference data)."""
    n = len(lon)
    out = np.full(n, default, dtype=object)
    unassigned = np.ones(n, dtype=bool)
    for _zid, name, ring in zones:
        if not unassigned.any():
            break
        hit = points_in_polygon(lon, lat, ring) & unassigned
        out[hit] = name
        unassigned &= ~hit
    return out


def euclidean_speed(dlon: np.ndarray, dlat: np.ndarray) -> np.ndarray:
    """Planar displacement magnitude sqrt(dx²+dy²) (reference's
    haversine-free distance, `database_pipeline.py:288-291`)."""
    return np.sqrt(dlon * dlon + dlat * dlat)
