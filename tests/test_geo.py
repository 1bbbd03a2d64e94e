"""Point-in-polygon kernel + zone classification tests."""

from __future__ import annotations

import numpy as np

from datamine_v2_0_spark.functions.geo import (
    classify_zones, euclidean_speed, points_in_polygon,
)
from datamine_v2_0_spark.schemas import DEFAULT_LOCATION_TYPE, ZONES

UNIT_SQUARE = [(0.0, 0.0), (1.0, 0.0), (1.0, 1.0), (0.0, 1.0), (0.0, 0.0)]


def test_points_in_polygon_basic():
    lon = np.array([0.5, 1.5, -0.1, 0.99, float("nan")])
    lat = np.array([0.5, 0.5, 0.5, 0.01, 0.5])
    got = points_in_polygon(lon, lat, UNIT_SQUARE)
    assert got.tolist() == [True, False, False, True, False]


def test_points_in_polygon_concave():
    # L-shape: the notch (upper right) is OUTSIDE
    ring = [(0, 0), (2, 0), (2, 1), (1, 1), (1, 2), (0, 2), (0, 0)]
    ring = [(float(a), float(b)) for a, b in ring]
    lon = np.array([0.5, 1.5, 1.5, 0.5])
    lat = np.array([0.5, 0.5, 1.5, 1.5])
    got = points_in_polygon(lon, lat, ring)
    assert got.tolist() == [True, True, False, True]


def test_classify_zones_reference_data():
    # centroid-ish interior points of two reference zones + a far-away point
    lon = np.array([-97.83007, -97.838, -97.0])
    lat = np.array([33.25793, 33.2721, 33.0])
    got = classify_zones(lon, lat, ZONES)
    assert got[0] == "Crusher"
    assert got[1] == "Pit 1"
    assert got[2] == DEFAULT_LOCATION_TYPE


def test_euclidean_speed():
    np.testing.assert_allclose(
        euclidean_speed(np.array([3.0]), np.array([4.0])), [5.0]
    )


def test_grid_radius_join_matches_brute_force(spark):
    import itertools
    import math

    from pyspark.sql import functions as F

    from datamine_v2_0_spark.operators.spatial import grid_radius_join

    pts = [(i, (i * 37 % 100) / 10.0, (i * 73 % 100) / 10.0) for i in range(120)]
    df = spark.createDataFrame(pts, ["pid", "lat", "lon"])
    r = 1.3
    got = {
        (x["id_a"], x["id_b"]): x["dist"]
        for x in grid_radius_join(
            df, F.col("lat"), F.col("lon"), "pid", radius=r
        ).collect()
    }
    want = {}
    for (i, la, lo), (j, lb, lc) in itertools.combinations(pts, 2):
        d = math.sqrt((la - lb) ** 2 + (lo - lc) ** 2)
        if d <= r:
            want[(i, j)] = round(d, 6)
    assert got == want  # full recall AND no duplicates, exact distances


def test_grid_radius_join_rejects_nonpositive_radius(spark):
    import pytest as _pt
    from pyspark.sql import functions as F

    from datamine_v2_0_spark.operators.spatial import grid_radius_join

    df = spark.createDataFrame([(1, 0.0, 0.0)], ["pid", "lat", "lon"])
    with _pt.raises(ValueError):
        grid_radius_join(df, F.col("lat"), F.col("lon"), "pid", radius=0)
