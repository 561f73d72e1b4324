"""Unit tests for the cell-binned spatial join (operators/spatial.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from erddap2agol_spark.operators.spatial import (
    haversine_km,
    nearest_station,
    planar_d2,
)


def _pts(spark, rows):
    return spark.createDataFrame(rows, "point_id long, plat double, plon double")


def _st(spark, rows):
    return spark.createDataFrame(
        rows, "station_id long, slat double, slon double"
    )


def test_nearest_picks_closest_station(spark):
    pts = _pts(spark, [(1, 25.0, -90.0)])
    st = _st(spark, [(10, 25.4, -90.0), (11, 25.1, -90.0), (12, 26.8, -90.0)])
    out = nearest_station(pts, st, "point_id", "station_id", 1.0).collect()
    assert len(out) == 1
    assert out[0]["station_id"] == 11
    assert abs(out[0]["d2_deg"] - 0.1 * 0.1) < 1e-12


def test_nearest_crosses_cell_boundary(spark):
    # point near a cell edge; the true nearest sits in the adjacent cell
    pts = _pts(spark, [(1, 25.95, -90.0)])
    st = _st(spark, [(10, 25.05, -90.0), (11, 26.05, -90.0)])
    out = nearest_station(pts, st, "point_id", "station_id", 1.0).collect()
    assert out[0]["station_id"] == 11


def test_out_of_reach_point_drops(spark):
    pts = _pts(spark, [(1, 25.0, -90.0), (2, 19.0, -82.0)])
    st = _st(spark, [(10, 25.2, -90.2)])
    out = nearest_station(pts, st, "point_id", "station_id", 1.0).collect()
    assert [r["point_id"] for r in out] == [1]


def test_distance_tie_breaks_on_station_id(spark):
    pts = _pts(spark, [(1, 25.0, -90.0)])
    st = _st(spark, [(20, 25.0, -90.5), (10, 25.0, -89.5)])
    out = nearest_station(pts, st, "point_id", "station_id", 1.0).collect()
    assert out[0]["station_id"] == 10


def test_station_side_is_broadcast(spark):
    pts = _pts(spark, [(1, 25.0, -90.0)])
    st = _st(spark, [(10, 25.2, -90.2)])
    plan = (
        nearest_station(pts, st, "point_id", "station_id", 1.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_haversine_known_distance(spark):
    # one degree of latitude is ~111.19 km anywhere
    df = spark.range(1).select(
        haversine_km(
            F.lit(25.0), F.lit(-90.0), F.lit(26.0), F.lit(-90.0)
        ).alias("km")
    )
    km = df.collect()[0]["km"]
    assert math.isclose(km, 111.1949, rel_tol=1e-4)


def test_planar_d2_exact(spark):
    df = spark.range(1).select(
        planar_d2(F.lit(1.5), F.lit(2.0), F.lit(1.0), F.lit(4.0)).alias("d2")
    )
    assert df.collect()[0]["d2"] == 0.25 + 4.0


def test_zorder_out_of_extent_clamps_to_edge(spark):
    """ADVICE r3: coordinates outside the stated extent must clamp to
    the edge cell — never alias into interior key space via sign-fill."""
    from pyspark.sql import functions as F

    from erddap2agol_spark.operators.spatial import zorder_key

    df = spark.createDataFrame(
        [
            ("below", -80.0, -200.0),   # far outside both axes (low side)
            ("corner_lo", 18.0, -98.0), # exact low corner
            ("above", 89.0, 179.0),     # far outside both axes (high side)
            ("corner_hi", 31.0, -76.0), # exact high corner
            ("inside", 25.0, -85.0),
        ],
        ["name", "lat", "lon"],
    )
    keys = {
        r["name"]: r["z"]
        for r in df.select(
            "name",
            zorder_key(
                F.col("lat"), F.col("lon"), 18.0, 31.0, -98.0, -76.0, bits=8
            ).alias("z"),
        ).collect()
    }
    assert keys["below"] == keys["corner_lo"]   # clamped to low edge cell
    assert keys["above"] == keys["corner_hi"]   # clamped to high edge cell
    assert all(0 <= v < (1 << 16) for v in keys.values())
    assert keys["inside"] not in (keys["below"], keys["above"])
