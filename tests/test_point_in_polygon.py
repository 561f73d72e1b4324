"""Point-in-polygon spatial join (operators/spatial.py): planted rings,
cell coverage, and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from erddap2agol_spark.operators.spatial import (
    point_in_polygon_join,
    polygon_cells,
    ray_cast_inside,
)


def _ring(*xy):
    # closed ring from (x, y) tuples; repeats the first vertex
    pts = list(xy) + [xy[0]]
    return F.array(
        *[F.struct(F.lit(float(x)).alias("x"), F.lit(float(y)).alias("y")) for x, y in pts]
    )


def _inside(spark, px, py, ring):
    return (
        spark.range(1)
        .select(ray_cast_inside(F.lit(float(px)), F.lit(float(py)), ring).alias("r"))
        .collect()[0]
        .r
    )


def test_ray_cast_square(spark):
    sq = _ring((0, 0), (4, 0), (4, 4), (0, 4))
    assert _inside(spark, 2, 2, sq) is True
    assert _inside(spark, 5, 2, sq) is False
    assert _inside(spark, -1, 2, sq) is False
    assert _inside(spark, 2, 9, sq) is False


def test_ray_cast_concave(spark):
    # U-shape: the notch (2, 2.5) is OUTSIDE despite being in the bbox
    u = _ring((0, 0), (4, 0), (4, 4), (3, 4), (3, 1), (1, 1), (1, 4), (0, 4))
    assert _inside(spark, 2, 0.5, u) is True  # bottom bar
    assert _inside(spark, 2, 2.5, u) is False  # inside the notch
    assert _inside(spark, 0.5, 3, u) is True  # left arm
    assert _inside(spark, 3.5, 3, u) is True  # right arm


def test_polygon_cells_coverage(spark):
    polys = spark.range(1).select(
        F.lit(7).alias("pid"), _ring((-1, -1), (6, -1), (6, 6), (-1, 6)).alias("verts")
    )
    cells = {(r.cx, r.cy) for r in polygon_cells(polys, "pid", "verts", 5.0).collect()}
    # bbox [-1,6]^2 at 5-degree cells: x in {-1..0} -> {-1, 0, 1}? floor(-1/5)=-1, floor(6/5)=1
    assert cells == {(cx, cy) for cx in (-1, 0, 1) for cy in (-1, 0, 1)}


def test_join_matches_brute_force(spark):
    pts = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in enumerate(
            [(2, 2), (8, 8), (12, 2), (-3, -3), (2.5, 2.5), (7, 2)]
        )],
        "point_id int, x double, y double",
    )
    polys_rows = spark.range(1).select(
        F.lit(1).alias("poly_id"), _ring((0, 0), (5, 0), (5, 5), (0, 5)).alias("verts")
    ).unionAll(
        spark.range(1).select(
            F.lit(2).alias("poly_id"), _ring((6, 0), (10, 0), (8, 4)).alias("verts")
        )
    )
    got = {
        (r.point_id, r.poly_id)
        for r in point_in_polygon_join(pts, polys_rows, cell_deg=5.0).collect()
    }
    assert got == {(0, 1), (4, 1), (5, 2)}


def test_join_plan_is_broadcast_no_cartesian(spark):
    pts = spark.createDataFrame([(1, 1.0, 1.0)], "point_id int, x double, y double")
    polys = spark.range(1).select(
        F.lit(1).alias("poly_id"), _ring((0, 0), (2, 0), (2, 2), (0, 2)).alias("verts")
    )
    plan = (
        point_in_polygon_join(pts, polys)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan
