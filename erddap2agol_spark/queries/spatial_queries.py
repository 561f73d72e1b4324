"""Graded query for the cell-binned spatial join (operators/spatial.py).

Coordinates are synthesized deterministically from TPC-H keys with pure
integer arithmetic (modulo, then one division by 100.0), placed in the
Gulf-of-Mexico box the reference's GCOOS deployment serves — lat 18..30,
lon -98..-80 — where the planar ranking metric is legitimate.  Every
derived double is the result of the same integer ops in both engines, so
distances are bit-identical and the argmin is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.spatial import nearest_station
from ..sources.tables import load_table
from . import register


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("point_id"),
        (F.lit(18.0) + (F.col("c_custkey") * 37 % 1200) / F.lit(100.0)).alias(
            "plat"
        ),
        (F.lit(-98.0) + (F.col("c_custkey") * 61 % 1800) / F.lit(100.0)).alias(
            "plon"
        ),
    )


def _stations(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").alias("station_id"),
        (F.lit(18.0) + (F.col("s_suppkey") * 53 % 1200) / F.lit(100.0)).alias(
            "slat"
        ),
        (F.lit(-98.0) + (F.col("s_suppkey") * 89 % 1800) / F.lit(100.0)).alias(
            "slon"
        ),
    )


@register(
    "nearest_station_binned",
    oracle="""
    WITH p AS (
      SELECT c_custkey AS point_id,
             18.0 + (c_custkey * 37 % 1200) / 100.0 AS plat,
             -98.0 + (c_custkey * 61 % 1800) / 100.0 AS plon
      FROM customer
    ),
    s AS (
      SELECT s_suppkey AS station_id,
             18.0 + (s_suppkey * 53 % 1200) / 100.0 AS slat,
             -98.0 + (s_suppkey * 89 % 1800) / 100.0 AS slon
      FROM supplier
    ),
    sn AS (
      SELECT station_id, slat, slon,
             CAST(floor(slat / 1.0) AS BIGINT) + dx.dx AS cx,
             CAST(floor(slon / 1.0) AS BIGINT) + dy.dy AS cy
      FROM s, (VALUES (-1), (0), (1)) dx(dx), (VALUES (-1), (0), (1)) dy(dy)
    ),
    cand AS (
      SELECT p.point_id, sn.station_id,
             (p.plat - sn.slat) * (p.plat - sn.slat)
             + (p.plon - sn.slon) * (p.plon - sn.slon) AS d2_deg
      FROM p JOIN sn ON CAST(floor(p.plat / 1.0) AS BIGINT) = sn.cx
                    AND CAST(floor(p.plon / 1.0) AS BIGINT) = sn.cy
    )
    SELECT point_id, station_id, d2_deg FROM (
      SELECT point_id, station_id, d2_deg,
             row_number() OVER (PARTITION BY point_id
                                ORDER BY d2_deg, station_id) AS rk
      FROM cand
    ) WHERE rk = 1
    """,
    doc="Nearest station per observation point via the geohash-bin "
    "pattern: both sides bin to 1-degree cells (integer floor), the "
    "small station side explodes to its 3x3 neighborhood and broadcasts, "
    "candidates meet only on the cell equi-join, and the per-point "
    "argmin ranks a handful of rows. The observation side never "
    "shuffles; bounded-radius semantics (no station within the ring -> "
    "point drops out).",
)
def nearest_station_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    return nearest_station(
        _points(spark, sf_dir),
        _stations(spark, sf_dir),
        point_id="point_id",
        station_id="station_id",
        cell_deg=1.0,
    )


_Z_TERMS = " + ".join(
    f"(((qlat >> {i}) & 1) << {2 * i + 1}) + (((qlon >> {i}) & 1) << {2 * i})"
    for i in range(16)
)


@register(
    "zorder_keys",
    oracle=f"""
    WITH p AS (
      SELECT c_custkey AS point_id,
             18.0 + (c_custkey * 37 % 1200) / 100.0 AS plat,
             -98.0 + (c_custkey * 61 % 1800) / 100.0 AS plon
      FROM customer
    ),
    q AS (
      SELECT point_id, plat, plon,
             CAST(floor((plat - 18.0) / 12.0 * 65535) AS BIGINT) AS qlat,
             CAST(floor((plon + 98.0) / 18.0 * 65535) AS BIGINT) AS qlon
      FROM p
    )
    SELECT point_id, {_Z_TERMS} AS zkey
    FROM q
    """,
    doc="Morton/Z-order clustering keys over the point set: 16-bit "
    "quantization per axis, bit-interleaved into one BIGINT. Sorting or "
    "range-partitioning by this key at write time co-locates 2-D "
    "neighbors in the same parquet files, so later bbox scans prune by "
    "file min/max on a single column — the OPTIMIZE ZORDER layout "
    "expressed as plain repartitionByRange. Map-only integer bit "
    "algebra inside codegen.",
)
def zorder_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spatial import zorder_key

    p = _points(spark, sf_dir)
    return p.select(
        "point_id",
        zorder_key(
            F.col("plat"), F.col("plon"), 18.0, 30.0, -98.0, -80.0, bits=16
        ).alias("zkey"),
    )


@register(
    "alert_polygon_hits",
    oracle="""
    WITH pts AS (
      SELECT c_custkey AS point_id,
             18.0 + (c_custkey * 37 % 1200) / 100.0 AS plat,
             -98.0 + (c_custkey * 61 % 1800) / 100.0 AS plon
      FROM customer
    ),
    polys AS (
      SELECT n_nationkey AS poly_id,
             -97.0 + (n_nationkey * 71 % 1600) / 100.0 AS cx,
             19.0 + (n_nationkey * 41 % 1000) / 100.0 AS cy,
             0.5 + (n_nationkey * 13 % 20) / 10.0 AS w,
             0.5 + (n_nationkey * 17 % 20) / 10.0 AS h
      FROM nation
    ),
    edges AS (
      SELECT poly_id, cx - w AS x1, cy AS y1, cx AS x2, cy + h AS y2 FROM polys
      UNION ALL SELECT poly_id, cx, cy + h, cx + w, cy FROM polys
      UNION ALL SELECT poly_id, cx + w, cy, cx, cy - h FROM polys
      UNION ALL SELECT poly_id, cx, cy - h, cx - w, cy FROM polys
    ),
    cr AS (
      SELECT p.point_id, e.poly_id,
             count(*) FILTER (
               WHERE ((y1 > plat) <> (y2 > plat))
                 AND (plon < (x2 - x1) * (plat - y1) / (y2 - y1) + x1)
             ) AS nc
      FROM pts p CROSS JOIN edges e
      GROUP BY p.point_id, e.poly_id
    )
    SELECT point_id, poly_id FROM cr WHERE nc % 2 = 1
    """,
    doc="CAP-alert containment join: which observation points fall "
    "inside each alert polygon (diamond rings synthesized from nation "
    "keys with pure rational arithmetic, like the station synth). "
    "Spark side is the scale path: polygons explode to covered coarse "
    "grid cells and broadcast; points bin to one cell each with floor "
    "arithmetic and never shuffle; the exact even-odd ray cast (pure "
    "Column algebra, IEEE-exact ops only) filters candidates inside "
    "the same codegen stage. The oracle brute-forces the identical "
    "crossing test over all point x edge pairs — same classification "
    "for every point, including boundary cases, because both engines "
    "run identical float ops.",
)
def alert_polygon_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.spatial import point_in_polygon_join

    pts = _points(spark, sf_dir)
    n = load_table(spark, sf_dir, "nation")
    k = F.col("n_nationkey")
    cx = F.lit(-97.0) + (k * 71 % 1600) / F.lit(100.0)
    cy = F.lit(19.0) + (k * 41 % 1000) / F.lit(100.0)
    w = F.lit(0.5) + (k * 13 % 20) / F.lit(10.0)
    h = F.lit(0.5) + (k * 17 % 20) / F.lit(10.0)

    def v(x, y):
        return F.struct(x.alias("x"), y.alias("y"))

    polys = n.select(
        k.alias("poly_id"),
        F.array(
            v(cx - w, cy),
            v(cx, cy + h),
            v(cx + w, cy),
            v(cx, cy - h),
            v(cx - w, cy),
        ).alias("verts"),
    )
    return point_in_polygon_join(
        pts,
        polys,
        point_id="point_id",
        x_col="plon",
        y_col="plat",
        poly_id="poly_id",
        verts_col="verts",
        cell_deg=5.0,
    )
