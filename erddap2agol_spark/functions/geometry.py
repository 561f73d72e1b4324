"""Geometry constructors (SURVEY §2.8 F17).

The reference's converters build GeoJSON geometries from GeoRSS/GML/W3C
shapes: ``point`` ("lat lon" reordered to lon/lat), ``line`` (flat
ordinate list -> coordinate pairs, srsDimension-aware), ``polygon``
(ring, closed, CCW reversal option), ``box``/``envelope`` (2 corners ->
5-point ring), plus Z append (Converters/Xml2GeoJSON.py:893-955,
Json2GeoJSON.py:349-376, 1043-1065).

Here each constructor is pure Column array algebra emitting the GeoJSON
geometry as a compact JSON string — composable into feature rows without
any Python per-row code, so geometry construction rides whole-stage
codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _fmt(d: Column) -> Column:
    """Render a double as a compact JSON number (no trailing .0 for ints —
    matches the reference's json.dumps output for floats)."""
    i = d.cast("long")
    return F.when(d == i.cast("double"), i.cast("string")).otherwise(d.cast("string"))


def _pair(x: Column, y: Column) -> Column:
    return F.concat(F.lit("["), _fmt(x), F.lit(","), _fmt(y), F.lit("]"))


def point_geojson(lat_lon: Column) -> Column:
    """GeoRSS point: input "lat lon" string -> lon/lat GeoJSON Point
    (the reference reorders, Xml2GeoJSON.py:893-896)."""
    parts = F.split(F.trim(lat_lon), r"\s+")
    lat = F.element_at(parts, 1).cast("double")
    lon = F.element_at(parts, 2).cast("double")
    return F.concat(
        F.lit('{"type":"Point","coordinates":'), _pair(lon, lat), F.lit("}")
    )


def point_from_xy(x: Column, y: Column) -> Column:
    return F.concat(
        F.lit('{"type":"Point","coordinates":'), _pair(x, y), F.lit("}")
    )


def _coords_from_flat(flat: Column, srs_dim: int = 2, lat_first: bool = True) -> Column:
    """Flat ordinate list "a b a b ..." -> array of "[lon,lat]" strings."""
    nums = F.transform(F.split(F.trim(flat), r"\s+"), lambda s: s.cast("double"))
    n_pts = (F.size(nums) / srs_dim).cast("int")
    idx = F.sequence(F.lit(0), n_pts - 1)

    def pt(i: Column) -> Column:
        a = F.element_at(nums, i * srs_dim + 1)
        b = F.element_at(nums, i * srs_dim + 2)
        return _pair(b, a) if lat_first else _pair(a, b)

    return F.transform(idx, pt)


def line_geojson(flat: Column, srs_dim: int = 2, lat_first: bool = True) -> Column:
    """GeoRSS/GML line: flat "lat lon lat lon ..." -> LineString."""
    coords = _coords_from_flat(flat, srs_dim, lat_first)
    return F.concat(
        F.lit('{"type":"LineString","coordinates":['),
        F.concat_ws(",", coords),
        F.lit("]}"),
    )


def polygon_geojson(
    flat: Column, srs_dim: int = 2, lat_first: bool = True, reverse: bool = False
) -> Column:
    """GeoRSS/GML polygon ring -> Polygon; ``reverse=True`` flips winding
    (the reference's CCW reversal). The ring is closed if not already."""
    coords = _coords_from_flat(flat, srs_dim, lat_first)
    if reverse:
        coords = F.reverse(coords)
    closed = F.when(
        F.element_at(coords, 1) == F.element_at(coords, -1), coords
    ).otherwise(F.concat(coords, F.array(F.element_at(coords, 1))))
    return F.concat(
        F.lit('{"type":"Polygon","coordinates":[['),
        F.concat_ws(",", closed),
        F.lit("]]}"),
    )


def box_geojson(corners: Column, lat_first: bool = True) -> Column:
    """GeoRSS box/GML envelope: "lat1 lon1 lat2 lon2" two corners ->
    5-point ring Polygon (reference Xml2GeoJSON.py box assembly)."""
    nums = F.transform(F.split(F.trim(corners), r"\s+"), lambda s: s.cast("double"))
    if lat_first:
        y1, x1 = F.element_at(nums, 1), F.element_at(nums, 2)
        y2, x2 = F.element_at(nums, 3), F.element_at(nums, 4)
    else:
        x1, y1 = F.element_at(nums, 1), F.element_at(nums, 2)
        x2, y2 = F.element_at(nums, 3), F.element_at(nums, 4)
    ring = F.concat_ws(
        ",", _pair(x1, y1), _pair(x2, y1), _pair(x2, y2), _pair(x1, y2), _pair(x1, y1)
    )
    return F.concat(F.lit('{"type":"Polygon","coordinates":[['), ring, F.lit("]]}"))


def _triple(x: Column, y: Column, z: Column) -> Column:
    return F.concat(
        F.lit("["), _fmt(x), F.lit(","), _fmt(y), F.lit(","), _fmt(z), F.lit("]")
    )


def point3d_geojson(
    x: Column,
    y: Column,
    z: Column,
    z_factor: float = 1.0,
    z_offset: float = 0.0,
) -> Column:
    """F17 Z ordinates: 3-D Point with the reference's zFactor/zOffset
    scaling (Converters/Json2GeoJSON.py:72-86, 349-376). ``strip-Z`` is
    simply using :func:`point_from_xy` instead."""
    zz = z.cast("double") * z_factor + z_offset
    return F.concat(
        F.lit('{"type":"Point","coordinates":'), _triple(x, y, zz), F.lit("}")
    )


def segment3d_geojson(
    x1: Column, y1: Column, z1: Column, x2: Column, y2: Column, z2: Column,
    z_factor: float = 1.0, z_offset: float = 0.0,
) -> Column:
    """Two-point LineString with elevation (the reference's addElevation
    recursively appends Z to every coordinate; for fixed-arity shapes
    that is plain column algebra)."""
    s1 = _triple(x1, y1, z1.cast("double") * z_factor + z_offset)
    s2 = _triple(x2, y2, z2.cast("double") * z_factor + z_offset)
    return F.concat(
        F.lit('{"type":"LineString","coordinates":['), s1, F.lit(","), s2, F.lit("]}")
    )


def segment_geojson(x1: Column, y1: Column, x2: Column, y2: Column) -> Column:
    """Two-point LineString — the glider consecutive-point segment (W1)."""
    return F.concat(
        F.lit('{"type":"LineString","coordinates":['),
        _pair(x1, y1),
        F.lit(","),
        _pair(x2, y2),
        F.lit("]}"),
    )
