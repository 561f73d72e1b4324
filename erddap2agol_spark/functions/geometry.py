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
    matches the reference's json.dumps output for floats).

    Non-finite ordinates (NaN/±Inf) render as NULL, which propagates
    through the surrounding ``concat`` exactly like a NULL ordinate —
    the geometry collapses to GeoJSON-legal ``null`` instead of either
    emitting a JSON-illegal ``NaN`` literal or, worse, throwing: a plain
    ``cast("long")`` raises CAST_OVERFLOW under ANSI mode (Spark 4
    default), so ONE bad coordinate row would kill an entire export job.
    ``try_cast`` also keeps huge finite doubles (beyond long range) on
    the plain-string path rather than crashing the integer-compaction
    probe."""
    finite = F.when(
        F.isnan(d) | (d == F.lit(float("inf"))) | (d == F.lit(float("-inf"))),
        F.lit(None).cast("double"),
    ).otherwise(d)
    i = finite.try_cast("long")
    return F.when(finite == i.cast("double"), i.cast("string")).otherwise(
        finite.cast("string")
    )


def _pair(x: Column, y: Column) -> Column:
    return F.concat(F.lit("["), _fmt(x), F.lit(","), _fmt(y), F.lit("]"))


def _point_body(lat_lon: Column, const_z: Column | None = None) -> Column:
    """"lat lon [alt]" string -> the "[lon,lat(,z)]" coordinate fragment
    shared by Point and MultiPoint assembly."""
    parts = F.split(F.trim(lat_lon), r"\s+")
    lat = F.element_at(parts, 1).cast("double")
    lon = F.element_at(parts, 2).cast("double")
    # F.get is 0-based and NULL-safe out of bounds (element_at raises
    # under ANSI mode when the third ordinate is absent)
    z = F.get(parts, 2).cast("double")
    if const_z is not None:
        z = F.coalesce(z, const_z.cast("double"))
    return F.when(z.isNotNull(), _triple(lon, lat, z)).otherwise(_pair(lon, lat))


def point_geojson(lat_lon: Column, const_z: Column | None = None) -> Column:
    """GeoRSS point: input "lat lon [alt]" string -> lon/lat[/alt] GeoJSON
    Point (the reference reorders and keeps an optional third ordinate,
    Xml2GeoJSON.py:893-896).  ``const_z`` supplies elevation when the
    string itself carries only two ordinates (georss:elev sidecar)."""
    body = _point_body(lat_lon, const_z)
    return F.concat(F.lit('{"type":"Point","coordinates":'), body, F.lit("}"))


def multipoint_geojson(parts: Column, const_z: Column | None = None) -> Column:
    """F17 multi-part assembly: an ARRAY of "lat lon [alt]" part strings ->
    MultiPoint.  The reference accumulates repeated geometry elements of
    one item into a parts tuple and emits ``"Multi" + type`` when more
    than one part is present (Json2GeoJSON.py:1043-1065); here the parts
    array is assembled with a higher-order transform — still pure Column
    algebra, no per-row Python."""
    coords = F.transform(parts, lambda p: _point_body(p, const_z))
    return F.concat(
        F.lit('{"type":"MultiPoint","coordinates":['),
        F.concat_ws(",", coords),
        F.lit("]}"),
    )


def point_from_xy(x: Column, y: Column) -> Column:
    return F.concat(
        F.lit('{"type":"Point","coordinates":'), _pair(x, y), F.lit("}")
    )


def _coords_from_flat(
    flat: Column,
    srs_dim: int = 2,
    lat_first: bool = True,
    const_z: Column | None = None,
) -> Column:
    """Flat ordinate list "a b a b ..." -> array of "[lon,lat]" strings.
    ``srs_dim=3`` consumes a third ordinate per point; ``const_z`` appends
    the same elevation to every 2-D point (the reference's addElevation,
    Xml2GeoJSON.py:923-930)."""
    nums = F.transform(F.split(F.trim(flat), r"\s+"), lambda s: s.cast("double"))
    n_pts = (F.size(nums) / srs_dim).cast("int")
    idx = F.sequence(F.lit(0), n_pts - 1)

    def pt(i: Column) -> Column:
        a = F.element_at(nums, i * srs_dim + 1)
        b = F.element_at(nums, i * srs_dim + 2)
        x, y = (b, a) if lat_first else (a, b)
        if srs_dim >= 3:
            return _triple(x, y, F.element_at(nums, i * srs_dim + 3))
        if const_z is not None:
            cz = const_z.cast("double")
            # per-row: only rows that actually carry an elevation get Z
            return F.when(cz.isNotNull(), _triple(x, y, cz)).otherwise(_pair(x, y))
        return _pair(x, y)

    return F.transform(idx, pt)


def line_geojson(
    flat: Column,
    srs_dim: int = 2,
    lat_first: bool = True,
    const_z: Column | None = None,
) -> Column:
    """GeoRSS/GML line: flat "lat lon lat lon ..." -> LineString."""
    coords = _coords_from_flat(flat, srs_dim, lat_first, const_z)
    return F.concat(
        F.lit('{"type":"LineString","coordinates":['),
        F.concat_ws(",", coords),
        F.lit("]}"),
    )


def _line_body(
    flat: Column,
    srs_dim: int = 2,
    lat_first: bool = True,
    const_z: Column | None = None,
) -> Column:
    coords = _coords_from_flat(flat, srs_dim, lat_first, const_z)
    return F.concat(F.lit("["), F.concat_ws(",", coords), F.lit("]"))


def multiline_geojson(
    parts: Column,
    srs_dim: int = 2,
    lat_first: bool = True,
    const_z: Column | None = None,
) -> Column:
    """F17 multi-part assembly: an ARRAY of flat ordinate-list part
    strings ("lat lon lat lon ..." each) -> MultiLineString
    (Json2GeoJSON.py:1043-1065 part accumulation)."""
    bodies = F.transform(parts, lambda p: _line_body(p, srs_dim, lat_first, const_z))
    return F.concat(
        F.lit('{"type":"MultiLineString","coordinates":['),
        F.concat_ws(",", bodies),
        F.lit("]}"),
    )


def _ring_body(
    flat: Column,
    srs_dim: int = 2,
    lat_first: bool = True,
    reverse: bool = False,
    const_z: Column | None = None,
) -> Column:
    coords = _coords_from_flat(flat, srs_dim, lat_first, const_z)
    if reverse:
        coords = F.reverse(coords)
    closed = F.when(
        F.element_at(coords, 1) == F.element_at(coords, -1), coords
    ).otherwise(F.concat(coords, F.array(F.element_at(coords, 1))))
    return F.concat(F.lit("[["), F.concat_ws(",", closed), F.lit("]]"))


def multipolygon_geojson(
    parts: Column,
    srs_dim: int = 2,
    lat_first: bool = True,
    reverse: bool = False,
    const_z: Column | None = None,
) -> Column:
    """F17 multi-part assembly: an ARRAY of ring ordinate-list strings ->
    MultiPolygon, one single-ring polygon per part, each closed and
    optionally rewound like :func:`polygon_geojson`."""
    bodies = F.transform(
        parts, lambda p: _ring_body(p, srs_dim, lat_first, reverse, const_z)
    )
    return F.concat(
        F.lit('{"type":"MultiPolygon","coordinates":['),
        F.concat_ws(",", bodies),
        F.lit("]}"),
    )


def polygon_geojson(
    flat: Column,
    srs_dim: int = 2,
    lat_first: bool = True,
    reverse: bool = False,
    const_z: Column | None = None,
) -> Column:
    """GeoRSS/GML polygon ring -> Polygon; ``reverse=True`` flips winding
    (the reference's CCW reversal). The ring is closed if not already."""
    body = _ring_body(flat, srs_dim, lat_first, reverse, const_z)
    return F.concat(F.lit('{"type":"Polygon","coordinates":'), body, F.lit("}"))


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


def _z_transform(
    z: Column, z_factor: float = 1.0, z_offset: float = 0.0, z_absolute: bool = False
) -> Column:
    """The reference's Z pipeline (Json2GeoJSON.py:368-374): abs() first
    when zAbsolute, then scale by zFactor, then shift by zOffset."""
    zz = z.cast("double")
    if z_absolute:
        zz = F.abs(zz)
    return zz * z_factor + z_offset


def point_zm_geojson(
    x: Column,
    y: Column,
    z: Column | None = None,
    m: Column | None = None,
    *,
    z_factor: float = 1.0,
    z_offset: float = 0.0,
    z_absolute: bool = False,
    z_output: bool = True,
    m_output: bool = True,
) -> Column:
    """F17 full ordinate surface: Point with optional Z and M, honoring
    the reference's switches (Json2GeoJSON.py:72-86, 349-376):

    - ``z_output=False`` strips Z — unless M is kept, in which case the
      Z slot is emitted as ``null`` (a 4-ordinate coordinate needs its
      third position);
    - ``m_output=False`` strips the measure;
    - Z, when kept, runs abs -> *zFactor -> +zOffset.
    """
    ords: list[Column] = [_fmt(x), _fmt(y)]
    zz = (
        _fmt(_z_transform(z, z_factor, z_offset, z_absolute))
        if (z is not None and z_output)
        else None
    )
    if m is not None and m_output:
        ords.append(zz if zz is not None else F.lit("null"))
        ords.append(_fmt(m.cast("double")))
    elif zz is not None:
        ords.append(zz)
    return F.concat(
        F.lit('{"type":"Point","coordinates":['),
        F.concat_ws(",", *ords),
        F.lit("]}"),
    )


def measured_line_geojson(
    flat: Column,
    srs_dim: int = 2,
    lat_first: bool = True,
    *,
    z_factor: float = 1.0,
    z_offset: float = 0.0,
    z_absolute: bool = False,
    z_output: bool = True,
    m_increment: float | None = None,
) -> Column:
    """LineString from a flat ordinate list with the reference's Z/M
    post-processing (Json2GeoJSON.py:349-376): per-point Z (when
    ``srs_dim=3``) is scaled or stripped; ``m_increment`` appends a
    running measure ordinate (0, inc, 2*inc, ... — the reference's
    per-coordinate counter), with the Z slot defaulting to 0 (then
    scaled) or ``null`` when Z output is off."""
    nums = F.transform(F.split(F.trim(flat), r"\s+"), lambda s: s.cast("double"))
    n_pts = (F.size(nums) / srs_dim).cast("int")
    idx = F.sequence(F.lit(0), n_pts - 1)

    def pt(i: Column) -> Column:
        a = F.element_at(nums, i * srs_dim + 1)
        b = F.element_at(nums, i * srs_dim + 2)
        x, y = (b, a) if lat_first else (a, b)
        z = F.element_at(nums, i * srs_dim + 3) if srs_dim >= 3 else F.lit(0.0)
        zz = (
            _fmt(_z_transform(z, z_factor, z_offset, z_absolute))
            if z_output
            else None
        )
        parts: list[Column] = [_fmt(x), _fmt(y)]
        if m_increment is not None:
            parts.append(zz if zz is not None else F.lit("null"))
            parts.append(_fmt(i.cast("double") * m_increment))
        elif z_output and srs_dim >= 3:
            parts.append(zz)
        return F.concat(F.lit("["), F.concat_ws(",", *parts), F.lit("]"))

    coords = F.transform(idx, pt)
    return F.concat(
        F.lit('{"type":"LineString","coordinates":['),
        F.concat_ws(",", coords),
        F.lit("]}"),
    )


def point3d_geojson(
    x: Column,
    y: Column,
    z: Column,
    z_factor: float = 1.0,
    z_offset: float = 0.0,
    z_absolute: bool = False,
) -> Column:
    """F17 Z ordinates: 3-D Point with the reference's zAbsolute/zFactor/
    zOffset pipeline (Converters/Json2GeoJSON.py:72-86, 349-376).
    ``strip-Z`` is simply using :func:`point_from_xy` instead; the full
    switch surface (M ordinates, null-Z-with-M) is
    :func:`point_zm_geojson`."""
    zz = _z_transform(z, z_factor, z_offset, z_absolute)
    return F.concat(
        F.lit('{"type":"Point","coordinates":'), _triple(x, y, zz), F.lit("}")
    )


def segment3d_geojson(
    x1: Column, y1: Column, z1: Column, x2: Column, y2: Column, z2: Column,
    z_factor: float = 1.0, z_offset: float = 0.0, z_absolute: bool = False,
) -> Column:
    """Two-point LineString with elevation (the reference's addElevation
    recursively appends Z to every coordinate; for fixed-arity shapes
    that is plain column algebra)."""
    s1 = _triple(x1, y1, _z_transform(z1, z_factor, z_offset, z_absolute))
    s2 = _triple(x2, y2, _z_transform(z2, z_factor, z_offset, z_absolute))
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
