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
    # F.get is 0-based and NULL-safe out of bounds; element_at raises
    # under ANSI mode, so a feed item with a one-token point string
    # ("12.5") would abort the whole ingest job instead of rendering
    # null geometry.  try_cast likewise turns non-numeric tokens into
    # NULL instead of CAST_INVALID_INPUT — feeds are untrusted input.
    lat = F.get(parts, 0).try_cast("double")
    lon = F.get(parts, 1).try_cast("double")
    z = F.get(parts, 2).try_cast("double")
    if const_z is not None:
        z = F.coalesce(z, const_z.try_cast("double"))
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


def _ordinate_slots(
    flat: Column, srs_dim: int
) -> tuple[Column, Column, Column | None]:
    """Split a flat ordinate list into per-slot arrays (1st ordinate of
    every point, 2nd, optional 3rd) — the capture-free prologue of the
    flat parsers.  try_cast turns a non-numeric token into a NULL
    ordinate (null geometry downstream) instead of an ANSI
    CAST_INVALID_INPUT abort — feeds are untrusted input.

    Why slots + ``zip_with`` instead of an index ramp whose lambda
    captures the token array: co-projecting two flat parsers over the
    same column (e.g. ``line_geojson`` and ``measured_line_geojson``
    side by side) made Spark's subexpression machinery cross-bind the
    captured array between the sibling transforms' lambda variables —
    element_at probed the 1-element INDEX array and one malformed-free
    row still aborted the job (and in other orderings silently fed one
    column's rendered output into the other's cast).  Slot arrays keep
    every lambda's inputs its own arguments, so there is nothing to
    cross-bind; a trailing partial point pads with NULL and is dropped
    by the callers' null filter."""
    nums = F.transform(
        F.split(F.trim(flat), r"\s+"), lambda s: s.try_cast("double")
    )
    a = F.filter(nums, lambda v, ix: ix % srs_dim == 0)
    b = F.filter(nums, lambda v, ix: ix % srs_dim == 1)
    c = F.filter(nums, lambda v, ix: ix % srs_dim == 2) if srs_dim >= 3 else None
    return a, b, c


def _coords_from_flat(
    flat: Column,
    srs_dim: int = 2,
    lat_first: bool = True,
    const_z: Column | None = None,
) -> Column:
    """Flat ordinate list "a b a b ..." -> array of "[lon,lat]" strings.
    ``srs_dim=3`` consumes a third ordinate per point; ``const_z`` appends
    the same elevation to every 2-D point (the reference's addElevation,
    Xml2GeoJSON.py:923-930).  Incomplete or non-numeric points render as
    NULL and are filtered out."""
    a, b, c = _ordinate_slots(flat, srs_dim)
    xs, ys = (b, a) if lat_first else (a, b)
    if srs_dim >= 3:
        xy = F.zip_with(
            xs, ys, lambda x, y: F.struct(x.alias("x"), y.alias("y"))
        )
        coords = F.zip_with(xy, c, lambda p, z: _triple(p["x"], p["y"], z))
    elif const_z is not None:
        cz = const_z.try_cast("double")

        def pt2z(x: Column, y: Column) -> Column:
            # per-row: only rows that actually carry an elevation get Z
            return F.when(cz.isNotNull(), _triple(x, y, cz)).otherwise(
                _pair(x, y)
            )

        coords = F.zip_with(xs, ys, pt2z)
    else:
        coords = F.zip_with(xs, ys, _pair)
    return F.filter(coords, lambda s: s.isNotNull())


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
    # F.get (0-based) is NULL-safe on an empty array where element_at
    # raises under ANSI — a degenerate ring renders NULL (null geometry
    # via the caller's concat), it doesn't abort the job
    first = F.get(coords, 0)
    last = F.get(coords, F.size(coords) - 1)
    closed = F.when(first == last, coords).otherwise(
        F.concat(coords, F.array(first))
    )
    return F.when(
        F.size(coords) >= 1,
        F.concat(F.lit("[["), F.concat_ws(",", closed), F.lit("]]")),
    ).otherwise(F.lit(None).cast("string"))


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
    # F.get + try_cast: a box string with missing or non-numeric corner
    # ordinates renders NULL geometry instead of an ANSI abort; the
    # explicit 4-ordinate guard stops concat_ws from silently skipping
    # NULL corners and emitting a partial (wrong) ring
    nums = F.transform(
        F.split(F.trim(corners), r"\s+"), lambda s: s.try_cast("double")
    )
    if lat_first:
        y1, x1 = F.get(nums, 0), F.get(nums, 1)
        y2, x2 = F.get(nums, 2), F.get(nums, 3)
    else:
        x1, y1 = F.get(nums, 0), F.get(nums, 1)
        x2, y2 = F.get(nums, 2), F.get(nums, 3)
    ring = F.concat_ws(
        ",", _pair(x1, y1), _pair(x2, y1), _pair(x2, y2), _pair(x1, y2), _pair(x1, y1)
    )
    # guard on the RENDERED ordinates: _fmt also nulls NaN/±Inf, which
    # pass a bare isNotNull and would leave a partial skipped-slot ring
    ok = (
        (F.size(nums) >= 4)
        & _fmt(x1).isNotNull() & _fmt(y1).isNotNull()
        & _fmt(x2).isNotNull() & _fmt(y2).isNotNull()
    )
    return F.when(
        ok,
        F.concat(F.lit('{"type":"Polygon","coordinates":[['), ring, F.lit("]]}")),
    ).otherwise(F.lit(None).cast("string"))


def _triple(x: Column, y: Column, z: Column) -> Column:
    return F.concat(
        F.lit("["), _fmt(x), F.lit(","), _fmt(y), F.lit(","), _fmt(z), F.lit("]")
    )


def _z_transform(
    z: Column, z_factor: float = 1.0, z_offset: float = 0.0, z_absolute: bool = False
) -> Column:
    """The reference's Z pipeline (Json2GeoJSON.py:368-374): abs() first
    when zAbsolute, then scale by zFactor, then shift by zOffset."""
    zz = z.try_cast("double")
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
        # coalesce BOTH positional slots: a runtime-NULL z or m (garbage
        # value through try_cast) must render as the literal null, not be
        # skipped by concat_ws — dropping a slot shifts the measure into
        # the z position and silently mis-shapes the XYZM coordinate
        ords.append(F.coalesce(zz, F.lit("null")) if zz is not None else F.lit("null"))
        ords.append(F.coalesce(_fmt(m.try_cast("double")), F.lit("null")))
    elif zz is not None:
        ords.append(zz)
    # no renderable x/y (NULL or non-finite) -> null geometry, not a
    # coordinate with skipped leading slots
    return F.when(
        ords[0].isNotNull() & ords[1].isNotNull(),
        F.concat(
            F.lit('{"type":"Point","coordinates":['),
            F.concat_ws(",", *ords),
            F.lit("]}"),
        ),
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
    a, b, c = _ordinate_slots(flat, srs_dim)
    xs, ys = (b, a) if lat_first else (a, b)
    xy = F.zip_with(xs, ys, lambda x, y: F.struct(x.alias("x"), y.alias("y")))
    if srs_dim >= 3:
        xyz = F.zip_with(
            xy,
            c,
            lambda p, z: F.struct(
                p["x"].alias("x"), p["y"].alias("y"), z.alias("z")
            ),
        )
    else:
        xyz = F.transform(
            xy,
            lambda p: F.struct(
                p["x"].alias("x"), p["y"].alias("y"), F.lit(0.0).alias("z")
            ),
        )

    # drop junk points (no renderable x/y — NULL or non-finite, which
    # _fmt nulls) BEFORE numbering, so the running measure is the
    # per-RENDERED-coordinate ramp 0, inc, 2*inc the docstring promises
    # (filtering after numbering left gaps in m at dropped points)
    kept = F.filter(
        xyz, lambda p: _fmt(p["x"]).isNotNull() & _fmt(p["y"]).isNotNull()
    )

    def pt(p: Column, i: Column) -> Column:
        zz = (
            _fmt(_z_transform(p["z"], z_factor, z_offset, z_absolute))
            if z_output
            else None
        )
        parts: list[Column] = [_fmt(p["x"]), _fmt(p["y"])]
        if m_increment is not None:
            # coalesce the positional z slot: a runtime-NULL z (garbage
            # token) must render as the literal null, not be skipped by
            # concat_ws — dropping it would shift the measure into the
            # z position
            parts.append(
                F.coalesce(zz, F.lit("null")) if zz is not None else F.lit("null")
            )
            parts.append(_fmt(i.cast("double") * m_increment))
        elif z_output and srs_dim >= 3:
            parts.append(zz)
        return F.concat(F.lit("["), F.concat_ws(",", *parts), F.lit("]"))

    coords = F.transform(kept, pt)
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
