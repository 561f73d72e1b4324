"""Chunked raster store for gridded output (K5 — VERDICT r5 #5).

The reference publishes griddap NetCDF as AGOL imagery layers
(``copy_raster``, agol_wrangler.py:235-472: latitude flipped to
north->south, WKID 4326, nodata configured).  The engine's long-form
grid (one row per cell) is the right ANALYTIC layout, but map/imagery
consumers need the raster layout back: fixed-size 2-D tiles per
(variable, time[, level]) addressed by block coordinates — the shape
shared by Zarr chunks and COG tiles.

Layout under ``root`` (all Python-side I/O through the
:mod:`.fsio` seam — local path, fsspec scheme, or registered store)::

    _raster_meta.json                     lattice + tiling + manifest
    <var>/<slice>/tile_<ty>_<tx>.f64      raw float64-LE tile block,
                                          row-major, row 0 = NORTHERNMOST
                                          (the reference's lat flip)

Write path is PARTITION-PARALLEL: cells shuffle once on the tile key
``(var, slice, ty, tx)`` and each task assembles + writes its own tiles
(``applyInPandas`` group = one tile), returning one manifest row per
tile; the driver writes only the metadata document (O(tiles) rows, no
pixel ever crosses the driver).  Missing cells and NaN values are
stored as ``nodata`` and surface as NULL on readback.

The lattice (axis origin/step/size) is derived from the data with two
small distinct-aggregates (bounded by axis length, not cell count) —
the same metadata-not-data discipline as the chunk planner (O4).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fsio import for_path

WKID = 4326  # the reference pins WGS84 (agol_wrangler.py copy_raster)
_META = "_raster_meta.json"


def _path_slug(s: str) -> str:
    """Path-safe directory name for a var/slice value: F7 sanitization
    plus an md5 tag whenever sanitization changed anything, so two
    DISTINCT values can never collide onto one tile file (review r6:
    'a b' vs 'a:b' both sanitize to 'a_b'; a var containing '/' would
    escape the layout).  The manifest stores the RAW value; the slug is
    only the storage address."""
    import hashlib

    clean = "".join(ch if ch.isalnum() or ch in "._-" else "_" for ch in s)
    if clean == s and s not in ("", ".", ".."):
        return clean
    return f"{clean}-{hashlib.md5(s.encode()).hexdigest()[:8]}"


@dataclass(frozen=True)
class Lattice:
    lat0: float  # northernmost latitude (row 0 — the lat flip)
    lon0: float  # westernmost longitude (col 0)
    dlat: float  # positive step between adjacent rows (southward)
    dlon: float
    n_lat: int
    n_lon: int


def _axis(values: list[float], descending: bool) -> tuple[float, float, int]:
    vs = sorted(values, reverse=descending)
    if len(vs) < 2:
        return vs[0], 1.0, len(vs)
    steps = {round(abs(b - a), 9) for a, b in zip(vs, vs[1:])}
    if len(steps) != 1:
        raise ValueError(f"non-uniform axis (steps {sorted(steps)[:3]}...)")
    return vs[0], steps.pop(), len(vs)


def derive_lattice(cells: DataFrame, lat_col: str, lon_col: str) -> Lattice:
    lats = [r[0] for r in cells.select(lat_col).distinct().collect()]
    lons = [r[0] for r in cells.select(lon_col).distinct().collect()]
    lat0, dlat, n_lat = _axis(lats, descending=True)  # north first
    lon0, dlon, n_lon = _axis(lons, descending=False)
    return Lattice(lat0, lon0, dlat, dlon, n_lat, n_lon)


def write_raster_tiles(
    cells: DataFrame,
    root: str,
    var_col: str = "var",
    slice_cols: tuple[str, ...] = ("time",),
    lat_col: str = "lat",
    lon_col: str = "lon",
    value_col: str = "value",
    tile_h: int = 4,
    tile_w: int = 4,
    nodata: float = -9999.0,
) -> dict:
    """Long-form cells -> tiled raster store; returns the metadata doc.

    ``slice_cols`` are the non-spatial dimensions (time, level) — one
    2-D tile grid per distinct combination.  Values equal to ``nodata``
    must not occur as real data (the reference's copy_raster carries the
    same caveat).
    """
    lattice = derive_lattice(cells, lat_col, lon_col)
    iy = F.round(
        (F.lit(lattice.lat0) - F.col(lat_col)) / F.lit(lattice.dlat)
    ).cast("int")
    ix = F.round(
        (F.col(lon_col) - F.lit(lattice.lon0)) / F.lit(lattice.dlon)
    ).cast("int")
    # the slice separator is escaped INSIDE each value first, so a value
    # containing '|' can never collide with a multi-column combination
    # (review r6: ('a','b') vs ('a|b',))
    slice_key = F.concat_ws(
        "|",
        *[
            F.regexp_replace(
                F.coalesce(F.col(c).cast("string"), F.lit("na")), r"\|", "%7C"
            )
            for c in slice_cols
        ],
    )
    stamped = cells.select(
        F.col(var_col).alias("var"),
        slice_key.alias("slice"),
        iy.alias("iy"),
        ix.alias("ix"),
        (iy / tile_h).cast("int").alias("ty"),
        (ix / tile_w).cast("int").alias("tx"),
        F.col(value_col).cast("double").alias("v"),
    )

    th, tw, nd, root_str = tile_h, tile_w, nodata, root

    def build_tile(pdf):
        import pandas as pd

        var = pdf["var"].iloc[0]
        sl = pdf["slice"].iloc[0]
        ty, tx = int(pdf["ty"].iloc[0]), int(pdf["tx"].iloc[0])
        block = np.full((th, tw), nd, dtype=np.float64)
        ry = pdf["iy"].to_numpy() - ty * th
        rx = pdf["ix"].to_numpy() - tx * tw
        vals = pdf["v"].to_numpy(dtype=np.float64)
        vals = np.where(np.isnan(vals), nd, vals)
        block[ry, rx] = vals
        fs, r = for_path(root_str)
        vdir, sdir = _path_slug(str(var)), _path_slug(sl)
        d = fs.join(r, vdir, sdir)
        fs.makedirs(d)
        fname = f"tile_{ty:04d}_{tx:04d}.f64"
        with fs.open(fs.join(d, fname), "wb") as f:
            f.write(block.tobytes())  # little-endian f64, row-major
        return pd.DataFrame(
            [
                {
                    "var": var,
                    "slice": sl,
                    "ty": ty,
                    "tx": tx,
                    "path": f"{vdir}/{sdir}/{fname}",
                    "n_cells": int(len(pdf)),
                }
            ]
        )

    manifest_rows = (
        stamped.groupBy("var", "slice", "ty", "tx")
        .applyInPandas(
            build_tile,
            schema="var string, slice string, ty int, tx int, "
            "path string, n_cells long",
        )
        .collect()
    )
    meta = {
        "wkid": WKID,
        "nodata": nodata,
        "tile_h": tile_h,
        "tile_w": tile_w,
        "lat0": lattice.lat0,
        "lon0": lattice.lon0,
        "dlat": lattice.dlat,
        "dlon": lattice.dlon,
        "n_lat": lattice.n_lat,
        "n_lon": lattice.n_lon,
        "slice_cols": list(slice_cols),
        "tiles": [
            {
                "var": r["var"],
                "slice": r["slice"],
                "ty": r["ty"],
                "tx": r["tx"],
                "path": r["path"],
                "n_cells": r["n_cells"],
            }
            for r in sorted(
                manifest_rows, key=lambda r: (r["var"], r["slice"], r["ty"], r["tx"])
            )
        ],
    }
    fs, r = for_path(root)
    fs.makedirs(r)
    # manifest LAST — its presence is the commit marker (same discipline
    # as the GeoJSON committer and the snapshot tables)
    fs.write_atomic(fs.join(r, _META), json.dumps(meta))
    return meta


def read_raster_meta(root: str) -> dict:
    fs, r = for_path(root)
    with fs.open(fs.join(r, _META)) as f:
        return json.load(f)


def read_raster_tiles(spark: SparkSession, root: str) -> DataFrame:
    """Raster store -> long-form cells ``(var, slice, lat, lon, value)``;
    nodata cells surface as NULL.  One scan task per tile batch
    (``mapInPandas`` over the manifest), decode is a numpy reshape —
    partition-parallel, no pixel through the driver."""
    meta = read_raster_meta(root)
    man = spark.createDataFrame(
        [
            (t["var"], t["slice"], t["ty"], t["tx"], t["path"])
            for t in meta["tiles"]
        ],
        "var string, slice string, ty int, tx int, path string",
    )
    th, tw = meta["tile_h"], meta["tile_w"]
    lat0, lon0 = meta["lat0"], meta["lon0"]
    dlat, dlon = meta["dlat"], meta["dlon"]
    n_lat, n_lon = meta["n_lat"], meta["n_lon"]
    nd, root_str = meta["nodata"], root

    def decode(batches):
        import pandas as pd

        fs, r = for_path(root_str)
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                with fs.open(fs.join(r, row["path"]), "rb") as f:
                    block = np.frombuffer(f.read(), dtype=np.float64).reshape(
                        th, tw
                    )
                ys, xs = np.meshgrid(range(th), range(tw), indexing="ij")
                iy = row["ty"] * th + ys.ravel()
                ix = row["tx"] * tw + xs.ravel()
                v = block.ravel()
                keep = (iy < n_lat) & (ix < n_lon)  # edge-tile padding
                out.append(
                    pd.DataFrame(
                        {
                            "var": row["var"],
                            "slice": row["slice"],
                            "lat": lat0 - iy[keep] * dlat,
                            "lon": lon0 + ix[keep] * dlon,
                            "value": np.where(
                                v[keep] == nd, np.nan, v[keep]
                            ),
                        }
                    )
                )
            yield pd.concat(out) if out else pd.DataFrame(
                columns=["var", "slice", "lat", "lon", "value"]
            )

    cells = man.mapInPandas(
        decode, schema="var string, slice string, lat double, lon double, value double"
    )
    # NaN (the in-flight nodata marker) -> NULL, the engine-wide missing
    # convention for grid cells
    return cells.withColumn(
        "value", F.when(F.isnan("value"), None).otherwise(F.col("value"))
    )
