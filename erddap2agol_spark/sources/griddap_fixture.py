"""Deterministic synthetic griddap spool for the S7 binary-ingestion
grade (VERDICT r3 next-round #4).

Two NetCDF-classic files model the reference's download spool
(``{dataset_id}.nc`` / ``{dataset_id}_subset_{n}.nc``,
src/data_wrangler.py:592-604):

* ``tempsal_grid.nc`` — time is the RECORD (unlimited) dimension, data
  interleaved per record; a packed-short variable (scale/offset CF
  packing) over (time, altitude, lat, lon) plus a float variable with
  fill values over (time, lat, lon); latitude stored DESCENDING
  (north-first), matching grids the reference has to re-order
  (src/agol_wrangler.py:235-261).
* ``tempsal_grid_subset_2.nc`` — a later time slab with FIXED dims
  (non-record layout), same dataset id after the subset-suffix strip.

``truth_rows`` computes the expected long form with plain Python loops —
independent of the parser/decoder under test — and the fixture writer
stores it as parquet so the DuckDB oracle of the graded
``griddap_ingest`` query reads the truth while Spark reads the bytes.

Everything is formula-generated (no RNG), so files and truth are
byte-stable across runs and machines.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd

from .netcdf import write_netcdf_classic

EPOCH = np.datetime64("2024-03-01T00:00:00", "us")
ALTS = [0.0, -10.0, -25.0]
LATS = [30.0, 29.0, 28.0, 27.0, 26.0, 25.0]  # descending / north-first
LONS = [-95.0, -94.0, -93.0, -92.0, -91.0]
SCALE, OFFSET, FILL_SHORT = 0.01, 20.0, -32768
FILL_F4 = -9999.0


def _temp_raw(ti: int, ai: int, yi: int, xi: int) -> int:
    if yi == 2 and xi == 3:
        return FILL_SHORT
    return (ti * 1000 + ai * 100 + yi * 10 + xi) % 600 - 100


def _sal_raw(ti: int, yi: int, xi: int) -> float:
    if yi == 0 and xi == 0:
        return FILL_F4
    return float(np.float32(35.0 + ti * 0.1 + yi * 0.01 * xi))


def _file_arrays(t_indices: list[int]):
    nt, na, ny, nx = len(t_indices), len(ALTS), len(LATS), len(LONS)
    temp = np.empty((nt, na, ny, nx), dtype=np.int16)
    sal = np.empty((nt, ny, nx), dtype=np.float32)
    for i, ti in enumerate(t_indices):
        for ai in range(na):
            for yi in range(ny):
                for xi in range(nx):
                    temp[i, ai, yi, xi] = _temp_raw(ti, ai, yi, xi)
        for yi in range(ny):
            for xi in range(nx):
                sal[i, yi, xi] = _sal_raw(ti, yi, xi)
    return temp, sal


def _write_file(path: str, t_indices: list[int], record_time: bool) -> None:
    temp, sal = _file_arrays(t_indices)
    hours = np.array([6.0 * ti for ti in t_indices], dtype=np.float64)
    dims = [
        ("time", None if record_time else len(t_indices)),
        ("altitude", len(ALTS)),
        ("latitude", len(LATS)),
        ("longitude", len(LONS)),
    ]
    variables = {
        "time": (
            ["time"], hours,
            {"units": "hours since 2024-03-01T00:00:00Z", "axis": "T"},
        ),
        "altitude": (["altitude"], np.array(ALTS, dtype=np.float32), {"units": "m"}),
        "latitude": (
            ["latitude"], np.array(LATS, dtype=np.float32),
            {"units": "degrees_north"},
        ),
        "longitude": (
            ["longitude"], np.array(LONS, dtype=np.float32),
            {"units": "degrees_east"},
        ),
        "water_temp": (
            ["time", "altitude", "latitude", "longitude"], temp,
            {
                "_FillValue": np.int16(FILL_SHORT),
                "scale_factor": SCALE,
                "add_offset": OFFSET,
                "units": "degree_C",
            },
        ),
        "salinity": (
            ["time", "latitude", "longitude"], sal,
            {"_FillValue": np.float32(FILL_F4), "units": "PSU"},
        ),
    }
    write_netcdf_classic(
        path, dims, variables,
        {"title": "synthetic griddap fixture", "Conventions": "COARDS"},
    )


def truth_rows() -> pd.DataFrame:
    """The expected long form, via plain loops (independent of the
    parser): one row per grid cell per variable across both files."""
    rows = []
    for t_indices in ([0, 1, 2, 3], [4, 5]):
        for ti in t_indices:
            t = EPOCH + np.timedelta64(int(6 * ti * 3600 * 1_000_000), "us")
            t = pd.Timestamp(t)
            for ai, alt in enumerate(ALTS):
                for yi, lat in enumerate(LATS):
                    for xi, lon in enumerate(LONS):
                        raw = _temp_raw(ti, ai, yi, xi)
                        val = np.nan if raw == FILL_SHORT else float(raw) * SCALE + OFFSET
                        rows.append(
                            ("tempsal_grid", t, float(np.float32(alt)),
                             lat, lon, "water_temp", val)
                        )
            for yi, lat in enumerate(LATS):
                for xi, lon in enumerate(LONS):
                    raw = _sal_raw(ti, yi, xi)
                    val = np.nan if raw == FILL_F4 else raw
                    rows.append(
                        ("tempsal_grid", t, np.nan, lat, lon, "salinity", val)
                    )
    return pd.DataFrame(
        rows,
        columns=["dataset_id", "time", "altitude", "lat", "lon", "var", "value"],
    )


def ensure_griddap_fixture(root: str) -> tuple[str, str]:
    """Idempotently materialize the spool + truth under ``root``.
    Returns ``(nc_dir, truth_parquet_path)``.  Writes are atomic
    (tempfile + rename) so concurrent query builds can race safely."""
    nc_dir = os.path.join(root, "nc")
    truth = os.path.join(root, "grid_long_truth.parquet")
    os.makedirs(nc_dir, exist_ok=True)
    targets = {
        os.path.join(nc_dir, "tempsal_grid.nc"): ([0, 1, 2, 3], True),
        os.path.join(nc_dir, "tempsal_grid_subset_2.nc"): ([4, 5], False),
    }
    for path, (t_idx, rec) in targets.items():
        if not os.path.exists(path):
            fd, tmp = tempfile.mkstemp(dir=nc_dir, suffix=".tmp")
            os.close(fd)
            _write_file(tmp, t_idx, rec)
            os.replace(tmp, path)
    if not os.path.exists(truth):
        fd, tmp = tempfile.mkstemp(dir=root, suffix=".tmp")
        os.close(fd)
        df = truth_rows()
        # nullable floats so fill-value cells land as parquet NULLs (a
        # raw NaN would poison avg() on the oracle side); microsecond
        # timestamps so Spark reads TIMESTAMP, not nanos-as-long
        df["value"] = df["value"].astype("Float64")
        df["altitude"] = df["altitude"].astype("Float64")
        df["time"] = df["time"].astype("datetime64[us]")
        df.to_parquet(tmp, index=False)
        os.replace(tmp, truth)
    return nc_dir, truth


FIXTURE_ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "fixtures", "griddap")
