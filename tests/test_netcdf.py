"""NetCDF-classic ingestion (S7 physical path): pure-numpy CDF-1
writer/parser round-trips, spec-level golden bytes, CF decoding, and the
binaryFile + mapInPandas Spark reader against the independent truth."""

from __future__ import annotations

import glob
import struct

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.sources import netcdf as nc
from erddap2agol_spark.sources.griddap_fixture import (
    FIXTURE_ROOT,
    ensure_griddap_fixture,
    truth_rows,
)


def test_golden_header_bytes(tmp_path):
    """The writer must produce the PUBLIC spec layout, not merely
    something its own parser accepts: magic CDF\\x01, big-endian numrecs,
    NC_DIMENSION/NC_VARIABLE tags, 4-byte-padded names."""
    p = str(tmp_path / "min.nc")
    nc.write_netcdf_classic(
        p,
        [("x", 3)],
        {"v": (["x"], np.array([1, 2, 3], dtype=np.int32), {})},
        {},
    )
    buf = open(p, "rb").read()
    assert buf[:4] == b"CDF\x01"
    assert struct.unpack(">i", buf[4:8])[0] == 0  # numrecs
    assert struct.unpack(">ii", buf[8:16]) == (0x0A, 1)  # dim list, 1 dim
    # name "x": len 1, padded to 4
    assert struct.unpack(">i", buf[16:20])[0] == 1
    assert buf[20:24] == b"x\x00\x00\x00"
    assert struct.unpack(">i", buf[24:28])[0] == 3  # dim length
    # data: three big-endian int32 at the var's begin (last 12 bytes)
    assert buf[-12:] == struct.pack(">iii", 1, 2, 3)


def test_roundtrip_fixed_and_record(tmp_path):
    p = str(tmp_path / "rt.nc")
    t = np.array([0.0, 1.5, 3.0], dtype=np.float64)
    grid = np.arange(3 * 2 * 4, dtype=np.float32).reshape(3, 2, 4)
    flags = np.array([[1, 0], [0, 1], [1, 1]], dtype=np.int8)
    fixed = np.array([[10, 20, 30, 40], [50, 60, 70, 80]], dtype=np.int16)
    nc.write_netcdf_classic(
        p,
        [("time", None), ("y", 2), ("x", 4)],
        {
            "time": (["time"], t, {"units": "days since 2000-01-01"}),
            "grid": (["time", "y", "x"], grid, {"_FillValue": np.float32(-1.0)}),
            "flags": (["time", "y"], flags, {}),
            "fixed": (["y", "x"], fixed, {"scale_factor": 2.0}),
        },
        {"title": "rt", "level": np.int32(7)},
    )
    parsed = nc.parse_netcdf_classic(open(p, "rb").read())
    assert parsed["dims"] == [("time", 0), ("y", 2), ("x", 4)]
    assert parsed["attrs"]["title"] == "rt"
    assert parsed["attrs"]["level"] == 7
    np.testing.assert_array_equal(parsed["vars"]["time"]["data"], t)
    np.testing.assert_array_equal(parsed["vars"]["grid"]["data"], grid)
    np.testing.assert_array_equal(parsed["vars"]["flags"]["data"], flags)
    np.testing.assert_array_equal(parsed["vars"]["fixed"]["data"], fixed)
    assert parsed["vars"]["fixed"]["attrs"]["scale_factor"] == 2.0


def test_roundtrip_single_record_var_no_padding(tmp_path):
    """Spec special case: with exactly ONE record variable the record
    slab is NOT padded to 4 bytes — an i2 slab of 6 bytes strides by 6."""
    p = str(tmp_path / "single.nc")
    data = np.arange(12, dtype=np.int16).reshape(4, 3)  # slab 6 bytes
    nc.write_netcdf_classic(
        p, [("time", None), ("x", 3)], {"v": (["time", "x"], data, {})}, {}
    )
    buf = open(p, "rb").read()
    parsed = nc.parse_netcdf_classic(buf)
    np.testing.assert_array_equal(parsed["vars"]["v"]["data"], data)
    # records really are 6 bytes apart: total data = 4*6
    begin = buf.rfind(struct.pack(">hhh", 0, 1, 2))
    assert buf[begin: begin + 24] == data.astype(">i2").tobytes()


def test_cf_decode_fill_scale_offset():
    var = {
        "attrs": {"_FillValue": np.int16(-9), "scale_factor": 0.5, "add_offset": 100.0},
        "data": np.array([-9, 0, 4], dtype=np.int16),
        "dims": ["x"],
    }
    out = nc.cf_decode_values(var)
    assert np.isnan(out[0]) and out[1] == 100.0 and out[2] == 102.0


def test_cf_decode_time_units():
    for units, secs in [
        ("seconds since 1970-01-01T00:00:00Z", 1.0),
        ("hours since 2024-03-01 00:00:00", 3600.0),
        ("days since 2020-06-01", 86400.0),
    ]:
        var = {"attrs": {"units": units}, "data": np.array([0.0, 2.0]), "dims": ["t"]}
        out = nc.cf_decode_time(var)
        delta = (out[1] - out[0]) / np.timedelta64(1, "s")
        assert delta == 2 * secs, units
    with pytest.raises(ValueError):
        nc.cf_decode_time(
            {"attrs": {"units": "fortnights since 2020-01-01"}, "data": np.array([1.0]), "dims": ["t"]}
        )


def test_grid_long_matches_independent_truth():
    """Full decode of the spool (record file + fixed file) equals the
    loop-computed truth, row for row."""
    nc_dir, _ = ensure_griddap_fixture(FIXTURE_ROOT)
    frames = [
        nc.grid_long_pandas(
            nc.parse_netcdf_classic(open(p, "rb").read()), "tempsal_grid"
        )
        for p in sorted(glob.glob(nc_dir + "/*.nc"))
    ]
    dec = pd.concat(frames, ignore_index=True)
    tr = truth_rows()
    key = ["dataset_id", "var", "time", "altitude", "lat", "lon"]
    dec = dec.sort_values(key, na_position="first").reset_index(drop=True)
    tr = tr.sort_values(key, na_position="first").reset_index(drop=True)
    dec["time"] = dec["time"].astype("datetime64[us]")
    tr["time"] = tr["time"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(dec, tr, check_dtype=False)


def test_spark_reader_matches_truth(spark):
    """binaryFile + mapInPandas == truth parquet, via Spark collect on
    both sides (exercises dataset-id extraction incl. the _subset_N
    suffix strip, Arrow batch decode, schema)."""
    nc_dir, truth = ensure_griddap_fixture(FIXTURE_ROOT)
    got = nc.read_griddap_netcdf(spark, nc_dir)
    assert got.columns == [
        "dataset_id", "time", "altitude", "lat", "lon", "var", "value"
    ]
    want = spark.read.parquet(truth)

    def keyed(df):
        out = {}
        for r in df.collect():
            v = r["value"]
            if v is not None and v != v:  # NaN -> missing
                v = None
            alt = r["altitude"]
            if alt is not None and alt != alt:
                alt = None
            out[(r["dataset_id"], r["var"], r["time"], alt, r["lat"], r["lon"])] = (
                None if v is None else round(v, 9)
            )
        return out

    g, w = keyed(got), keyed(want)
    assert len(g) == len(w) == 720
    assert g == w
    # every file decodes: both layouts, all six time steps present
    times = {r["time"] for r in got.select("time").distinct().collect()}
    assert len(times) == 6


def test_ingest_feeds_grid_operators(spark):
    """The decoded long form flows into the existing S7 operator
    surface: hyperslab + first-altitude slice + N->S export ordering."""
    from erddap2agol_spark.operators import grid

    nc_dir, _ = ensure_griddap_fixture(FIXTURE_ROOT)
    cells = nc.read_griddap_netcdf(spark, nc_dir).filter(F.col("var") == "water_temp")
    surf = grid.first_altitude_slice(cells, "altitude")
    # fixture altitudes are 0/-10/-25; "first" = min = -25 per operator
    assert {r["altitude"] for r in surf.select("altitude").distinct().collect()} == {-25.0}
    sliced = grid.hyperslab(
        surf, "time", "lat", "lon",
        time_range=("2024-03-01 00:00:00", "2024-03-01 12:00:00"),
        lon_range=(-94.5, -92.5),
    )
    assert sliced.count() == 3 * 6 * 2  # 3 times x 6 lats x 2 lons
    ordered = grid.north_south_order(sliced, "time", "lat", "lon")
    rows = ordered.collect()
    assert len(rows) == 36
