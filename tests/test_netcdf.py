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


def _pruning_file(tmp_path):
    """12 hourly records starting 2024-01-01T00, one record data var."""
    p = str(tmp_path / "prune.nc")
    t = np.arange(12, dtype=np.float64)  # hours since epoch below
    grid = np.arange(12 * 2 * 3, dtype=np.float32).reshape(12, 2, 3)
    nc.write_netcdf_classic(
        p,
        [("time", None), ("latitude", 2), ("longitude", 3)],
        {
            "time": (["time"], t, {"units": "hours since 2024-01-01T00:00:00Z"}),
            "grid": (["time", "latitude", "longitude"], grid, {}),
        },
        {},
    )
    return p, t, grid


def test_rec_range_decodes_only_the_slice(tmp_path):
    """Record pruning (VERDICT r4 #5): rec_range decodes records [3, 5)
    only — every record variable sliced identically, fixed vars intact,
    and the records_decoded telemetry shows the drop."""
    p, t, grid = _pruning_file(tmp_path)
    buf = open(p, "rb").read()
    parsed = nc.parse_netcdf_classic(buf, rec_range=(3, 5))
    assert parsed["records_total"] == 12 and parsed["records_decoded"] == 2
    np.testing.assert_array_equal(parsed["vars"]["time"]["data"], t[3:5])
    np.testing.assert_array_equal(parsed["vars"]["grid"]["data"], grid[3:5])
    # clamped edges; empty slice yields 0-record arrays, not an error
    assert nc.parse_netcdf_classic(buf, rec_range=(10, 99))["vars"]["grid"][
        "data"
    ].shape == (2, 2, 3)
    assert nc.parse_netcdf_classic(buf, rec_range=(5, 5))["vars"]["grid"][
        "data"
    ].shape == (0, 2, 3)


def test_time_rec_range_closed_form(tmp_path):
    """Header-only probe: a closed time interval maps to exactly the
    records inside it via the strided time-coordinate gather."""
    p, _, _ = _pruning_file(tmp_path)
    buf = open(p, "rb").read()
    d = np.datetime64
    # hours 3..5 inclusive -> records [3, 6)
    assert nc.time_rec_range(
        buf, d("2024-01-01T03:00:00"), d("2024-01-01T05:00:00")
    ) == (3, 6)
    # off-grid bounds still bracket correctly
    assert nc.time_rec_range(
        buf, d("2024-01-01T02:30:00"), d("2024-01-01T04:30:00")
    ) == (3, 5)
    # interval fully outside -> empty range (lo == hi)
    lo, hi = nc.time_rec_range(
        buf, d("2025-01-01T00:00:00"), d("2025-06-01T00:00:00")
    )
    assert lo == hi
    # a fixed-time-dim file can't prune records: full range fallback
    p2 = str(tmp_path / "fixed.nc")
    nc.write_netcdf_classic(
        p2,
        [("time", 4), ("x", 2)],
        {
            "time": (["time"], np.arange(4.0), {"units": "hours since 2024-01-01"}),
            "v": (["time", "x"], np.zeros((4, 2), np.float32), {}),
        },
        {},
    )
    buf2 = open(p2, "rb").read()
    assert nc.time_rec_range(
        buf2, d("2024-01-01T01:00:00"), d("2024-01-01T02:00:00")
    ) == (0, 0)  # numrecs is 0 for a no-record-dim file: nothing to prune


def test_spark_reader_time_range_pruned_equals_filtered_full(spark, tmp_path):
    """End to end: the record-pruned scan equals the full scan filtered
    to the same closed interval (the record file prunes; the fixed-dim
    subset file falls back to full decode and the comparison still
    holds because the filter drops nothing extra in the pruned case)."""
    nc_dir, _ = ensure_griddap_fixture(FIXTURE_ROOT)
    t0 = np.datetime64("2024-03-01T06:00:00")
    t1 = np.datetime64("2024-03-01T12:00:00")
    pruned = nc.read_griddap_netcdf(spark, nc_dir, time_range=(t0, t1))
    full = nc.read_griddap_netcdf(spark, nc_dir)
    lohi = (F.col("time") >= F.lit(pd.Timestamp(t0))) & (
        F.col("time") <= F.lit(pd.Timestamp(t1))
    )
    from collections import Counter

    def norm(rows):  # NaN normalized: float('nan') instances hash by id
        return Counter(
            tuple(
                None if isinstance(x, float) and x != x else x for x in r
            )
            for r in map(tuple, rows)
        )

    got = norm(pruned.filter(lohi).collect())
    want = norm(full.filter(lohi).collect())
    assert got == want and sum(want.values()) > 0


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


# ---------------------------------------------------------------------------
# property fuzz: writer -> parser roundtrip over random grids


from hypothesis import given, settings
from hypothesis import strategies as st

from erddap2agol_spark.sources.netcdf import (
    parse_netcdf_classic,
    write_netcdf_classic,
)

_FUZZ_DTYPES = ["int8", "int16", "int32", "float32", "float64"]


@st.composite
def _nc_spec(draw):
    n_dims = draw(st.integers(1, 3))
    has_rec = draw(st.booleans())
    sizes = [draw(st.integers(1, 4)) for _ in range(n_dims)]
    dim_names = [f"d{i}" for i in range(n_dims)]
    dims = [
        (nm, None if (has_rec and i == 0) else sizes[i])
        for i, nm in enumerate(dim_names)
    ]
    numrecs = draw(st.integers(1, 3)) if has_rec else 0
    fixed_pool = dim_names[1:] if has_rec else dim_names

    variables = {}
    for vi in range(draw(st.integers(1, 3))):
        is_rec = has_rec and (not fixed_pool or draw(st.booleans()))
        if is_rec:
            extra = (
                draw(
                    st.lists(
                        st.sampled_from(fixed_pool), unique=True, max_size=2
                    )
                )
                if fixed_pool
                else []
            )
            dnames = [dim_names[0]] + extra
            shape = (numrecs,) + tuple(
                sizes[dim_names.index(d)] for d in extra
            )
        else:
            dnames = draw(
                st.lists(
                    st.sampled_from(fixed_pool),
                    unique=True,
                    min_size=1,
                    max_size=len(fixed_pool),
                )
            )
            shape = tuple(sizes[dim_names.index(d)] for d in dnames)
        dtype = draw(st.sampled_from(_FUZZ_DTYPES))
        seed = draw(st.integers(0, 2**31 - 1))
        rng = np.random.RandomState(seed)
        if dtype.startswith("int"):
            data = rng.randint(-100, 100, size=shape).astype(dtype)
        else:
            data = rng.randint(-1000, 1000, size=shape).astype(dtype) / 8.0
        attrs = {}
        if draw(st.booleans()):
            attrs["units"] = draw(st.sampled_from(["m", "degC", "psu 1e-3"]))
        if draw(st.booleans()):
            attrs["flag"] = draw(st.integers(-5, 5))
        variables[f"v{vi}"] = (dnames, data, attrs)
    gattrs = {"title": "fuzz"} if draw(st.booleans()) else {}
    return dims, variables, gattrs


@given(spec=_nc_spec())
@settings(max_examples=40, deadline=None)
def test_netcdf_roundtrip_fuzz(spec):
    """Random CDF-1 grids (mixed record/fixed variables, 1-3 dims,
    every supported numeric dtype, optional attrs) survive the
    writer -> parser roundtrip bit-exactly — slab padding, the
    single-record-variable no-padding special case, record striding
    and attr encoding all exercised far beyond the golden fixtures."""
    import os
    import tempfile

    dims, variables, gattrs = spec
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "fuzz.nc")
        write_netcdf_classic(path, dims, variables, gattrs)
        parsed = parse_netcdf_classic(open(path, "rb").read())

    parsed_dims = dict(parsed["dims"])
    for name, size in dims:
        assert parsed_dims[name] == (0 if size is None else size)
    assert parsed["attrs"] == gattrs
    assert set(parsed["vars"]) == set(variables)
    for name, (dnames, data, attrs) in variables.items():
        got = parsed["vars"][name]
        assert got["dims"] == list(dnames)
        assert got["attrs"] == attrs
        assert got["data"].shape == data.shape
        assert np.array_equal(got["data"], data), name


@given(spec=_nc_spec(), lo=st.integers(0, 4), width=st.integers(0, 4))
@settings(max_examples=40, deadline=None)
def test_netcdf_rec_range_fuzz(spec, lo, width):
    """Record pruning is a pure SLICE for any random file and any
    (clamped) record range: every record variable equals the full
    parse's [lo:hi] slice, fixed variables are untouched, and the
    telemetry counts match."""
    import os
    import tempfile

    dims, variables, gattrs = spec
    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "fuzz.nc")
        write_netcdf_classic(path, dims, variables, gattrs)
        buf = open(path, "rb").read()
    full = parse_netcdf_classic(buf)
    total = full["records_total"]
    sliced = parse_netcdf_classic(buf, rec_range=(lo, lo + width))
    c_lo, c_hi = min(lo, total), min(max(lo, lo + width), total)
    assert sliced["records_decoded"] == c_hi - c_lo
    rec_dim = next((n for n, s in dims if s is None), None)
    for name, (dnames, _, _) in variables.items():
        got = sliced["vars"][name]["data"]
        want = full["vars"][name]["data"]
        if rec_dim is not None and dnames and dnames[0] == rec_dim:
            assert np.array_equal(got, want[c_lo:c_hi]), name
        else:
            assert np.array_equal(got, want), name


def test_streaming_sentinel_numrecs_derives_from_length(tmp_path):
    """Spec STREAMING sentinel: numrecs = 0xFFFFFFFF means 'derive the
    record count from the file length' — a live server may stream this;
    the parser must not read it as 'zero records' (review r5)."""
    p, t, grid = _pruning_file(tmp_path)
    buf = bytearray(open(p, "rb").read())
    assert struct.unpack(">i", bytes(buf[4:8]))[0] == 12
    buf[4:8] = b"\xff\xff\xff\xff"
    parsed = nc.parse_netcdf_classic(bytes(buf))
    assert parsed["records_total"] == 12  # derived, not -1 or 0
    np.testing.assert_array_equal(parsed["vars"]["grid"]["data"], grid)
    # record pruning still composes with the derived count
    sliced = nc.parse_netcdf_classic(bytes(buf), rec_range=(3, 5))
    np.testing.assert_array_equal(sliced["vars"]["time"]["data"], t[3:5])
