"""NetCDF-classic (CDF-1/CDF-2) binary ingestion — the physical half of
S7 (SURVEY §2.1).

The reference downloads real NetCDF bytes for griddap datasets
(src/data_wrangler.py:592-604 writes ``response.content`` straight to
``*.nc``) and later decodes them with xarray, normalizing the latitude
axis direction (src/agol_wrangler.py:235-261 ``changeArrayDims``).  The
Spark-first mapping (SURVEY §2.1 S7): ``spark.read.format("binaryFile")``
over the ``.nc`` spool + an Arrow-batched ``mapInPandas`` decode into the
LONG grid form ``(time, altitude, lat, lon, var, value)`` that
``operators/grid.py`` already melts / hyperslabs / exports.  One file =
one decode task, so a spool of per-subset downloads (the reference's
``{dataset_id}_subset_{n}.nc`` naming) decodes embarrassingly parallel —
no shuffle anywhere in ingestion.

No xarray/netCDF4/scipy in this environment, and none needed: the
classic format is a short public spec (magic ``CDF\\x01``/``\\x02``,
big-endian header of dim/attr/var lists, contiguous non-record data,
interleaved record data).  ``parse_netcdf_classic`` reads it with numpy
alone, including the unlimited (record) dimension and the
single-record-variable no-padding special case.  CF decoding covers the
attributes ERDDAP actually emits: ``_FillValue``/``missing_value``,
``scale_factor``/``add_offset``, and ``units: <unit> since <epoch>`` on
the time coordinate.

``write_netcdf_classic`` is the fixture half — tests and the graded
``griddap_ingest`` query write a deterministic synthetic grid with it,
then prove the binary decode against an independently-computed long-form
parquet truth (DuckDB oracle reads the truth; Spark reads the bytes).
"""

from __future__ import annotations

import struct
from collections.abc import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C

_TYPE_TO_DTYPE = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}
_KIND_TO_TYPE = {"i1": NC_BYTE, "S1": NC_CHAR, "i2": NC_SHORT,
                 "i4": NC_INT, "f4": NC_FLOAT, "f8": NC_DOUBLE}


def _pad4(n: int) -> int:
    return (n + 3) & ~3


# ---------------------------------------------------------------- writer


def _enc_name(name: str) -> bytes:
    b = name.encode("utf-8")
    return struct.pack(">i", len(b)) + b + b"\x00" * (_pad4(len(b)) - len(b))


def _attr_payload(value) -> tuple[int, bytes, int]:
    """-> (nc_type, packed values WITHOUT padding, nelems)."""
    if isinstance(value, str):
        b = value.encode("utf-8")
        return NC_CHAR, b, len(b)
    arr = np.atleast_1d(np.asarray(value))
    if arr.dtype.kind == "f":
        arr = arr.astype(">f8") if arr.dtype.itemsize > 4 else arr.astype(">f4")
    elif arr.dtype.itemsize <= 1:
        arr = arr.astype(">i1")
    elif arr.dtype.itemsize == 2:
        arr = arr.astype(">i2")
    else:
        arr = arr.astype(">i4")
    return _KIND_TO_TYPE[arr.dtype.str[1:]], arr.tobytes(), arr.size


def _enc_attrs(attrs: dict) -> bytes:
    if not attrs:
        return struct.pack(">ii", 0, 0)  # ABSENT
    out = [struct.pack(">ii", _NC_ATTRIBUTE, len(attrs))]
    for k, v in attrs.items():
        t, payload, nelems = _attr_payload(v)
        out.append(_enc_name(k))
        out.append(struct.pack(">ii", t, nelems))
        out.append(payload + b"\x00" * (_pad4(len(payload)) - len(payload)))
    return b"".join(out)


def write_netcdf_classic(
    path: str,
    dims: Sequence[tuple[str, int | None]],
    variables: dict[str, tuple[Sequence[str], np.ndarray, dict]],
    global_attrs: dict | None = None,
) -> None:
    """Write a CDF-1 file.  ``dims``: ordered ``(name, size)`` with
    ``None`` size marking the record (unlimited) dimension.  Each
    variable: ``(dim_names, data, attrs)``; a record variable's data
    carries the record count as its first axis."""
    dim_ids = {name: i for i, (name, _) in enumerate(dims)}
    rec_dim = next((n for n, s in dims if s is None), None)

    numrecs = 0
    var_order = list(variables)
    rec_vars = [
        v for v in var_order if rec_dim and variables[v][0] and variables[v][0][0] == rec_dim
    ]
    for v in rec_vars:
        numrecs = max(numrecs, variables[v][1].shape[0])

    # per-variable slab metadata
    metas = {}
    for name in var_order:
        dnames, data, attrs = variables[name]
        arr = np.ascontiguousarray(data)
        nc_type = _KIND_TO_TYPE[
            {"int8": "i1", "|S1": "S1", "int16": "i2", "int32": "i4",
             "float32": "f4", "float64": "f8"}.get(str(arr.dtype), arr.dtype.str[1:])
        ]
        be = arr.astype(_TYPE_TO_DTYPE[nc_type])
        is_rec = name in rec_vars
        slab_shape = be.shape[1:] if is_rec else be.shape
        slab_bytes = int(np.prod(slab_shape, dtype=np.int64)) * be.dtype.itemsize
        # vsize: one record's (or the whole var's) bytes, padded to 4 —
        # except the single-record-variable special case
        pad = len(rec_vars) != 1 or not is_rec
        vsize = _pad4(slab_bytes) if pad else slab_bytes
        metas[name] = dict(
            dnames=list(dnames), attrs=attrs, nc_type=nc_type, be=be,
            is_rec=is_rec, slab_bytes=slab_bytes, vsize=vsize,
        )

    # header size: lay it out once with dummy begins, then patch
    def header(begins: dict[str, int]) -> bytes:
        out = [b"CDF\x01", struct.pack(">i", numrecs)]
        if dims:
            out.append(struct.pack(">ii", _NC_DIMENSION, len(dims)))
            for dname, dsize in dims:
                out.append(_enc_name(dname))
                out.append(struct.pack(">i", 0 if dsize is None else dsize))
        else:
            out.append(struct.pack(">ii", 0, 0))
        out.append(_enc_attrs(global_attrs or {}))
        if variables:
            out.append(struct.pack(">ii", _NC_VARIABLE, len(variables)))
            for name in var_order:
                m = metas[name]
                out.append(_enc_name(name))
                out.append(struct.pack(">i", len(m["dnames"])))
                for dn in m["dnames"]:
                    out.append(struct.pack(">i", dim_ids[dn]))
                out.append(_enc_attrs(m["attrs"]))
                out.append(struct.pack(">iii", m["nc_type"], m["vsize"], begins[name]))
        else:
            out.append(struct.pack(">ii", 0, 0))
        return b"".join(out)

    hsize = len(header(dict.fromkeys(var_order, 0)))
    begins, off = {}, hsize
    for name in var_order:  # non-record data first, contiguous
        if not metas[name]["is_rec"]:
            begins[name] = off
            off += _pad4(metas[name]["slab_bytes"])
    rec_base = off
    for name in var_order:  # record begins point into record 0
        if metas[name]["is_rec"]:
            begins[name] = off
            off += metas[name]["vsize"]
    recsize = off - rec_base

    body = bytearray(b"\x00" * (rec_base + recsize * numrecs - hsize))
    for name in var_order:
        m = metas[name]
        if not m["is_rec"]:
            raw = m["be"].tobytes()
            body[begins[name] - hsize: begins[name] - hsize + len(raw)] = raw
        else:
            for r in range(m["be"].shape[0]):
                # slice (not index): be[r] on a 1-D array returns a
                # NATIVE-endian numpy scalar and tobytes() would flip
                # the byte order; be[r:r+1] keeps the big-endian dtype
                raw = m["be"][r: r + 1].tobytes()
                start = begins[name] - hsize + r * recsize
                body[start: start + len(raw)] = raw
    with open(path, "wb") as f:
        f.write(header(begins))
        f.write(bytes(body))


# ---------------------------------------------------------------- parser


class _Reader:
    def __init__(self, buf: bytes) -> None:
        self.buf, self.pos = buf, 0

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos: self.pos + n]
        self.pos += n
        return b

    def i4(self) -> int:
        return struct.unpack(">i", self.take(4))[0]

    def i8(self) -> int:
        return struct.unpack(">q", self.take(8))[0]

    def name(self) -> str:
        n = self.i4()
        s = self.take(n).decode("utf-8")
        self.take(_pad4(n) - n)
        return s

    def attrs(self) -> dict:
        tag, nelems = self.i4(), self.i4()
        out = {}
        if tag == 0:
            return out
        if tag != _NC_ATTRIBUTE:
            raise ValueError(f"bad attr list tag {tag}")
        for _ in range(nelems):
            k = self.name()
            t, n = self.i4(), self.i4()
            dt = _TYPE_TO_DTYPE[t]
            raw = self.take(n * dt.itemsize)
            self.take(_pad4(n * dt.itemsize) - n * dt.itemsize)
            if t == NC_CHAR:
                out[k] = raw.decode("utf-8", errors="replace")
            else:
                vals = np.frombuffer(raw, dtype=dt)
                out[k] = vals[0].item() if vals.size == 1 else vals
        return out


def _parse_header(buf: bytes):
    """Header-only parse (a few hundred bytes of reading, no data):
    ``(numrecs, dims, gattrs, raw_vars, recsize)`` where ``raw_vars``
    entries are ``(name, dim_ids, attrs, nc_type, vsize, begin)``."""
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a NetCDF classic (CDF-1/CDF-2) file")
    wide = buf[3] == 2
    r = _Reader(buf)
    r.take(4)
    numrecs = r.i4()

    tag, ndims = r.i4(), r.i4()
    dims: list[tuple[str, int]] = []
    if tag == _NC_DIMENSION:
        dims = [(r.name(), r.i4()) for _ in range(ndims)]
    elif tag != 0:
        raise ValueError(f"bad dim list tag {tag}")
    gattrs = r.attrs()

    tag, nvars = r.i4(), r.i4()
    if tag not in (0, _NC_VARIABLE):
        raise ValueError(f"bad var list tag {tag}")
    raw_vars = []
    for _ in range(nvars if tag else 0):
        vname = r.name()
        vdims = [r.i4() for _ in range(r.i4())]
        vattrs = r.attrs()
        nc_type, vsize = r.i4(), r.i4()
        begin = r.i8() if wide else r.i4()
        raw_vars.append((vname, vdims, vattrs, nc_type, vsize, begin))

    rec_vars = [v for v in raw_vars if v[1] and dims[v[1][0]][1] == 0]
    # actual record stride: padded slabs, EXCEPT when there is exactly
    # one record variable (spec: no padding in that case)
    recsize = 0
    for vname, vdims, _, nc_type, _, _ in rec_vars:
        dt = _TYPE_TO_DTYPE[nc_type]
        slab = int(
            np.prod([dims[d][1] for d in vdims[1:]], dtype=np.int64)
        ) * dt.itemsize
        recsize += slab if len(rec_vars) == 1 else _pad4(slab)
    if numrecs < 0:
        # spec STREAMING sentinel (numrecs = 0xFFFFFFFF reads as -1
        # signed): the record count is 'derive from the file length' —
        # load-bearing now that the HTTP path feeds the parser live wire
        # responses, not just repo-written fixtures
        if rec_vars and recsize > 0:
            rec_start = min(v[5] for v in rec_vars)
            numrecs = max(0, (len(buf) - rec_start) // recsize)
        else:
            numrecs = 0
    return numrecs, dims, gattrs, raw_vars, recsize


def time_rec_range(buf: bytes, t_lo, t_hi) -> tuple[int, int]:
    """Map a CLOSED time interval ``[t_lo, t_hi]`` to the half-open
    RECORD range ``[lo, hi)`` it occupies, reading only the header and
    the time coordinate's values (strided gather at the closed-form
    offsets ``begin + r * recsize`` — never a data slab).

    This is P5's time hyperslab pushed into the record dimension
    (VERDICT r4 #5): pass the result as ``parse_netcdf_classic``'s
    ``rec_range`` and a task decodes only its slice's records. Falls
    back to the full range when time is not the record coordinate or is
    not monotonically non-decreasing (correctness before pruning).
    """
    numrecs, dims, _, raw_vars, recsize = _parse_header(buf)
    coord = None
    for vname, vdims, vattrs, nc_type, _, begin in raw_vars:
        if (
            len(vdims) == 1
            and dims[vdims[0]][1] == 0  # the record dimension
            and dims[vdims[0]][0] == vname  # coordinate convention
            and _dim_role(vname) == "time"
        ):
            coord = (vname, vattrs, nc_type, begin)
            break
    if coord is None or numrecs == 0 or recsize == 0:
        return (0, numrecs)
    _, vattrs, nc_type, begin = coord
    dt = _TYPE_TO_DTYPE[nc_type]
    raw = np.ndarray(
        shape=(numrecs,), dtype=dt, buffer=buf, offset=begin,
        strides=(recsize,),
    )
    times = cf_decode_time({"attrs": vattrs, "data": raw})
    if numrecs > 1 and (np.diff(times) < np.timedelta64(0, "us")).any():
        return (0, numrecs)  # non-monotonic: no order to binary-search
    lo64 = np.datetime64(t_lo, "us")
    hi64 = np.datetime64(t_hi, "us")
    lo = int(np.searchsorted(times, lo64, side="left"))
    hi = int(np.searchsorted(times, hi64, side="right"))
    return (lo, hi)


def parse_netcdf_classic(buf: bytes, rec_range: tuple[int, int] | None = None) -> dict:
    """Decode a CDF-1/CDF-2 byte string.

    Returns ``{"dims": [(name, size)], "attrs": {...}, "vars": {name:
    {"dims": [...], "attrs": {...}, "data": np.ndarray}}}`` with record
    variables already stacked along axis 0.

    ``rec_range=(lo, hi)`` decodes only records ``lo <= r < hi`` (clamped
    to ``[0, numrecs)``) — record-dimension PRUNING (VERDICT r4 #5): the
    classic format stores record data interleaved at the closed-form
    offset ``begin + r * recsize``, so a time-sliced scan task can skip
    straight to its records instead of decoding the whole file. Every
    record variable (data AND the record coordinate) is sliced
    identically, so downstream meshgrids stay consistent; non-record
    variables are untouched. ``parsed["records_decoded"]`` /
    ``parsed["records_total"]`` report the drop.
    """
    numrecs, dims, gattrs, raw_vars, recsize = _parse_header(buf)

    rec_lo, rec_hi = 0, numrecs
    if rec_range is not None:
        rec_lo = min(max(0, rec_range[0]), numrecs)
        rec_hi = min(max(rec_lo, rec_range[1]), numrecs)

    out_vars = {}
    for vname, vdims, vattrs, nc_type, _, begin in raw_vars:
        dt = _TYPE_TO_DTYPE[nc_type]
        dnames = [dims[d][0] for d in vdims]
        if vdims and dims[vdims[0]][1] == 0:  # record variable
            slab_shape = tuple(dims[d][1] for d in vdims[1:])
            slab = int(np.prod(slab_shape, dtype=np.int64)) * dt.itemsize
            recs = []
            for rec in range(rec_lo, rec_hi):
                start = begin + rec * recsize
                recs.append(
                    np.frombuffer(buf, dtype=dt, count=slab // dt.itemsize,
                                  offset=start).reshape(slab_shape)
                )
            data = (np.stack(recs) if recs
                    else np.empty((0, *slab_shape), dtype=dt))
        else:
            shape = tuple(dims[d][1] for d in vdims)
            count = int(np.prod(shape, dtype=np.int64))
            data = np.frombuffer(buf, dtype=dt, count=count,
                                 offset=begin).reshape(shape)
        out_vars[vname] = {"dims": dnames, "attrs": vattrs, "data": data}
    return {
        "dims": dims,
        "attrs": gattrs,
        "vars": out_vars,
        "records_total": numrecs,
        "records_decoded": rec_hi - rec_lo,
    }


# ------------------------------------------------------------- CF decode


_TIME_UNIT_SECONDS = {
    "seconds": 1.0, "second": 1.0, "secs": 1.0, "sec": 1.0, "s": 1.0,
    "minutes": 60.0, "minute": 60.0, "mins": 60.0, "min": 60.0,
    "hours": 3600.0, "hour": 3600.0, "hrs": 3600.0, "hr": 3600.0, "h": 3600.0,
    "days": 86400.0, "day": 86400.0, "d": 86400.0,
}


def cf_decode_values(var: dict) -> np.ndarray:
    """Apply ``_FillValue``/``missing_value`` then
    ``scale_factor``/``add_offset`` (CF packing), always in float64 so
    the truth side of any parity check can reproduce the arithmetic
    bit-for-bit."""
    attrs = var["attrs"]
    raw = np.asarray(var["data"])
    data = raw.astype(np.float64)
    for key in ("_FillValue", "missing_value"):
        if key in attrs:
            fill = float(np.asarray(attrs[key]).ravel()[0])
            data = np.where(raw == fill, np.nan, data)
    scale = float(np.asarray(attrs.get("scale_factor", 1.0)).ravel()[0])
    offset = float(np.asarray(attrs.get("add_offset", 0.0)).ravel()[0])
    if scale != 1.0 or offset != 0.0:
        data = data * scale + offset
    return data


def cf_decode_time(var: dict) -> np.ndarray:
    """CF ``<unit> since <epoch>`` -> numpy datetime64[us] (UTC)."""
    units = str(var["attrs"].get("units", "seconds since 1970-01-01T00:00:00Z"))
    try:
        unit, _, epoch = units.partition(" since ")
        mult = _TIME_UNIT_SECONDS[unit.strip().lower()]
        epoch64 = np.datetime64(
            epoch.strip().rstrip("Z").replace(" ", "T"), "us"
        )
    except (KeyError, ValueError) as e:
        raise ValueError(f"unsupported CF time units {units!r}") from e
    vals = np.asarray(var["data"]).astype(np.float64) * mult
    return epoch64 + (vals * 1e6).round().astype("timedelta64[us]")


_ROLE_NAMES = {
    "time": ("time", "t"),
    "altitude": ("altitude", "depth", "z", "alt", "elevation"),
    # the reference's own lat/lon candidate lists (agol_wrangler.py:244)
    "lat": ("latitude", "lat", "y"),
    "lon": ("longitude", "lon", "x"),
}


def _dim_role(name: str) -> str | None:
    low = name.lower()
    for role, names in _ROLE_NAMES.items():
        if low in names:
            return role
    return None


def grid_long_pandas(parsed: dict, dataset_id: str) -> pd.DataFrame:
    """One parsed file -> long-form pandas frame
    ``(dataset_id, time, altitude, lat, lon, var, value)``.

    Coordinate variables are the 1-D variables named after their
    dimension (the NetCDF convention); data variables are everything
    whose dims all have a recognized role and include lat+lon.  NaN
    cells (fill values) are KEPT — the reference keeps them too and
    filters later (src/erddap_wrangler.py:380-385); drop with
    ``filters.drop_invalid_coords`` / a null filter downstream.
    """
    coords: dict[str, dict] = {}
    for name, var in parsed["vars"].items():
        if var["dims"] == [name]:
            coords[name] = var
    frames = []
    for name, var in parsed["vars"].items():
        if name in coords:
            continue
        roles = [_dim_role(d) for d in var["dims"]]
        if None in roles or "lat" not in roles or "lon" not in roles:
            continue
        axes = []
        for dname, role in zip(var["dims"], roles):
            cvar = coords.get(dname)
            if cvar is None:
                axes.append(np.arange(parsed_dim_size(parsed, dname), dtype=np.float64))
            elif role == "time":
                axes.append(cf_decode_time(cvar))
            else:
                axes.append(cf_decode_values(cvar))
        mesh = np.meshgrid(*axes, indexing="ij")
        cols = {role: m.ravel() for role, m in zip(roles, mesh)}
        values = cf_decode_values(var).ravel()
        frame = pd.DataFrame(
            {
                "dataset_id": dataset_id,
                "time": pd.to_datetime(cols.get("time")),
                "altitude": cols.get("altitude", np.nan),
                "lat": cols["lat"],
                "lon": cols["lon"],
                "var": name,
                "value": values,
            }
        )
        frames.append(frame)
    if not frames:
        return pd.DataFrame(
            columns=["dataset_id", "time", "altitude", "lat", "lon", "var", "value"]
        )
    return pd.concat(frames, ignore_index=True)


def parsed_dim_size(parsed: dict, dname: str) -> int:
    for name, size in parsed["dims"]:
        if name == dname:
            return size
    raise KeyError(dname)


# ------------------------------------------------------------ Spark side

GRID_LONG_SCHEMA = (
    "dataset_id string, time timestamp, altitude double, "
    "lat double, lon double, var string, value double"
)


def read_griddap_netcdf(spark, path: str, time_range: tuple | None = None):
    """S7 physical path: ``binaryFile`` scan over ``.nc`` spool files +
    ``mapInPandas`` decode to the long grid form.

    One input file = one Arrow batch = one decode call, so parallelism
    equals the file count (the reference spools one file per
    time-subset, src/data_wrangler.py:592-604 — exactly the unit you
    want).  The decode itself is numpy slicing, no Python-per-row work,
    and the output flows straight into ``operators/grid.py``
    (hyperslab, melt is already long, N->S export ordering).

    ``time_range=(t_lo, t_hi)`` (closed interval, datetime/datetime64)
    pushes P5's time hyperslab into the RECORD dimension: each task maps
    the interval to record offsets from the header alone
    (:func:`time_rec_range`) and decodes only those records — a
    one-day slice of a year-long file decodes ~1/365th of the slabs.
    Pruning is a best-effort SKIP, not a filter: it is exact when time
    is the record coordinate, and falls back to full decode otherwise —
    callers wanting exact bounds still compose the hyperslab time filter
    (operators/grid.py) downstream, which then drops nothing extra in
    the pruned case.
    """
    from pyspark.sql import functions as F

    binary = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.nc")
        .load(path)
        .select(
            F.regexp_extract(
                F.element_at(F.split(F.col("path"), "/"), -1),
                r"^(.*?)(?:_subset_\d+)?\.nc$",
                1,
            ).alias("dataset_id"),
            "content",
        )
    )

    def decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for dataset_id, content in zip(pdf["dataset_id"], pdf["content"]):
                out = _decode_long(bytes(content), dataset_id, time_range)
                if len(out):
                    yield out

    return binary.mapInPandas(decode, schema=GRID_LONG_SCHEMA)


def _decode_long(buf: bytes, dataset_id: str, time_range: tuple | None) -> pd.DataFrame:
    """One .nc byte string -> long-form frame, with the record-range
    prune applied when a time interval is given."""
    rng = (
        time_rec_range(buf, time_range[0], time_range[1])
        if time_range is not None
        else None
    )
    return grid_long_pandas(parse_netcdf_classic(buf, rec_range=rng), dataset_id)


_SUBSET_RE = r"^(.*?)(?:_subset_\d+)?\.nc$"


def read_griddap_netcdf_http(
    spark,
    urls: Sequence[str],
    time_range: tuple | None = None,
    attempts: int = 3,
    timeout_s: float = 120.0,
):
    """S7's LIVE-HTTP physical path: griddap ``.nc`` chunk URLs (the
    reference GETs each division URL and spools ``response.content``
    straight to ``*.nc``, data_wrangler.py:592-604) fetched ONE PER SCAN
    TASK with the same bounded retry policy as the tabledap connector
    (``http_fetch.fetch_with_retry``), decoded in the task to the long
    grid form — the bytes never spool to disk and never cross the
    driver. Dataset ids derive from the URL basename with the
    ``_subset_N`` suffix stripped, exactly like the file reader.
    """
    import os
    import re

    from .http_fetch import fetch_with_retry

    if not urls:
        raise ValueError("read_griddap_netcdf_http: no URLs to scan")

    def _dataset_id(u: str) -> str:
        name = os.path.basename(u.split("?")[0])
        m = re.match(_SUBSET_RE, name)
        if m:
            return m.group(1)
        # non-.nc basename (e.g. .nc4, extensionless endpoint): fall
        # back to the name sans extension rather than failing the plan
        return os.path.splitext(name)[0] or name

    rows = [(_dataset_id(u), u) for u in urls]
    src = spark.createDataFrame(rows, "dataset_id string, url string").repartition(
        len(rows)
    )

    def fetch_decode(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for dataset_id, url in zip(pdf["dataset_id"], pdf["url"]):
                buf = fetch_with_retry(url, attempts=attempts, timeout_s=timeout_s)
                out = _decode_long(buf, dataset_id, time_range)
                if len(out):
                    yield out

    return src.mapInPandas(fetch_decode, schema=GRID_LONG_SCHEMA)
