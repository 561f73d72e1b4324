"""Golden URL-compilation tests (the reference's own test style, SURVEY §5)
plus chunk-planner math (W4/O5)."""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest

from erddap2agol_spark.plans import chunking
from erddap2agol_spark.sources import erddap_url as eu

SERVER = "https://erddap.example.org/erddap"
T0 = datetime(2024, 1, 1)
T1 = datetime(2024, 1, 31)


def test_tabledap_url_golden():
    url = eu.tabledap_url(
        SERVER,
        "gcoos_42G01",
        ["time", "latitude", "longitude", "sea_surface_temperature_0"],
        eu.TimeRange(T0, T1),
    )
    assert url == (
        "https://erddap.example.org/erddap/tabledap/gcoos_42G01.csvp"
        "?time%2Clatitude%2Clongitude%2Csea_surface_temperature_0"
        "&time%3E%3D2024-01-01T00:00:00Z&time%3C%3D2024-01-31T00:00:00Z"
    )


def test_tabledap_depth_first_and_time_dedup():
    url = eu.tabledap_url(SERVER, "ds", ["time", "sst", "depth", "time"])
    q = url.split("?")[1]
    assert q == "time%2Cdepth%2Csst"  # depth forced first, time never doubled


def test_griddap_url_golden():
    sel = eu.GridSelector(
        time_range=eu.TimeRange(T0, T1),
        lat_range=(18.0, 31.0),
        lon_range=(-98.0, -76.0),
        has_altitude=True,
    )
    url = eu.griddap_url(SERVER, "sst_grid", ["sst", "sst_anomaly"], sel)
    assert url == (
        "https://erddap.example.org/erddap/griddap/sst_grid.nc?"
        "sst%5B(2024-01-01T00:00:00Z):1:(2024-01-31T00:00:00Z)%5D%5B0%5D"
        "%5B(18.0):1:(31.0)%5D%5B(-98.0):1:(-76.0)%5D"
        "%2Csst_anomaly%5B(2024-01-01T00:00:00Z):1:(2024-01-31T00:00:00Z)%5D%5B0%5D"
        "%5B(18.0):1:(31.0)%5D%5B(-98.0):1:(-76.0)%5D"
    )


def test_griddap_lat_flip():
    sel = eu.GridSelector(
        time_range=eu.TimeRange(T0, T1),
        lat_range=(18.0, 31.0),
        lon_range=(-98.0, -76.0),
        lat_order_desc=True,
    )
    url = eu.griddap_url(SERVER, "g", ["v"], sel)
    assert "%5B(31.0):1:(18.0)%5D" in url  # selector order flipped (T2)


def test_nrt_url_window():
    now = datetime(2024, 6, 15, 12, 0, 0)
    url = eu.nrt_url(SERVER, "ds", ["time", "v"], now)
    assert "time%3E%3D2024-06-08T12:00:00Z" in url
    assert "time%3C%3D2024-06-15T12:00:00Z" in url


def test_search_urls():
    assert eu.search_url(SERVER, ["wave", "height"]).endswith(
        "searchFor=wave+height&protocol=tabledap"
    )
    assert "minTime=2024-06-08T12:00:00Z" in eu.nrt_search_url(
        SERVER, datetime(2024, 6, 15, 12)
    )
    assert "itemsPerPage=10000000" in eu.nrt_search_url(SERVER, datetime(2024, 6, 15))
    # advanced-search term + protocol, reference core.py:119-127 shape
    full = eu.nrt_search_url(
        SERVER,
        datetime(2024, 6, 15, 12),
        keywords=["glider", "salinity"],
        protocol="tabledap",
    )
    assert "advanced.json?searchFor=glider+salinity&page=1" in full
    assert full.endswith("&maxTime=&protocol=tabledap")
    # bare variant keeps the empty maxTime and no protocol filter
    assert eu.nrt_search_url(SERVER, datetime(2024, 6, 15, 12)).endswith("&maxTime=")


# --- chunk planner ---------------------------------------------------------


def test_chunk_count_math():
    assert chunking.n_chunks(100_000) == 1
    assert chunking.n_chunks(100_001) == 2
    assert chunking.n_chunks(1_000_000) == 10
    assert not chunking.needs_subsetting(100_000)
    assert chunking.needs_subsetting(100_001)


def test_time_slices_equal_duration_and_clamped():
    slices = chunking.time_slices(T0, T1, row_count=450_000)
    assert len(slices) == 5
    total = T1 - T0
    for s in slices:
        assert abs((s.end - s.start) - total / 5) < timedelta(seconds=1)
    assert slices[0].start == T0
    assert slices[-1].end == T1  # last slice clamped exactly
    assert chunking.plan_summary(slices)["continuous"]


def test_chunk_urls_one_per_slice():
    slices = chunking.time_slices(T0, T1, row_count=250_000)
    urls = eu.tabledap_chunk_urls(SERVER, "ds", ["time", "v"], slices)
    assert len(urls) == 3
    assert all("time%3E%3D" in u for u in urls)


def test_time_slices_rejects_reversed_range():
    with pytest.raises(ValueError):
        chunking.time_slices(T1, T0, 10)


# ---------------------------------------------------------------------------
# property fuzz: URL compiler invariants


from datetime import datetime, timedelta
from urllib.parse import unquote

from hypothesis import given, settings
from hypothesis import strategies as st

from erddap2agol_spark.sources.erddap_url import (
    TimeRange,
    tabledap_chunk_urls,
    tabledap_url,
)

_COLNAME = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz_", min_size=1, max_size=8
)


@given(
    cols=st.lists(_COLNAME, min_size=0, max_size=6, unique=True),
    with_depth=st.booleans(),
    with_time_col=st.booleans(),
    start=st.datetimes(
        min_value=datetime(1980, 1, 1), max_value=datetime(2100, 1, 1)
    ).map(lambda d: d.replace(microsecond=0)),
    span_s=st.integers(0, 10**9),
    n_chunks=st.integers(1, 5),
)
@settings(max_examples=150, deadline=None)
def test_tabledap_url_invariants(
    cols, with_depth, with_time_col, start, span_s, n_chunks
):
    """The reference's projection rules hold for ANY column list: time
    is projected exactly once and FIRST, depth (when present) second,
    remaining column order preserved, the whole projection
    percent-decodes back to exactly the input set, and chunk URLs are
    pointwise tabledap_url over their slices."""
    cols = [c for c in cols if c not in ("time", "depth")]
    if with_depth:
        cols.insert(len(cols) // 2, "depth")
    if with_time_col:
        cols.insert(0, "time")
    tr = TimeRange(start, start + timedelta(seconds=span_s))
    url = tabledap_url("https://srv.example/erddap/", "ds1", cols, tr)

    assert url.startswith("https://srv.example/erddap/tabledap/ds1.csvp?")
    query = url.split("?", 1)[1]
    projection = query.split("&", 1)[0]
    parts = unquote(projection).split(",")
    assert parts[0] == "time"
    assert parts.count("time") == 1
    non_time = [c for c in cols if c != "time"]
    if with_depth:
        assert parts[1] == "depth"
        assert parts[1:] == ["depth"] + [c for c in non_time if c != "depth"]
    else:
        assert parts[1:] == non_time
    # time predicate: both bounds present, encoded, ISO-Z, ordered
    assert f"&time%3E%3D{tr.start.strftime('%Y-%m-%dT%H:%M:%SZ')}" in url
    assert f"&time%3C%3D{tr.end.strftime('%Y-%m-%dT%H:%M:%SZ')}" in url
    # raw >= <= , [ ] never leak unencoded into the query
    assert not any(ch in query for ch in (">", "<", ",", "[", "]"))

    chunks = [
        TimeRange(
            tr.start + timedelta(seconds=i), tr.start + timedelta(seconds=i + 1)
        )
        for i in range(n_chunks)
    ]
    urls = tabledap_chunk_urls("https://srv.example/erddap", "ds1", cols, chunks)
    # half-open contract: every chunk but the last is end-EXCLUSIVE, so a
    # row exactly on a shared boundary is fetched by exactly one task
    assert urls == [
        tabledap_url(
            "https://srv.example/erddap", "ds1", cols, c,
            end_exclusive=(i != len(chunks) - 1),
        )
        for i, c in enumerate(chunks)
    ]
    for u in urls[:-1]:
        assert "%3C%3D" not in u and "time%3C" in u
    assert "%3C%3D" in urls[-1]
    assert len(set(urls)) == len(urls)  # distinct slices -> distinct tasks
