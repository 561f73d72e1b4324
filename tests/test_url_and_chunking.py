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
