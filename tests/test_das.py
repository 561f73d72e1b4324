"""DAS metadata model tests (SURVEY §2.1 S4, §2.3 P1/P2, §2.5 A1/A4).

Fixture DAS text follows FIXTURES.md §6: a time variable with
actual_range (one negative-epoch, one future-clamped case), QC variables
that must be dropped, coverage_content_type flags, NC_GLOBAL geospatial
ranges, and a multi-line string attribute.
"""

from __future__ import annotations

from datetime import datetime, timezone

from erddap2agol_spark.sources import das

DAS_BUOY = """Attributes {
 s {
  String comment "single char var";
 }
 time {
  String _CoordinateAxisType "Time";
  Float64 actual_range 1.0385856e+9, 4.102444800e+9;
  String axis "T";
  String ioos_category "Time";
  String units "seconds since 1970-01-01T00:00:00Z";
 }
 latitude {
  Float64 actual_range 27.9, 27.9;
  String units "degrees_north";
 }
 longitude {
  Float64 actual_range -93.6, -93.6;
  String units "degrees_east";
 }
 sea_surface_temperature_0 {
  Float64 actual_range 14.2, 33.1;
  String units "degree_C";
 }
 sea_surface_temperature_0_qc_agg {
  Int32 actual_range 1, 4;
  String coverage_content_type "qualityInformation";
 }
 qartod_speed_flag {
  Int32 actual_range 1, 9;
 }
 depth {
  Float64 actual_range 0.0, 2.0;
 }
 wmo_platform_code {
  String ioos_category "Identifier";
 }
 NC_GLOBAL {
  String summary "Buoy 42G01 observations
spanning multiple lines of text.";
  String institution "GCOOS";
  Float64 geospatial_lat_min 27.9;
  Float64 geospatial_lat_max 27.9;
  Float64 geospatial_lon_min -93.6;
  Float64 geospatial_lon_max -93.6;
 }
}
"""

DAS_ANCIENT = """Attributes {
 time {
  Float64 actual_range -6.106032e+8, 9.468576e+8;
  String units "seconds since 1970-01-01T00:00:00Z";
 }
 temp {
  Float64 actual_range 1.0, 2.0;
 }
}
"""

NOW = datetime(2026, 8, 13, tzinfo=timezone.utc)


def _meta(spark):
    return das.das_to_dataframe(spark, {"buoy": DAS_BUOY, "ancient": DAS_ANCIENT})


def test_parse_das_rows(spark):
    meta = _meta(spark)
    rows = {
        (r.variable, r.attr): (r.datatype, r.value)
        for r in meta.filter(meta.dataset_id == "buoy").collect()
    }
    assert rows[("time", "actual_range")][0] == "Float64"
    assert rows[("time", "units")] == ("String", "seconds since 1970-01-01T00:00:00Z")
    # multi-line string rejoined
    assert "spanning multiple lines" in rows[("NC_GLOBAL", "summary")][1]
    assert rows[("latitude", "actual_range")][1] == "27.9, 27.9"


def test_actual_attributes_filter(spark):
    kept = {
        r.variable
        for r in das.actual_attributes(_meta(spark))
        .filter("dataset_id = 'buoy'")
        .collect()
    }
    # QC-suffixed, qartod-prefixed, single-char, NC_GLOBAL all dropped
    assert kept == {
        "time",
        "latitude",
        "longitude",
        "sea_surface_temperature_0",
        "depth",
        "wmo_platform_code",  # exactly one attribute -> kept
    }


def test_actual_attributes_return_all(spark):
    kept = {
        r.variable
        for r in das.actual_attributes(_meta(spark), return_all=True)
        .filter("dataset_id = 'buoy'")
        .collect()
    }
    assert "sea_surface_temperature_0_qc_agg" in kept  # bypass keeps QC
    assert "NC_GLOBAL" not in kept


def test_grid_measure_variables(spark):
    kept = {
        r.variable
        for r in das.grid_measure_variables(_meta(spark))
        .filter("dataset_id = 'buoy'")
        .collect()
    }
    # dims + coverage-flagged dropped; measures kept
    assert "sea_surface_temperature_0" in kept
    assert "sea_surface_temperature_0_qc_agg" not in kept
    assert "latitude" not in kept and "time" not in kept


def test_time_extent_clamp_and_negative_epoch(spark):
    ext = {
        r.dataset_id: (r.start_time, r.end_time)
        for r in das.time_extent_from_meta(_meta(spark), now=NOW).collect()
    }
    # future end (year 2100) clamped to now
    assert ext["buoy"][1] == NOW.replace(tzinfo=None)
    # negative epoch -> pre-1970 start preserved
    assert ext["ancient"][0].year == 1950
    assert ext["ancient"][1].year == 2000


def test_malformed_metadata_yields_null_ranges_not_crash(spark):
    """DAS metadata is remote content: an actual_range with no comma or
    non-numeric bounds, and a garbage geospatial extent, must degrade to
    NULLs for that dataset — under ANSI mode the old element_at/cast
    aborted the whole metadata scan."""
    rows = [
        ("bad1", "time", "actual_range", "1.0"),           # no comma
        ("bad2", "time", "actual_range", "abc,def"),       # non-numeric
        ("ok", "time", "actual_range", "0.0,86400.0"),
        ("bad3", "NC_GLOBAL", "geospatial_lat_min", "north-ish"),
        ("bad3", "NC_GLOBAL", "geospatial_lat_max", "31.1"),
    ]
    meta = spark.createDataFrame(
        rows, "dataset_id string, variable string, attr string, value string"
    )
    ext = {
        r.dataset_id: (r.start_time, r.end_time)
        for r in das.time_extent_from_meta(meta, now=NOW).collect()
    }
    assert ext["bad1"][0] is not None and ext["bad1"][1] is None
    assert ext["bad2"] == (None, None)
    assert ext["ok"][0].year == 1970
    geo = {
        r.dataset_id: (r.lat_min, r.lat_max)
        for r in das.geographic_range_from_meta(meta).collect()
    }
    assert geo["bad3"] == (None, 31.1)


def test_geographic_range(spark):
    geo = {
        r.dataset_id: (r.lat_min, r.lat_max, r.lon_min, r.lon_max)
        for r in das.geographic_range_from_meta(_meta(spark)).collect()
    }
    assert geo["buoy"] == (27.9, 27.9, -93.6, -93.6)


def test_find_time_variables(spark):
    extra = """Attributes {
 datecollec {
  String units "seconds since 1970-01-01T00:00:00Z";
 }
 date_gmt {
  String ioos_category "Time";
 }
 temp {
  Float64 actual_range 1.0, 2.0;
 }
}
"""
    meta = das.das_to_dataframe(spark, {"buoy": DAS_BUOY, "alt": extra})
    got = {
        (r.dataset_id, r.variable)
        for r in das.find_time_variables(meta).collect()
    }
    assert ("buoy", "time") in got
    assert ("alt", "datecollec") in got and ("alt", "date_gmt") in got
    assert ("alt", "temp") not in got
