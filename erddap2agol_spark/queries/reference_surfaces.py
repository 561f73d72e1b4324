"""Registry-graded queries for the reference surfaces that were
pytest-only through round 5 (VERDICT r5 next-round #1): DAS metadata
parse + schema derivation (S4/P1/A1/A4/F2), feed ingestion and geometry
assembly (S12/F17), the JSON converter pipeline (S13/F12/F15/O11/X1),
the universal datetime decoder (F1), the URL compiler goldens
(P3/P4/P5/F6 — the one test idea SURVEY §5 inherits from the
reference), the publish portal (K3/K4/K6/K8/F18/U5/F7/F13), and the NRT
change-detection gates (ST2/ST3/ST4/W2/ST6, batch and wire forms).

Pattern: committed fixture (fixtures/das, fixtures/feeds,
fixtures/json) or the loopback ERDDAP simulator -> DataFrame -> DuckDB
oracle whose expected rows are HAND-DERIVED literals (VALUES) or an
independent DuckDB read of the same fixture — the same
independent-truth discipline as the griddap fixture oracle.
"""

from __future__ import annotations

import os
import tempfile
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import register

_FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
)
_DAS_DIR = os.path.join(_FIXTURES, "das")
_FEEDS_DIR = os.path.join(_FIXTURES, "feeds")
_JSON_DOC = os.path.join(_FIXTURES, "json", "stations.json")


def _das_texts() -> dict[str, str]:
    out = {}
    for name in sorted(os.listdir(_DAS_DIR)):
        if name.endswith(".das"):
            with open(os.path.join(_DAS_DIR, name)) as f:
                out[name[: -len(".das")]] = f.read()
    return out


# ---------------------------------------------------------------------------
# S4 — DAS parse
# ---------------------------------------------------------------------------

_DAS_PARSE_ORACLE = """
SELECT * FROM (VALUES
  ('buoy_42', 'time', '_CoordinateAxisType', 'String', 'Time'),
  ('buoy_42', 'time', 'actual_range', 'Float64', '1.6094592e+9, 4.102444800e+9'),
  ('buoy_42', 'time', 'axis', 'String', 'T'),
  ('buoy_42', 'time', 'ioos_category', 'String', 'Time'),
  ('buoy_42', 'time', 'units', 'String', 'seconds since 1970-01-01T00:00:00Z'),
  ('buoy_42', 'latitude', 'actual_range', 'Float64', '27.9, 27.9'),
  ('buoy_42', 'latitude', 'units', 'String', 'degrees_north'),
  ('buoy_42', 'longitude', 'actual_range', 'Float64', '-93.6, -93.6'),
  ('buoy_42', 'longitude', 'units', 'String', 'degrees_east'),
  ('buoy_42', 'sea_water_temperature', 'actual_range', 'Float64', '14.2, 33.1'),
  ('buoy_42', 'sea_water_temperature', 'units', 'String', 'degree_C'),
  ('buoy_42', 'sea_water_temperature_qc_agg', 'actual_range', 'Int32', '1, 4'),
  ('buoy_42', 'sea_water_temperature_qc_agg', 'coverage_content_type', 'String', 'qualityInformation'),
  ('buoy_42', 'qartod_speed_flag', 'actual_range', 'Int32', '1, 9'),
  ('buoy_42', 'z', 'units', 'String', 'm'),
  ('buoy_42', 'station_id', 'ioos_category', 'String', 'Identifier'),
  ('buoy_42', 'NC_GLOBAL', 'title', 'String', 'Buoy 42G01 Meteorological Observations'),
  ('buoy_42', 'NC_GLOBAL', 'summary', 'String', 'Hourly surface meteorology
from moored buoy 42G01.'),
  ('buoy_42', 'NC_GLOBAL', 'institution', 'String', 'GCOOS'),
  ('buoy_42', 'NC_GLOBAL', 'license', 'String', 'Public domain'),
  ('buoy_42', 'NC_GLOBAL', 'keywords', 'String', 'ocean, buoy, temperature'),
  ('buoy_42', 'NC_GLOBAL', 'geospatial_lat_min', 'Float64', '27.9'),
  ('buoy_42', 'NC_GLOBAL', 'geospatial_lat_max', 'Float64', '27.9'),
  ('buoy_42', 'NC_GLOBAL', 'geospatial_lon_min', 'Float64', '-93.6'),
  ('buoy_42', 'NC_GLOBAL', 'geospatial_lon_max', 'Float64', '-93.6'),
  ('ship_wteo', 'time', 'actual_range', 'Float64', '-6.106032e+8, 9.468576e+8'),
  ('ship_wteo', 'time', 'units', 'String', 'seconds since 1970-01-01T00:00:00Z'),
  ('ship_wteo', 'flag', 'comment', 'String', 'single attribute variable'),
  ('ship_wteo', 'air_temperature', 'actual_range', 'Float64', '-2.5, 38.0'),
  ('ship_wteo', 'air_temperature', 'units', 'String', 'degree_C'),
  ('ship_wteo', 'NC_GLOBAL', 'title', 'String', 'Ship WTEO Underway Data'),
  ('ship_wteo', 'NC_GLOBAL', 'institution', 'String', 'NOAA')
) AS t(dataset_id, variable, attr, datatype, value)
"""


@register(
    "das_parse_metadata",
    oracle=_DAS_PARSE_ORACLE,
    doc="S4: committed ERDDAP .das fixture documents parsed into the "
    "(dataset_id, variable, attr, datatype, value) metadata frame — "
    "multi-line quoted strings rejoined, numeric actual_range kept "
    "verbatim, datatypes captured (reference das_client.parseDasResponse "
    "src/das_client.py:25-135). The oracle is the hand-derived expected "
    "row set, so the hash grades the parser itself.",
)
def das_parse_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.das import das_to_dataframe

    return das_to_dataframe(spark, _das_texts())


_DAS_PLAN_ORACLE = """
SELECT * FROM (VALUES
  ('buoy_42', 5,
   'latitude,longitude,sea_water_temperature,station_id,time',
   TIMESTAMP '2021-01-01 00:00:00', TIMESTAMP '2025-01-01 00:00:00',
   27.9, 27.9, -93.6, -93.6),
  ('ship_wteo', 3, 'air_temperature,flag,time',
   TIMESTAMP '1950-08-26 20:00:00', TIMESTAMP '2000-01-03 00:00:00',
   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
   CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))
) AS t(dataset_id, n_vars_kept, kept_vars, start_time, end_time,
       lat_min, lat_max, lon_min, lon_max)
"""


@register(
    "das_schema_plan",
    oracle=_DAS_PLAN_ORACLE,
    doc="P1+A1+A4+F2 composed — the reference's metadata-only planning "
    "(O4): from the parsed DAS fixture, the surviving projection per "
    "dataset (QC/qartod suffixes, single-char names, NC_GLOBAL dropped; "
    "actual_range-or-single-attribute kept — getActualAttributes "
    "src/das_client.py:299-389), the epoch-seconds time extent with a "
    "negative-epoch start preserved and a year-2100 end clamped to 'now' "
    "(:186-231), and the NC_GLOBAL geographic extent "
    "(src/data_wrangler.py:224-233). All relational algebra over the "
    "metadata frame; expected rows hand-derived.",
)
def das_schema_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import das

    meta = das.das_to_dataframe(spark, _das_texts())
    kept = (
        das.actual_attributes(meta)
        .groupBy("dataset_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_vars_kept"),
            F.array_join(
                F.sort_array(F.collect_list("variable")), ","
            ).alias("kept_vars"),
        )
    )
    ext = das.time_extent_from_meta(
        meta, now=datetime(2025, 1, 1, tzinfo=timezone.utc)
    )
    geo = das.geographic_range_from_meta(meta)
    return kept.join(ext, "dataset_id", "left").join(geo, "dataset_id", "left")


# ---------------------------------------------------------------------------
# S12/F17 — feeds
# ---------------------------------------------------------------------------


def _feed_items(spark: SparkSession) -> DataFrame:
    from ..sources.feeds import feeds_to_dataframe

    rows = []
    for name in sorted(os.listdir(_FEEDS_DIR)):
        if name.endswith(".xml"):
            with open(os.path.join(_FEEDS_DIR, name)) as f:
                rows.append((name, f.read()))
    feeds = spark.createDataFrame(rows, "path string, content string")
    return feeds_to_dataframe(spark, feeds)


_S = "CAST(NULL AS VARCHAR)"
_I = "CAST(NULL AS INT)"

_FEED_ITEMS_ORACLE = f"""
SELECT * FROM (VALUES
  ('alerts_rss.xml', 0, 'Buoy adrift', 'http://example.org/alerts/1',
   'Buoy 42 adrift', 'Tue, 05 Mar 2024 12:00:00 GMT', 'alert-1',
   '27.5 -90.25', {_S}, {_S}, {_S}, {_S}, {_S}, {_S}, {_I}, '{{}}'),
  ('alerts_rss.xml', 1, 'Glider track', 'http://example.org/alerts/2',
   'Track segment', 'Wed, 06 Mar 2024 00:30:00 GMT', 'alert-2',
   {_S}, '27 -90 27.5 -90.5 28 -91', {_S}, {_S}, {_S}, {_S}, '-5', {_I}, '{{}}'),
  ('alerts_rss.xml', 2, 'Twin moorings', 'http://example.org/alerts/3',
   'Two stations', 'Wed, 06 Mar 2024 06:00:00 GMT', 'alert-3',
   '26 -89|26.5 -89.5', {_S}, {_S}, {_S}, {_S}, {_S}, {_S}, {_I}, '{{}}'),
  ('cap_atom.xml', 0, 'Coastal flood warning', {_S}, 'Flooding expected',
   '2024-03-05T18:00:00Z', 'cap-1',
   {_S}, {_S}, '25 -91 25 -90 26 -90 26 -91 25 -91', {_S}, {_S}, {_S}, {_S}, 2, '{{}}'),
  ('cap_atom.xml', 1, 'Station fix', {_S}, 'W3C geo point',
   '2024-03-05T19:00:00Z', 'cap-2',
   {_S}, {_S}, {_S}, {_S}, '29.1', '-94.75', {_S}, {_I}, '{{}}'),
  ('cap_atom.xml', 2, 'Search box', {_S}, 'Envelope',
   '2024-03-05T20:00:00Z', 'cap-3',
   {_S}, {_S}, {_S}, '24 -92 25 -91', {_S}, {_S}, {_S}, {_I}, '{{}}'),
  ('cap_atom.xml', 3, 'Two zones', {_S}, 'Multi polygon',
   '2024-03-05T21:00:00Z', 'cap-4',
   {_S}, {_S}, '30 -85 30 -84 31 -84 30 -85|32 -83 32 -82 33 -82 32 -83',
   {_S}, {_S}, {_S}, {_S}, {_I}, '{{}}')
) AS t(source, item_index, title, link, description, pub_date, guid,
       georss_point, georss_line, georss_polygon, georss_box,
       geo_lat, geo_lon, georss_elev, geo_dims, extras)
"""


@register(
    "feed_items_parse",
    oracle=_FEED_ITEMS_ORACLE,
    doc="S12: committed RSS + ATOM/CAP fixture feeds parsed to item rows "
    "inside mapInPandas (root autodetect item->RSS / entry->ATOM, "
    "namespace-local tag matching, CAP comma-tuple normalization with "
    "dimension capture, repeated geometry elements accumulated as "
    "|-separated parts, GML georss:where Envelope -> box corners — "
    "reference Xml2GeoJSON.py:810-950, 1050-1140). Expected rows "
    "hand-derived from the fixtures.",
)
def feed_items_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _feed_items(spark)


_FEED_GEOM_ORACLE = """
SELECT * FROM (VALUES
  ('alerts_rss.xml', 0, '{"type":"Point","coordinates":[-90.25,27.5]}'),
  ('alerts_rss.xml', 1, '{"type":"LineString","coordinates":[[-90,27,-5],[-90.5,27.5,-5],[-91,28,-5]]}'),
  ('alerts_rss.xml', 2, '{"type":"MultiPoint","coordinates":[[-89,26],[-89.5,26.5]]}'),
  ('cap_atom.xml', 0, '{"type":"Polygon","coordinates":[[[-91,25],[-91,26],[-90,26],[-90,25],[-91,25]]]}'),
  ('cap_atom.xml', 1, '{"type":"Point","coordinates":[-94.75,29.1]}'),
  ('cap_atom.xml', 2, '{"type":"Polygon","coordinates":[[[-92,24],[-91,24],[-91,25],[-92,25],[-92,24]]]}'),
  ('cap_atom.xml', 3, '{"type":"MultiPolygon","coordinates":[[[[-85,30],[-84,31],[-84,30],[-85,30]]],[[[-83,32],[-82,33],[-82,32],[-83,32]]]]}')
) AS t(source, item_index, geometry)
"""


@register(
    "feed_geometry_assembly",
    oracle=_FEED_GEOM_ORACLE,
    doc="F17 end-to-end over the feed fixtures, multi-part included: "
    "lat-first reorder, georss:elev as constant Z, polygon ring CCW "
    "reversal + closing, two-corner box -> 5-point ring, repeated "
    "point/polygon elements -> MultiPoint/MultiPolygon (reference "
    "Xml2GeoJSON.py:893-955, Json2GeoJSON.py:1043-1065). Pure Column "
    "algebra — geometry strings ride whole-stage codegen; expected "
    "GeoJSON hand-derived.",
)
def feed_geometry_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.feeds import with_feed_geometry

    return with_feed_geometry(_feed_items(spark)).select(
        "source", "item_index", "geometry"
    )


# ---------------------------------------------------------------------------
# S13/F12/F15/O11/X1 — JSON converter pipeline
# ---------------------------------------------------------------------------

_JSON_FLATTEN_ORACLE = f"""
SELECT CAST(s.id AS BIGINT) AS id,
       s.name AS name,
       s.status AS status,
       CAST(s.detail.obs_count AS BIGINT) AS detail_obs_count,
       CAST(s.detail.mean_temp AS DOUBLE) AS detail_mean_temp,
       CAST(to_timestamp(CAST(s.detail.created AS BIGINT)) AS TIMESTAMP)
         AS detail_created,
       CAST(s.geo.lat AS DOUBLE) AS geo_lat,
       CAST(s.geo.lon AS DOUBLE) AS geo_lon,
       CAST(s.updated AS TIMESTAMP) AS updated
FROM (SELECT unnest(stations) AS s FROM read_json_auto('{_JSON_DOC}'))
"""


@register(
    "json_flatten_types",
    oracle=_JSON_FLATTEN_ORACLE,
    doc="S13+F12+F15+O11 as one pipeline over a committed JSON document, "
    "run through the X1 converter-plugin registry: root autodetect "
    "(largest list wins, Json2GeoJSON.py:829-895), recursive "
    "parent_child flatten (:1003-1035), four-type inference with the "
    "name-based epoch->date promotion over the sample buffer (:711-750, "
    "150-row sample), then the casts (epoch-second strings -> "
    "timestamps). Oracle: DuckDB reads the SAME committed file and "
    "applies the expected casts independently.",
)
def json_flatten_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.convert import (
        apply_converters,
        apply_field_types,
        flatten,
        infer_field_types,
        register_converter,
    )
    from ..sources.feeds import json_docs_to_dataframe

    def _converter(df: DataFrame) -> DataFrame:
        flat = flatten(df)
        return apply_field_types(flat, infer_field_types(flat))

    register_converter("stations_pipeline", _converter)
    with open(_JSON_DOC) as f:
        items = json_docs_to_dataframe(spark, [f.read()])
    out = apply_converters(items, ["stations_pipeline"])
    return out.select(
        "id", "name", "status", "detail_obs_count", "detail_mean_temp",
        "detail_created", "geo_lat", "geo_lon", "updated",
    )


# ---------------------------------------------------------------------------
# F1 — universal datetime decoder over a format matrix
# ---------------------------------------------------------------------------

_DT_CASES = [
    ("c01_iso_z", "2024-03-05T12:30:00Z"),
    ("c02_iso_offset", "2024-03-05T14:30:00+02:00"),
    ("c03_space", "2024-03-05 12:30:00"),
    ("c04_date_only", "2024-03-05"),
    ("c05_ddmmyyyy", "05/03/2024"),
    ("c06_rfc822", "Tue, 05 Mar 2024 12:00:00 GMT"),
    ("c07_ordinal_ampm", "March 3rd, 2024 4:05 PM"),
    ("c08_epoch_s", "1709640000"),
    ("c09_epoch_ms", "1709640000000"),
    ("c10_epoch_negative", "-86400"),
    ("c11_day_of_year", "2024-066"),
    ("c12_tz_est", "05 Mar 2024 14:00 EST"),
    ("c13_tz_ist", "2024-03-05 09:15:00 IST"),
    ("c14_month_name", "Mar 5, 2024"),
    ("c15_iso_fraction", "2024-03-05T12:30:00.250Z"),
    ("c16_garbage", "not a date"),
]

_DT_ORACLE = """
SELECT * FROM (VALUES
  ('c01_iso_z', '2024-03-05 12:30:00'),
  ('c02_iso_offset', '2024-03-05 12:30:00'),
  ('c03_space', '2024-03-05 12:30:00'),
  ('c04_date_only', '2024-03-05 00:00:00'),
  ('c05_ddmmyyyy', '2024-03-05 00:00:00'),
  ('c06_rfc822', '2024-03-05 12:00:00'),
  ('c07_ordinal_ampm', '2024-03-03 16:05:00'),
  ('c08_epoch_s', '2024-03-05 12:00:00'),
  ('c09_epoch_ms', '2024-03-05 12:00:00'),
  ('c10_epoch_negative', '1969-12-31 00:00:00'),
  ('c11_day_of_year', '2024-03-06 00:00:00'),
  ('c12_tz_est', '2024-03-05 19:00:00'),
  ('c13_tz_ist', '2024-03-05 03:45:00'),
  ('c14_month_name', '2024-03-05 00:00:00'),
  ('c15_iso_fraction', '2024-03-05 12:30:00'),
  ('c16_garbage', CAST(NULL AS VARCHAR))
) AS t(case_id, decoded)
"""


@register(
    "datetime_decode_matrix",
    oracle=_DT_ORACLE,
    doc="F1, the universal datetime decoder, graded over a 16-case "
    "format matrix: ISO (Z / offset / fraction), date-only, dd/MM/yyyy "
    "(F5), RFC-822 pubDate, month names + ordinal suffixes + am/pm, "
    "10/13-digit and negative epochs (F2), day-of-year, fixed-offset "
    "timezone abbreviations (EST, half-hour IST), and a garbage->NULL "
    "case (reference datetimeUtils.decodeDatetime :15-252 + tz table "
    ":254-477). Runs the two-pass table form (fast JVM path, pandas-UDF "
    "tail only for leftovers); expected UTC renderings hand-derived.",
)
def datetime_decode_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.datetimes import decode_datetime_df

    df = spark.createDataFrame(_DT_CASES, "case_id string, raw string")
    out = decode_datetime_df(df, "raw", out_col="ts")
    return out.select(
        "case_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("decoded")
    )


# ---------------------------------------------------------------------------
# P3/P4/P5/F6 — URL compiler goldens (the reference's own test idea)
# ---------------------------------------------------------------------------

_URL_ORACLE = """
SELECT * FROM (VALUES
  ('tabledap_projection_time',
   'https://gcoos5.geos.tamu.edu/erddap/tabledap/gcoos_42G01.csvp?time%2Cdepth%2Csea_water_temperature%2Clatitude&time%3E%3D2024-03-01T00:00:00Z&time%3C%3D2024-03-08T00:00:00Z'),
  ('nrt_window',
   'https://x/erddap/tabledap/ship_wteo.csvp?time%2Cair_temperature&time%3E%3D2024-03-01T00:00:00Z&time%3C%3D2024-03-08T00:00:00Z'),
  ('griddap_hyperslab',
   'https://x/erddap/griddap/hycom.nc?water_temp%5B(2024-03-01T00:00:00Z):2:(2024-03-02T00:00:00Z)%5D%5B0%5D%5B(25.0):1:(30.0)%5D%5B(-95.0):1:(-90.0)%5D%2Csalinity%5B(2024-03-01T00:00:00Z):2:(2024-03-02T00:00:00Z)%5D%5B0%5D%5B(25.0):1:(30.0)%5D%5B(-95.0):1:(-90.0)%5D'),
  ('chunk_0',
   'https://x/erddap/tabledap/ds1.csvp?time%2Cv&time%3E%3D2024-03-01T00:00:00Z&time%3C2024-03-02T00:00:00Z'),
  ('chunk_1',
   'https://x/erddap/tabledap/ds1.csvp?time%2Cv&time%3E%3D2024-03-02T00:00:00Z&time%3C%3D2024-03-03T00:00:00Z'),
  ('search',
   'https://x/erddap/search/index.json?page=1&itemsPerPage=100000&searchFor=glider+salinity+profile&protocol=tabledap'),
  ('orderby_max',
   'https://x/erddap/tabledap/ds1.csvp?time%2Cstation&orderByMax(%22station%2Ctime%2F1day%22)')
) AS t(kind, url)
"""


@register(
    "url_compile_goldens",
    oracle=_URL_ORACLE,
    doc="P3/P4/P5/F6/W2/S3 — the query-URL compiler against golden "
    "literals, the one inherited test idea (SURVEY §5: the reference's "
    "own tests compare generate_url output to expected URLs, "
    "tests/erddap_client_tests.py:50-95): projection with depth forced "
    "first and time deduped, closed/half-open time predicates (chunk "
    "continuation rule), griddap hyperslab with stride + altitude "
    "first-slice, full-text search encoding, and a server-side "
    "orderByMax clause.",
)
def url_compile_goldens(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.erddap_url import (
        GridSelector,
        TimeRange,
        griddap_url,
        nrt_url,
        search_url,
        tabledap_chunk_urls,
        tabledap_url,
    )

    d = datetime
    rows = [
        (
            "tabledap_projection_time",
            tabledap_url(
                "https://gcoos5.geos.tamu.edu/erddap",
                "gcoos_42G01",
                ["sea_water_temperature", "depth", "latitude", "time"],
                TimeRange(d(2024, 3, 1), d(2024, 3, 8)),
            ),
        ),
        (
            "nrt_window",
            nrt_url(
                "https://x/erddap", "ship_wteo", ["time", "air_temperature"],
                now=d(2024, 3, 8),
            ),
        ),
        (
            "griddap_hyperslab",
            griddap_url(
                "https://x/erddap",
                "hycom",
                ["water_temp", "salinity"],
                GridSelector(
                    TimeRange(d(2024, 3, 1), d(2024, 3, 2)),
                    (25.0, 30.0),
                    (-95.0, -90.0),
                    time_stride=2,
                    has_altitude=True,
                ),
            ),
        ),
    ]
    chunks = tabledap_chunk_urls(
        "https://x/erddap",
        "ds1",
        ["time", "v"],
        [
            TimeRange(d(2024, 3, 1), d(2024, 3, 2)),
            TimeRange(d(2024, 3, 2), d(2024, 3, 3)),
        ],
    )
    rows += [(f"chunk_{i}", u) for i, u in enumerate(chunks)]
    rows.append(
        ("search", search_url("https://x/erddap", ["glider", "salinity profile"]))
    )
    rows.append(
        (
            "orderby_max",
            tabledap_url(
                "https://x/erddap", "ds1", ["time", "station"],
                order_by=("orderByMax", ["station", "time/1day"]),
            ),
        )
    )
    return spark.createDataFrame(rows, "kind string, url string")


# ---------------------------------------------------------------------------
# K3/K4/K6/K8/F18/U5/F7/F13 — publish portal
# ---------------------------------------------------------------------------

_PUBLISH_ORACLE = """
SELECT * FROM (VALUES
  ('Buoy_42G01_Meteorological_Observations',
   'Buoy 42G01 Meteorological Observations',
   'Hourly surface meteorology
from moored buoy 42G01.',
   'Public domain',
   'erddap2agol_spark,buoy_42,ocean,buoy,temperature',
   (SELECT count(*) FROM region)),
  ('Buoy_42G01_Meteorological_Observations_2',
   'Buoy 42G01 Meteorological Observations',
   'Hourly surface meteorology
from moored buoy 42G01.',
   'Public domain',
   'erddap2agol_spark,buoy_42,ocean,buoy,temperature',
   (SELECT count(*) FROM nation))
) AS t(item_id, title, snippet, license_info, tags, n_rows)
"""


@register(
    "publish_portal_roundtrip",
    oracle=_PUBLISH_ORACLE,
    doc="K3/K4/K6/K8/F18/U5/F7/F13 composed against the local portal: "
    "item properties built from the DAS fixture's NC_GLOBAL (title/"
    "summary fallback chain, keyword tags flattened + deduped with "
    "reserved tags dropped — makeItemProperties agol_wrangler.py:113-197, "
    "tag hygiene :204-222), publish with 409-style collision rename "
    "(postAndPublish :527-568), K4 chunk append, and a K6 overwrite that "
    "PRESERVES the original properties sidecar while replacing the data "
    "(the observable contract of OverwriteFS backup/restore "
    ":1744-2688). Row counts are graded cross-engine: the overwritten "
    "item must hold exactly |region| rows, the appended one "
    "|nation|+|region|.",
)
def publish_portal_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sinks import publish as P
    from ..sources.tables import load_table

    meta = {
        "title": "Buoy 42G01 Meteorological Observations",
        "summary": "Hourly surface meteorology\nfrom moored buoy 42G01.",
        "institution": "GCOOS",
        "license": "Public domain",
        "keywords": "ocean, buoy, temperature",
    }
    props = P.item_properties_from_metadata(meta, "buoy_42")
    portal = tempfile.mkdtemp(prefix="e2a_portal_")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    id1 = P.publish(nation, portal, props)
    # collision -> _2; published from the FIRST chunk, remaining chunk
    # appended (K4 appends subsets of the same dataset — same schema)
    id2 = P.publish(nation.filter(F.col("n_nationkey") < 10), portal, props)
    P.append(nation.filter(F.col("n_nationkey") >= 10), portal, id2)
    # K6 overwrite with CHANGED props: data replaced, original sidecar kept
    changed = P.item_properties_from_metadata(
        {**meta, "summary": "SHOULD NOT APPEAR"}, "buoy_42"
    )
    P.publish(region, portal, changed, overwrite=True)
    rows = []
    for item_id in (id1, id2):
        pr = P.item_properties(portal, item_id)
        rows.append(
            (
                item_id,
                pr["title"],
                pr["snippet"],
                pr["license_info"],
                ",".join(pr["tags"]),
                P.read_item(spark, portal, item_id).count(),
            )
        )
    return spark.createDataFrame(
        rows,
        "item_id string, title string, snippet string, license_info string, "
        "tags string, n_rows bigint",
    )


# ---------------------------------------------------------------------------
# ST2/ST3/ST4/W2/ST6 — NRT change-detection gates, batch form
# ---------------------------------------------------------------------------

_NRT_GATES_ORACLE = """
SELECT * FROM (VALUES
  ('cycle1_publish', true, 'published',
   (SELECT count(*) FROM events
    WHERE ts >= TIMESTAMP '2024-01-13 00:00:00'
      AND ts <= TIMESTAMP '2024-01-20 00:00:00')),
  ('cycle2_skip', false, 'no rows newer than high-water mark', 0),
  ('cycle3_publish', true, 'published',
   (SELECT count(*) FROM events
    WHERE ts >= TIMESTAMP '2024-01-17 00:00:00'
      AND ts <= TIMESTAMP '2024-01-24 00:00:00')),
  ('st3_first', true, 'content changed', 0),
  ('st3_repeat', false, 'content fingerprint unchanged', 0)
) AS t(step, flag, detail, n_rows)
"""


@register(
    "nrt_gate_cycles",
    oracle=_NRT_GATES_ORACLE,
    doc="ST2/ST3/ST4 + W2 + ST6 as a deterministic batch replay over the "
    "events table: cycle 1 publishes the trailing 7-day window through "
    "the A/B atomic swap; cycle 2 re-offers the same archive and is "
    "skipped by the high-water-mark gate (the Last-Modified/pubDate "
    "analog, OverwriteFS.py:2182-2196); cycle 3 advances 'now' with new "
    "data and republishes — its snapshot row count is graded "
    "cross-engine against DuckDB's count of the same window. The "
    "standalone ST3 content-fingerprint gate (CRC analog, :2198-2205) "
    "is exercised as changed-then-unchanged. Snapshot counts come from "
    "reading back through the committed pointer (readers never see a "
    "partial write).",
)
def nrt_gate_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table
    from ..streaming import nrt

    events = load_table(spark, sf_dir, "events")
    sink = tempfile.mkdtemp(prefix="e2a_nrt_")
    gate_sink = tempfile.mkdtemp(prefix="e2a_nrt_gate_")
    now1, now2 = "2024-01-20 00:00:00", "2024-01-24 00:00:00"
    src1 = events.filter(F.col("ts") <= F.lit(now1).cast("timestamp"))
    src2 = events.filter(F.col("ts") <= F.lit(now2).cast("timestamp"))

    def snap_count() -> int:
        # zero-row robustness: a cycle that published nothing leaves no
        # snapshot to read — 0 rows, not FileNotFoundError
        try:
            return nrt.read_current(spark, sink).count()
        except FileNotFoundError:
            return 0

    rows = []
    r1 = nrt.refresh(src1, "ts", sink, window_days=7, now=now1)
    rows.append(
        (
            "cycle1_publish",
            r1["published"],
            "published" if r1["published"] else r1["reason"],
            snap_count(),
        )
    )
    r2 = nrt.refresh(src1, "ts", sink, window_days=7, now=now1)
    rows.append(("cycle2_skip", r2["published"], r2["reason"], 0))
    r3 = nrt.refresh(src2, "ts", sink, window_days=7, now=now2)
    rows.append(
        (
            "cycle3_publish",
            r3["published"],
            "published" if r3["published"] else r3["reason"],
            snap_count(),
        )
    )
    window1 = src1.filter(
        F.col("ts")
        >= F.lit(now1).cast("timestamp") - F.expr("INTERVAL 7 DAYS")
    )
    first = nrt.content_changed(window1, gate_sink)
    rows.append(
        ("st3_first", first, "content changed" if first else "?", 0)
    )
    again = nrt.content_changed(window1, gate_sink)
    rows.append(
        (
            "st3_repeat",
            again,
            "content changed" if again else "content fingerprint unchanged",
            0,
        )
    )
    return spark.createDataFrame(
        rows, "step string, flag boolean, detail string, n_rows bigint"
    )


# ---------------------------------------------------------------------------
# ST2 on the wire — conditional GET / HTTP 304
# ---------------------------------------------------------------------------

_CSVP_FIXTURE = os.path.join(_FIXTURES, "csvp", "glider_track.csvp")

_NRT_304_ORACLE = f"""
SELECT * FROM (VALUES
  ('cycle1', true, 'published',
   (SELECT count(*) FROM read_csv('{_CSVP_FIXTURE}', header=true, nullstr='NaN'))),
  ('cycle2', false, 'HTTP 304 not modified', 0)
) AS t(cycle, published, detail, n_rows)
"""


@register(
    "nrt_http_304",
    oracle=_NRT_304_ORACLE,
    doc="ST2's wire form, graded end to end: refresh_http_csvp polls the "
    "loopback ERDDAP simulator — cycle 1 GETs the window, publishes "
    "through the A/B swap, and records Last-Modified only AFTER the "
    "commit; cycle 2 sends If-Modified-Since and the server's 304 skips "
    "the refresh without transferring a data byte (reference "
    "OverwriteFS.py:2137-2231 Last-Modified gate). The published row "
    "count is graded against DuckDB's read of the same committed csvp "
    "fixture.",
)
def nrt_http_304(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.nrt import read_current, refresh_http_csvp
    from .grid_queries import _fixture_base_url

    base = _fixture_base_url()
    url = (
        f"{base}/tabledap/glider_track.csvp"
        "?time,latitude,longitude,depth,sea_water_temperature"
    )
    sink = tempfile.mkdtemp(prefix="e2a_nrt304_")
    rows = []
    r1 = refresh_http_csvp(spark, url, sink, timeout_s=30.0)
    rows.append(
        (
            "cycle1",
            r1["published"],
            "published" if r1["published"] else r1["reason"],
            read_current(spark, sink).count(),
        )
    )
    r2 = refresh_http_csvp(spark, url, sink, timeout_s=30.0)
    rows.append(
        ("cycle2", r2["published"], r2.get("reason", "published"), 0)
    )
    return spark.createDataFrame(
        rows, "cycle string, published boolean, detail string, n_rows bigint"
    )


# ---------------------------------------------------------------------------
# K3/K6/K8 over the WIRE — ArcGIS-REST transport vs the loopback portal
# ---------------------------------------------------------------------------

# NOTE: DuckDB's sum(INTEGER) is HUGEINT (decimal128 over Arrow) — the
# r6 driver sweep hash-mismatched this query while fetchall()-based
# local compares passed, because int128 normalizes differently from
# Spark's BIGINT in an Arrow/pandas pipeline.  Every other green oracle
# casts integer sums; this one now does too (VERDICT r6 "wrong" #1).
_AGOL_REST_ORACLE = """
SELECT * FROM (VALUES
  ('item1', 'Buoy 42 Observations', 'snip',
   (SELECT count(*) FROM region),
   (SELECT CAST(sum(r_regionkey) AS BIGINT) FROM region)),
  ('item2', 'Buoy 42 Observations_2', 'snip',
   (SELECT count(*) FROM nation),
   (SELECT CAST(sum(n_nationkey) AS BIGINT) FROM nation))
) AS t(item, title, snippet, n_rows, key_sum)
"""


@register(
    "agol_rest_roundtrip",
    oracle=_AGOL_REST_ORACLE,
    doc="The publish surface's REST TRANSPORT (VERDICT r5 missing #1), "
    "graded end to end against the loopback ArcGIS-REST portal "
    "(sinks/agol_httpd.py): addItem with the 409 title-collision rename "
    "loop (postAndPublish agol_wrangler.py:527-568), publish to a "
    "feature service, an OVERWRITE that swaps the service data while "
    "backup->restore preserves the item properties over the wire "
    "(OverwriteFS.py:268-805 contract in three REST calls), and paged "
    "FeatureServer query readback. Row counts and key sums of the "
    "read-back services are graded cross-engine against the source "
    "tables.",
)
def agol_rest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sinks.agol_httpd import AgolFixturePortal
    from ..sinks.agol_rest import AgolRestClient, publish_df, read_service
    from ..sinks.publish import ItemProperties
    from ..sources.tables import load_table

    portal = AgolFixturePortal()
    base = portal.start()
    try:
        client = AgolRestClient(base)
        props = ItemProperties(
            title="Buoy 42 Observations", snippet="snip",
            license_info="Public domain", tags=["e2a_layer", "buoy_42"],
        )
        nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
        region = load_table(spark, sf_dir, "region").select("r_regionkey")
        i1, s1 = publish_df(nation, client, props)
        i2, s2 = publish_df(nation, client, props)  # 409 -> rename _2
        changed = ItemProperties(
            title="Buoy 42 Observations", snippet="SHOULD NOT APPEAR",
            tags=list(props.tags),
        )
        publish_df(region, client, changed, overwrite=True)
        rows = []
        for label, iid, sid, schema, key in (
            ("item1", i1, s1, "r_regionkey long", "r_regionkey"),
            ("item2", i2, s2, "n_nationkey long", "n_nationkey"),
        ):
            back = read_service(spark, client, sid, schema, page_size=7)
            agg = back.agg(
                F.count(F.lit(1)).alias("n"), F.sum(key).alias("s")
            ).first()
            pr = client.item_properties(iid)
            rows.append(
                (label, pr["title"], pr["snippet"], agg["n"], agg["s"])
            )
        # Self-check (VERDICT r6 #2): recompute the expected tuple from
        # the same source tables in-process; on ANY divergence raise with
        # the portal request log — the CORRECTNESS ``err`` field is the
        # one channel that carries diagnostics back from a driver sweep.
        exp = []
        for label, src, suffix in (
            ("item1", region, ""),
            ("item2", nation, "_2"),
        ):
            a = src.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(src.columns[0]).alias("s"),
            ).first()
            exp.append(
                (label, "Buoy 42 Observations" + suffix, "snip", a["n"], a["s"])
            )
        if rows != exp:
            raise RuntimeError(
                f"agol_rest_roundtrip self-check: got={rows!r} "
                f"expected={exp!r} request_log_tail="
                f"{portal.request_log[-12:]!r}"
            )
        return spark.createDataFrame(
            rows,
            "item string, title string, snippet string, "
            "n_rows bigint, key_sum bigint",
        )
    finally:
        portal.stop()


# ---------------------------------------------------------------------------
# K3/K6/K8 behind the TOKEN boundary (VERDICT r6 #5)
# ---------------------------------------------------------------------------

_AGOL_AUTH_ORACLE = """
SELECT * FROM (VALUES
  ('anon_write',   'denied:499', CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
  ('bad_password', 'denied:401', CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
  ('authed_publish', 'ok',
   (SELECT count(*) FROM nation),
   (SELECT CAST(sum(n_nationkey) AS BIGINT) FROM nation)),
  ('reauth_after_expiry', 'ok',
   (SELECT count(*) FROM region),
   (SELECT CAST(sum(r_regionkey) AS BIGINT) FROM region)),
  ('bad_client_secret', 'denied:400', CAST(0 AS BIGINT), CAST(0 AS BIGINT)),
  ('oauth_publish', 'ok',
   (SELECT count(*) FROM supplier),
   (SELECT CAST(sum(s_suppkey) AS BIGINT) FROM supplier))
) AS t(step, detail, n_rows, key_sum)
"""


@register(
    "agol_rest_auth_roundtrip",
    oracle=_AGOL_AUTH_ORACLE,
    doc="The REST transport's TOKEN boundary (VERDICT r6 #5 — the "
    "reference logs in with a fresh GIS('Home') per worker, "
    "core.py:787-804): an anonymous write is refused with 499, a bad "
    "password is refused by generateToken with 401, an authenticated "
    "publish succeeds, and after the portal expires every token "
    "(deterministic stand-in for wall-clock expiry) the next overwrite "
    "hits 498 and the client transparently re-authenticates and "
    "retries. The OAuth half of the boundary (the reference's "
    "GIS(client_id=...) app login) is graded alongside: a bad client "
    "secret is refused by the client_credentials grant with 400, and "
    "an app-token publish succeeds through the same write boundary. "
    "Graded by reading the published services back and checking "
    "counts/key-sums cross-engine.",
)
def agol_rest_auth_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sinks.agol_httpd import AgolFixturePortal
    from ..sinks.agol_rest import (
        AgolHttpError,
        AgolRestClient,
        publish_df,
        read_service,
    )
    from ..sinks.publish import ItemProperties
    from ..sources.tables import load_table

    portal = AgolFixturePortal(require_auth=True)
    base = portal.start()
    try:
        props = ItemProperties(
            title="Buoy 42 Observations", snippet="snip",
            tags=["e2a_layer", "buoy_42"],
        )
        nation = load_table(spark, sf_dir, "nation").select("n_nationkey")
        region = load_table(spark, sf_dir, "region").select("r_regionkey")
        rows = []
        for step, client in (
            ("anon_write", AgolRestClient(base)),
            ("bad_password", AgolRestClient(base, password="wrong")),
        ):
            try:
                publish_df(nation, client, props)
                detail = "unexpectedly-accepted"
            except AgolHttpError as e:
                detail = f"denied:{e.code}"
            rows.append((step, detail, 0, 0))
        authed = AgolRestClient(base, password="e2a_pw")
        _, s1 = publish_df(nation, authed, props)
        back = read_service(spark, authed, s1, "n_nationkey long", page_size=7)
        a = back.agg(
            F.count(F.lit(1)).alias("n"), F.sum("n_nationkey").alias("s")
        ).first()
        rows.append(("authed_publish", "ok", a["n"], a["s"]))
        portal.expire_tokens()  # every live token now answers 498
        _, s2 = publish_df(region, authed, props, overwrite=True)
        back = read_service(spark, authed, s2, "r_regionkey long", page_size=7)
        a = back.agg(
            F.count(F.lit(1)).alias("n"), F.sum("r_regionkey").alias("s")
        ).first()
        rows.append(("reauth_after_expiry", "ok", a["n"], a["s"]))
        try:
            publish_df(
                nation,
                AgolRestClient(
                    base, client_id="e2a_app", client_secret="nope"
                ),
                props,
            )
            detail = "unexpectedly-accepted"
        except AgolHttpError as e:
            detail = f"denied:{e.code}"
        rows.append(("bad_client_secret", detail, 0, 0))
        app = AgolRestClient(
            base, client_id="e2a_app", client_secret="e2a_secret"
        )
        supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey")
        _, s3 = publish_df(
            supplier, app,
            ItemProperties(title="Supplier Index", tags=["e2a_app_layer"]),
        )
        back = read_service(spark, app, s3, "s_suppkey long", page_size=7)
        a = back.agg(
            F.count(F.lit(1)).alias("n"), F.sum("s_suppkey").alias("s")
        ).first()
        rows.append(("oauth_publish", "ok", a["n"], a["s"]))
        return spark.createDataFrame(
            rows,
            "step string, detail string, n_rows bigint, key_sum bigint",
        )
    finally:
        portal.stop()


# ---------------------------------------------------------------------------
# SURVEY §3.3 — the glider workflow end to end, over the wire
# ---------------------------------------------------------------------------

_GLIDER_E2E_ORACLE = f"""
WITH raw AS (
  SELECT "time (UTC)" AS t,
         "latitude (degrees_north)" AS lat,
         "longitude (degrees_east)" AS lon
  FROM read_csv('{_CSVP_FIXTURE}', header=true, nullstr='NaN')
),
pts AS (SELECT t FROM raw WHERE lat IS NOT NULL AND lon IS NOT NULL)
SELECT (SELECT count(*) FROM pts) - 1 AS n_segments,
       (SELECT count(*) FROM pts) - 1 AS n_published,
       (SELECT count(*) FROM raw) AS n_raw_rows,
       (SELECT count(*) FROM pts) AS n_clean_points
"""


@register(
    "glider_workflow_e2e",
    oracle=_GLIDER_E2E_ORACLE,
    doc="SURVEY §3.3 — the reference's glider workflow traced END TO "
    "END over real transports in one graded plan: chunked tabledap "
    "scan from the loopback ERDDAP server (one HTTP chunk per scan "
    "task), invalid-coordinate drop + consecutive-point segment build "
    "(scalable row numbering, agol_wrangler.pointTableToGeojsonLine), "
    "two-point LineString Features rendered in codegen, the "
    "executor-parallel geojson_fc sink assembling one "
    "FeatureCollection, and the resulting layer published through the "
    "ArcGIS-REST transport and read back from the portal's "
    "FeatureServer. The oracle derives every count independently from "
    "the committed csvp fixture — raw rows, plottable points, segments "
    "(points-1 for a single track), and the published service's rows "
    "must all agree.",
)
def glider_workflow_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as dt
    import json

    from ..functions import geometry
    from ..sinks import geojson_sink
    from ..sinks.agol_httpd import AgolFixturePortal
    from ..sinks.agol_rest import AgolRestClient, publish_df, read_service
    from ..sinks.geojson import feature_json
    from ..sinks.publish import ItemProperties
    from ..sources import erddap_http
    from ..sources.erddap_url import TimeRange, tabledap_chunk_urls
    from .grid_queries import _fixture_base_url, _glider_segments

    base = _fixture_base_url()
    erddap_http.register(spark)
    d = dt.datetime
    chunks = [
        TimeRange(d(2024, 3, 1, 0, 0), d(2024, 3, 1, 13, 0)),
        TimeRange(d(2024, 3, 1, 13, 0), d(2024, 3, 2, 5, 0)),
        TimeRange(d(2024, 3, 2, 5, 0), d(2024, 3, 2, 20, 0)),
    ]
    cols = ["time", "latitude", "longitude", "depth", "sea_water_temperature"]
    urls = tabledap_chunk_urls(base, "glider_track", cols, chunks)
    scan = (
        spark.read.format("erddap_csvp_http")
        .option("urls", "\n".join(urls))
        .option(
            "schema_ddl",
            "time timestamp_ntz, latitude double, longitude double, "
            "depth double, sea_water_temperature double",
        )
        .option("timeout_s", "30")
        .load()
    )
    n_raw = scan.count()
    n_clean = scan.filter(
        F.col("latitude").isNotNull() & F.col("longitude").isNotNull()
    ).count()
    segs = _glider_segments(scan)
    feats = segs.select(
        feature_json(
            F.struct(F.col("seg_id"), F.col("temp_end")),
            geometry.segment_geojson(
                F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")
            ),
        ).alias("feature")
    )
    out = tempfile.mkdtemp(prefix="e2a_glider_e2e_")
    geojson_sink.register(spark)
    (
        feats.write.format("geojson_fc")
        .mode("overwrite")
        .option("assemble", "true")
        .save(out)
    )
    with open(os.path.join(out, "collection.geojson")) as f:
        doc = json.load(f)
    n_features = len(doc["features"])
    portal = AgolFixturePortal()
    pbase = portal.start()
    try:
        client = AgolRestClient(pbase)
        layer = spark.createDataFrame(
            [(int(ft["properties"]["seg_id"]),) for ft in doc["features"]],
            "seg_id long",
        )
        _, svc = publish_df(
            layer, client,
            ItemProperties(title="Glider Track Segments", tags=["e2a_glider"]),
        )
        n_published = read_service(
            spark, client, svc, "seg_id long", page_size=11
        ).count()
    finally:
        portal.stop()
    return spark.createDataFrame(
        [(n_features, n_published, n_raw, n_clean)],
        "n_segments bigint, n_published bigint, n_raw_rows bigint, "
        "n_clean_points bigint",
    )


# ---------------------------------------------------------------------------
# ST1's Structured Streaming SOURCE, driver-graded (VERDICT r6 #7)
# ---------------------------------------------------------------------------

_SUBSEC_P2 = os.path.join(_FIXTURES, "csvp", "subsec_phase2.csvp")

_STREAM_HWM_ORACLE = f"""
SELECT "time (UTC)" AS time_iso,
       "v (m)" AS v,
       CAST(1 AS BIGINT) AS n_deliveries
FROM read_csv('{_SUBSEC_P2}', header=true,
              types={{'time (UTC)': 'VARCHAR', 'v (m)': 'DOUBLE'}})
"""


@register(
    "streaming_tabledap_hwm",
    oracle=_STREAM_HWM_ORACLE,
    doc="ST1's Structured Streaming leg end to end: three availableNow "
    "micro-batch cycles against the loopback tabledap simulator through "
    "one checkpoint. Cycle 1 ingests a FRACTIONAL-second dataset (max "
    "event time 12:00:00.500), the upstream then grows by a row strictly "
    "inside the whole-second truncation gap (00.750) plus a later row, "
    "cycle 2 must deliver exactly those two, and cycle 3 (no upstream "
    "change) must deliver nothing. The committed offset is the "
    "microsecond-precision ISO high-water mark (ADVICE r5 — a "
    "whole-second hwm re-delivers the gap row and n_deliveries becomes "
    "2), and exactly-once comes from Spark's offset log + sink commit, "
    "not hand-rolled state (sources/erddap_http.py:224; reference NRT "
    "loop OverwriteFS.py:2137-2231). The oracle is DuckDB over the "
    "final upstream fixture with every row delivered exactly once.",
)
def streaming_tabledap_hwm(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sources import erddap_http
    from ..sources.erddap_httpd import ErddapFixtureServer

    p1 = os.path.join(_FIXTURES, "csvp", "subsec_phase1.csvp")
    srv = ErddapFixtureServer(csvp_fixtures={"subsec": p1})
    base = srv.start()
    out = tempfile.mkdtemp(prefix="e2a_streamhwm_sink_")
    ckpt = tempfile.mkdtemp(prefix="e2a_streamhwm_ckpt_")
    try:
        erddap_http.register(spark)

        def run_cycle() -> None:
            stream = (
                spark.readStream.format("erddap_csvp_http")
                .option("stream_url", f"{base}/tabledap/subsec.csvp?time,v")
                .option("schema_ddl", "time timestamp_ntz, v double")
                .option("urls", "unused")  # batch-path option, not consumed
                .option("timeout_s", "30")
                .load()
            )
            q = (
                stream.writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run_cycle()                                   # phase-1 rows
        srv.csvp_fixtures["subsec"] = _SUBSEC_P2      # upstream grows
        run_cycle()                                   # only (hwm, max]
        run_cycle()                                   # no change: empty
    finally:
        srv.stop()
    sink = spark.read.schema("time timestamp_ntz, v double").parquet(out)
    return sink.groupBy(
        F.concat(
            F.date_format("time", "yyyy-MM-dd'T'HH:mm:ss.SSS"), F.lit("Z")
        ).alias("time_iso"),
        F.col("v"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_deliveries"))


# ---------------------------------------------------------------------------
# Legacy Rss2Json converter (deprecated in the reference; distinct
# semantics kept alive — see sources/rss2json_legacy.py)
# ---------------------------------------------------------------------------

_RSS2JSON_DIR = os.path.join(_FIXTURES, "rss2json")


def _legacy_inputs(spark: SparkSession):
    from ..sources import rss2json_legacy as lg

    with open(os.path.join(_RSS2JSON_DIR, "legacy_rss.xml")) as f:
        xml = f.read()
    with open(os.path.join(_RSS2JSON_DIR, "legacy_rss.ini")) as f:
        cfg = lg.read_legacy_ini(f.read())
    feeds = spark.createDataFrame(
        [("legacy_rss.xml", xml)], "path string, content string"
    )
    props = lg.legacy_properties_df(spark, feeds)
    return xml, cfg, props


_RSS2JSON_FIELDS_ORACLE = """
SELECT * FROM (VALUES
  ('legacy_rss.xml', 0, 0, 'alert_title', 'Buoy adrift '),
  ('legacy_rss.xml', 0, 1, 'event_time', '2024/03/05 12:00:00'),
  ('legacy_rss.xml', 0, 2, 'url', 'example.org/legacy/1'),
  ('legacy_rss.xml', 0, 3, 'station_id', 'unknown station'),
  ('legacy_rss.xml', 1, 0, 'alert_title', 'Glider recov'),
  ('legacy_rss.xml', 1, 1, 'event_time', '2024/03/06 00:30:00'),
  ('legacy_rss.xml', 1, 2, 'url', 'example.org/legacy/2'),
  ('legacy_rss.xml', 1, 3, 'station_id', 'unknown station')
) AS t(source, item_index, field_pos, field_name, value)
"""


@register(
    "rss2json_legacy_fields",
    oracle=_RSS2JSON_FIELDS_ORACLE,
    doc="Legacy Rss2Json converter surface (reference Rss2Json.py:21-118,"
    " 148-245, 481-628 — the deprecated predecessor of Xml2GeoJSON): INI"
    " sidecar field config parsed (`col=fieldName [type [Key value]...]`,"
    " %20 escapes, type-validated defaults), legacy property flatten"
    " (direct children, prefix_localName, geometry elements consumed),"
    " then the config-ordered per-field pipeline: fieldName substitution,"
    " combined Start/Offset/Length/End extraction (link -> text after"
    " '://'), date re-render through the universal decoder, text Width"
    " truncation with FIRST-row-only padding, Default substitution for"
    " the absent `station` column.  Expected rows hand-derived from the"
    " committed fixture pair.",
)
def rss2json_legacy_fields(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import rss2json_legacy as lg

    _, cfg, props = _legacy_inputs(spark)
    return lg.apply_field_config(props, cfg).orderBy(
        "source", "item_index", "field_pos"
    )


_RSS2JSON_TALLIES_ORACLE = """
SELECT * FROM (VALUES
  ('unavailable', 'station', CAST(2 AS BIGINT)),
  ('unused', 'category', CAST(1 AS BIGINT)),
  ('unused', 'source', CAST(1 AS BIGINT))
) AS t(tally, field, n)
"""


@register(
    "rss2json_field_tallies",
    oracle=_RSS2JSON_TALLIES_ORACLE,
    doc="Legacy Rss2Json end-of-run field report (Rss2Json.py:110-117,"
    " 673-677): `unavailable` = items missing a CONFIGURED column"
    " (station, absent from both items), `unused` = properties present"
    " but unconfigured (category in item 0, source in item 1).  Two"
    " map-side-combined aggregates over the legacy property relation;"
    " expected rows hand-derived.",
)
def rss2json_field_tallies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import rss2json_legacy as lg

    _, cfg, props = _legacy_inputs(spark)
    return lg.field_tallies(props, cfg).orderBy("tally", "field")
