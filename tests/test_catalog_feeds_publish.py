"""Catalog wire format (S2/S3/J2/T3), feed ingestion (S12/S13), and the
publish sink (K3/K4/K6/F18/U5)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.sinks import publish
from erddap2agol_spark.sources import catalog, feeds

TABLE_JSON = json.dumps(
    {
        "table": {
            "columnNames": ["datasetID", "title", "tabledap", "griddap", "minTime (UTC)", "maxTime (UTC)"],
            "rows": [
                ["allDatasets", "all", "x", "", "2020-01-01T00:00:00Z", "2024-01-01T00:00:00Z"],
                ["buoy_1", "Gulf Buoy Watch", "url", "", "2021-05-01T00:00:00Z", "2024-06-01T00:00:00Z"],
                ["ship_2", "Ship Track NRT", "url", "", "2024-01-01T00:00:00Z", "2024-06-10T00:00:00Z"],
                ["grid_3", "SST Grid", "", "url", "2019-01-01T00:00:00Z", "2024-06-01T00:00:00Z"],
                ["blank_4", "No protocol", "", "", None, None],
            ],
        }
    }
)


def test_catalog_parse_filter_search(spark):
    df = catalog.parse_table_json(spark, TABLE_JSON)
    assert df.columns[:4] == ["dataset_id", "title", "tabledap", "griddap"]
    ds = catalog.catalog_datasets(df)  # tabledap protocol
    ids = {r.dataset_id for r in ds.collect()}
    assert ids == {"buoy_1", "ship_2"}  # self-row, grid, blank filtered
    hits = catalog.search(ds, ["buoy", "gulf"])
    assert [r.dataset_id for r in hits.collect()] == ["buoy_1"]


def test_date_cache_restore(spark):
    cat = catalog.parse_table_json(spark, TABLE_JSON)
    cache = catalog.build_date_cache(catalog.catalog_datasets(cat))
    # search results arrive with missing dates
    results = spark.createDataFrame(
        [("buoy_1", None, None), ("new_9", None, None)],
        schema="dataset_id string, min_time timestamp, max_time timestamp",
    )
    restored = {r.dataset_id: r.min_time for r in catalog.restore_dates(results, cache).collect()}
    assert restored["buoy_1"].year == 2021  # cache value restored
    assert restored["new_9"] is None  # unknown id stays null


def test_paginate_and_cart(spark):
    cat = catalog.catalog_datasets(catalog.parse_table_json(spark, TABLE_JSON))
    page1 = catalog.paginate(cat, page=1, page_size=1)
    assert page1.count() == 1
    cart = catalog.add_to_cart(page1, page1)  # double add dedups
    assert cart.count() == 1


RSS = """<?xml version="1.0"?>
<rss version="2.0" xmlns:georss="http://www.georss.org/georss">
 <channel><title>alerts</title>
  <item><title>A1</title><link>http://x/1</link><pubDate>Tue, 05 Mar 2024 10:11:12 +0000</pubDate>
   <georss:point>27.9 -93.6</georss:point><guid>g1</guid><severity>high</severity></item>
  <item><title>A2</title><description>d2</description>
   <georss:box>18 -98 31 -76</georss:box><guid>g2</guid></item>
 </channel></rss>"""

ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom">
 <title>f</title>
 <entry><title>E1</title><id>e1</id><updated>2024-03-05T10:00:00Z</updated></entry>
</feed>"""


def test_feed_parse_rss_and_atom(spark):
    src = spark.createDataFrame([("rss1", RSS), ("atom1", ATOM)], ["path", "content"])
    items = feeds.feeds_to_dataframe(spark, src)
    rows = {(r.source, r.item_index): r for r in items.collect()}
    assert len(rows) == 3
    a1 = rows[("rss1", 0)]
    assert a1.title == "A1" and a1.georss_point == "27.9 -93.6"
    assert json.loads(a1.extras)["severity"] == "high"
    assert rows[("rss1", 1)].georss_box == "18 -98 31 -76"
    e1 = rows[("atom1", 0)]
    assert e1.guid == "e1" and e1.pub_date == "2024-03-05T10:00:00Z"


def test_feed_parse_skips_malformed(spark):
    src = spark.createDataFrame(
        [("bad", "<rss><item><title>x</title>"), ("ok", ATOM)], ["path", "content"]
    )
    items = feeds.feeds_to_dataframe(spark, src)
    assert [r.source for r in items.collect()] == ["ok"]


def test_json_root_detection(spark):
    doc1 = json.dumps({"meta": 1, "features": [{"a": 1}, {"a": 2}], "other": [1]})
    doc2 = json.dumps({"small": [1], "big": [{"b": i} for i in range(3)]})
    df = feeds.json_docs_to_dataframe(spark, [doc1, doc2])
    assert df.count() == 5  # 2 features + 3 big items


def test_publish_overwrite_preserves_properties(spark, tmp_path):
    portal = str(tmp_path / "portal")
    df = spark.range(10).withColumn("v", F.col("id") * 2.0)
    props = publish.item_properties_from_metadata(
        {
            "title": "Gulf Buoy Watch",
            "summary": "Buoy obs",
            "institution": "GCOOS",
            "license": "CC0",
            "keywords": "buoy, sst, latitude",
        },
        "buoy_1",
        nrt=True,
    )
    item = publish.publish(df, portal, props)
    assert item == "Gulf_Buoy_Watch"  # sanitized title (F7)
    got = publish.item_properties(portal, item)
    assert got["tags"][:3] == ["erddap2agol_spark", "buoy_1", "e2a_nrt"]
    assert "latitude" not in got["tags"]  # reserved tag dropped (U5)
    assert got["license_info"] == "CC0"

    # overwrite with fresh data keeps the original sidecar (K8 contract)
    publish.publish(df.limit(3), portal, publish.ItemProperties(title="Gulf Buoy Watch"),
                    overwrite=True)
    assert publish.read_item(spark, portal, item).count() == 3
    assert publish.item_properties(portal, item)["snippet"] == "Buoy obs"


def test_publish_collision_rename_and_append(spark, tmp_path):
    portal = str(tmp_path / "portal")
    df = spark.range(5)
    p = publish.ItemProperties(title="Same Name")
    first = publish.publish(df, portal, p)
    second = publish.publish(df, portal, p)  # 409 -> rename
    assert (first, second) == ("Same_Name", "Same_Name_2")
    publish.append(spark.range(5, 8), portal, first)  # K4
    assert publish.read_item(spark, portal, first).count() == 8


def test_search_items_by_tag(spark, tmp_path):
    portal = str(tmp_path / "portal")
    publish.publish(
        spark.range(1), portal, publish.ItemProperties(title="A", tags=["e2a_nrt"])
    )
    publish.publish(spark.range(1), portal, publish.ItemProperties(title="B", tags=["x"]))
    assert publish.search_items(portal, "e2a_nrt") == ["A"]


def test_flatten_and_clean_tags():
    assert publish.flatten_tags(["a", ["b", ["c"]], None]) == ["a", "b", "c"]
    assert publish.clean_tags(["A", "mask", "A", ["NC_GLOBAL", "ok"]]) == ["A", "ok"]


# ---------------------------------------------------------------------------
# S12 end-to-end feed geometry (VERDICT r1 #9)
# ---------------------------------------------------------------------------

CAP_ATOM = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom"
      xmlns:cap="urn:oasis:names:tc:emergency:cap:1.1"
      xmlns:georss="http://www.georss.org/georss"
      xmlns:gml="http://www.opengis.net/gml"
      xmlns:geo="http://www.w3.org/2003/01/geo/wgs84_pos#">
  <title>alerts</title>
  <entry>
    <id>cap-1</id><title>Tornado Warning</title>
    <cap:polygon>30.0,-95.0 31.0,-95.0 31.0,-94.0 30.0,-95.0</cap:polygon>
  </entry>
  <entry>
    <id>rss-pt</id><title>Buoy</title>
    <georss:point>27.5 -82.25</georss:point>
    <georss:elev>-10</georss:elev>
  </entry>
  <entry>
    <id>gml-line</id><title>Track</title>
    <georss:where>
      <gml:LineString srsDimension="3">
        <gml:posList>27.0 -82.0 5.0 27.1 -82.1 6.0</gml:posList>
      </gml:LineString>
    </georss:where>
  </entry>
  <entry>
    <id>gml-box</id><title>Region</title>
    <georss:where>
      <gml:Envelope>
        <gml:lowerCorner>42.94 -71.03</gml:lowerCorner>
        <gml:upperCorner>43.04 -69.86</gml:upperCorner>
      </gml:Envelope>
    </georss:where>
  </entry>
  <entry>
    <id>w3c</id><title>Station</title>
    <geo:lat>55.7</geo:lat>
    <geo:long>12.57</geo:long>
  </entry>
</feed>
"""


def test_feed_geometry_end_to_end(spark):
    import json as _json

    from erddap2agol_spark.sources import feeds

    src = spark.createDataFrame([("capfeed.xml", CAP_ATOM)], ["path", "content"])
    items = feeds.feeds_to_dataframe(spark, src)
    out = feeds.with_feed_geometry(items)
    got = {r.guid: r.geometry for r in out.collect()}
    assert len(got) == 5

    # CAP polygon: comma pairs -> flat, lat-first reorder, CCW reversal,
    # ring closed (already closed in the fixture)
    cap = _json.loads(got["cap-1"])
    assert cap["type"] == "Polygon"
    assert cap["coordinates"] == [
        [[-95, 30], [-94, 31], [-95, 31], [-95, 30]]
    ]

    # GeoRSS point + elev sidecar -> 3-D point, lon/lat/z
    pt = _json.loads(got["rss-pt"])
    assert pt == {"type": "Point", "coordinates": [-82.25, 27.5, -10]}

    # GML 3-D posList: srsDimension=3 consumes z per point
    line = _json.loads(got["gml-line"])
    assert line["type"] == "LineString"
    assert line["coordinates"] == [[-82.0, 27.0, 5.0], [-82.1, 27.1, 6.0]]

    # GML envelope -> 5-point ring polygon
    box = _json.loads(got["gml-box"])
    assert box["type"] == "Polygon"
    ring = box["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]
    assert ring[0] == [-71.03, 42.94] and ring[2] == [-69.86, 43.04]

    # W3C geo:lat/geo:long -> plain point
    w3c = _json.loads(got["w3c"])
    assert w3c == {"type": "Point", "coordinates": [12.57, 55.7]}


MULTI_FEED = """<?xml version="1.0"?>
<feed xmlns="http://www.w3.org/2005/Atom"
      xmlns:cap="urn:oasis:names:tc:emergency:cap:1.1"
      xmlns:georss="http://www.georss.org/georss"
      xmlns:gml="http://www.opengis.net/gml">
  <title>multi</title>
  <entry>
    <id>mp</id><title>Two Buoys</title>
    <georss:point>27.5 -82.25</georss:point>
    <georss:point>28.0 -83.0</georss:point>
  </entry>
  <entry>
    <id>ml</id><title>Two Tracks</title>
    <georss:line>27.0 -82.0 27.1 -82.1</georss:line>
    <georss:line>28.0 -83.0 28.2 -83.3</georss:line>
  </entry>
  <entry>
    <id>mpoly</id><title>Two Cells</title>
    <cap:polygon>30.0,-95.0 31.0,-95.0 31.0,-94.0 30.0,-95.0</cap:polygon>
    <cap:polygon>10.0,-60.0 11.0,-60.0 11.0,-59.0 10.0,-60.0</cap:polygon>
  </entry>
  <entry>
    <id>single</id><title>One Buoy</title>
    <georss:point>27.9 -93.6</georss:point>
  </entry>
</feed>
"""


def test_feed_geometry_multipart(spark):
    """F17 multi-part assembly: repeated geometry elements in one item
    become Multi* shapes (reference Json2GeoJSON.py:1043-1065), while a
    single part keeps the plain geometry type."""
    import json as _json

    from erddap2agol_spark.sources import feeds

    src = spark.createDataFrame([("multi.xml", MULTI_FEED)], ["path", "content"])
    out = feeds.with_feed_geometry(feeds.feeds_to_dataframe(spark, src))
    got = {r.guid: _json.loads(r.geometry) for r in out.collect()}

    assert got["mp"] == {
        "type": "MultiPoint",
        "coordinates": [[-82.25, 27.5], [-83, 28]],
    }
    assert got["ml"] == {
        "type": "MultiLineString",
        "coordinates": [
            [[-82, 27], [-82.1, 27.1]],
            [[-83, 28], [-83.3, 28.2]],
        ],
    }
    mpoly = got["mpoly"]
    assert mpoly["type"] == "MultiPolygon"
    assert len(mpoly["coordinates"]) == 2
    # each part: one closed, CCW-rewound ring
    for part in mpoly["coordinates"]:
        assert len(part) == 1 and part[0][0] == part[0][-1]
    assert mpoly["coordinates"][0][0] == [
        [-95, 30], [-94, 31], [-95, 31], [-95, 30]
    ]
    assert mpoly["coordinates"][1][0] == [
        [-60, 10], [-59, 11], [-60, 11], [-60, 10]
    ]
    # a lone part is NOT wrapped in a Multi
    assert got["single"]["type"] == "Point"


def test_feed_geometry_null_when_absent(spark):
    from erddap2agol_spark.sources import feeds

    plain = """<?xml version="1.0"?><rss><channel>
      <item><title>no geom</title><guid>g1</guid></item>
    </channel></rss>"""
    src = spark.createDataFrame([("p.xml", plain)], ["path", "content"])
    out = feeds.with_feed_geometry(feeds.feeds_to_dataframe(spark, src))
    rows = out.collect()
    assert len(rows) == 1 and rows[0].geometry is None


# ---------------------------------------------------------------------------
# property fuzz: feed parsing invariants over generated XML


def test_parse_feed_xml_fuzz():
    """Random well-formed RSS/ATOM trees (namespaced or not, weird
    child tags, comma/space coordinate soup, repeated geometry
    elements): parse_feed_xml never raises, yields exactly one row per
    item, keeps extras as valid JSON, and accumulates repeated
    geometry parts with the '|' separator."""
    import json as _json
    import random
    from xml.sax.saxutils import escape

    from erddap2agol_spark.sources.feeds import parse_feed_xml

    known_geo = ["point", "polygon", "line"]
    other = ["title", "link", "guid", "pubDate", "weird", "category"]
    texts = ["", "a b", "1,2 3,4", "10.5 -20.25", ",,", "x,y", "  pad  ", "<&>"]

    for seed in range(40):
        rng = random.Random(seed)
        ns = 'xmlns:georss="http://www.georss.org/georss" ' if rng.random() < 0.5 else ""
        items_xml, expect = [], []
        for _ in range(rng.randint(0, 4)):
            children, n_parts = [], {}
            for _ in range(rng.randint(0, 6)):
                tag = rng.choice(known_geo + other)
                txt = rng.choice(texts)
                pfx = "georss:" if (ns and tag in known_geo and rng.random() < 0.7) else ""
                children.append(f"<{pfx}{tag}>{escape(txt)}</{pfx}{tag}>")
                if tag in known_geo and txt.strip():
                    n_parts[tag] = n_parts.get(tag, 0) + 1
            items_xml.append("<item>" + "".join(children) + "</item>")
            expect.append(n_parts)
        xml = f'<rss {ns}version="2.0"><channel>' + "".join(items_xml) + "</channel></rss>"

        rows = parse_feed_xml(xml, source="fuzz")
        assert len(rows) == len(items_xml), seed
        for row, parts in zip(rows, expect):
            _json.loads(row["extras"])  # always valid JSON
            for tag, n in parts.items():
                key = {"point": "georss_point", "polygon": "georss_polygon", "line": "georss_line"}[tag]
                got = row.get(key, "")
                assert got.count("|") == n - 1, (seed, key, got)
