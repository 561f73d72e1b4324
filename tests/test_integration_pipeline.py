"""End-to-end lifecycle tests mirroring the reference's three entry
points (SURVEY §3): batch create, NRT update, feed->GeoJSON conversion.
Each test drives the full path through the public modules — no internal
shortcuts."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.functions import datetimes, geometry
from erddap2agol_spark.operators import convert
from erddap2agol_spark.operators.projection import metadata_projection
from erddap2agol_spark.plans import chunking
from erddap2agol_spark.sinks import publish
from erddap2agol_spark.sinks.geojson import write_feature_collection
from erddap2agol_spark.sources import das, erddap_url, feeds
from erddap2agol_spark.sources.tables import load_table
from erddap2agol_spark.streaming import nrt

SF = "/root/testdata/sf0.001"


def test_batch_create_lifecycle(spark, tmp_path):
    """§3.1: metadata -> projection -> chunk plan -> URL compile ->
    'download' (table scan stands in) -> publish with item properties."""
    das_text = """Attributes {
 time {
  Float64 actual_range 1.7040672e+9, 1.7066592e+9;
 }
 value {
  Float64 actual_range 0.0, 200.0;
 }
 value_qc_agg {
  Int32 actual_range 1, 9;
 }
 NC_GLOBAL {
  String summary "Synthetic event stream.";
  String institution "TestOrg";
 }
}
"""
    meta = das.das_to_dataframe(spark, {"events_ds": das_text})
    # (1) metadata-driven projection: QC column dropped
    keep = {r.variable for r in das.actual_attributes(meta).collect()}
    assert keep == {"time", "value"}
    # (2) extent + chunk plan from metadata only (no data scan)
    ext = das.time_extent_from_meta(meta).first()
    slices = chunking.time_slices(ext.start_time, ext.end_time, row_count=250_000)
    assert len(slices) == 3
    # (3) compiled scan URLs, one per partition
    urls = erddap_url.tabledap_chunk_urls(
        "https://example.org/erddap", "events_ds", ["time", "value"], slices
    )
    assert len(urls) == 3 and all("time%3E%3D" in u for u in urls)
    # (4) "download" -> project -> publish
    data = load_table(spark, SF, "events").select(
        F.col("ts").alias("time"), "value", (F.col("value") * 0).cast("int").alias("value_qc_agg")
    )
    projected = metadata_projection(data, required=["time"])
    assert projected.columns == ["time", "value"]
    props = publish.item_properties_from_metadata(
        {"summary": "Synthetic event stream.", "institution": "TestOrg"}, "events_ds"
    )
    portal = str(tmp_path / "portal")
    item = publish.publish(projected, portal, props)
    assert publish.read_item(spark, portal, item).count() == projected.count()
    assert publish.item_properties(portal, item)["snippet"] == "Synthetic event stream."


def test_nrt_update_lifecycle(spark, tmp_path):
    """§3.2: inventory scan -> anti-join -> windowed refresh -> gates."""
    portal = str(tmp_path / "portal")
    ev = load_table(spark, SF, "events")
    # publish an existing NRT item
    publish.publish(
        ev.limit(10), portal, publish.ItemProperties(title="ds_old", tags=["e2a_nrt"])
    )
    existing = publish.search_items(portal, "e2a_nrt")
    assert existing == ["ds_old"]
    # anti-join: which datasets are new?
    candidates = spark.createDataFrame([("ds_old",), ("ds_new",)], ["dataset_id"])
    inventory = spark.createDataFrame([(i,) for i in existing], ["dataset_id"])
    from erddap2agol_spark.operators.joins import anti_join_new

    new = [r.dataset_id for r in anti_join_new(candidates, inventory, "dataset_id").collect()]
    assert new == ["ds_new"]
    # refresh the window into its own sink; second run skips
    sink = str(tmp_path / "nrt_ds_new")
    r1 = nrt.refresh(ev, "ts", sink)
    r2 = nrt.refresh(ev, "ts", sink)
    assert r1["published"] and not r2["published"]


FEED = """<?xml version="1.0"?>
<rss version="2.0" xmlns:georss="http://www.georss.org/georss">
 <channel><title>obs</title>
  <item><title>Buoy A</title><pubDate>Tue, 05 Mar 2024 10:11:12 +0000</pubDate>
   <georss:point>27.9 -93.6</georss:point><reading_count>14</reading_count></item>
  <item><title>Buoy B</title><pubDate>1709633472</pubDate>
   <georss:point>28.4 -90.1</georss:point><reading_count>7</reading_count></item>
 </channel></rss>"""


def test_feed_to_geojson_lifecycle(spark, tmp_path):
    """§3.3 shape on a feed: XML -> items -> type inference -> datetime
    decode -> geometry -> FeatureCollection file."""
    src = spark.createDataFrame([("feed1", FEED)], ["path", "content"])
    items = feeds.feeds_to_dataframe(spark, src)
    # extras carry custom elements; promote reading_count via inference
    items = items.withColumn(
        "reading_count", F.get_json_object("extras", "$.reading_count")
    )
    types = convert.infer_field_types(items.select("title", "reading_count"))
    assert types["reading_count"] == "integer"
    typed = items.withColumn("reading_count", F.col("reading_count").cast("bigint"))
    # decode both pubDate formats (RFC-822 + epoch) to the same instant
    typed = typed.withColumn("pub_ts", datetimes.decode_datetime(F.col("pub_date")))
    ts = [r.pub_ts for r in typed.select("pub_ts").collect()]
    assert ts[0] == ts[1] is not None
    # geometry + write
    path = str(tmp_path / "obs.geojson")
    n = write_feature_collection(
        typed,
        ["title", "reading_count"],
        geometry.point_geojson(F.col("georss_point")),
        path,
    )
    fc = json.load(open(path))
    assert n == 2
    coords = sorted(f["geometry"]["coordinates"] for f in fc["features"])
    assert coords == [[-93.6, 27.9], [-90.1, 28.4]]


def test_glider_spaced_column_names(spark, tmp_path):
    """FIXTURES.md §3: real glider tables have spaced/parenthesized
    column names ('longitude (degrees_east)') — the full segment ->
    GeoJSON path must survive them, including ~2% null coordinates."""
    from erddap2agol_spark.operators.filters import drop_invalid_coords
    from erddap2agol_spark.operators.windows import track_segments

    rows = [
        ("g1", "2024-01-01 00:00:00", -93.6, 27.9, 22.5),
        ("g1", "2024-01-01 01:00:00", -93.5, 28.0, 22.7),
        ("g1", "2024-01-01 02:00:00", None, None, 23.0),  # dropped point
        ("g1", "2024-01-01 03:00:00", -93.4, 28.1, 23.1),
        ("g2", "2024-01-01 00:30:00", -90.0, 25.0, 25.0),
        ("g2", "2024-01-01 01:30:00", -90.1, 25.1, 25.2),
    ]
    df = spark.createDataFrame(
        rows,
        schema=[
            "glider_id",
            "time",
            "longitude (degrees_east)",
            "latitude (degrees_north)",
            "temperature",
        ],
    ).withColumn("time", F.col("time").cast("timestamp"))
    clean = drop_invalid_coords(
        df, ["longitude (degrees_east)", "latitude (degrees_north)"]
    )
    assert clean.count() == 5
    segs = track_segments(
        clean,
        "glider_id",
        "time",
        "longitude (degrees_east)",
        "latitude (degrees_north)",
        carry_cols=["temperature"],
    )
    got = {(r.glider_id, r.x1, r.x2, r.temperature) for r in segs.collect()}
    # null point removed -> g1 pairs (p0,p1) and (p1,p3); properties from
    # the SECOND point of each segment
    assert got == {
        ("g1", -93.6, -93.5, 22.7),
        ("g1", -93.5, -93.4, 23.1),
        ("g2", -90.0, -90.1, 25.2),
    }
    path = str(tmp_path / "gliders.geojson")
    n = write_feature_collection(
        segs,
        ["glider_id", "temperature"],
        geometry.segment_geojson(F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")),
        path,
    )
    fc = json.load(open(path))
    assert n == 3 and len(fc["features"]) == 3
    assert all(f["properties"]["glider_id"] in ("g1", "g2") for f in fc["features"])


def test_streaming_corpus_ingest_lifecycle(spark, tmp_path):
    """Streaming capstone: a document stream flows through the
    MinHash-LSH ingest gate (near-dups of accepted history rejected
    batch over batch), the accepted corpus is then compacted and read
    back as a batch table, and the batch exact-dedup canon confirms the
    gate left no duplicate content behind — the streaming and batch
    faces of the dedup family agreeing on one corpus."""
    from pyspark.sql import functions as F

    from erddap2agol_spark.operators import dedup
    from erddap2agol_spark.streaming import neardup

    words = [f"w{i}" for i in range(40)]
    text_a = " ".join(words)
    text_b = " ".join(w + "x" for w in words)
    text_c = " ".join(w + "q" for w in words)
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id bigint, text string"

    def feed(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    feed([(1, text_a), (2, text_b)])
    q = neardup.start_lsh_dedup_ingest(
        spark.readStream.schema(schema).parquet(src), store, out, ckpt
    )
    try:
        q.processAllAvailable()
        feed([(3, text_a), (4, text_c)])   # 3 = exact dup of history
        q.processAllAvailable()
        feed([(5, text_b), (6, text_b)])   # both dups (one of history)
        q.processAllAvailable()
    finally:
        q.stop()

    neardup.compact_store(spark, store, keep_last=1)
    corpus = neardup.read_accepted(spark, out)
    assert sorted(r.doc_id for r in corpus.collect()) == [1, 2, 4]
    # batch exact-dedup canon over the accepted corpus: every content
    # hash must be unique — the gate admitted no duplicate text
    canon = dedup.exact_dedup(corpus, "text", "doc_id")
    assert canon.filter(F.col("n_copies") > 1).count() == 0
    assert canon.count() == 3
