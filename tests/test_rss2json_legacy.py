"""Legacy Rss2Json compat (sources/rss2json_legacy.py): INI sidecar
round-trip, publication gate, legacy property flatten, and the per-field
pipeline edges the fixture pair exercises end-to-end via the two
registered queries (whose oracles the global parity sweep checks)."""

from __future__ import annotations

import os

import pytest

from erddap2agol_spark.sources import rss2json_legacy as lg

_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "fixtures", "rss2json")


def _fixture(name: str) -> str:
    with open(os.path.join(_DIR, name)) as f:
        return f.read()


# ---------------------------------------------------------------- INI


def test_ini_parse_fixture():
    cfg = lg.read_legacy_ini(_fixture("legacy_rss.ini"))
    assert cfg.last_publication_date == "2024/03/01 00:00:00"
    assert [f.col for f in cfg.fields] == ["title", "pubDate", "link", "station"]
    title, pubdate, link, station = cfg.fields
    assert (title.field_name, title.field_type, title.width) == ("alert_title", "text", 12)
    assert (pubdate.field_name, pubdate.field_type) == ("event_time", "date")
    assert pubdate.default == lg.DEFAULT_TIME
    assert (link.start, link.width) == ("://", 0)
    assert station.default == "unknown station"  # %20 decoded


def test_ini_illegal_type_cleared():
    cfg = lg.read_legacy_ini("[f]\ncol=name bogus Width 9\n")
    (f,) = cfg.fields
    # Rss2Json.py:203-208: illegal type clears type/default/width
    assert (f.field_type, f.default, f.width) == ("", "", 0)


def test_ini_width_is_text_only():
    cfg = lg.read_legacy_ini("[f]\ncol=name integer Width 9\n")
    assert cfg.fields[0].width == 0
    cfg = lg.read_legacy_ini("[f]\ncol=name text Width nope\n")
    assert cfg.fields[0].width == 0


def test_ini_unknown_property_skipped():
    cfg = lg.read_legacy_ini("[f]\ncol=name text Sparkle 9 Width 4\n")
    assert cfg.fields[0].width == 4


def test_ini_bad_pubdate_ignored():
    cfg = lg.read_legacy_ini("[properties]\nlastPublicationDate=yesterday\n")
    assert cfg.last_publication_date is None


def test_ini_write_read_roundtrip():
    cfg = lg.read_legacy_ini(_fixture("legacy_rss.ini"))
    cfg.source_filename = "legacy_rss.xml"
    text = lg.write_legacy_ini(cfg)
    back = lg.read_legacy_ini(text)
    assert back.last_publication_date == cfg.last_publication_date
    assert back.fields == cfg.fields


# --------------------------------------------------------------- gate


def test_publication_date_extraction():
    assert lg.feed_publication_date(_fixture("legacy_rss.xml")) == "2024/03/06 12:00:00"


def test_publication_gate():
    # older or equal stored mark -> proceed only when strictly newer
    assert lg.publication_changed("2024/03/06 12:00:00", "2024/03/01 00:00:00")
    assert not lg.publication_changed("2024/03/06 12:00:00", "2024/03/06 12:00:00")
    assert not lg.publication_changed("2024/03/06 12:00:00", "2024/03/07 00:00:00")
    # a missing stamp on either side never blocks (Rss2Json.py:382-389)
    assert lg.publication_changed(None, "2024/03/07 00:00:00")
    assert lg.publication_changed("2024/03/06 12:00:00", None)


# ------------------------------------------------------------ flatten


def test_legacy_flatten_rules():
    rows = lg.parse_legacy_properties(_fixture("legacy_rss.xml"), "s")
    by_item: dict[int, dict[str, str]] = {}
    for r in rows:
        by_item.setdefault(r["item_index"], {})[r["name"]] = r["value"]
    # geometry elements consumed; plain + RSS2.0 <source> kept
    assert "georss_point" not in by_item[0]
    assert by_item[0]["category"] == "marine-warning"
    assert by_item[1]["source"] == "ops-desk"
    assert by_item[1]["pubDate"] == "Wed, 06 Mar 2024 00:30:00 GMT"


def test_legacy_flatten_prefix_and_container():
    xml = (
        '<rss xmlns:dc="http://purl.org/dc/elements/1.1/"><channel><item>'
        "<dc:creator>ops</dc:creator>"
        "<meta><a>x</a><b>y</b></meta>"
        "<title>first</title><title>second</title>"
        "</item></channel></rss>"
    )
    rows = lg.parse_legacy_properties(xml, "s")
    props = {r["name"]: r["value"] for r in rows}
    assert props["dc_creator"] == "ops"           # document prefix naming
    assert props["meta"] == "x, y"                # nested-text join
    assert props["title"] == "second"             # repeated name last-wins


def test_legacy_flatten_attribute_fallback():
    # childless element with no text: unprefixed attribute values stand
    # in (Rss2Json.py:487-504)
    xml = (
        "<rss><channel><item>"
        '<enclosure url="http://example.org/a.png" length="512"/>'
        "<title>t</title>"
        "</item></channel></rss>"
    )
    rows = lg.parse_legacy_properties(xml, "s")
    props = {r["name"]: r["value"] for r in rows}
    assert props["enclosure"] in ("http://example.org/a.png", "512")
    assert props["title"] == "t"


def test_legacy_extract_start_not_found_yields_default(spark):
    cfg = lg.LegacyConfig(fields=[
        lg.LegacyField(col="v", field_name="out", field_type="text",
                       default="dflt", start="@@"),
    ])
    props = spark.createDataFrame(
        [("s", 0, "v", "no marker here")],
        "source string, item_index int, name string, value string",
    )
    out = lg.apply_field_config(props, cfg).collect()
    # Rss2Json.py:78-82: extraction that resolves to offset 0/length 0
    # substitutes the field default
    assert out[0]["value"] == "dflt"


def test_first_row_pad_only(spark):
    cfg = lg.LegacyConfig(fields=[
        lg.LegacyField(col="t", field_name="t", field_type="text", width=6),
    ])
    props = spark.createDataFrame(
        [("s", 0, "t", "abc"), ("s", 1, "t", "def"), ("s", 2, "t", "longerthan6")],
        "source string, item_index int, name string, value string",
    )
    got = {r["item_index"]: r["value"]
           for r in lg.apply_field_config(props, cfg).collect()}
    assert got[0] == "abc   "          # padded (first row sets width)
    assert got[1] == "def"             # later rows not padded
    assert got[2] == "longer"          # truncated


def test_config_only_items_emit_default_rows(spark):
    # an item carrying NONE of the configured columns still emits rows
    cfg = lg.LegacyConfig(fields=[
        lg.LegacyField(col="missing", field_name="m", field_type="text",
                       default="d"),
    ])
    props = spark.createDataFrame(
        [("s", 0, "other", "x")],
        "source string, item_index int, name string, value string",
    )
    out = lg.apply_field_config(props, cfg).collect()
    assert [(r["field_name"], r["value"]) for r in out] == [("m", "d")]
