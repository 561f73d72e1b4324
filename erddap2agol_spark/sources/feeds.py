"""Feed ingestion: XML (RSS/ATOM/CAP/GeoRSS) and JSON documents
(SURVEY §2.1 S12/S13).

The reference's converters DOM-parse feeds per file on one thread
(Xml2GeoJSON.py:810-950, Json2GeoJSON.py:829-895). Spark-first: files
land as rows (``binaryFile`` source or a file list), parsing runs inside
``mapInPandas`` partitions — one feed per row in, one row per item out —
so a million small feeds parse with cluster parallelism. Root-element
autodetection mirrors the reference: ``item`` -> RSS, ``entry`` ->
ATOM/CAP; JSON roots pick the LARGEST list value (``features`` known).

The parser is stdlib ``xml.etree`` (namespace-aware tag localname
matching); geometry-bearing tags (georss:point/line/polygon/box,
geo:lat/long) surface as plain columns for functions.geometry to
consume.
"""

from __future__ import annotations

import json
import re
from collections.abc import Iterator
from xml.etree import ElementTree

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

#: per-item fields surfaced from feeds (fixed schema -> stable plans)
FEED_ITEM_SCHEMA = (
    "source string, item_index int, title string, link string, "
    "description string, pub_date string, guid string, "
    "georss_point string, georss_line string, georss_polygon string, "
    "georss_box string, geo_lat string, geo_lon string, "
    "georss_elev string, geo_dims int, "
    "extras string"
)

_KNOWN = {
    "title",
    "link",
    "description",
    "summary",
    "content",
    "pubdate",
    "published",
    "updated",
    "guid",
    "id",
    "point",
    "line",
    "polygon",
    "box",
    "lat",
    "long",
}


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def _norm_coords(val: str) -> tuple[str, int | None]:
    """ATOM/CAP coordinate normalization (Xml2GeoJSON.py:1050-1056):
    comma-separated tuples ("lat1,lon1 lat2,lon2") carry their dimension
    in the first tuple's comma count; commas then become spaces so every
    form is one flat ordinate list."""
    if "," in val:
        dims = val.split(" ", 1)[0].count(",") + 1
        return val.replace(",", " "), dims
    return val, None


#: multi-part separator inside the flat geometry columns.  The reference
#: accumulates repeated geometry elements of one item into a parts tuple
#: and emits "Multi"+type when >1 part (Json2GeoJSON.py:1043-1065); the
#: ordinate lists themselves are space-separated numbers, so "|" is an
#: unambiguous part delimiter that keeps the feed schema fixed.
PART_SEP = "|"


def _add_geom_part(row: dict, key: str, val: str) -> int | None:
    """Accumulate a repeated geometry element as another part."""
    norm, dims = _norm_coords(val)
    row[key] = row[key] + PART_SEP + norm if key in row else norm
    return dims


def _parse_gml_where(el, row: dict) -> None:
    """GML GeoRSS ("georss:where" wrapping gml:Point/LineString/Polygon/
    Envelope, srsDimension-aware — Xml2GeoJSON.py:1075-1140): route the
    posList/pos/corners into the same flat georss_* columns."""
    kind = None
    lower = upper = None
    for g in el.iter():
        gname = _local(g.tag)
        sd = g.attrib.get("srsDimension", "")
        if sd.isnumeric():
            row["geo_dims"] = int(sd)
        text = (g.text or "").strip()
        if gname == "point":
            kind = "point"
        elif gname in ("linestring", "line", "curve"):
            kind = "line"
        elif gname == "polygon":
            kind = "polygon"
        elif gname == "envelope":
            kind = "box"
        elif gname in ("pos", "poslist", "coordinates") and text:
            val, dims = _norm_coords(text)
            if dims:
                row.setdefault("geo_dims", dims)
            if kind == "point" or (kind is None and gname == "pos"):
                key = "georss_point"
            elif kind == "polygon":
                key = "georss_polygon"
            else:
                key = "georss_line"
            row[key] = row[key] + PART_SEP + val if key in row else val
        elif gname == "lowercorner":
            lower = text
        elif gname == "uppercorner":
            upper = text
    if lower and upper:
        row["georss_box"] = f"{lower} {upper}"


def parse_feed_xml(text: str, source: str = "") -> list[dict]:
    """One XML feed -> item dicts. Root autodetect: any ``item`` elements
    -> RSS; else ``entry`` -> ATOM/CAP."""
    root = ElementTree.fromstring(text)
    items = [e for e in root.iter() if _local(e.tag) == "item"]
    if not items:
        items = [e for e in root.iter() if _local(e.tag) == "entry"]
    out: list[dict] = []
    for i, el in enumerate(items):
        row: dict = {"source": source, "item_index": i, "extras": {}}
        for child in el:
            name = _local(child.tag)
            val = (child.text or "").strip()
            if name == "title":
                row["title"] = val
            elif name == "link":
                row["link"] = val or child.attrib.get("href")
            elif name in ("description", "summary", "content"):
                row.setdefault("description", val)
            elif name in ("pubdate", "published", "updated"):
                row.setdefault("pub_date", val)
            elif name in ("guid", "id"):
                row.setdefault("guid", val)
            elif name == "point":
                d = _add_geom_part(row, "georss_point", val)
                if d:
                    row["geo_dims"] = d
            elif name in ("line", "linestring"):
                d = _add_geom_part(row, "georss_line", val)
                if d:
                    row["geo_dims"] = d
            elif name == "polygon":  # also CAP "lat1,lon1 lat2,lon2 ..."
                d = _add_geom_part(row, "georss_polygon", val)
                if d:
                    row["geo_dims"] = d
            elif name in ("box", "envelope"):
                row["georss_box"], d = _norm_coords(val)
                if d:
                    row["geo_dims"] = d
            elif name == "elev":
                row["georss_elev"] = val
            elif name == "where":
                _parse_gml_where(child, row)
            elif name == "lat":
                row["geo_lat"] = val
            elif name == "long":
                row["geo_lon"] = val
            else:
                row["extras"][name] = val
        row["extras"] = json.dumps(row["extras"], sort_keys=True)
        out.append(row)
    return out


def detect_json_root(doc: dict | list) -> list:
    """S13 root autodetect: a list document is its own root; otherwise
    ``features`` wins if present, else the LARGEST list value
    (Json2GeoJSON.py:829-895)."""
    if isinstance(doc, list):
        return doc
    if isinstance(doc.get("features"), list):
        return doc["features"]
    best: list = []
    for v in doc.values():
        if isinstance(v, list) and len(v) > len(best):
            best = v
    return best


def feeds_to_dataframe(
    spark: SparkSession, feeds: DataFrame, content_col: str = "content", source_col: str = "path"
) -> DataFrame:
    """Distributed parse: a DataFrame of (source, xml_text) rows ->
    one row per feed item. Arrow-batched; each partition parses its own
    feeds — the scale shape for millions of small documents."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split(" ")[0] for c in FEED_ITEM_SCHEMA.split(", ")]
        for pdf in batches:
            rows: list[dict] = []
            for _, r in pdf.iterrows():
                try:
                    rows.extend(parse_feed_xml(r[content_col], source=str(r[source_col])))
                except ElementTree.ParseError:
                    continue  # malformed feed: skipped, not fatal (ST5)
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(
                columns=cols
            )

    return feeds.mapInPandas(run, schema=FEED_ITEM_SCHEMA)


def with_feed_geometry(items: DataFrame, geometry_col: str = "geometry") -> DataFrame:
    """S12 end-to-end: attach a GeoJSON geometry string built from the
    parsed feed columns, routing each shape through the
    :mod:`..functions.geometry` constructors with the reference's
    conventions (lat-first input reordered to lon/lat; polygons reversed
    to CCW exterior winding, Xml2GeoJSON.py:902-908; georss:elev adds a
    constant Z to every coordinate; srsDimension=3 consumes a third
    ordinate per point).  Repeated geometry elements arrive as
    PART_SEP-joined parts and assemble into Multi* shapes, mirroring the
    reference's parts accumulation (Json2GeoJSON.py:1043-1065).  Pure
    Column algebra — rides codegen, NULL when an item carries no
    recognizable shape."""
    from pyspark.sql import functions as F

    from ..functions import geometry as G

    # try_cast: feed attributes are untrusted — a garbage elevation or
    # W3C geo tag is NULL, not an ANSI abort of the feed scan
    elev = F.col("georss_elev").try_cast("double")
    elev_or_null = F.when(elev.isNotNull(), elev)
    dims3 = F.col("geo_dims") == 3
    sep = r"\s*" + re.escape(PART_SEP) + r"\s*"

    def parts_of(col: str) -> F.Column:
        return F.split(F.col(col), sep)

    def shaped(flat: str, builder, multi_builder) -> F.Column:
        parts = parts_of(flat)
        single = F.element_at(parts, 1)
        return F.when(
            F.size(parts) > 1,
            F.when(dims3, multi_builder(parts, srs_dim=3, lat_first=True)).otherwise(
                multi_builder(parts, srs_dim=2, lat_first=True, const_z=elev_or_null)
            ),
        ).otherwise(
            F.when(dims3, builder(single, srs_dim=3, lat_first=True)).otherwise(
                builder(single, srs_dim=2, lat_first=True, const_z=elev_or_null)
            )
        )

    pt_parts = parts_of("georss_point")
    geom = (
        F.when(
            F.col("georss_point").isNotNull(),
            F.when(
                F.size(pt_parts) > 1,
                G.multipoint_geojson(pt_parts, const_z=elev_or_null),
            ).otherwise(
                G.point_geojson(F.element_at(pt_parts, 1), const_z=elev_or_null)
            ),
        )
        .when(
            F.col("georss_line").isNotNull(),
            shaped("georss_line", G.line_geojson, G.multiline_geojson),
        )
        .when(
            F.col("georss_polygon").isNotNull(),
            F.when(
                F.size(parts_of("georss_polygon")) > 1,
                F.when(
                    dims3,
                    G.multipolygon_geojson(
                        parts_of("georss_polygon"),
                        srs_dim=3,
                        lat_first=True,
                        reverse=True,
                    ),
                ).otherwise(
                    G.multipolygon_geojson(
                        parts_of("georss_polygon"),
                        srs_dim=2,
                        lat_first=True,
                        reverse=True,
                        const_z=elev_or_null,
                    )
                ),
            )
            .when(
                dims3,
                G.polygon_geojson(
                    F.col("georss_polygon"), srs_dim=3, lat_first=True, reverse=True
                ),
            )
            .otherwise(
                G.polygon_geojson(
                    F.col("georss_polygon"),
                    srs_dim=2,
                    lat_first=True,
                    reverse=True,
                    const_z=elev_or_null,
                )
            ),
        )
        .when(
            F.col("georss_box").isNotNull(),
            G.box_geojson(F.col("georss_box"), lat_first=True),
        )
        .when(
            F.col("geo_lat").isNotNull() & F.col("geo_lon").isNotNull(),
            G.point_from_xy(
                F.col("geo_lon").try_cast("double"), F.col("geo_lat").try_cast("double")
            ),
        )
    )
    return items.withColumn(geometry_col, geom)


def json_docs_to_dataframe(spark: SparkSession, texts: list[str]) -> DataFrame:
    """S13: JSON documents -> exploded item rows (root autodetected),
    schema inferred by the JSON reader; nested structs left intact for
    operators.convert.flatten."""
    items: list[str] = []
    for t in texts:
        for item in detect_json_root(json.loads(t)):
            items.append(json.dumps(item))
    return spark.read.json(spark.sparkContext.parallelize(items))
