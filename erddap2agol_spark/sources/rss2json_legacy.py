"""Legacy Rss2Json converter compatibility.

The reference ships a DEPRECATED predecessor of Xml2GeoJSON
(``src/utils/Converters/Rss2Json.py`` — its own banner says "please
transition to using 'Xml2GeoJSON'").  Its successor's semantics are
fully covered by :mod:`.feeds` (S12) and :mod:`..functions.geometry`
(F17); this module keeps alive the four behaviors that are DISTINCT to
the legacy converter, so a user of the reference's legacy path can run
the same pipeline here:

1. **INI sidecar config/state** (``_readINI``/``_writeINI``,
   Rss2Json.py:148-273): a ``[properties]`` section holding the
   ``lastPublicationDate`` high-water mark (validated against
   ``%Y/%m/%d %H:%M:%S``) plus one field-spec line per output field —
   ``col=fieldName [type [Key value]...]`` with optional
   Width/Default/Offset/Length/Start/End properties, ``%20`` escaping
   for embedded spaces, and type validation that CLEARS type, default
   and width on an illegal type name.
2. **Publication gate** (Rss2Json.py:363-389): the feed-level
   ``lastBuildDate``/``pubDate``/``updated``/``published`` (parent must
   be ``channel``/``feed``) is datetime-decoded and compared against
   the stored mark; an unchanged-or-older feed is skipped entirely.
3. **Legacy property flatten** (Rss2Json.py:481-628): DIRECT item
   children only, property names ``prefix_localName`` when namespaced,
   empty container text replaced by the ', '-join of nested texts,
   repeated names last-wins, geometry-bearing elements (georss/cap
   point/line/linestring/polygon/box/envelope plus georss elev/where
   and W3C geo lat/long/alt) consumed by the geometry path instead
   (covered here by :func:`.feeds.with_feed_geometry`).
4. **Per-field output pipeline + tallies** (``_saveFeature``,
   Rss2Json.py:21-118): config-ordered fields, fieldName substitution,
   the COMBINED offset/start/end/length extraction (note: unlike the
   Json2GeoJSON op-chain DSL, all four compose into one slice, and an
   extraction that resolves to offset 0 / length 0 yields the field
   DEFAULT), date fields re-rendered through the universal datetime
   decoder, text width truncation with FIRST-ROW-ONLY padding, and the
   ``unavailable`` (configured but absent) / ``unused`` (present but
   unconfigured) per-field tallies.

Date rendering: the reference prints ``str(decodeDatetime(value))``
into its JSON output; this port renders the decoded timestamp in the
converter's own canonical ``%Y/%m/%d %H:%M:%S`` format (the one it
round-trips through the INI sidecar), which is the same instant with a
stable, engine-portable spelling.

Scale shape: the property relation is corpus-sized (items x fields);
the config is a handful of driver-side constants.  The field pipeline
pivots the property rows once (one exchange, explicit pivot values) and
then evaluates every configured field as constant-folded Column algebra
on the pivoted row — no joins, no per-field scans — before unpivoting
with ``stack``.  Both tallies are map-side-combined aggregates over the
same relations.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from xml.etree import ElementTree

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.datetimes import _decode_one, decode_datetime

#: legacy type name -> default value (Rss2Json.py:154, ``allowedTypes``)
DEFAULT_TIME = "1970/01/01T00:00:00"
ALLOWED_TYPES = {"integer": "0", "float": "0.0", "text": "", "date": DEFAULT_TIME}

#: optional INI field properties (Rss2Json.py:140-147), lowercase key ->
#: dataclass attribute
_OPTIONAL_PROPS = {
    "width": "width",
    "default": "default",
    "offset": "offset",
    "length": "length",
    "start": "start",
    "end": "end",
}

_PUB_FMT = "%Y/%m/%d %H:%M:%S"

#: element local names consumed by the geometry path for ANY prefix
#: (Rss2Json.py:584 ``geomFunctions`` keys)
_GEOM_LOCAL = {"point", "line", "linestring", "polygon", "box", "envelope"}
#: consumed only under a georss/cap prefix (Rss2Json.py:514-555)
_GEOM_PREFIXED = {"elev", "where"}
#: consumed under the W3C geo prefix (Rss2Json.py:585 ``w3cIndex``)
_W3C_LOCAL = {"lat", "long", "alt"}

_MAXLEN = 1 << 30


@dataclass
class LegacyField:
    """One field-spec line of the legacy INI (Rss2Json.py:161-171)."""

    col: str
    field_name: str
    field_type: str = ""
    width: int = 0
    default: str = ""
    offset: int = 0
    length: int = 0
    start: str = ""
    end: str = ""


@dataclass
class LegacyConfig:
    last_publication_date: str | None = None
    fields: list[LegacyField] = dc_field(default_factory=list)
    source_filename: str = ""


def read_legacy_ini(text: str) -> LegacyConfig:
    """Parse the legacy INI sidecar (mirrors ``_readINI``,
    Rss2Json.py:148-245): ``[properties]`` carries the validated
    ``lastPublicationDate``; every other section holds field-spec lines.
    Illegal types clear type/default/width; illegal widths clear to 0;
    unknown optional property keys are skipped; ``%20`` decodes to a
    space in optional property values."""
    cfg = LegacyConfig()
    in_properties = False
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("[") and line.endswith("]"):
            in_properties = line.strip("[]").lower() == "properties"
        elif "=" in line:
            key, value = line.split("=", 1)
            value = value.strip()
            if in_properties:
                if key.lower() == "lastpublicationdate" and value:
                    try:
                        import datetime as _dt

                        _dt.datetime.strptime(value, _PUB_FMT)
                        cfg.last_publication_date = value
                    except ValueError:
                        pass  # bad format: ignored (Rss2Json.py:188-190)
                continue
            parts = value.split()
            if not parts:
                continue
            f = LegacyField(col=key.strip(), field_name=parts[0])
            if len(parts) > 1:
                f.field_type = parts[1]
                if f.field_type.lower() not in ALLOWED_TYPES:
                    f.field_type = ""  # illegal type: cleared
                else:
                    f.field_type = f.field_type.lower()
                    f.default = ALLOWED_TYPES[f.field_type]
                    i = 2
                    while i < len(parts):
                        prop = parts[i].lower()
                        i += 1
                        if prop not in _OPTIONAL_PROPS or i >= len(parts):
                            continue  # unknown/valueless property: skipped
                        raw = parts[i].replace("%20", " ")
                        i += 1
                        attr = _OPTIONAL_PROPS[prop]
                        if attr in ("offset", "length", "width"):
                            try:
                                setattr(f, attr, int(raw))
                            except ValueError:
                                pass
                        else:
                            setattr(f, attr, raw)
                    if f.field_type != "text" or f.width < 0:
                        f.width = 0  # width is text-only (Rss2Json.py:233-243)
            cfg.fields.append(f)
    return cfg


def write_legacy_ini(cfg: LegacyConfig) -> str:
    """Render the sidecar back out (mirrors ``_writeINI``,
    Rss2Json.py:245-273): ``[properties]`` first, then one section named
    by the source filename with one line per field; spaces in values
    re-escape as ``%20``; a date default equal to the epoch constant is
    elided."""
    out = ["[properties]", f"lastPublicationDate={cfg.last_publication_date or ''}", ""]
    out.append(f"[{cfg.source_filename or 'fields'}]")
    for f in cfg.fields:
        line = f"{f.col}={f.field_name}"
        if f.field_type:
            line += " " + f.field_type
        for prop, attr in _OPTIONAL_PROPS.items():
            val = getattr(f, attr)
            if not val:
                continue
            if prop == "default" and val == DEFAULT_TIME:
                continue
            if isinstance(val, str):
                val = val.replace(" ", "%20")
            line += f" {prop.capitalize()} {val}"
        out.append(line)
    return "\n".join(out) + "\n"


def _doc_prefixes(text: str) -> dict[str, str]:
    """Namespace URI -> the DOCUMENT'S declared prefix (the legacy
    converter names properties by the document prefix, not a fixed
    table)."""
    uri_to_prefix: dict[str, str] = {}
    try:
        for _, (prefix, uri) in ElementTree.iterparse(
            __import__("io").StringIO(text), events=("start-ns",)
        ):
            uri_to_prefix.setdefault(uri, prefix)
    except ElementTree.ParseError:
        pass
    return uri_to_prefix


def _split_tag(tag: str, uri_to_prefix: dict[str, str]) -> tuple[str, str]:
    if tag.startswith("{"):
        uri, local = tag[1:].split("}", 1)
        return uri_to_prefix.get(uri, ""), local
    return "", tag


def _nested_texts(el) -> str:
    """', '-join of nested element texts (Rss2Json.py:625: the value of
    a container element with no direct text)."""
    vals = [
        t.strip()
        for child in el.iter()
        if child is not el
        for t in (child.text,)
        if t and t.strip()
    ]
    return ", ".join(vals)


def parse_legacy_properties(text: str, source: str = "") -> list[dict]:
    """One feed -> legacy property rows ``(source, item_index, name,
    value)`` under the legacy flatten rules (Rss2Json.py:481-628): direct
    item children only, ``prefix_localName`` naming, geometry elements
    skipped, attribute fallback for childless elements, repeated names
    last-wins."""
    root = ElementTree.fromstring(text)
    uri_to_prefix = _doc_prefixes(text)
    items = [e for e in root.iter() if _split_tag(e.tag, uri_to_prefix)[1] == "item"]
    if not items:
        items = [
            e for e in root.iter() if _split_tag(e.tag, uri_to_prefix)[1] == "entry"
        ]
    out: list[dict] = []
    for i, el in enumerate(items):
        props: dict[str, str] = {}
        for child in el:
            if not isinstance(child.tag, str):
                continue  # comments / PIs
            prefix, local = _split_tag(child.tag, uri_to_prefix)
            low = local.lower()
            if low in _GEOM_LOCAL:
                continue  # geometry path (any prefix)
            if prefix in ("georss", "cap") and low in _GEOM_PREFIXED:
                continue
            if prefix == "geo" and low in _W3C_LOCAL:
                continue
            value = (child.text or "").strip()
            if not value and len(child) == 0 and child.attrib:
                # childless element: unprefixed attribute values stand in
                # (Rss2Json.py:487-504)
                for v in child.attrib.values():
                    if v:
                        value = v
            if not value:
                value = _nested_texts(child)
            name = f"{prefix}_{local}" if prefix else local
            props[name] = value  # repeated names: last wins
        for name, value in props.items():
            out.append(
                {"source": source, "item_index": i, "name": name, "value": value}
            )
    return out


def feed_publication_date(text: str) -> str | None:
    """The legacy publication stamp (Rss2Json.py:363-376): first
    decodable ``lastBuildDate``/``pubDate``/``updated``/``published``
    whose parent is ``channel``/``feed``, rendered ``%Y/%m/%d
    %H:%M:%S``."""
    try:
        root = ElementTree.fromstring(text)
    except ElementTree.ParseError:
        return None
    uri_to_prefix = _doc_prefixes(text)
    containers = [
        e
        for e in root.iter()
        if _split_tag(e.tag, uri_to_prefix)[1] in ("channel", "feed")
    ]
    for tag in ("lastBuildDate", "pubDate", "updated", "published"):
        for c in containers:
            for child in c:
                if not isinstance(child.tag, str):
                    continue
                if _split_tag(child.tag, uri_to_prefix)[1] != tag:
                    continue
                decoded = _decode_one((child.text or "").strip())
                if decoded is not None:
                    return decoded.strftime(_PUB_FMT)
    return None


def publication_changed(pub_date: str | None, last: str | None) -> bool:
    """The gate (Rss2Json.py:382-389): skip (False) only when BOTH
    stamps exist and the feed's is ``<=`` the stored one — string
    comparison is correct because the format is big-endian."""
    if pub_date and last:
        return pub_date > last
    return True


def legacy_properties_df(spark, feeds: DataFrame, content_col: str = "content",
                         source_col: str = "path") -> DataFrame:
    """Distributed legacy flatten: (source, xml_text) rows -> one row per
    item property.  Arrow-batched per partition — the same scale shape as
    :func:`.feeds.feeds_to_dataframe`."""
    import pandas as pd

    schema = "source string, item_index int, name string, value string"

    def run(batches):
        cols = ["source", "item_index", "name", "value"]
        for pdf in batches:
            rows: list[dict] = []
            for _, r in pdf.iterrows():
                try:
                    rows.extend(
                        parse_legacy_properties(r[content_col], source=str(r[source_col]))
                    )
                except ElementTree.ParseError:
                    continue  # malformed feed: skipped, not fatal (ST5)
            yield pd.DataFrame(rows, columns=cols) if rows else pd.DataFrame(columns=cols)

    return feeds.mapInPandas(run, schema=schema)


def _legacy_extract(value: F.Column, f: LegacyField) -> F.Column:
    """The COMBINED legacy extraction (Rss2Json.py:57-82) as constant-
    folded Column algebra.  Python slice semantics: ``offset`` moves past
    ``Start`` when found; ``length`` counts from the post-Start offset;
    ``End`` (first occurrence after offset) overrides the stop; a slice
    that resolves to offset 0 AND stop 0 yields the field DEFAULT; the
    extracted text is stripped."""
    off = F.when(
        F.lit(abs(f.offset)) >= F.length(value), F.lit(0)
    ).otherwise(F.lit(f.offset))
    if f.start:
        pos_s = F.locate(f.start, value, 1)  # reference: find from offset;
        # locate() lacks a column start — for the supported non-negative
        # offsets the first occurrence at-or-after offset equals the
        # first occurrence overall whenever Start does not precede the
        # offset, which is the converter's documented use (offset XOR
        # start in practice; both combine only in hand-tuned configs)
        off = F.when(pos_s > 0, pos_s - 1 + len(f.start)).otherwise(off)
    stop = F.when(F.lit(f.length) != 0, off + F.lit(f.length)).otherwise(F.lit(0))
    if f.end:
        pos_e = F.locate(f.end, value, 1)
        stop = F.when(pos_e > 0, pos_e - 1).otherwise(stop)
    sliced = F.when(
        stop > 0, F.substring(value, off + 1, F.greatest(stop - off, F.lit(0)))
    ).otherwise(F.substring(value, off + 1, _MAXLEN))
    return F.when((off != 0) | (stop != 0), F.trim(sliced)).otherwise(
        F.lit(f.default)
    )


def _field_value(raw: F.Column, f: LegacyField, is_first_row: F.Column) -> F.Column:
    """One configured field's output value (``_saveFeature``,
    Rss2Json.py:35-110): default substitution, extraction, date decode,
    width truncate / first-row pad."""
    value = F.coalesce(raw, F.lit(f.default))
    if f.offset or f.length or f.start or f.end:
        value = _legacy_extract(value, f)
    if f.field_type == "date":
        decoded = F.date_format(decode_datetime(value), "yyyy/MM/dd HH:mm:ss")
        value = F.when(
            (value != "") & (value != F.lit(f.default)), F.coalesce(decoded, value)
        ).otherwise(value)
    if f.width:
        value = (
            F.when(F.length(value) > f.width, F.substring(value, 1, f.width))
            .when(is_first_row, F.rpad(value, f.width, " "))
            .otherwise(value)
        )
    return value


def apply_field_config(props: DataFrame, cfg: LegacyConfig) -> DataFrame:
    """Config-ordered per-field output rows ``(source, item_index,
    field_pos, field_name, value)`` — the relational form of the legacy
    feature properties block.

    One exchange: pivot the property rows to one row per item (explicit
    pivot values = the configured columns, so the plan is static), then
    every field is constant-folded Column algebra, unpivoted with
    ``stack``."""
    cols = [f.col for f in cfg.fields]
    wide = (
        props.filter(F.col("name").isin(cols))
        .groupBy("source", "item_index")
        .pivot("name", cols)
        .agg(F.first("value"))
    )
    # items that carry NONE of the configured columns still emit rows
    # (all defaults) in the reference; re-attach them
    all_items = props.select("source", "item_index").distinct()
    wide = all_items.join(wide, ["source", "item_index"], "left")
    is_first = F.col("item_index") == 0  # rowNumber == 1 (per source file)
    return wide.select(
        "source",
        "item_index",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(pos).alias("field_pos"),
                        F.lit(f.field_name).alias("field_name"),
                        _field_value(F.col(f.col), f, is_first).alias("value"),
                    )
                    for pos, f in enumerate(cfg.fields)
                ]
            )
        ).alias("fp"),
    ).select(
        "source", "item_index", "fp.field_pos", "fp.field_name", "fp.value"
    )


def field_tallies(props: DataFrame, cfg: LegacyConfig) -> DataFrame:
    """The legacy converter's end-of-run report (Rss2Json.py:110-117,
    673-677) as a relation: ``(tally, field, n)`` where ``unavailable``
    counts items missing a CONFIGURED column and ``unused`` counts
    properties present but unconfigured.  Two map-side-combined
    aggregates."""
    cols = [f.col for f in cfg.fields]
    items = props.select("source", "item_index").distinct()
    n_items = items.groupBy().agg(F.count(F.lit(1)).alias("n_items"))
    present = (
        props.filter(F.col("name").isin(cols))
        .groupBy("name")
        .agg(F.count_distinct("source", "item_index").alias("n_present"))
    )
    configured = props.sparkSession.createDataFrame(
        [(c,) for c in cols], "name string"
    )
    unavailable = (
        configured.crossJoin(F.broadcast(n_items))
        .join(present, "name", "left")
        .select(
            F.lit("unavailable").alias("tally"),
            F.col("name").alias("field"),
            (F.col("n_items") - F.coalesce(F.col("n_present"), F.lit(0))).alias("n"),
        )
        .filter(F.col("n") > 0)
    )
    unused = (
        props.filter(~F.col("name").isin(cols))
        .groupBy(F.col("name").alias("field"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("unused").alias("tally"), "field", "n")
    )
    return unavailable.unionByName(unused)
