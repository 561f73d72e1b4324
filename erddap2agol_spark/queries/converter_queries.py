"""Queries exercising the converter/geometry/GeoJSON subsystem on the
driver tables. GeoJSON strings are engine-specific to render, so these
are registered without oracles where formatting differs; the glider
feature query keeps a rows-only check (the driver records row count +
schema stability).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import geometry
from ..operators import multimodal
from ..sinks.geojson import feature_json
from ..sources.tables import load_table
from . import register


_FMT_X1 = """CASE WHEN x1 = trunc(x1) THEN CAST(CAST(trunc(x1) AS BIGINT) AS VARCHAR)
             ELSE CAST(x1 AS VARCHAR) END"""
_FMT_X2 = """CASE WHEN x2 = trunc(x2) THEN CAST(CAST(trunc(x2) AS BIGINT) AS VARCHAR)
             ELSE CAST(x2 AS VARCHAR) END"""


@register(
    "glider_features",
    # feature strings ARE cross-engine renderable: functions.geometry._fmt
    # pins float formatting (integers render without '.0', fractions via
    # shortest-roundtrip, identical in JVM and DuckDB for these
    # magnitudes), so the oracle rebuilds the exact JSON with string
    # concatenation.  trunc() mirrors Spark's cast-to-long truncation
    # (a bare DuckDB CAST(DOUBLE AS BIGINT) ROUNDS).
    oracle=f"""
    WITH s AS (
      SELECT o_custkey AS track_id, o_orderkey AS k1,
             o_totalprice AS x1,
             CAST(o_custkey AS DOUBLE) AS y1,
             lead(o_totalprice) OVER w AS x2,
             lead(CAST(o_custkey AS DOUBLE)) OVER w AS y2,
             lead(o_orderpriority) OVER w AS priority
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    )
    SELECT track_id, k1,
           '{{"type":"Feature","properties":{{"track_id":' || track_id ||
           ',"priority":"' || priority ||
           '"}},"geometry":{{"type":"LineString","coordinates":[[' ||
           {_FMT_X1} || ',' || CAST(CAST(track_id AS BIGINT) AS VARCHAR) ||
           '],[' ||
           {_FMT_X2} || ',' || CAST(CAST(track_id AS BIGINT) AS VARCHAR) ||
           ']]}}}}' AS feature
    FROM s WHERE x2 IS NOT NULL
    """,
    doc="W1+F17+K2 composed: consecutive-point segments -> two-point "
    "LineString GeoJSON features with properties from the second point "
    "(the reference's glider workflow, SURVEY §3.3, as pure Column algebra).",
)
def glider_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    segs = (
        o.select(
            F.col("o_custkey").alias("track_id"),
            F.col("o_orderkey").alias("k1"),
            F.col("o_totalprice").alias("x1"),
            (F.col("o_custkey") * 1.0).alias("y1"),
            F.lead("o_totalprice").over(w).alias("x2"),
            F.lead(F.col("o_custkey") * 1.0).over(w).alias("y2"),
            F.lead("o_orderpriority").over(w).alias("priority"),
        )
        .filter(F.col("x2").isNotNull())
    )
    geom = geometry.segment_geojson(
        F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")
    )
    props = F.struct(F.col("track_id"), F.col("priority"))
    return segs.select(
        "track_id", "k1", feature_json(props, geom).alias("feature")
    )


@register(
    "geojson_sink_roundtrip",
    oracle="""
    SELECT o_custkey AS track_id,
           CAST(count(*) AS BIGINT) AS n_features,
           round(sum(o_totalprice), 2) AS sum_x
    FROM orders
    GROUP BY o_custkey
    """,
    doc="K2 committer path, driver-graded end to end: point features are "
    "rendered per order, written through the geojson_fc Python DataSource "
    "WRITER (executor part spool -> manifest -> committer assembly of "
    "collection.geojson), then the ASSEMBLED document is parsed back and "
    "re-aggregated — any byte the sink drops, duplicates, or mangles "
    "breaks the hash against the direct-SQL oracle. The single-document "
    "parse is inherently one task (a FeatureCollection is one JSON value); "
    "the scale output is the NDJSON part files, which the write step "
    "produces executor-parallel.",
)
def geojson_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    from ..sinks import geojson_sink

    o = load_table(spark, sf_dir, "orders")
    geom = geometry.point_from_xy(F.col("o_totalprice"), F.col("o_custkey") * 1.0)
    props = F.struct(
        F.col("o_custkey").alias("track_id"), F.col("o_orderkey").alias("key")
    )
    feats = o.select(feature_json(props, geom).alias("feature"))
    # pid-keyed: two concurrent runs against the same scale factor must
    # not race on one sink directory (one overwrites while the other
    # parses collection.geojson — ADVICE r5)
    out = os.path.join(
        tempfile.gettempdir(),
        f"erddap2agol_geojson_rt_{os.path.basename(sf_dir.rstrip('/'))}"
        f"_{os.getpid()}",
    )
    geojson_sink.register(spark)
    (
        feats.write.format("geojson_fc")
        .mode("overwrite")
        .option("assemble", "true")
        .save(out)
    )
    # explicit schema: inference over an EMPTY features array (zero-row
    # input — the empty-tables robustness contract) degrades the element
    # type to string and the field extraction below would not resolve
    doc = (
        spark.read.schema(
            "type string, features array<struct<"
            "type string, "
            "properties struct<track_id long, key long>, "
            "geometry struct<type string, coordinates array<double>>>>"
        )
        .option("multiLine", "true")
        .json(os.path.join(out, "collection.geojson"))
    )
    f = doc.select(F.explode("features").alias("f"))
    return f.groupBy(
        F.col("f.properties.track_id").cast("long").alias("track_id")
    ).agg(
        F.count(F.lit(1)).alias("n_features"),
        F.round(F.sum(F.col("f.geometry.coordinates")[0]), 2).alias("sum_x"),
    )


@register(
    "fsspec_sink_roundtrip",
    oracle="""
    SELECT o_orderpriority AS priority,
           CAST(count(*) AS BIGINT) AS n_features,
           CAST(sum(o_orderkey) AS BIGINT) AS key_sum
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="The fsio SCHEME seam end to end (VERDICT r6 #6): the geojson_fc "
    "writer runs against a REGISTERED non-POSIX object store "
    "(fsio.ObjectStoreDirFS — copy+delete rename, plain-PUT "
    "write_atomic, the exact contract FsspecFS exposes for s3/gs; "
    "fsspec itself isn't in this container) with a staging prefix "
    "distinct from the publish prefix. Executor tasks resolve the "
    "scheme from the registry snapshot baked into the shipped "
    "DataSource class, publish their completed parts themselves "
    "(no driver byte funnel — ADVICE r6), and the driver commits the "
    "manifest last. Readback follows the reader contract — the "
    "manifest, never a listing, names the parts — and the re-parsed "
    "features are re-aggregated against the direct-SQL oracle.",
)
def fsspec_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json
    import os
    import tempfile

    from ..sinks import fsio, geojson_sink

    o = load_table(spark, sf_dir, "orders")
    geom = geometry.point_from_xy(
        F.col("o_totalprice"), F.col("o_custkey") * 1.0
    )
    props = F.struct(
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderkey").alias("key"),
    )
    feats = o.select(feature_json(props, geom).alias("feature"))
    # pid-keyed scheme + backing dir: concurrent runs never share a store
    scheme = f"e2aobjstore{os.getpid()}"
    root = tempfile.mkdtemp(prefix="e2a_objstore_rt_")
    fsio.register_filesystem(scheme, fsio.ObjectStoreDirFS(root))
    try:
        geojson_sink.register(spark)  # bakes the scheme snapshot in
        (
            feats.write.format("geojson_fc")
            .mode("overwrite")
            .option("assemble", "false")
            .option("spool_path", f"{scheme}://staging")
            .save(f"{scheme}://published")
        )
        store, pub = fsio.for_path(f"{scheme}://published")
        with store.open(store.join(pub, "_manifest.json")) as f:
            manifest = json.load(f)
        lines: list[str] = []
        for part in manifest["parts"]:
            with store.open(store.join(pub, part["file"])) as f:
                lines += [ln for ln in f.read().splitlines() if ln]
        if len(lines) != manifest["n_features"]:
            raise ValueError(
                f"manifest promises {manifest['n_features']} features, "
                f"parts hold {len(lines)}"
            )
    finally:
        fsio.unregister_filesystem(scheme)
    parsed = spark.createDataFrame(
        [(ln,) for ln in lines], "feature string"
    ).select(
        F.from_json(
            "feature",
            "struct<type string, "
            "properties struct<priority string, key long>, "
            "geometry struct<type string, coordinates array<double>>>",
        ).alias("f")
    )
    return parsed.groupBy(F.col("f.properties.priority").alias("priority")).agg(
        F.count(F.lit(1)).alias("n_features"),
        F.sum("f.properties.key").cast("bigint").alias("key_sum"),
    )


@register(
    "multimodal_inventory",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             unhex(CASE doc_id % 4 WHEN 0 THEN 'FFD8FF'
                                   WHEN 1 THEN '89504E47'
                                   WHEN 2 THEN '52494646'
                                   ELSE '' END) || encode(text) AS blob
      FROM documents
    )
    SELECT doc_id,
           CAST(octet_length(blob) AS BIGINT) AS n_bytes,
           CASE WHEN starts_with(upper(hex(blob)), 'FFD8FF') THEN 'jpeg'
                WHEN starts_with(upper(hex(blob)), '89504E47') THEN 'png'
                WHEN starts_with(upper(hex(blob)), '52494646') THEN 'riff'
                ELSE 'unknown' END AS format,
           md5(upper(hex(blob))) AS digest
    FROM b
    """,
    doc="Multimodal metadata inventory: binary blobs (synthesized here "
    "with real magic bytes over the documents table) -> byte length, "
    "magic-byte format sniff, portable content digest — the typed-"
    "metadata surface every media column carries. All JVM Column "
    "algebra; no decode, no Python.",
)
def multimodal_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    prefix_hex = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("FFD8FF"))
        .when(F.col("doc_id") % 4 == 1, F.lit("89504E47"))
        .when(F.col("doc_id") % 4 == 2, F.lit("52494646"))
        .otherwise(F.lit(""))
    )
    blobs = docs.select(
        "doc_id",
        F.concat(
            F.to_binary(prefix_hex, F.lit("hex")), F.encode(F.col("text"), "UTF-8")
        ).alias("blob"),
    )
    return multimodal.with_media_meta(blobs, "blob").select(
        "doc_id",
        F.col("media_meta.n_bytes").alias("n_bytes"),
        F.col("media_meta.format").alias("format"),
        F.col("media_meta.digest").alias("digest"),
    )


@register(
    "png_decode_resize",
    oracle="""
    WITH px AS (
      SELECT media_id, y, x, c,
             (media_id*13 + (y*4)*7 + (x*4)*3 + c*11) % 256 AS v
      FROM (SELECT unnest(generate_series(1, 4)) AS media_id),
           (SELECT unnest(generate_series(0, 3)) AS y),
           (SELECT unnest(generate_series(0, 5)) AS x),
           (SELECT unnest(generate_series(0, 2)) AS c)
    )
    SELECT media_id, 'png' AS format, 24 AS src_width, 16 AS src_height,
           3 AS n_channels,
           md5(string_agg(printf('%02X', v), '' ORDER BY y, x, c))
             AS resized_digest
    FROM px GROUP BY media_id
    """,
    doc="The REAL multimodal codec path (VERDICT r5 #2): formula-"
    "generated RGB images are encoded to genuine PNG bytes (zlib "
    "scanlines, filter types cycling 0-4), decoded back inside the "
    "bounded-batch mapInPandas seam (functions/png.py — stdlib zlib + "
    "numpy unfiltering, no image library), and nearest-neighbor resized "
    "24x16 -> 6x4. The oracle never sees a PNG: DuckDB recomputes the "
    "expected resized pixels straight from the generating formula "
    "(src = floor(dst*src_size/dst_size) sampling) and hashes the "
    "raster hex — a hash match proves encode -> decode -> unfilter -> "
    "resample end to end.",
)
def png_decode_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np

    from ..functions.png import encode_png

    rows = []
    for mid in range(1, 5):
        img = np.fromfunction(
            lambda y, x, c: (mid * 13 + y * 7 + x * 3 + c * 11) % 256,
            (16, 24, 3),
        ).astype(np.uint8)
        rows.append((mid, bytearray(encode_png(img))))
    df = spark.createDataFrame(rows, "media_id long, blob binary")
    dec = multimodal.decode_media(df, "media_id", "blob")
    rsz = multimodal.resize_media(df, "media_id", "blob", 6, 4)
    digest = rsz.select(
        "media_id", F.md5(F.upper(F.hex("data"))).alias("resized_digest")
    )
    return dec.select(
        "media_id",
        "format",
        F.col("width").alias("src_width"),
        F.col("height").alias("src_height"),
        "n_channels",
    ).join(digest, "media_id")
