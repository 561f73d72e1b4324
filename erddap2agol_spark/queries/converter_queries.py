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
from ..sinks.geojson import feature_json
from ..sources.tables import load_table
from . import register


@register(
    "glider_features",
    oracle=None,  # JSON string rendering is engine-specific -> rows-only
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
