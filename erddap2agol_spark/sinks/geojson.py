"""GeoJSON FeatureCollection sink (SURVEY §2.2 K2, §3.3 glider path).

The reference hand-rolls a streaming JSON writer, feature by feature
(Converters/Json2GeoJSON.py:935-1107). Spark-first: each feature is one
row's JSON string built by Column algebra (properties via ``to_json`` of
a struct, geometry from :mod:`..functions.geometry`), so feature
rendering is distributed; only the final FeatureCollection FRAMING is a
single-writer step, as it must be for one JSON document.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HEADER = '{"type":"FeatureCollection","features":['
FOOTER = "]}"


def feature_json(properties: Column, geometry_json: Column) -> Column:
    """One GeoJSON Feature as a JSON string. ``properties`` is a struct
    column (rendered with to_json); ``geometry_json`` is an
    already-rendered geometry string from functions.geometry."""
    return F.concat(
        F.lit('{"type":"Feature","properties":'),
        F.to_json(properties),
        F.lit(',"geometry":'),
        F.coalesce(geometry_json, F.lit("null")),
        F.lit("}"),
    )


def features_df(
    df: DataFrame, property_cols: Sequence[str], geometry_json: Column
) -> DataFrame:
    """DataFrame of rendered feature strings (column ``feature``)."""
    props = F.struct(*[F.col(c) for c in property_cols])
    return df.select(feature_json(props, geometry_json).alias("feature"))


def write_feature_collection(
    df: DataFrame,
    property_cols: Sequence[str],
    geometry_json: Column,
    path: str,
    order_by: Sequence[str] | None = None,
) -> int:
    """Assemble and write one FeatureCollection file; returns the feature
    count. Feature rendering is distributed; only the final framing runs
    on one writer because the output is a single JSON document (same
    constraint the reference has — it's the format, not the engine).

    ``order_by`` pins feature order (the reference writes features in
    record order; without it the order depends on partitioning).  The
    body is STREAMED via ``toLocalIterator`` — partitions arrive in
    order, one at a time — so no single JVM string (2 GB cap) and no
    whole-result ``collect`` ever materializes.
    """
    if order_by:
        df = df.orderBy(*[F.col(c) for c in order_by])
    feats = features_df(df, property_cols, geometry_json)
    n = 0
    with open(path, "w") as f:
        f.write(HEADER)
        for row in feats.toLocalIterator():
            if n:
                f.write(",")
            f.write(row["feature"])
            n += 1
        f.write(FOOTER)
    return n
