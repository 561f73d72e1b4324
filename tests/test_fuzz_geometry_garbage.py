"""Fuzz the geometry constructors with arbitrary garbage strings.

Contract under test (the ANSI-robustness rule this round's hardening
established): for ANY input string — malformed, non-numeric, partial,
empty, unicode noise — every constructor either returns NULL or a string
that parses as JSON, and NEVER raises.  One bad feed item must not be
able to abort a distributed export job."""

from __future__ import annotations

import json

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from erddap2agol_spark.functions import geometry as G

_TOKEN = st.one_of(
    st.from_regex(r"[+-]?[0-9]{1,6}(\.[0-9]{1,4})?", fullmatch=True),
    st.sampled_from(
        ["abc", "NaN", "Infinity", "-Infinity", "1e999", "+-5", ".",
         "0x10", "١٢", "", "  ", "1.2.3", '"', "\\", "null"]
    ),
)
_FLAT = st.lists(_TOKEN, min_size=0, max_size=9).map(" ".join)


@settings(max_examples=20, deadline=None)
@given(flats=st.lists(_FLAT, min_size=1, max_size=8))
def test_any_string_renders_null_or_valid_json(spark, flats):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(flats)], "id bigint, s string"
    )
    rows = df.select(
        G.point_geojson(F.col("s")).alias("pt"),
        G.line_geojson(F.col("s")).alias("ln"),
        G.line_geojson(F.col("s"), srs_dim=3).alias("ln3"),
        G.polygon_geojson(F.col("s")).alias("pg"),
        G.polygon_geojson(F.col("s"), reverse=True).alias("pgr"),
        G.box_geojson(F.col("s")).alias("bx"),
        G.measured_line_geojson(F.col("s"), m_increment=1.5).alias("ml"),
        G.measured_line_geojson(
            F.col("s"), srs_dim=3, z_factor=2.0, z_offset=-1.0
        ).alias("mlz"),
    ).collect()
    for r in rows:
        for col in ("pt", "ln", "ln3", "pg", "pgr", "bx", "ml", "mlz"):
            v = r[col]
            if v is not None:
                json.loads(v)
