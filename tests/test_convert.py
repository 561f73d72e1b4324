"""Converter subsystem tests: flatten (F12), type inference (F15/O11),
plugin registry (X1), geometry constructors (F17), GeoJSON sink (K2),
datetime decoding (F1)."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from erddap2agol_spark.functions import datetimes, geometry
from erddap2agol_spark.operators import convert
from erddap2agol_spark.sinks import geojson


# --- F12 flatten -----------------------------------------------------------


def _nested_df(spark):
    return spark.createDataFrame(
        [
            Row(
                id=1,
                meta=Row(author=Row(name="ada"), name="m1"),
                name="top",
            )
        ]
    )


def test_flatten_path_names(spark):
    out = convert.flatten(_nested_df(spark))
    assert out.columns == ["id", "meta_author_name", "meta_name", "name"]
    r = out.first()
    assert (r.meta_author_name, r.meta_name, r.name) == ("ada", "m1", "top")


def test_flatten_leaf_names_with_collisions(spark):
    out = convert.flatten(_nested_df(spark), flatten_names=False)
    # three leaves all named 'name' -> name, name2, name3 (U4 suffixing)
    assert out.columns == ["id", "name", "name2", "name3"]


def test_flatten_exclusions(spark):
    out = convert.flatten(_nested_df(spark), exclude=("meta.author",))
    assert "meta_author" in out.columns  # kept as struct, not descended
    assert out.schema["meta_author"].dataType.typeName() == "struct"


# --- F15 type inference ----------------------------------------------------


def test_detect_type_heuristics():
    assert convert.detect_type("count", ["1", "2"]) == "integer"
    assert convert.detect_type("last_updated", ["1704067200", "1704153600"]) == "date"
    assert convert.detect_type("price", ["1.5", "2"]) == "float"
    assert convert.detect_type("when", ["2024-01-01 10:00", "2024-02-03"]) == "date"
    assert convert.detect_type("note", ["abc", "1"]) == "text"
    assert convert.detect_type("empty", [None, ""]) == "text"


def test_infer_and_apply_field_types(spark):
    df = spark.createDataFrame(
        [("1", "1704067200", "2.5", "hello", "2024-01-05")],
        ["n", "item_updated", "x", "note", "obs_date"],
    )
    types = convert.infer_field_types(df)
    assert types == {
        "n": "integer",
        "item_updated": "date",
        "x": "float",
        "note": "text",
        "obs_date": "date",
    }
    out = convert.apply_field_types(df, types)
    r = out.first()
    assert r.n == 1 and abs(r.x - 2.5) < 1e-9
    assert r.item_updated.year == 2024  # epoch-second int promoted
    assert r.obs_date.month == 1


# --- X1 plugin registry ----------------------------------------------------


def test_converter_registry(spark):
    calls = []

    @convert.register_converter("add_flag")
    def add_flag(df):
        calls.append("add_flag")
        return df.withColumn("flag", F.lit(1))

    @convert.register_converter("noop")
    def noop(df):
        calls.append("noop")
        return None  # "no change" contract

    df = spark.range(2)
    out = convert.apply_converters(df, ["add_flag", "noop"])
    assert "flag" in out.columns
    assert calls == ["add_flag", "noop"]
    with pytest.raises(KeyError):
        convert.get_converter("missing")


# --- F17 geometry ----------------------------------------------------------


def test_point_reorders_lat_lon(spark):
    df = spark.createDataFrame([("27.9 -93.6",)], ["georss_point"])
    g = df.select(geometry.point_geojson(F.col("georss_point")).alias("g")).first().g
    assert json.loads(g) == {"type": "Point", "coordinates": [-93.6, 27.9]}


def test_line_and_srs_dimension(spark):
    df = spark.createDataFrame([("10 20 11 21",)], ["flat"])
    g = df.select(geometry.line_geojson(F.col("flat")).alias("g")).first().g
    assert json.loads(g)["coordinates"] == [[20, 10], [21, 11]]
    df3 = spark.createDataFrame([("10 20 99 11 21 99",)], ["flat"])
    # srsDimension=3 keeps the Z ordinate (the reference's point() emits
    # [x, y, z]; strip-Z is the explicit measured_line_geojson switch)
    g3 = df3.select(geometry.line_geojson(F.col("flat"), srs_dim=3).alias("g")).first().g
    assert json.loads(g3)["coordinates"] == [[20, 10, 99], [21, 11, 99]]


def test_polygon_close_and_reverse(spark):
    df = spark.createDataFrame([("0 0 0 10 10 10",)], ["flat"])
    g = json.loads(df.select(geometry.polygon_geojson(F.col("flat")).alias("g")).first().g)
    ring = g["coordinates"][0]
    assert ring[0] == ring[-1]  # closed
    gr = json.loads(
        df.select(geometry.polygon_geojson(F.col("flat"), reverse=True).alias("g")).first().g
    )
    assert gr["coordinates"][0][:3] == ring[:3][::-1]  # winding flipped


def test_box_five_point_ring(spark):
    df = spark.createDataFrame([("18 -98 31 -76",)], ["box"])
    g = json.loads(df.select(geometry.box_geojson(F.col("box")).alias("g")).first().g)
    ring = g["coordinates"][0]
    assert len(ring) == 5 and ring[0] == ring[-1]
    assert ring[0] == [-98, 18] and ring[2] == [-76, 31]


# --- K2 GeoJSON sink -------------------------------------------------------


def test_write_feature_collection(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 10.0, 20.0, 11.0, 21.0), (2, "b", 30.0, 40.0, 31.0, 41.0)],
        ["seg_id", "label", "x1", "y1", "x2", "y2"],
    )
    geom = geometry.segment_geojson(
        F.col("x1"), F.col("y1"), F.col("x2"), F.col("y2")
    )
    path = str(tmp_path / "out.geojson")
    n = geojson.write_feature_collection(df, ["seg_id", "label"], geom, path)
    assert n == 2
    fc = json.loads(open(path).read())
    assert fc["type"] == "FeatureCollection" and len(fc["features"]) == 2
    feats = sorted(fc["features"], key=lambda f: f["properties"]["seg_id"])
    assert feats[0]["geometry"]["coordinates"] == [[10, 20], [11, 21]]
    assert feats[0]["properties"] == {"seg_id": 1, "label": "a"}


# --- F1 datetime decoding --------------------------------------------------

CASES = [
    ("2024-03-05T10:11:12Z", (2024, 3, 5, 10, 11, 12)),
    ("2024-03-05 10:11:12", (2024, 3, 5, 10, 11, 12)),
    ("05/03/2024", (2024, 3, 5, 0, 0, 0)),  # dd/MM/yyyy (F5)
    ("1709633472", (2024, 3, 5, 10, 11, 12)),  # epoch seconds
    ("1709633472000", (2024, 3, 5, 10, 11, 12)),  # epoch millis
    ("March 5th, 2024 10:11 AM", (2024, 3, 5, 10, 11, 0)),
    ("Tue, 05 Mar 2024 10:11:12 +0000", (2024, 3, 5, 10, 11, 12)),
    ("2024-03-05 05:11:12 EST", (2024, 3, 5, 10, 11, 12)),  # -5 -> UTC
    ("2024-03-05 02:11:12 PST", (2024, 3, 5, 10, 11, 12)),  # -8 -> UTC
    ("2024-03-05 16:11:12 BST", (2024, 3, 5, 10, 11, 12)),  # Bangladesh +6
    ("2024-03-05 15:41:12 IST", (2024, 3, 5, 10, 11, 12)),  # India +5:30
    ("2024-03-05 13:11:12 MSK", (2024, 3, 5, 10, 11, 12)),  # Moscow +3
    ("2024-03-05 06:41:12 NST", (2024, 3, 5, 10, 11, 12)),  # Nfld -3:30
    ("2024-066", (2024, 3, 6, 0, 0, 0)),  # day-of-year (leap year)
    ("066/2024", (2024, 3, 6, 0, 0, 0)),
    ("03/05/24 10:11", (2024, 3, 5, 10, 11, 0)),  # 2-digit year, US order
]


def test_decode_datetime(spark):
    df = spark.createDataFrame([(s,) for s, _ in CASES], ["raw"])
    out = df.select("raw", datetimes.decode_datetime(F.col("raw")).alias("ts")).collect()
    got = {r.raw: r.ts for r in out}
    for raw, expect in CASES:
        ts = got[raw]
        assert ts is not None, raw
        assert (ts.year, ts.month, ts.day, ts.hour, ts.minute, ts.second) == expect, raw


def test_decode_datetime_null_on_garbage(spark):
    df = spark.createDataFrame([("not a date",), (None,)], ["raw"])
    out = df.select(datetimes.decode_datetime(F.col("raw")).alias("ts")).collect()
    assert all(r.ts is None for r in out)


def test_point3d_and_segment3d(spark):
    df = spark.createDataFrame([(1.0, 2.0, 5.0, 3.0, 4.0, 7.0)],
                               ["x1", "y1", "z1", "x2", "y2", "z2"])
    p = df.select(geometry.point3d_geojson(
        F.col("x1"), F.col("y1"), F.col("z1"), z_factor=2.0, z_offset=1.0
    ).alias("g")).first().g
    assert json.loads(p)["coordinates"] == [1, 2, 11]
    s = df.select(geometry.segment3d_geojson(
        F.col("x1"), F.col("y1"), F.col("z1"),
        F.col("x2"), F.col("y2"), F.col("z2")).alias("g")).first().g
    assert json.loads(s)["coordinates"] == [[1, 2, 5], [3, 4, 7]]


# --- F17 Z/M ordinate switches (VERDICT r1 #10) ----------------------------


def test_point_zm_switches(spark):
    import json as _json

    df = spark.createDataFrame([(1.0, 2.0, -30.0, 7.5)], ["x", "y", "z", "m"])

    def render(col):
        return _json.loads(df.select(col.alias("g")).first().g)

    # zAbsolute applies BEFORE zFactor/zOffset: abs(-30)*2 + 5 = 65
    g = render(geometry.point_zm_geojson(
        F.col("x"), F.col("y"), F.col("z"),
        z_factor=2.0, z_offset=5.0, z_absolute=True))
    assert g["coordinates"] == [1, 2, 65]
    # strip-Z
    g = render(geometry.point_zm_geojson(
        F.col("x"), F.col("y"), F.col("z"), z_output=False))
    assert g["coordinates"] == [1, 2]
    # M kept with Z stripped -> Z slot is null (4-ordinate shape holds)
    g = render(geometry.point_zm_geojson(
        F.col("x"), F.col("y"), F.col("z"), F.col("m"), z_output=False))
    assert g["coordinates"] == [1, 2, None, 7.5]
    # full XYZM
    g = render(geometry.point_zm_geojson(
        F.col("x"), F.col("y"), F.col("z"), F.col("m")))
    assert g["coordinates"] == [1, 2, -30, 7.5]
    # strip-M keeps plain XYZ
    g = render(geometry.point_zm_geojson(
        F.col("x"), F.col("y"), F.col("z"), F.col("m"), m_output=False))
    assert g["coordinates"] == [1, 2, -30]


def test_measured_line(spark):
    import json as _json

    df = spark.createDataFrame(
        [("10.0 20.0 -5.0 11.0 21.0 -6.0",)], ["flat"]
    )

    def render(col):
        return _json.loads(df.select(col.alias("g")).first().g)

    # 3-D line, z scaled (abs -> *10 -> +1), M increments 0, 2.5
    g = render(geometry.measured_line_geojson(
        F.col("flat"), srs_dim=3, z_factor=10.0, z_offset=1.0,
        z_absolute=True, m_increment=2.5))
    assert g["coordinates"] == [[20, 10, 51, 0], [21, 11, 61, 2.5]]
    # strip-Z with M kept -> null Z slot
    g = render(geometry.measured_line_geojson(
        F.col("flat"), srs_dim=3, z_output=False, m_increment=1.0))
    assert g["coordinates"] == [[20, 10, None, 0], [21, 11, None, 1]]
    # strip both -> plain 2-D line
    g = render(geometry.measured_line_geojson(
        F.col("flat"), srs_dim=3, z_output=False))
    assert g["coordinates"] == [[20, 10], [21, 11]]


def test_decode_datetime_df_two_pass_matches(spark):
    """The table-level two-pass decode (UDF only on the unparsed tail)
    must agree with the column-level operator on every format family."""
    rows = [(s,) for s, _ in CASES] + [("not a date",), (None,)]
    df = spark.createDataFrame(rows, ["raw"])
    col_level = {
        r.raw: r.ts
        for r in df.select(
            "raw", datetimes.decode_datetime(F.col("raw")).alias("ts")
        ).collect()
    }
    table_level = {
        r.raw: r.decoded
        for r in datetimes.decode_datetime_df(df, "raw").collect()
    }
    assert table_level == col_level
    # and the Python stage consumes a FILTERED input, not the whole table
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        datetimes.decode_datetime_df(df, "raw").explain("formatted")
    plan = buf.getvalue()
    arrow = plan.find("ArrowEvalPython")
    assert arrow != -1 and "Filter" in plan[:arrow]


# ---------------------------------------------------------------------------
# property fuzz: flatten name-disambiguation invariants


def _random_schema_and_row(rng):
    """Random nested struct schema (depth <= 3) whose every leaf value
    IS its dotted path — so data preservation is checkable by value."""
    from pyspark.sql import types as T

    names = ["a", "b", "a2", "b2", "x"]

    def build(depth, path):
        fields, row = [], {}
        for _ in range(rng.randint(1, 3)):
            nm = rng.choice(names)
            if nm in row:
                continue
            p = path + [nm]
            if depth < 2 and rng.random() < 0.45:
                sub_t, sub_v = build(depth + 1, p)
                fields.append(T.StructField(nm, sub_t))
                row[nm] = sub_v
            else:
                fields.append(T.StructField(nm, T.StringType()))
                row[nm] = ".".join(p)
        return T.StructType(fields), row

    return build(0, [])


def test_flatten_leaf_names_unique_fuzz(spark):
    """flatten(flatten_names=False) NEVER emits duplicate output
    columns — including the suffix scheme's blind spot where a literal
    leaf named 'a2' meets the generated suffix for a duplicated 'a' —
    and every leaf value survives to exactly one output column."""
    import random

    from erddap2agol_spark.operators.convert import flatten

    for seed in range(30):
        rng = random.Random(seed)
        schema, row = _random_schema_and_row(rng)

        def to_row(v):
            return tuple(to_row(x) for x in v.values()) if isinstance(v, dict) else v

        df = spark.createDataFrame([to_row(row)], schema)
        out = flatten(df, flatten_names=False)
        assert len(out.columns) == len(set(out.columns)), (seed, out.columns)

        def leaves(v):
            if isinstance(v, dict):
                for x in v.values():
                    yield from leaves(x)
            else:
                yield v

        got = sorted(v for v in out.collect()[0])
        assert got == sorted(leaves(row)), (seed, got)


def test_flatten_suffix_blindspot_regression(spark):
    """The exact collision: columns (a, a, a2) via two structs — the
    naive per-base counter would emit a2 twice."""
    from pyspark.sql import types as T

    from erddap2agol_spark.operators.convert import flatten

    schema = T.StructType(
        [
            T.StructField(
                "s1",
                T.StructType(
                    [
                        T.StructField("a", T.StringType()),
                        T.StructField("a2", T.StringType()),
                    ]
                ),
            ),
            T.StructField("s2", T.StructType([T.StructField("a", T.StringType())])),
        ]
    )
    df = spark.createDataFrame([(("v1", "v2"), ("v3",))], schema)
    out = flatten(df, flatten_names=False)
    assert sorted(out.columns) == ["a", "a2", "a3"]
    assert dict(zip(out.columns, out.collect()[0])) == {
        "a": "v1",
        "a2": "v2",
        "a3": "v3",
    }


# ---------------------------------------------------------------------------
# property fuzz: every emitted geometry/feature is structurally valid JSON


def test_nonfinite_coordinates_render_null_geometry_not_crash(spark):
    """NaN/±Inf ordinates must collapse to GeoJSON-legal null geometry.
    Before the _fmt guard, the integer-compaction probe's cast("long")
    threw CAST_OVERFLOW under ANSI mode — ONE bad coordinate row killed
    the entire export job — and a plain cast("string") would have
    emitted the JSON-illegal literal NaN instead."""
    import json

    from pyspark.sql import functions as F

    from erddap2agol_spark.functions import geometry as G
    from erddap2agol_spark.sinks.geojson import feature_json

    nan, inf = float("nan"), float("inf")
    df = spark.createDataFrame(
        [(1, nan, 2.0), (2, inf, -3.5), (3, 5.0, -inf), (4, 1e300, 2.0),
         (5, None, 2.0), (6, 1.5, 2.0)],
        "id bigint, x double, y double",
    )
    rows = df.select(
        F.col("id"),
        feature_json(
            F.struct("id"), G.point_from_xy(F.col("x"), F.col("y"))
        ).alias("feat"),
    ).collect()
    geoms = {}
    for r in rows:
        geoms[r.id] = json.loads(r.feat)["geometry"]  # parseable: no NaN leak
    assert geoms[1] is None and geoms[2] is None and geoms[3] is None
    assert geoms[5] is None  # NULL ordinate: unchanged propagation
    assert geoms[4]["coordinates"][0] == 1e300  # huge finite survives
    assert geoms[6]["coordinates"] == [1.5, 2]


def test_malformed_geometry_strings_render_null_not_crash(spark):
    """Feed geometry strings are untrusted: short token lists, garbage
    numerics, empty rings, and truncated boxes must render null/empty
    geometry — under ANSI mode the old element_at / cast paths aborted
    the whole job on the first malformed item."""
    import json

    from pyspark.sql import functions as F

    from erddap2agol_spark.functions import geometry as G

    df = spark.createDataFrame(
        [
            (1, "12.5", "1 2 3", "", "1 2"),            # short point/odd line/empty ring/short box
            (2, "abc def", "a b c d", "x y", "1 2 3 x"),  # garbage numerics
            (3, "10 20", "1 2 3 4", "1 2 3 4 5 6", "1 2 3 4"),  # valid
        ],
        "id bigint, pt string, ln string, ring string, box string",
    )
    rows = {
        r.id: r
        for r in df.select(
            "id",
            G.point_geojson(F.col("pt")).alias("pt"),
            G.line_geojson(F.col("ln")).alias("ln"),
            G.polygon_geojson(F.col("ring")).alias("pg"),
            G.box_geojson(F.col("box")).alias("bx"),
            G.measured_line_geojson(F.col("ln"), m_increment=2.0).alias("ml"),
        ).collect()
    }
    # malformed -> NULL geometry string (callers coalesce to JSON null)
    assert rows[1].pt is None and rows[2].pt is None
    assert rows[1].pg is None and rows[2].pg is None
    assert rows[1].bx is None and rows[2].bx is None
    # odd-length line keeps the whole points it has; garbage -> null ords
    assert json.loads(rows[1].ln)["coordinates"] == [[2, 1]]
    json.loads(rows[2].ln)  # parseable
    assert json.loads(rows[1].ml)["coordinates"] == [[2, 1, 0, 0]]
    # all-garbage measured line: junk points DROP, not render as z/m-only
    assert json.loads(rows[2].ml)["coordinates"] == []
    # valid row unchanged
    assert json.loads(rows[3].pt)["coordinates"] == [20, 10]
    assert json.loads(rows[3].pg)["coordinates"][0][0] == [2, 1]
    assert json.loads(rows[3].bx)["type"] == "Polygon"


def test_sibling_geometry_projections_do_not_cross_bind(spark):
    """All geometry forms co-projected in ONE select, two over the SAME
    input column.  The index-ramp formulation (a transform whose lambda
    captured the token array) made Spark's subexpression machinery
    cross-bind the captured array between sibling transforms — probing
    the 1-element index array crashed the job, and in other orderings
    one column's rendered JSON leaked into the other column's cast.
    The slot/zip_with formulation leaves nothing to cross-bind."""
    import json

    from pyspark.sql import functions as F

    from erddap2agol_spark.functions import geometry as G

    df = spark.createDataFrame(
        [(1, "12.5", "1 2 3", "", "1 2"),
         (2, "abc def", "a b c d", "x y", "1 2 3 x"),
         (3, "10 20", "1 2 3 4", "1 2 3 4 5 6", "1 2 3 4")],
        "id bigint, pt string, ln string, ring string, box string",
    )
    rows = df.select(
        "id",
        G.point_geojson(F.col("pt")).alias("pt"),
        G.line_geojson(F.col("ln")).alias("ln"),
        G.polygon_geojson(F.col("ring")).alias("pg"),
        G.box_geojson(F.col("box")).alias("bx"),
        G.measured_line_geojson(F.col("ln"), m_increment=2.0).alias("ml"),
    ).collect()
    by_id = {r.id: r for r in rows}
    for r in rows:
        for col in ("pt", "ln", "pg", "bx", "ml"):
            v = r[col]
            if v is not None:
                json.loads(v)
    # the two siblings over `ln` must agree on the xy prefix (no leak)
    ln3 = json.loads(by_id[3].ln)["coordinates"]
    ml3 = json.loads(by_id[3].ml)["coordinates"]
    assert [p[:2] for p in ml3] == ln3 == [[2, 1], [4, 3]]


def test_geometry_emission_always_valid_json_fuzz(spark):
    """Random coordinates (including negatives, .5 fractions, nulls in
    properties, special chars in strings) through point/line/polygon/
    box/multipoint and feature_json always yield parseable JSON with
    the right GeoJSON structure — the reference emits these strings to
    a file, so a single malformed corner breaks the whole
    FeatureCollection."""
    import json
    import random

    from pyspark.sql import functions as F

    from erddap2agol_spark.functions import geometry as G
    from erddap2agol_spark.sinks.geojson import feature_json

    rng = random.Random(42)
    rows = []
    for i in range(25):
        pts = [
            (
                round(rng.uniform(-90, 90), 3),
                round(rng.uniform(-180, 180), 3),
            )
            for _ in range(rng.randint(2, 5))
        ]
        flat = " ".join(f"{a} {b}" for a, b in pts)
        rows.append(
            (
                i,
                f"{pts[0][0]} {pts[0][1]}",
                flat,
                [f"{a} {b}" for a, b in pts],
                rng.choice(['plain', 'quo"te', "unié", None]),
            )
        )
    df = spark.createDataFrame(
        rows, "id int, pt string, flat string, parts array<string>, label string"
    )

    emitted = df.select(
        G.point_geojson(F.col("pt")).alias("pt"),
        G.line_geojson(F.col("flat")).alias("ln"),
        G.polygon_geojson(F.col("flat")).alias("pg"),
        G.multipoint_geojson(F.col("parts")).alias("mp"),
        feature_json(
            F.struct("id", "label"), G.point_geojson(F.col("pt"))
        ).alias("feat"),
    ).collect()
    for r in emitted:
        pt = json.loads(r["pt"])
        assert pt["type"] == "Point" and len(pt["coordinates"]) == 2
        ln = json.loads(r["ln"])
        assert ln["type"] == "LineString"
        assert all(len(p) == 2 for p in ln["coordinates"])
        pg = json.loads(r["pg"])
        assert pg["type"] == "Polygon"
        ring = pg["coordinates"][0]
        assert ring[0] == ring[-1]  # closed
        mp = json.loads(r["mp"])
        assert mp["type"] == "MultiPoint"
        feat = json.loads(r["feat"])
        assert feat["type"] == "Feature"
        assert set(feat) == {"type", "properties", "geometry"}
        assert feat["geometry"]["type"] == "Point"


def test_regex_functions_match_python_mirror_fuzz(spark):
    """sanitize_name and numeric_prefix_cast agree with independent
    Python re mirrors over adversarial strings."""
    import random
    import re

    from pyspark.sql import functions as F

    from erddap2agol_spark.functions.dsl import (
        numeric_prefix_cast,
        sanitize_name,
    )

    rng = random.Random(7)
    alphabet = "aZ0 9._-+/\\:;#@!é%" + '"'
    vals = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
        for _ in range(60)
    ] + ["12.5m", "+3e", "-.5x", "...", "-+1", "", "42"]
    df = spark.createDataFrame([(v,) for v in vals], "v string")
    got = df.select(
        sanitize_name(F.col("v")).alias("s"),
        numeric_prefix_cast(F.col("v")).alias("n"),
    ).collect()
    for v, r in zip(vals, got):
        assert r["s"] == re.sub(r"[^A-Za-z0-9_\-]", "_", v), v
        m = re.match(r"^[0-9+\-.]+", v)
        want = None
        if m:
            try:
                want = float(m.group(0))
            except ValueError:
                want = None
        assert r["n"] == want, (v, r["n"], want)


def test_zm_slots_keep_arity_on_garbage_and_measure_ramp_on_drops(spark):
    """Review findings (r4): a runtime-NULL z or m must render as the
    literal null, never be skipped by concat_ws (dropping a slot shifts
    the measure into the z position); junk points dropped from a
    measured line must not leave gaps in the 0, inc, 2*inc measure
    ramp; a NaN box corner must yield null geometry, not a partial
    ring."""
    import json

    from pyspark.sql import functions as F

    from erddap2agol_spark.functions import geometry as G

    df = spark.createDataFrame(
        [(1.0, 2.0, "zz", "n/a", "1 2 x 4 5 6", "1 2 x y 5 6", "NaN 2 3 4")],
        "x double, y double, z string, m string, ln3 string, ln2 string, box string",
    )
    row = df.select(
        G.point_zm_geojson(
            F.col("x"), F.col("y"), z=F.col("z").try_cast("double"), m=F.col("m")
        ).alias("zm"),
        G.measured_line_geojson(
            F.col("ln3"), srs_dim=3, m_increment=2.0
        ).alias("ml3"),
        G.measured_line_geojson(
            F.col("ln2"), srs_dim=2, m_increment=2.0
        ).alias("ml2"),
        G.box_geojson(F.col("box")).alias("bx"),
    ).collect()[0]
    # garbage z AND m: both positional slots render as null, arity = 4
    assert json.loads(row.zm)["coordinates"] == [1, 2, None, None]
    # garbage z token mid-line: slot null, measure stays in position 4
    assert json.loads(row.ml3)["coordinates"] == [[2, 1, None, 0], [5, 4, 6, 2]]
    # junk middle point drops; measure ramp renumbers (0, 2), no gap
    assert json.loads(row.ml2)["coordinates"] == [[2, 1, 0, 0], [6, 5, 0, 2]]
    # NaN corner: null geometry, not a partial skipped-slot ring
    assert row.bx is None


def test_search_urls_percent_encode_terms():
    from erddap2agol_spark.sources import erddap_url as eu

    u = eu.search_url("https://x/erddap", ["sea surface", "a&b=c"])
    assert "searchFor=sea+surface+a%26b%3Dc" in u
