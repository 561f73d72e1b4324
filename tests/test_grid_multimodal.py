"""Grid model (S7/P5/T2) and multimodal column tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.operators import grid, multimodal


@pytest.fixture(scope="module")
def lattice(spark):
    """Synthetic sst_grid (FIXTURES.md §4): 12 times x 5 lats x 4 lons x
    2 depths, lat ascending, two measures."""
    return (
        spark.range(12 * 5 * 4 * 2)
        .select(
            (F.col("id") % 12).alias("t_idx"),
            ((F.col("id") / 12).cast("long") % 5).alias("lat_idx"),
            ((F.col("id") / 60).cast("long") % 4).alias("lon_idx"),
            ((F.col("id") / 240).cast("long") % 2).alias("d_idx"),
        )
        .select(
            (
                F.lit("2024-01-01").cast("timestamp")
                + F.make_interval(hours=F.col("t_idx") * 6)
            ).alias("time"),
            "t_idx",
            (18.0 + F.col("lat_idx") * 2).alias("latitude"),
            (-98.0 + F.col("lon_idx") * 3).alias("longitude"),
            (F.col("d_idx") * 10.0).alias("depth"),
            (20.0 + F.col("t_idx") + F.col("lat_idx")).alias("sst"),
            (F.col("lon_idx") * 0.1).alias("sst_anomaly"),
        )
    )


def test_melt_measures(spark, lattice):
    long = grid.melt_measures(
        lattice, ["time", "latitude", "longitude", "depth"], ["sst", "sst_anomaly"]
    )
    assert long.columns == ["time", "latitude", "longitude", "depth", "var", "value"]
    assert long.count() == lattice.count() * 2
    assert set(r.var for r in long.select("var").distinct().collect()) == {
        "sst",
        "sst_anomaly",
    }


def test_hyperslab_ranges_and_arithmetic_stride(spark, lattice):
    out = grid.hyperslab(
        lattice,
        "time",
        "latitude",
        "longitude",
        time_range=("2024-01-01 00:00:00", "2024-01-02 00:00:00"),
        lat_range=(20.0, 24.0),
        lon_range=(-98.0, -92.0),
        time_stride=2,
        time_index=F.col("t_idx"),
    )
    rows = out.collect()
    assert all(r.t_idx % 2 == 0 for r in rows)
    assert all(20.0 <= r.latitude <= 24.0 for r in rows)
    # 3 kept time steps (0,2,4 within the day) x 3 lats x 3 lons x 2 depths
    assert len(rows) == 3 * 3 * 3 * 2


def test_hyperslab_rank_stride_matches_arithmetic(spark, lattice):
    a = grid.hyperslab(
        lattice, "time", "latitude", "longitude", time_stride=3,
        time_index=F.col("t_idx"),
    )
    b = grid.hyperslab(lattice, "time", "latitude", "longitude", time_stride=3)
    assert a.count() == b.count()
    assert a.select("time").distinct().count() == 4  # steps 0,3,6,9


def test_first_altitude_slice(spark, lattice):
    out = grid.first_altitude_slice(lattice, "depth")
    assert out.select("depth").distinct().collect()[0].depth == 0.0
    assert out.count() == lattice.count() / 2


def test_north_south_order(spark, lattice):
    ordered = grid.north_south_order(lattice, "time", "latitude", "longitude")
    pdf = ordered.toPandas()
    # within each time slice latitude must run north -> south
    for _, g in pdf.groupby("time"):
        lats = g["latitude"].tolist()
        assert lats == sorted(lats, reverse=True) or len(set(lats)) < len(lats)
        # first row of each slice is the northernmost latitude
        assert g["latitude"].iloc[0] == max(lats)


def test_write_grid_partitioned_prunes(spark, lattice, tmp_path):
    path = str(tmp_path / "grid")
    grid.write_grid_partitioned(lattice, "time", path)
    back = spark.read.parquet(path)
    one_day = back.filter(F.col("grid_date") == "2024-01-02")
    assert one_day.count() == lattice.filter(
        F.date_format("time", "yyyy-MM-dd") == "2024-01-02"
    ).count()
    # partition pruning visible in the physical plan
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "grid_date" in plan


# --- multimodal ------------------------------------------------------------


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, bytes.fromhex("FFD8FF") + b"fakejpegbody"),
        (2, bytes.fromhex("89504E47") + b"fakepngbody!!"),
        (3, b"RIFFxxxxWAVE" + b"\x00" * 5),
        (4, b"plain text bytes here"),
        (5, None),
    ]
    return spark.createDataFrame(rows, ["media_id", "payload"])


def test_media_meta_sniffing(spark, media):
    out = multimodal.with_media_meta(media, "payload").collect()
    meta = {r.media_id: r.media_meta for r in out}
    assert meta[1]["format"] == "jpeg"
    assert meta[2]["format"] == "png"
    assert meta[3]["format"] == "riff"
    assert meta[4]["format"] == "unknown"
    assert meta[1]["n_bytes"] == 15
    assert meta[5]["n_bytes"] is None


def test_decode_media_fake_deterministic(spark, media):
    out1 = multimodal.decode_media(media, "media_id", "payload", fake=True)
    assert out1.count() == 5
    r1 = {r.media_id: (r.width, r.height, r.n_channels) for r in out1.collect()}
    r2 = {
        r.media_id: (r.width, r.height, r.n_channels)
        for r in multimodal.decode_media(media, "media_id", "payload", fake=True).collect()
    }
    assert r1 == r2  # deterministic stub
    assert all(16 <= w <= 255 for w, _, _ in r1.values())


def test_decode_media_real_raises_on_non_png(spark, media):
    """The seam contract after the real PNG branch landed: non-PNG
    blobs still raise (NotImplementedError), and a blob that merely
    STARTS with the PNG magic fails parsing loudly (ValueError) — never
    wrong pixels."""
    with pytest.raises(Exception) as exc_info:
        multimodal.decode_media(media, "media_id", "payload", fake=False).collect()
    msg = str(exc_info.value)
    assert "NotImplementedError" in msg or "ValueError" in msg


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, 25), (2, 5), (3, 0)], ["media_id", "n_frames"])
    out = multimodal.frame_sample_plan(df, "media_id", "n_frames", every_n=10)
    got = sorted((r.media_id, r.frame_index) for r in out.collect())
    assert got == [(1, 0), (1, 10), (1, 20), (2, 0), (3, 0)]


def test_resize_media_fake_shape_and_determinism(spark, media):
    out = multimodal.resize_media(
        media, "media_id", "payload", width=8, height=4, fake=True
    )
    rows1 = {r.media_id: bytes(r.data) for r in out.collect()}
    assert set(rows1) == {1, 2, 3, 4, 5}
    # exact raster size: width * height * 3 channels, even for NULL blobs
    assert all(len(b) == 8 * 4 * 3 for b in rows1.values())
    rows2 = {
        r.media_id: bytes(r.data)
        for r in multimodal.resize_media(
            media, "media_id", "payload", width=8, height=4, fake=True
        ).collect()
    }
    assert rows1 == rows2  # deterministic stub
    # different content -> different raster (keystream is digest-seeded)
    assert rows1[1] != rows1[2]


def test_resize_media_real_raises_on_non_png(spark, media):
    with pytest.raises(Exception) as exc_info:
        multimodal.resize_media(
            media, "media_id", "payload", width=8, height=4, fake=False
        ).collect()
    msg = str(exc_info.value)
    assert "NotImplementedError" in msg or "ValueError" in msg


def _formula_png(mid: int, h: int = 16, w: int = 24):
    import numpy as np

    from erddap2agol_spark.functions.png import encode_png

    img = np.fromfunction(
        lambda y, x, c: (mid * 13 + y * 7 + x * 3 + c * 11) % 256, (h, w, 3)
    ).astype(np.uint8)
    return img, encode_png(img)


def test_decode_media_real_png(spark):
    """The REAL codec branch (VERDICT r5 #2): genuine PNG bytes through
    the bounded-batch seam come back with the actual pixel dimensions,
    not digest-derived fakes."""
    blobs = [(mid, bytearray(_formula_png(mid)[1])) for mid in (1, 2)]
    df = spark.createDataFrame(blobs, "media_id long, payload binary")
    out = {
        r.media_id: (r.format, r.width, r.height, r.n_channels)
        for r in multimodal.decode_media(df, "media_id", "payload").collect()
    }
    assert out[1] == ("png", 24, 16, 3) and out[2] == ("png", 24, 16, 3)


def test_resize_media_real_png_nearest_and_box(spark):
    import numpy as np

    from erddap2agol_spark.functions.png import resize_box, resize_nearest

    img, blob = _formula_png(3)
    df = spark.createDataFrame(
        [(3, bytearray(blob))], "media_id long, payload binary"
    )
    for mode, ref in (("nearest", resize_nearest), ("box", resize_box)):
        row = multimodal.resize_media(
            df, "media_id", "payload", width=6, height=4, mode=mode
        ).collect()[0]
        got = np.frombuffer(bytes(row.data), dtype=np.uint8).reshape(4, 6, 3)
        np.testing.assert_array_equal(got, ref(img, 6, 4))


def test_png_codec_roundtrip_all_filters():
    """encode_png cycles filter types 0-4 across rows; decode must
    invert every unfilter path bit-exactly, for 1/2/3/4-channel images
    and degenerate 1x1."""
    import numpy as np

    from erddap2agol_spark.functions.png import decode_png, encode_png

    rng = np.random.default_rng(11)
    for shape in [(16, 24, 3), (5, 5, 1), (7, 3, 4), (11, 13, 2), (1, 1, 3)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        np.testing.assert_array_equal(decode_png(encode_png(img)), img)


def test_png_decode_rejects_garbage():
    import pytest as _pytest

    from erddap2agol_spark.functions.png import decode_png, encode_png

    with _pytest.raises(ValueError):
        decode_png(b"\x89PNG\r\n\x1a\nnot really")
    with _pytest.raises(ValueError):
        decode_png(b"JUNK")
    # truncated valid stream
    import numpy as np

    blob = encode_png(np.zeros((4, 4, 3), dtype=np.uint8))
    with _pytest.raises(ValueError):
        decode_png(blob[: len(blob) - 20])


def test_props_variant_dirty_rows_degrade_to_null(spark):
    """Robustness contract on the VARIANT path: malformed JSON and a
    non-integer k degrade that row to NULL — never abort the job."""
    bad = spark.createDataFrame(
        [("view", "{bad json"), ("view", '{"k": "abc"}'), ("view", '{"k": 7}')],
        "event_type string, props string",
    )
    k = F.try_variant_get(F.try_parse_json(F.col("props")), "$.k", "int")
    got = [r.k for r in bad.select(k.alias("k")).collect()]
    assert got == [None, None, 7]


def test_bilinear_regrid_hand_computed(spark):
    from erddap2agol_spark.operators.grid import bilinear_regrid

    rows = [
        ("t", 0.0, 0.0, 1.0), ("t", 0.0, 1.0, 2.0),
        ("t", 1.0, 0.0, 3.0), ("t", 1.0, 1.0, 4.0),
        ("t", 0.0, 2.0, None),  # null corner: poisons its targets
        ("t", 1.0, 2.0, 6.0),
    ]
    df = spark.createDataFrame(rows, "var string, lat double, lon double, value double")
    out = bilinear_regrid(
        df, ["var"], "lat", "lon", "value",
        lat0=0.0, lon0=0.0, step=1.0, fy=0.5, fx=0.5,
    ).collect()
    got = {(r["lat"], r["lon"]): r["value"] for r in out}
    # center of the 2x2 block: plain average
    assert got == {(0.5, 0.5): 2.5}
    # the (0.5, 1.5) target needs the null corner -> dropped, and no
    # edge target is extrapolated
    assert len(out) == 1


def test_bilinear_regrid_weights(spark):
    from erddap2agol_spark.operators.grid import bilinear_regrid

    rows = [
        ("t", 0.0, 0.0, 0.0), ("t", 0.0, 1.0, 0.0),
        ("t", 1.0, 0.0, 0.0), ("t", 1.0, 1.0, 16.0),
    ]
    df = spark.createDataFrame(rows, "var string, lat double, lon double, value double")
    out = bilinear_regrid(
        df, ["var"], "lat", "lon", "value",
        lat0=0.0, lon0=0.0, step=1.0, fy=0.25, fx=0.25,
    ).collect()
    # target (0.25, 0.25): the far corner (1,1) carries weight fy*fx=1/16
    assert {(r["lat"], r["lon"]): r["value"] for r in out} == {(0.25, 0.25): 1.0}


def test_sigma_t_unesco_check_value(spark):
    """EOS-80 published check value: rho(S=35, T=5, P=0) = 1027.67547."""
    from erddap2agol_spark.functions.seawater import sigma_t, sigma_t_sql
    import duckdb

    df = spark.createDataFrame([(5.0, 35.0)], "t double, s double")
    [r] = df.select(F.round(sigma_t(F.col("t"), F.col("s")), 5).alias("st")).collect()
    assert r["st"] == 27.67547
    # the SQL builder produces the bit-identical expression
    [(d,)] = duckdb.sql(
        f"SELECT round({sigma_t_sql('5.0', '35.0')}, 5)"
    ).fetchall()
    assert d == 27.67547


def test_resize_media_rejects_unknown_mode(spark):
    _, blob = _formula_png(1)
    df = spark.createDataFrame([(1, bytearray(blob))], "media_id long, payload binary")
    with pytest.raises(ValueError, match="unknown resize mode"):
        multimodal.resize_media(df, "media_id", "payload", 4, 4, mode="bilinear")
