"""Unit tests for gap-fill resampling (operators/timeseries.py)."""

from __future__ import annotations

from datetime import datetime

from erddap2agol_spark.operators.timeseries import gap_stats, resample_locf


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "id long, key string, ts timestamp, value double"
    )


def test_locf_carries_last_value_forward(spark):
    rows = [
        (1, "a", datetime(2024, 1, 1, 0, 30), 10.0),
        (2, "a", datetime(2024, 1, 3, 12, 0), 20.0),
        (3, "a", datetime(2024, 1, 5, 1, 0), 30.0),
    ]
    out = resample_locf(
        _df(spark, rows), ["key"], "ts", "id", "value", step_s=86_400
    ).collect()
    got = {r["grid_ts"]: r["value"] for r in out}
    # grid starts at the first aligned point AFTER the first obs
    assert min(got) == datetime(2024, 1, 2)
    assert got[datetime(2024, 1, 2)] == 10.0
    assert got[datetime(2024, 1, 3)] == 10.0   # obs at 12:00 is later
    assert got[datetime(2024, 1, 4)] == 20.0
    # the 01:00 obs on Jan 5 is AFTER the 00:00 grid point -> not visible
    assert got[datetime(2024, 1, 5)] == 20.0
    # no leading-null rows, no values invented
    assert all(v is not None for v in got.values())


def test_locf_grid_point_equal_to_obs_takes_obs(spark):
    rows = [
        (1, "a", datetime(2024, 1, 1, 0, 0), 1.0),
        (2, "a", datetime(2024, 1, 2, 0, 0), 2.0),
    ]
    out = resample_locf(
        _df(spark, rows), ["key"], "ts", "id", "value", step_s=86_400
    ).collect()
    got = {r["grid_ts"]: r["value"] for r in out}
    # observation exactly at the grid instant wins (is_grid sorts after)
    assert got[datetime(2024, 1, 1)] == 1.0
    assert got[datetime(2024, 1, 2)] == 2.0


def test_locf_duplicate_ts_breaks_tie_on_id(spark):
    rows = [
        (7, "a", datetime(2024, 1, 1, 0, 0), 5.0),
        (3, "a", datetime(2024, 1, 1, 0, 0), 9.0),  # lower id sorts first
        (9, "a", datetime(2024, 1, 2, 0, 0), 1.0),
    ]
    out = resample_locf(
        _df(spark, rows), ["key"], "ts", "id", "value", step_s=86_400
    ).collect()
    got = {r["grid_ts"]: r["value"] for r in out}
    assert got[datetime(2024, 1, 1)] == 5.0  # id 7 is last at the tie


def test_locf_short_series_emits_nothing(spark):
    # span shorter than one step and no aligned point inside it
    rows = [
        (1, "a", datetime(2024, 1, 1, 1, 0), 1.0),
        (2, "a", datetime(2024, 1, 1, 2, 0), 2.0),
    ]
    out = resample_locf(
        _df(spark, rows), ["key"], "ts", "id", "value", step_s=86_400
    ).collect()
    assert out == []


def test_locf_keys_are_independent(spark):
    rows = [
        (1, "a", datetime(2024, 1, 1), 1.0),
        (2, "a", datetime(2024, 1, 2), 2.0),
        (3, "b", datetime(2024, 1, 1), 100.0),
        (4, "b", datetime(2024, 1, 2), 200.0),
    ]
    out = resample_locf(
        _df(spark, rows), ["key"], "ts", "id", "value", step_s=86_400
    ).collect()
    by_key = {(r["key"], r["grid_ts"]): r["value"] for r in out}
    assert by_key[("a", datetime(2024, 1, 2))] == 2.0
    assert by_key[("b", datetime(2024, 1, 2))] == 200.0


def test_gap_stats(spark):
    rows = [
        (1, "a", datetime(2024, 1, 1, 0, 0), 0.0),
        (2, "a", datetime(2024, 1, 1, 0, 10), 0.0),
        (3, "a", datetime(2024, 1, 1, 0, 20), 0.0),
        (4, "a", datetime(2024, 1, 1, 2, 20), 0.0),  # 2 h gap
    ]
    [r] = gap_stats(
        _df(spark, rows), ["key"], "ts", "id", max_gap_s=3600
    ).collect()
    assert r["n_obs"] == 4
    assert r["median_step_s"] == 600.0
    assert r["max_gap_s"] == 7200.0
    assert r["n_long_gaps"] == 1
