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


# ---------------------------------------------------------------- ewma


def test_ewma_matches_recursive_formula(spark):
    from erddap2agol_spark.operators.timeseries import ewma

    rows = [
        (i, "a", datetime(2024, 1, 1, i), float(v))
        for i, v in enumerate([10.0, 20.0, 5.0, 40.0, 15.0])
    ]
    out = {
        r["id"]: r["ewma"]
        for r in ewma(
            _df(spark, rows), ["key"], "ts", "id", "value",
            alpha=0.3, span_rows=10,
        ).collect()
    }
    # span covers the whole series -> exact left fold from the first obs
    s = 10.0
    expect = {0: 10.0}
    for i, v in enumerate([20.0, 5.0, 40.0, 15.0], start=1):
        s = 0.3 * v + 0.7 * s
        expect[i] = s
    assert out.keys() == expect.keys()
    for k in expect:
        assert abs(out[k] - expect[k]) < 1e-12


def test_ewma_bounded_span_drops_old_state(spark):
    from erddap2agol_spark.operators.timeseries import ewma

    rows = [
        (i, "a", datetime(2024, 1, 1, i), float(v))
        for i, v in enumerate([100.0, 1.0, 2.0, 3.0])
    ]
    out = {
        r["id"]: r["ewma"]
        for r in ewma(
            _df(spark, rows), ["key"], "ts", "id", "value",
            alpha=0.5, span_rows=2,
        ).collect()
    }
    # span=2: fold seeds on the PREVIOUS obs only
    assert out[0] == 100.0
    assert out[1] == 0.5 * 1.0 + 0.5 * 100.0
    assert out[2] == 0.5 * 2.0 + 0.5 * 1.0
    assert out[3] == 0.5 * 3.0 + 0.5 * 2.0


def test_ewma_span_one_is_identity(spark):
    from erddap2agol_spark.operators.timeseries import ewma

    rows = [(i, "a", datetime(2024, 1, 1, i), float(i * 7)) for i in range(4)]
    out = ewma(
        _df(spark, rows), ["key"], "ts", "id", "value", alpha=0.3, span_rows=1
    ).collect()
    assert all(r["ewma"] == r["id"] * 7.0 for r in out)


def test_ewma_keys_are_independent(spark):
    from erddap2agol_spark.operators.timeseries import ewma

    rows = [
        (1, "a", datetime(2024, 1, 1, 0), 10.0),
        (2, "b", datetime(2024, 1, 1, 1), 99.0),
        (3, "a", datetime(2024, 1, 1, 2), 20.0),
    ]
    out = {
        r["id"]: r["ewma"]
        for r in ewma(
            _df(spark, rows), ["key"], "ts", "id", "value",
            alpha=0.5, span_rows=5,
        ).collect()
    }
    assert out[2] == 99.0  # key b never sees key a's values
    assert out[3] == 0.5 * 20.0 + 0.5 * 10.0


# -------------------------------------------------- climatology / anomaly


def test_climatology_anomaly_known_values(spark):
    from erddap2agol_spark.operators.timeseries import anomaly_join, climatology

    rows = [
        (1, "sst", datetime(2024, 1, 5), 10.0),
        (2, "sst", datetime(2024, 1, 20), 14.0),
        (3, "sst", datetime(2024, 2, 5), 20.0),
        (4, "sal", datetime(2024, 1, 7), 35.0),
    ]
    df = _df(spark, rows).withColumnRenamed("key", "kind")
    clim = climatology(df, ["kind"], "ts", "value")
    got = {(r["kind"], r["month"]): (r["clim_mean"], r["clim_n"]) for r in clim.collect()}
    assert got[("sst", 1)] == (12.0, 2)
    assert got[("sst", 2)] == (20.0, 1)
    assert got[("sal", 1)] == (35.0, 1)

    anom = {
        r["id"]: r["anomaly"]
        for r in anomaly_join(df, clim, ["kind"], "ts", "value").collect()
    }
    assert anom == {1: -2.0, 2: 2.0, 3: 0.0, 4: 0.0}


def test_anomaly_join_is_broadcast(spark):
    from erddap2agol_spark.operators.timeseries import anomaly_join, climatology

    rows = [(1, "sst", datetime(2024, 1, 5), 10.0)]
    df = _df(spark, rows).withColumnRenamed("key", "kind")
    clim = climatology(df, ["kind"], "ts", "value")
    plan = anomaly_join(df, clim, ["kind"], "ts", "value")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


class TestIntervalOverlapJoin:
    def _mk(self, spark, rows, side):
        return spark.createDataFrame(rows, f"{side}_id int, lo_{side} double, hi_{side} double")

    def test_exactly_once_across_bins(self, spark):
        from erddap2agol_spark.operators.joins import interval_overlap_join

        # overlap spans many bins at bin_width=1: must emit ONE row
        a = self._mk(spark, [(1, 0.0, 10.0)], "a")
        b = self._mk(spark, [(2, 3.0, 9.0)], "b")
        out = interval_overlap_join(a, b, "lo_a", "hi_a", "lo_b", "hi_b", 1.0).collect()
        assert len(out) == 1

    def test_matches_theta_join(self, spark):
        from erddap2agol_spark.operators.joins import interval_overlap_join

        rows_a = [(i, float(i * 3 % 17), float(i * 3 % 17 + i % 5 + 1)) for i in range(40)]
        rows_b = [(i, float(i * 7 % 19), float(i * 7 % 19 + i % 4 + 1)) for i in range(40)]
        a, b = self._mk(spark, rows_a, "a"), self._mk(spark, rows_b, "b")
        for w in (1.0, 2.5, 8.0):
            got = {
                (r.a_id, r.b_id)
                for r in interval_overlap_join(a, b, "lo_a", "hi_a", "lo_b", "hi_b", w)
                .select("a_id", "b_id")
                .collect()
            }
            want = {
                (r.a_id, r.b_id)
                for r in a.join(
                    b, (a.lo_a < b.hi_b) & (b.lo_b < a.hi_a)
                ).select("a_id", "b_id").collect()
            }
            assert got == want, f"bin_width={w}"

    def test_no_nested_loop_in_plan(self, spark):
        from erddap2agol_spark.operators.joins import interval_overlap_join

        a = self._mk(spark, [(1, 0.0, 2.0)], "a")
        b = self._mk(spark, [(2, 1.0, 3.0)], "b")
        plan = (
            interval_overlap_join(a, b, "lo_a", "hi_a", "lo_b", "hi_b", 1.0)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_interpolate_linear_hand_computed(spark):
    from erddap2agol_spark.operators.timeseries import interpolate_linear

    # obs at :30 (v=10) and 2:30 (v=30): hourly grid points 1:00 and 2:00
    # sit 25% / 75% along the segment
    rows = [
        (1, "a", datetime(2024, 1, 1, 0, 30), 10.0),
        (2, "a", datetime(2024, 1, 1, 2, 30), 30.0),
    ]
    out = interpolate_linear(
        _df(spark, rows), ["key"], "ts", "id", "value", step_s=3600
    )
    got = {r["grid_ts"]: r["value"] for r in out.collect()}
    assert got == {
        datetime(2024, 1, 1, 1, 0): 15.0,
        datetime(2024, 1, 1, 2, 0): 25.0,
    }


def test_interpolate_linear_exact_hit_copies_observation(spark):
    from erddap2agol_spark.operators.timeseries import interpolate_linear

    rows = [
        (1, "a", datetime(2024, 1, 1, 1, 0), 7.123456789),
        (2, "a", datetime(2024, 1, 1, 3, 0), 9.0),
    ]
    out = interpolate_linear(
        _df(spark, rows), ["key"], "ts", "id", "value", step_s=3600
    )
    got = {r["grid_ts"]: r["value"] for r in out.collect()}
    # grid point ON the first observation copies it (rounded to 6dp),
    # never divides by a zero time delta
    assert got[datetime(2024, 1, 1, 1, 0)] == 7.123457
    # midpoint interpolates from the RAW neighbour values, rounded at output
    assert got[datetime(2024, 1, 1, 2, 0)] == 8.061728


def test_interpolate_linear_null_obs_are_skipped(spark):
    from erddap2agol_spark.operators.timeseries import interpolate_linear

    rows = [
        (1, "a", datetime(2024, 1, 1, 0, 0), 0.0),
        (2, "a", datetime(2024, 1, 1, 1, 0), None),  # non-observation
        (3, "a", datetime(2024, 1, 1, 2, 0), 20.0),
    ]
    out = interpolate_linear(
        _df(spark, rows), ["key"], "ts", "id", "value", step_s=3600
    )
    got = {r["grid_ts"]: r["value"] for r in out.collect()}
    # the null row must not anchor the segment: 1:00 interpolates 0..20
    assert got[datetime(2024, 1, 1, 1, 0)] == 10.0


def test_locf_grid_aligns_on_negative_epochs(spark):
    """Pre-1970 series: floor-mod alignment (pmod) must place the first
    grid point AT or AFTER the first observation on the epoch-aligned
    lattice — a sign-following % snaps one step late and drops it."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            # 1965-06-01 00:00:00 is NOT 60s-aligned to... it is; use an
            # offset first obs at hh:00:25 so ceil-align matters
            ("s", datetime(1965, 6, 1, 0, 0, 25), 1, 10.0),
            ("s", datetime(1965, 6, 1, 0, 3, 5), 2, 20.0),
        ],
        "k string, ts timestamp, id int, v double",
    )
    out = resample_locf(df, ["k"], "ts", "id", "v", step_s=60)
    got = sorted((r["grid_ts"], r["value"]) for r in out.collect())
    # first aligned point at/after 00:00:25 is 00:01:00 (not 00:02:00)
    assert got[0] == (datetime(1965, 6, 1, 0, 1), 10.0)
    assert [t.second for t, _ in got] == [0, 0, 0]
    # the 00:03:05 obs lands after the last grid point, so LOCF still
    # carries the first value at 00:03:00
    assert got[-1] == (datetime(1965, 6, 1, 0, 3), 10.0)


def test_interpolate_grid_aligns_on_negative_epochs(spark):
    from erddap2agol_spark.operators.timeseries import interpolate_linear

    df = spark.createDataFrame(
        [
            ("s", datetime(1965, 6, 1, 0, 0, 30), 1, 0.0),
            ("s", datetime(1965, 6, 1, 0, 2, 30), 2, 120.0),
        ],
        "k string, ts timestamp, id int, v double",
    )
    out = interpolate_linear(df, ["k"], "ts", "id", "v", step_s=60)
    got = sorted((r["grid_ts"], r["value"]) for r in out.collect())
    # grid 00:01 and 00:02, linearly interpolated (1.0 per second)
    assert got == [
        (datetime(1965, 6, 1, 0, 1), 30.0),
        (datetime(1965, 6, 1, 0, 2), 90.0),
    ]
