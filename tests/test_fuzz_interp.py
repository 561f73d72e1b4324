"""Fuzz interpolate_linear against numpy's reference interpolator.

``np.interp`` is an independent implementation of the same math; at
every epoch-aligned grid point inside the observation span the operator
must agree with it to float tolerance (the operator rounds its output to
6dp, so the bound is 1e-6 plus interpolation fp noise). Timestamps are
generated unique per key — duplicate-timestamp tie-breaking has its own
deterministic-contract tests in test_timeseries.py; this fuzz targets the
interpolation arithmetic and grid placement.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from erddap2agol_spark.operators.timeseries import interpolate_linear

_STEP_S = 60
_STEP_US = _STEP_S * 1_000_000

# offsets in seconds within an hour window, values in a tame range
_OBS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3600),
        st.floats(min_value=-1e3, max_value=1e3, allow_nan=False, width=32),
    ),
    min_size=1,
    max_size=12,
    unique_by=lambda t: t[0],
)

_BASE_US = 1_700_000_000_000_000  # fixed anchor epoch (µs)


def _mirror(obs: list[tuple[int, float]]) -> dict[int, float]:
    """Grid points + np.interp values, all in epoch µs."""
    xs = sorted(t * 1_000_000 + _BASE_US for t, _ in obs)
    by_x = {t * 1_000_000 + _BASE_US: v for t, v in obs}
    ys = [by_x[x] for x in xs]
    lo = xs[0] + (_STEP_US - xs[0] % _STEP_US) % _STEP_US
    out = {}
    g = lo
    while g <= xs[-1]:
        out[g] = float(np.interp(g, xs, ys))
        g += _STEP_US
    return out


@given(_OBS)
@settings(max_examples=12, deadline=None)
def test_interp_matches_numpy(spark, obs):
    rows = [
        (i, "k", (_BASE_US + t * 1_000_000), float(v))
        for i, (t, v) in enumerate(obs)
    ]
    df = spark.createDataFrame(
        rows, "id long, key string, us long, value double"
    ).selectExpr("id", "key", "timestamp_micros(us) AS ts", "value")
    out = interpolate_linear(
        df, ["key"], "ts", "id", "value", step_s=_STEP_S
    ).selectExpr("unix_micros(grid_ts) AS g_us", "value")
    got = {r["g_us"]: r["value"] for r in out.collect()}
    want = _mirror(obs)
    assert got.keys() == want.keys()
    for g, v in want.items():
        assert abs(got[g] - v) <= 1e-5, (g, got[g], v)


# ---------------------------------------------------------------------------
# cogrouped as-of == union-window as-of on random event shapes
# ---------------------------------------------------------------------------

_EVENTS = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),      # user
        st.integers(min_value=0, max_value=50),     # ts offset (collisions likely)
        st.booleans(),                              # True = right (purchase)
    ),
    min_size=1,
    max_size=30,
)


@given(_EVENTS)
@settings(max_examples=10, deadline=None)
def test_cogrouped_asof_matches_window_form(spark, events):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from erddap2agol_spark.operators.joins import asof_backward_cogrouped

    rows = [
        (i, int(u), _BASE_US + t * 1_000_000, bool(r))
        for i, (u, t, r) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, is_r boolean"
    ).selectExpr("event_id", "user_id", "timestamp_micros(us) AS ts", "is_r")
    left = df.filter(~F.col("is_r")).select("event_id", "ts", "user_id")
    right = df.filter(F.col("is_r")).select("event_id", "ts", "user_id")

    got = {
        r["event_id"]: r["last_purchase_ts"]
        for r in asof_backward_cogrouped(
            left, right, "user_id", "ts", "event_id", "last_purchase_ts"
        ).collect()
    }

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    want_df = (
        df.withColumn(
            "last_purchase_ts",
            F.max(F.when(F.col("is_r"), F.col("ts"))).over(w),
        )
        .filter(~F.col("is_r"))
        .select("event_id", "last_purchase_ts")
    )
    want = {r["event_id"]: r["last_purchase_ts"] for r in want_df.collect()}
    assert got == want
