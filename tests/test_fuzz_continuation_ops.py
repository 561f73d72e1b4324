"""Independent-mirror fuzz for the round-4 continuation operators:
orderBy* extremes vs tuple comparison, exact heavy hitters vs brute
force, bilinear regrid vs a numpy stencil, time-weighted average vs
numpy trapezoidal integration."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from erddap2agol_spark.operators import orderby

_ROWS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),                          # group
        st.one_of(st.none(), st.integers(-3, 3)),             # order value
    ),
    min_size=1,
    max_size=20,
)


def _mirror(rows, minimum):
    """Per group: (val, id) of the extreme row, NULL vals ignored,
    ties on val broken by id in the same direction as the extreme."""
    best = {}
    for i, (g, v) in enumerate(rows):
        if v is None:
            continue
        cur = best.get(g)
        cand = (v, i)
        if cur is None:
            best[g] = cand
        elif minimum:
            best[g] = min(cur, cand)
        else:
            best[g] = max(cur, cand)
    return best


@given(_ROWS)
@settings(max_examples=12, deadline=None)
def test_orderby_extremes_match_mirror(spark, rows):
    df = spark.createDataFrame(
        [(g, v, i) for i, (g, v) in enumerate(rows)],
        "g string, v int, id int",
    )
    for minimum in (False, True):
        fn = orderby.order_by_min if minimum else orderby.order_by_max
        got = {
            r["g"]: (r["v"], r["id"])
            for r in fn(df, ["g"], "v", carry=["id"]).collect()
        }
        want = _mirror(rows, minimum)
        assert got == want, (minimum, got, want)
        # minmax agrees with both single-sided forms
    mm = orderby.order_by_minmax(df, ["g"], "v", carry=["id"]).collect()
    lo = {r["g"]: (r["v"], r["id"]) for r in mm if r["extreme"] == "min"}
    hi = {r["g"]: (r["v"], r["id"]) for r in mm if r["extreme"] == "max"}
    assert lo == _mirror(rows, True) and hi == _mirror(rows, False)


# ---------------------------------------------------------------------------
# Misra-Gries exact heavy hitters == brute force, any skew, any k
# ---------------------------------------------------------------------------

_KEYS = st.lists(
    st.integers(min_value=0, max_value=6).flatmap(
        # draw a key id and a burst length so skew varies wildly
        lambda key: st.integers(min_value=1, max_value=15).map(
            lambda n: (key, n)
        )
    ),
    min_size=1,
    max_size=8,
)


@given(_KEYS, st.integers(min_value=1, max_value=5))
@settings(max_examples=10, deadline=None)
def test_heavy_hitters_exact_matches_bruteforce_fuzz(spark, bursts, k):
    from pyspark.sql import functions as F

    from erddap2agol_spark.operators.sketch import heavy_hitters_exact

    rows = [(f"k{key}",) for key, n in bursts for _ in range(n)]
    df = spark.createDataFrame(rows, "key string").repartition(4)
    got = {
        (r["key"], r["n_rows"])
        for r in heavy_hitters_exact(df, "key", k).collect()
    }
    n_total = len(rows)
    counts: dict[str, int] = {}
    for (key,) in rows:
        counts[key] = counts.get(key, 0) + 1
    want = {
        (key, n) for key, n in counts.items() if n * (k + 1) > n_total
    }
    assert got == want, (k, n_total, got, want)


# ---------------------------------------------------------------------------
# bilinear_regrid == numpy stencil on random regular grids
# ---------------------------------------------------------------------------

_GRID = st.tuples(
    st.integers(min_value=2, max_value=5),   # n_lat
    st.integers(min_value=2, max_value=5),   # n_lon
    st.floats(min_value=0.1, max_value=0.9, allow_nan=False),  # fy
    st.floats(min_value=0.1, max_value=0.9, allow_nan=False),  # fx
    st.integers(min_value=0, max_value=2**31 - 1),             # value seed
)


@given(_GRID)
@settings(max_examples=10, deadline=None)
def test_bilinear_regrid_matches_numpy_fuzz(spark, grid):
    import numpy as np

    from erddap2agol_spark.operators.grid import bilinear_regrid

    n_lat, n_lon, fy, fx, seed = grid
    rng = np.random.RandomState(seed)
    vals = np.round(rng.uniform(-50, 50, size=(n_lat, n_lon)), 3)
    rows = [
        ("v", float(i), float(j), float(vals[i, j]))
        for i in range(n_lat)
        for j in range(n_lon)
    ]
    df = spark.createDataFrame(
        rows, "var string, lat double, lon double, value double"
    )
    out = bilinear_regrid(
        df, ["var"], "lat", "lon", "value",
        lat0=0.0, lon0=0.0, step=1.0, fy=fy, fx=fx,
    ).collect()
    got = {(round(r["lat"], 6), round(r["lon"], 6)): r["value"] for r in out}
    # numpy mirror: every interior stencil
    want = {}
    for i in range(n_lat - 1):
        for j in range(n_lon - 1):
            v = (
                (1 - fy) * (1 - fx) * vals[i, j]
                + fy * (1 - fx) * vals[i + 1, j]
                + (1 - fy) * fx * vals[i, j + 1]
                + fy * fx * vals[i + 1, j + 1]
            )
            want[(round(i + fy, 6), round(j + fx, 6))] = v
    assert got.keys() == want.keys()
    for kxy, v in want.items():
        assert abs(got[kxy] - v) <= 2e-6, (kxy, got[kxy], v)


# ---------------------------------------------------------------------------
# time_weighted_avg == numpy trapezoid on random irregular series
# ---------------------------------------------------------------------------

_SERIES = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5000),  # ts offset seconds (unique)
        st.floats(min_value=-100, max_value=100, allow_nan=False, width=32),
    ),
    min_size=2,
    max_size=15,
    unique_by=lambda t: t[0],
)


@given(_SERIES)
@settings(max_examples=10, deadline=None)
def test_time_weighted_avg_matches_numpy_trapezoid(spark, series):
    import numpy as np

    from erddap2agol_spark.queries import REGISTRY, _load_all

    # drive the registered query's exact plan over a synthetic events dir
    _load_all()
    import os, tempfile
    d = tempfile.mkdtemp(prefix="twa_fuzz")
    base = 1_700_000_000_000_000
    rows = [
        (i, base + t * 1_000_000, 1, "x", float(v), "{}")
        for i, (t, v) in enumerate(series)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts long, user_id long, event_type string, value double, props string"
    ).selectExpr(
        "event_id", "timestamp_micros(ts) AS ts", "user_id", "event_type",
        "value", "props"
    ).coalesce(1).write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    out = REGISTRY["time_weighted_avg"].spark(spark, d).collect()
    pts = sorted(series)
    xs = np.array([t for t, _ in pts], dtype=np.float64)
    ys = np.array([v for _, v in pts], dtype=np.float64)
    want = float(np.trapz(ys, xs)) / float(xs[-1] - xs[0])
    [r] = out
    assert abs(r["twa"] - want) <= 1e-5, (r["twa"], want)
    assert r["n_obs"] == len(series)
