"""Fuzz the orderBy* argmax family against a pure-Python mirror:
random groups / duplicate order values / NULLs must reproduce the
struct-lexicographic tie-break chain and the ignore-missing contract."""

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
