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
