"""ERDDAP orderBy* family: URL clause goldens + operator semantics vs a
hand-computed frame (the oracle-parity test grades the same operators over
the driver tables; these pin the tie-break and tick edge cases)."""

from __future__ import annotations

import datetime as dt

import pytest

from erddap2agol_spark.operators import orderby
from erddap2agol_spark.sources import erddap_url as eu

SERVER = "https://erddap.example.org/erddap"


# ---------------------------------------------------------------------------
# URL emission
# ---------------------------------------------------------------------------


def test_orderby_clause_goldens():
    assert (
        eu.orderby_clause("orderByMax", ["stationID", "time"])
        == "&orderByMax(%22stationID%2Ctime%22)"
    )
    assert (
        eu.orderby_clause("orderByClosest", ["stationID", "time/6hours"])
        == "&orderByClosest(%22stationID%2Ctime%2F6hours%22)"
    )
    assert (
        eu.orderby_clause("orderByLimit", ["stationID", "10"])
        == "&orderByLimit(%22stationID%2C10%22)"
    )


def test_orderby_clause_rejects_unknown_and_empty():
    with pytest.raises(ValueError):
        eu.orderby_clause("orderByMedian", ["x"])
    with pytest.raises(ValueError):
        eu.orderby_clause("orderByMax", [])


def test_tabledap_url_with_orderby_suffix():
    url = eu.tabledap_url(
        SERVER,
        "ds",
        ["time", "sst", "stationID"],
        order_by=("orderByMax", ["stationID", "time"]),
    )
    assert url.endswith("&orderByMax(%22stationID%2Ctime%22)")
    # projection and clause coexist
    assert "?time%2Csst%2CstationID&orderByMax" in url


# ---------------------------------------------------------------------------
# operator semantics
# ---------------------------------------------------------------------------


def _frame(spark):
    rows = [
        # station, ts, val, id
        ("A", dt.datetime(2024, 1, 1, 0, 10), 5.0, 1),
        ("A", dt.datetime(2024, 1, 1, 5, 0), 9.0, 2),
        ("A", dt.datetime(2024, 1, 1, 7, 0), 9.0, 3),  # tie on val with id=2
        ("B", dt.datetime(2024, 1, 1, 2, 0), 1.0, 4),
        ("B", dt.datetime(2024, 1, 1, 3, 0), None, 5),
    ]
    return spark.createDataFrame(rows, "station string, ts timestamp, val double, id int")


def test_order_by_max_breaks_ties_on_carry(spark):
    out = orderby.order_by_max(_frame(spark), ["station"], "val", carry=["id"])
    got = {r["station"]: (r["val"], r["id"]) for r in out.collect()}
    # tie on val=9.0 -> larger id wins (struct lexicographic)
    assert got["A"] == (9.0, 3)
    assert got["B"] == (1.0, 4)  # null val never wins a max


def test_order_by_minmax_two_labelled_rows(spark):
    out = orderby.order_by_minmax(_frame(spark), ["station"], "ts", carry=["id"])
    rows = {(r["station"], r["extreme"]): r["id"] for r in out.collect()}
    assert rows[("A", "min")] == 1 and rows[("A", "max")] == 3
    assert rows[("B", "min")] == 4 and rows[("B", "max")] == 5


def test_order_by_count_nonnull(spark):
    out = orderby.order_by_count(
        _frame(spark).select("station", "val", "id"), ["station"]
    )
    got = {r["station"]: (r["val_count"], r["id_count"]) for r in out.collect()}
    assert got == {"A": (3, 3), "B": (1, 2)}  # B's null val not counted


def test_order_by_limit_requires_order_and_keeps_first_n(spark):
    from pyspark.sql import functions as F

    with pytest.raises(ValueError):
        orderby.order_by_limit(_frame(spark), ["station"], 2)
    out = orderby.order_by_limit(
        _frame(spark), ["station"], 2, order=[F.col("ts"), F.col("id")]
    )
    got = sorted((r["station"], r["id"]) for r in out.collect())
    assert got == [("A", 1), ("A", 2), ("B", 4), ("B", 5)]


def test_order_by_closest_snaps_to_nearest_tick(spark):
    six_h = 6 * 3600 * 1_000_000
    out = orderby.order_by_closest(
        _frame(spark).select("station", "ts", "id"),
        ["station"],
        "ts",
        six_h,
        carry=["id"],
    )
    got = {(r["station"], r["tick"]): r["id"] for r in out.collect()}
    # A: 00:10 -> tick 00:00; 05:00 and 07:00 both snap to 06:00 at equal
    # 1h distance -> the tie breaks on the earlier ts (id 2)
    assert got[("A", dt.datetime(2024, 1, 1, 0, 0))] == 1
    assert got[("A", dt.datetime(2024, 1, 1, 6, 0))] == 2
    # B: 02:00 -> 00:00 (2h) vs 06:00 (4h) -> 00:00; 03:00 is equidistant
    # (3h both ways) -> shift-mod snap rounds half UP to 06:00
    assert got[("B", dt.datetime(2024, 1, 1, 0, 0))] == 4
    assert got[("B", dt.datetime(2024, 1, 1, 6, 0))] == 5


def test_order_by_closest_negative_epochs(spark):
    # pre-1970 timestamps carry negative epoch-µs; a sign-following `%`
    # would snap them one tick late (the reference decodes negative
    # epochs — das_client.py:195-204). pmod keeps the floor-mod snap.
    six_h = 6 * 3600 * 1_000_000
    df = spark.createDataFrame(
        [
            # 1960-01-01 00:10 -> tick 00:00 (same-day floor, not -1 tick)
            ("A", dt.datetime(1960, 1, 1, 0, 10), 1),
            # 1960-01-01 05:00 -> tick 06:00 (1h vs 5h)
            ("A", dt.datetime(1960, 1, 1, 5, 0), 2),
            # 1960-01-01 03:00 equidistant -> rounds half UP to 06:00
            ("B", dt.datetime(1960, 1, 1, 3, 0), 3),
        ],
        "station string, ts timestamp, id int",
    )
    out = orderby.order_by_closest(df, ["station"], "ts", six_h, carry=["id"])
    got = {(r["station"], r["tick"]): r["id"] for r in out.collect()}
    assert got == {
        ("A", dt.datetime(1960, 1, 1, 0, 0)): 1,
        ("A", dt.datetime(1960, 1, 1, 6, 0)): 2,
        ("B", dt.datetime(1960, 1, 1, 6, 0)): 3,
    }


def test_order_by_mean_and_sum(spark):
    out_m = orderby.order_by_mean(_frame(spark), ["station"], ["val"]).collect()
    got_m = {r["station"]: r["val_mean"] for r in out_m}
    # nulls are skipped by avg (B has one non-null val)
    assert got_m == {"A": round((5.0 + 9.0 + 9.0) / 3, 6), "B": 1.0}
    out_s = orderby.order_by_sum(_frame(spark), ["station"], ["val", "id"]).collect()
    got_s = {r["station"]: (r["val_sum"], r["id_sum"]) for r in out_s}
    assert got_s == {"A": (23.0, 6), "B": (1.0, 9)}


def test_order_by_min_ignores_null_order_values(spark):
    # ERDDAP orderByMin ignores missing values; struct ordering alone
    # would rank the NULL row smallest and return it (review finding)
    out = orderby.order_by_min(_frame(spark), ["station"], "val", carry=["id"])
    got = {r["station"]: (r["val"], r["id"]) for r in out.collect()}
    assert got["B"] == (1.0, 4)  # not the null row (id=5)
    mm = orderby.order_by_minmax(_frame(spark), ["station"], "val", carry=["id"])
    rows = {(r["station"], r["extreme"]): r["id"] for r in mm.collect()}
    assert rows[("B", "min")] == 4 and rows[("B", "max")] == 4
