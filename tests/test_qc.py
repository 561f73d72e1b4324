"""Unit tests for the QARTOD-style QC battery (operators/qc.py).

Each test builds a tiny synthetic station series that forces a specific
flag branch; the plan test asserts the whole battery costs ONE exchange
(all window functions share the partition-by-station spec).
"""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from erddap2agol_spark.operators.qc import qc_battery

_T0 = datetime(2024, 1, 1)


def _series(spark, values, step_s=60):
    rows = [
        (i, "st1", _T0 + timedelta(seconds=i * step_s), float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "id long, station string, ts timestamp, value double")


_PARAMS = dict(
    gross_fail=(0.0, 100.0),
    gross_suspect=(10.0, 90.0),
    spike_fail=30.0,
    spike_suspect=15.0,
    flat_eps=0.01,
    flat_rep_suspect=2,
    flat_rep_fail=3,
    roc_max_per_sec=0.5,
    atten_n=3,
    atten_fail=0.5,
    atten_suspect=2.0,
)


def _run(spark, values, step_s=60):
    df = qc_battery(
        _series(spark, values, step_s),
        keys=["station"], ts_col="ts", id_col="id", value_col="value",
        **_PARAMS,
    )
    return {r["id"]: r.asDict() for r in df.collect()}


def test_gross_range_branches(spark):
    got = _run(spark, [50, 5, 95, -1, 101])
    assert got[0]["flag_gross"] == 1
    assert got[1]["flag_gross"] == 3  # below suspect_min
    assert got[2]["flag_gross"] == 3  # above suspect_max
    assert got[3]["flag_gross"] == 4  # below fail_min
    assert got[4]["flag_gross"] == 4  # above fail_max


def test_spike_branches(spark):
    # midpoints: id1 ref=(50+50)/2 -> dev 20 (suspect); id3 ref=50 -> dev 40 (fail)
    got = _run(spark, [50, 70, 50, 90, 50])
    assert got[0]["flag_spike"] == 2  # left endpoint
    assert got[1]["flag_spike"] == 3
    assert got[2]["flag_spike"] == 3  # |50 - (70+90)/2| = 30, not > fail thr
    assert got[3]["flag_spike"] == 4  # |90-50|=40 > 30
    assert got[4]["flag_spike"] == 2  # right endpoint


def test_flat_line_branches(spark):
    got = _run(spark, [20, 20.001, 20.002, 20.003, 50])
    assert got[0]["flag_flat"] == 2  # no history
    assert got[1]["flag_flat"] == 2  # only one predecessor
    assert got[2]["flag_flat"] == 3  # two near predecessors, no third
    assert got[3]["flag_flat"] == 4  # three near predecessors
    assert got[4]["flag_flat"] == 1  # jumped away


def test_rate_of_change_and_zero_dt(spark):
    got = _run(spark, [10, 15, 80], step_s=60)  # limit 0.5/s * 60s = 30
    assert got[0]["flag_roc"] == 2
    assert got[1]["flag_roc"] == 1  # dv=5 <= 30
    assert got[2]["flag_roc"] == 3  # dv=65 > 30
    # duplicate timestamps: product form flags any change as suspect
    dup = _run(spark, [10, 20], step_s=0)
    assert dup[1]["flag_roc"] == 3


def test_attenuated_signal_branches(spark):
    got = _run(spark, [10, 10.1, 10.2, 11, 30])
    assert got[0]["flag_atten"] == 2  # frame not full
    assert got[1]["flag_atten"] == 2
    assert got[2]["flag_atten"] == 4  # range 0.2 < 0.5
    assert got[3]["flag_atten"] == 3  # range 1.0 < 2.0
    assert got[4]["flag_atten"] == 1  # range 20


def test_primary_rollup_worst_wins(spark):
    got = _run(spark, [50, 5, -1])
    # id2: gross fail -> primary 4 regardless of other passes
    assert got[2]["flag_primary"] == 4
    assert got[1]["flag_primary"] >= 3


def test_battery_is_single_exchange(spark):
    df = qc_battery(
        _series(spark, [1.0] * 10),
        keys=["station"], ts_col="ts", id_col="id", value_col="value",
        **_PARAMS,
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_stations_are_independent(spark):
    a = _series(spark, [10, 10.001, 10.002, 10.003])
    b = a.withColumn("station", F.lit("st2")).withColumn("id", F.col("id") + 100)
    df = qc_battery(
        a.unionByName(b),
        keys=["station"], ts_col="ts", id_col="id", value_col="value",
        **_PARAMS,
    )
    rows = {r["id"]: r["flag_flat"] for r in df.collect()}
    # same pattern in both stations -> same flags; station b's history
    # never contaminates station a's edge rows
    assert rows[0] == rows[100] == 2
    assert rows[3] == rows[103] == 4
