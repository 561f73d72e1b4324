"""QARTOD-style automated QC tests for observational time series.

The reference ingests near-real-time ocean-observing feeds (ERDDAP
tabledap; SURVEY §2.9 ST1-ST5) whose upstream convention for flagging
sensor data is IOOS QARTOD — a published, public test battery (gross
range, spike, flat line, rate of change, attenuated signal) with the
standard flag vocabulary 1=pass, 2=not evaluated, 3=suspect, 4=fail.
This module implements those tests as pure DataFrame column algebra so a
QC pass over 100 TB of sensor history is ONE shuffle:

Scale shape: every test is either per-row (gross range — no shuffle at
all, evaluated inside the scan's codegen stage) or a window over the
SAME spec ``PARTITION BY station ORDER BY ts, id``.  Catalyst collapses
window functions that share a spec into a single WindowExec, so the
whole battery costs one hash-partition-by-station + one per-partition
sort, regardless of how many tests run.  No test ever looks across
stations, so skewed stations split cleanly under AQE and the battery
scales linearly in rows.

Thresholds are caller-supplied (QARTOD calls them "operator-provided
limits"); flags are integers, so cross-engine comparison is exact.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, WindowSpec
from pyspark.sql import functions as F

from ..functions.datetimes import epoch_us

PASS, NOT_EVAL, SUSPECT, FAIL = 1, 2, 3, 4


def _series_window(keys: Sequence[str], ts_col: str, id_col: str) -> WindowSpec:
    return Window.partitionBy(*keys).orderBy(ts_col, id_col)


def gross_range_flag(
    value: Column,
    fail_span: tuple[float, float],
    suspect_span: tuple[float, float],
) -> Column:
    """Per-row range check: outside ``fail_span`` -> 4, outside
    ``suspect_span`` -> 3, else 1.  No window — stays in the scan stage."""
    return (
        F.when((value < fail_span[0]) | (value > fail_span[1]), F.lit(FAIL))
        .when((value < suspect_span[0]) | (value > suspect_span[1]), F.lit(SUSPECT))
        .otherwise(F.lit(PASS))
    )


def spike_flag(
    value: Column, w: WindowSpec, fail_thr: float, suspect_thr: float
) -> Column:
    """Deviation from the neighbor midpoint ``|v - (prev+next)/2|``.
    Series endpoints (no neighbor on one side) -> 2 (not evaluated)."""
    prev, nxt = F.lag(value).over(w), F.lead(value).over(w)
    dev = F.abs(value - (prev + nxt) / F.lit(2.0))
    return (
        F.when(prev.isNull() | nxt.isNull(), F.lit(NOT_EVAL))
        .when(dev > fail_thr, F.lit(FAIL))
        .when(dev > suspect_thr, F.lit(SUSPECT))
        .otherwise(F.lit(PASS))
    )


def flat_line_flag(
    value: Column, w: WindowSpec, eps: float, rep_suspect: int, rep_fail: int
) -> Column:
    """Stuck-sensor check: the previous ``rep_fail`` values all within
    ``eps`` of the current value -> 4; the previous ``rep_suspect`` -> 3.
    Rows with fewer than ``rep_suspect`` predecessors -> 2.  Implemented as ``rep_fail`` lag
    columns over the shared window — still the one sort, no self-join."""
    near = [F.abs(value - F.lag(value, i).over(w)) < eps for i in range(1, rep_fail + 1)]
    have = [F.lag(value, i).over(w).isNotNull() for i in range(1, rep_fail + 1)]

    def _all(cols: list[Column]) -> Column:
        out = cols[0]
        for c in cols[1:]:
            out = out & c
        return out

    return (
        F.when(~_all(have[:rep_suspect]), F.lit(NOT_EVAL))
        .when(_all(have) & _all(near), F.lit(FAIL))
        .when(_all(near[:rep_suspect]), F.lit(SUSPECT))
        .otherwise(F.lit(PASS))
    )


def rate_of_change_flag(
    value: Column, ts: Column, w: WindowSpec, max_per_sec: float
) -> Column:
    """|dv/dt| against an operator limit (units/second) -> 3 (QARTOD's
    rate test only escalates to suspect).  First row per series -> 2.

    Compared in product form ``dv > limit * dt`` so a zero time step
    (duplicate timestamps) degrades to "any change is suspect" instead of
    a division-by-zero whose Inf/NaN semantics differ across engines."""
    dv = F.abs(value - F.lag(value).over(w))
    dt = (epoch_us(ts) - F.lag(epoch_us(ts)).over(w)) / F.lit(1e6)
    return (
        F.when(F.lag(value).over(w).isNull(), F.lit(NOT_EVAL))
        .when(dv > F.lit(max_per_sec) * dt, F.lit(SUSPECT))
        .otherwise(F.lit(PASS))
    )


def attenuated_signal_flag(
    value: Column, w: WindowSpec, n: int, min_var_fail: float, min_var_suspect: float
) -> Column:
    """Dying-sensor check: the range (max-min) of the trailing ``n``-row
    frame below ``min_var_fail`` -> 4, below ``min_var_suspect`` -> 3;
    frames with fewer than ``n`` rows -> 2."""
    frame = w.rowsBetween(-(n - 1), 0)
    rng = F.max(value).over(frame) - F.min(value).over(frame)
    cnt = F.count(value).over(frame)
    return (
        F.when(cnt < n, F.lit(NOT_EVAL))
        .when(rng < min_var_fail, F.lit(FAIL))
        .when(rng < min_var_suspect, F.lit(SUSPECT))
        .otherwise(F.lit(PASS))
    )


def rollup_flag(*flags: Column) -> Column:
    """QARTOD primary-flag aggregation: any 4 -> 4, else any 3 -> 3,
    else any 1 -> 1, else 2 (nothing was evaluable)."""
    def any_of(v: int) -> Column:
        out = flags[0] == v
        for c in flags[1:]:
            out = out | (c == v)
        return out

    return (
        F.when(any_of(FAIL), F.lit(FAIL))
        .when(any_of(SUSPECT), F.lit(SUSPECT))
        .when(any_of(PASS), F.lit(PASS))
        .otherwise(F.lit(NOT_EVAL))
    )


def qc_battery(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    *,
    gross_fail: tuple[float, float],
    gross_suspect: tuple[float, float],
    spike_fail: float,
    spike_suspect: float,
    flat_eps: float,
    flat_rep_suspect: int,
    flat_rep_fail: int,
    roc_max_per_sec: float,
    atten_n: int,
    atten_fail: float,
    atten_suspect: float,
) -> DataFrame:
    """Run the full five-test battery and the primary-flag rollup.

    Emits the input columns plus ``flag_gross/spike/flat/roc/atten`` and
    ``flag_primary`` — all int flags.  One shuffle total (see module
    docstring)."""
    w = _series_window(keys, ts_col, id_col)
    v, ts = F.col(value_col), F.col(ts_col)
    out = df.select(
        *df.columns,
        gross_range_flag(v, gross_fail, gross_suspect).alias("flag_gross"),
        spike_flag(v, w, spike_fail, spike_suspect).alias("flag_spike"),
        flat_line_flag(v, w, flat_eps, flat_rep_suspect, flat_rep_fail).alias(
            "flag_flat"
        ),
        rate_of_change_flag(v, ts, w, roc_max_per_sec).alias("flag_roc"),
        attenuated_signal_flag(v, w, atten_n, atten_fail, atten_suspect).alias(
            "flag_atten"
        ),
    )
    return out.withColumn(
        "flag_primary",
        rollup_flag(
            F.col("flag_gross"),
            F.col("flag_spike"),
            F.col("flag_flat"),
            F.col("flag_roc"),
            F.col("flag_atten"),
        ),
    )
