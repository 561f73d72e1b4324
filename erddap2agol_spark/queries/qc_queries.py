"""Graded queries for the QARTOD-style QC battery (operators/qc.py).

The events table stands in for a station feed: ``user_id`` is the
station, ``ts`` the observation time, ``value`` the measurement.  Flags
are integers, so the oracle comparison is exact — the only float work is
inside threshold comparisons, which are identical scalar expressions on
both engines.

Every ``ts`` reference in the oracles goes through
``CAST(ts AS TIMESTAMP)`` (ns -> µs truncation; see queries/__init__
column-name discipline notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.qc import qc_battery
from ..sources.tables import load_table
from . import register

# Operator-provided limits chosen to exercise every flag branch on the
# synthetic feed (value ~ U[0, 500], median per-station step ~7 h).
_PARAMS = dict(
    gross_fail=(0.5, 450.0),
    gross_suspect=(2.0, 300.0),
    spike_fail=200.0,
    spike_suspect=100.0,
    flat_eps=0.5,
    flat_rep_suspect=2,
    flat_rep_fail=3,
    roc_max_per_sec=0.05,
    atten_n=5,
    atten_fail=5.0,
    atten_suspect=50.0,
)

_FLAG_SQL = """
    WITH e AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value FROM events
    ),
    f AS (
      SELECT event_id, user_id, ts, value,
        CASE WHEN value < 0.5 OR value > 450.0 THEN 4
             WHEN value < 2.0 OR value > 300.0 THEN 3 ELSE 1 END AS flag_gross,
        CASE WHEN lag(value) OVER w IS NULL OR lead(value) OVER w IS NULL THEN 2
             WHEN abs(value - (lag(value) OVER w + lead(value) OVER w) / 2.0) > 200.0
               THEN 4
             WHEN abs(value - (lag(value) OVER w + lead(value) OVER w) / 2.0) > 100.0
               THEN 3
             ELSE 1 END AS flag_spike,
        CASE WHEN lag(value, 2) OVER w IS NULL THEN 2
             WHEN lag(value, 3) OVER w IS NOT NULL
                  AND abs(value - lag(value, 1) OVER w) < 0.5
                  AND abs(value - lag(value, 2) OVER w) < 0.5
                  AND abs(value - lag(value, 3) OVER w) < 0.5 THEN 4
             WHEN abs(value - lag(value, 1) OVER w) < 0.5
                  AND abs(value - lag(value, 2) OVER w) < 0.5 THEN 3
             ELSE 1 END AS flag_flat,
        CASE WHEN lag(value) OVER w IS NULL THEN 2
             WHEN abs(value - lag(value) OVER w) >
                  0.05 * ((epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1e6) THEN 3
             ELSE 1 END AS flag_roc,
        CASE WHEN count(value) OVER v5 < 5 THEN 2
             WHEN max(value) OVER v5 - min(value) OVER v5 < 5.0 THEN 4
             WHEN max(value) OVER v5 - min(value) OVER v5 < 50.0 THEN 3
             ELSE 1 END AS flag_atten
      FROM e
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id),
             v5 AS (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
    )
    SELECT event_id, user_id, flag_gross, flag_spike, flag_flat, flag_roc,
           flag_atten,
           CASE WHEN 4 IN (flag_gross, flag_spike, flag_flat, flag_roc, flag_atten)
                  THEN 4
                WHEN 3 IN (flag_gross, flag_spike, flag_flat, flag_roc, flag_atten)
                  THEN 3
                WHEN 1 IN (flag_gross, flag_spike, flag_flat, flag_roc, flag_atten)
                  THEN 1
                ELSE 2 END AS flag_primary
    FROM f
"""


def _battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    return qc_battery(
        ev, keys=["user_id"], ts_col="ts", id_col="event_id", value_col="value",
        **_PARAMS,
    )


@register(
    "qc_flags",
    oracle=_FLAG_SQL,
    doc="Five-test QARTOD battery + primary-flag rollup per observation; "
    "one shuffle on the station key (shared window spec).",
)
def qc_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _battery(spark, sf_dir).select(
        "event_id", "user_id", "flag_gross", "flag_spike", "flag_flat",
        "flag_roc", "flag_atten", "flag_primary",
    )


@register(
    "qc_station_summary",
    oracle=f"""
    WITH flags AS ({_FLAG_SQL})
    SELECT user_id,
           count(*) AS n_obs,
           count(*) FILTER (flag_primary = 4) AS n_fail,
           count(*) FILTER (flag_primary = 3) AS n_suspect,
           round(100.0 * (count(*) FILTER (flag_primary IN (3, 4))) / count(*), 4)
             AS pct_flagged
    FROM flags GROUP BY user_id
    """,
    doc="Per-station QC health report: observation/fail/suspect counts and "
    "flagged share — the battery's one shuffle feeds a map-side-combinable "
    "aggregation on the same key, so no second wide exchange at scale.",
)
def qc_station_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    flags = _battery(spark, sf_dir)
    return flags.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.count(F.when(F.col("flag_primary") == 4, 1)).alias("n_fail"),
        F.count(F.when(F.col("flag_primary") == 3, 1)).alias("n_suspect"),
        F.round(
            100.0
            * F.count(F.when(F.col("flag_primary").isin(3, 4), 1))
            / F.count(F.lit(1)),
            4,
        ).alias("pct_flagged"),
    )


@register(
    "robust_zscore_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ),
    dev AS (
      SELECT e.event_id, e.event_type, e.value, m.med,
             abs(e.value - m.med) AS adev
      FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT event_id, d.event_type,
           round(d.value, 6) AS value,
           round((d.value - d.med) / (1.4826 * NULLIF(mm.mad, 0)), 6) AS rz
    FROM dev d JOIN mad mm ON d.event_type = mm.event_type
    WHERE abs(round((d.value - d.med) / (1.4826 * NULLIF(mm.mad, 0)), 6)) > 3.0
    """,
    doc="Robust z-score outliers per group: median/MAD instead of "
    "mean/stddev, so the threshold itself is immune to the outliers it "
    "hunts (QARTOD gross-range's adaptive cousin). Two grouped exact "
    "medians (|groups|-row tables) broadcast back onto the stream of "
    "rows — the corpus shuffles zero times; flagging is a map. "
    "Zero-MAD groups (constant value) emit nothing by NULLIF design.",
)
def robust_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(F.percentile("value", F.lit(0.5)).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    rz = F.round(
        (F.col("value") - F.col("med"))
        / (F.lit(1.4826) * F.nullif(F.col("mad"), F.lit(0.0))),
        6,
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            rz.alias("rz"),
        )
        .where(F.abs(F.col("rz")) > 3.0)
    )


@register(
    "sensor_trend",
    oracle="""
    WITH x AS (
      SELECT user_id AS station_id,
             CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS DOUBLE) / 86400000000.0 AS t_days,
             value
      FROM events
    )
    SELECT station_id, count(*) AS n,
           round(covar_samp(t_days, value) / NULLIF(var_samp(t_days), 0), 6)
             AS slope_per_day,
           round(corr(t_days, value), 6) AS r
    FROM x
    GROUP BY station_id
    HAVING count(*) >= 3
    """,
    doc="Per-station OLS drift detection in ONE aggregate pass: slope = "
    "cov(t, v)/var(t) and Pearson r from the covariance family of "
    "combinable aggregates — no window, no sort, no per-group fitting "
    "loop; 100 TB of telemetry reduces map-side to five moments per "
    "station. Time is rescaled to days BEFORE aggregating so the "
    "intermediate sums stay far from double precision edges.",
)
def sensor_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.datetimes import epoch_us

    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("station_id"),
        (epoch_us("ts").cast("double") / 86400000000.0).alias("t_days"),
        "value",
    )
    return (
        ev.groupBy("station_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.covar_samp("t_days", "value")
                / F.nullif(F.var_samp("t_days"), F.lit(0.0)),
                6,
            ).alias("slope_per_day"),
            F.round(F.corr("t_days", "value"), 6).alias("r"),
        )
        .where(F.col("n") >= 3)
    )
