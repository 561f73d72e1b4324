"""Graded queries for regular-grid resampling (operators/timeseries.py).

Grid arithmetic is integer microseconds end-to-end (epoch_us, modulo
alignment, integer sequence/generate_series), so grid points are
bit-identical across engines; the LOCF value is a carried copy, never a
float computation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.timeseries import (
    anomaly_join,
    climatology,
    ewma,
    gap_stats,
    resample_locf,
)
from ..sources.tables import load_table
from . import register

_DAY_US = 86_400_000_000
_MAX_GAP_S = 21_600  # 6 h


@register(
    "resample_daily_locf",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us, value
      FROM events
    ),
    b AS (SELECT user_id, min(t_us) AS mn, max(t_us) AS mx FROM e GROUP BY user_id),
    g AS (
      SELECT user_id,
             unnest(generate_series(
               (mn + {_DAY_US - 1}) - ((((mn + {_DAY_US - 1}) % {_DAY_US}) + {_DAY_US}) % {_DAY_US}),
               mx, {_DAY_US})) AS t_us
      FROM b
      WHERE (mn + {_DAY_US - 1}) - ((((mn + {_DAY_US - 1}) % {_DAY_US}) + {_DAY_US}) % {_DAY_US}) <= mx
    ),
    u AS (
      SELECT user_id, t_us, 0 AS is_grid, event_id AS ord_id, value AS v FROM e
      UNION ALL
      SELECT user_id, t_us, 1, NULL, NULL FROM g
    ),
    f AS (
      SELECT user_id, t_us, is_grid,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY t_us, is_grid, coalesce(ord_id, 0)
               ROWS UNBOUNDED PRECEDING) AS value
      FROM u
    )
    SELECT user_id, make_timestamp(t_us) AS grid_ts, value
    FROM f WHERE is_grid = 1
    """,
    doc="Daily regular grid per station, LOCF-filled via the union+window "
    "trick: one shuffle on the key, grid points generated (not stored), "
    "no as-of join. The tabular regridding half of griddap semantics.",
)
def resample_daily_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    return resample_locf(
        ev, keys=["user_id"], ts_col="ts", id_col="event_id",
        value_col="value", step_s=86_400,
    )


@register(
    "sampling_gap_stats",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us
      FROM events
    ),
    gp AS (
      SELECT user_id,
             t_us - lag(t_us) OVER (PARTITION BY user_id
                                    ORDER BY t_us, event_id) AS gap_us
      FROM e
    )
    SELECT user_id, count(*) AS n_obs,
           floor(quantile_cont(gap_us, 0.5) + 0.5) / 1e6 AS median_step_s,
           round(max(gap_us) / 1e6, 6) AS max_gap_s,
           count(*) FILTER (gap_us > {_MAX_GAP_S * 1_000_000}) AS n_long_gaps
    FROM gp GROUP BY user_id
    """,
    doc="Per-station sampling-health report (median step, largest gap, "
    "long-gap count) — the diagnostic that says whether LOCF output is "
    "trustworthy. One window + one same-key aggregation.",
)
def sampling_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    out = gap_stats(
        ev, keys=["user_id"], ts_col="ts", id_col="event_id", max_gap_s=_MAX_GAP_S
    )
    return out.select(
        "user_id",
        "n_obs",
        "median_step_s",
        F.round("max_gap_s", 6).alias("max_gap_s"),
        "n_long_gaps",
    )


@register(
    "ewma_value",
    oracle="""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t,
             CAST(value AS DOUBLE) AS x
      FROM events
    ),
    f AS (
      SELECT user_id, event_id,
             list({'t': t, 'i': event_id, 'x': x}) OVER (
               PARTITION BY user_id ORDER BY t, event_id
               ROWS BETWEEN 19 PRECEDING AND CURRENT ROW) AS frame
      FROM e
    )
    SELECT user_id, event_id,
           round(list_reduce(
             list_transform(list_sort(frame), r -> r.x),
             (acc, x) -> CAST(0.3 AS DOUBLE) * x
                         + CAST(0.7 AS DOUBLE) * acc), 6) AS ewma
    FROM f
    """,
    doc="Per-station EWMA over the last 20 observations — sequential "
    "state no plain SQL window aggregate expresses. The frame is "
    "collected in ONE bounded window, sort-pinned, and left-folded "
    "(s -> a*x + (1-a)*s) with the oldest element as the seed, so the "
    "float result is bit-identical across engines (same pinned-fold "
    "trick as the BM25 scorer). One key-hash shuffle, O(span) state "
    "per row.",
)
def ewma_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    out = ewma(
        ev, keys=["user_id"], ts_col="ts", id_col="event_id",
        value_col="value", alpha=0.3, span_rows=20,
    )
    return out.select("user_id", "event_id", F.round("ewma", 6).alias("ewma"))


@register(
    "climatology_anomaly",
    oracle="""
    WITH e AS (
      SELECT event_id, event_type,
             CAST(month(CAST(ts AS TIMESTAMP)) AS INTEGER) AS month, value
      FROM events
    ),
    c AS (
      SELECT event_type, month, avg(value) AS m, count(*) AS clim_n
      FROM e GROUP BY event_type, month
    )
    SELECT e.event_id, e.event_type, e.month, e.value,
           round(c.m, 6) AS clim_mean,
           round(e.value - c.m, 6) AS anomaly, c.clim_n
    FROM e JOIN c ON e.event_type = c.event_type AND e.month = c.month
    """,
    doc="Month-of-year climatology per sensor type and the anomaly of "
    "every observation against it — the canonical oceanographic product "
    "over ERDDAP-style series. The climatology is one map-side-combinable "
    "aggregation (<= 12 rows per type) broadcast back onto the "
    "observations: the fact table never shuffles.",
)
def climatology_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    )
    clim = climatology(ev, keys=["event_type"], ts_col="ts", value_col="value")
    out = anomaly_join(
        ev, clim, keys=["event_type"], ts_col="ts", value_col="value"
    )
    return out.select(
        "event_id", "event_type", "month", "value",
        F.round("clim_mean", 6).alias("clim_mean"),
        F.round("anomaly", 6).alias("anomaly"),
        "clim_n",
    )


@register(
    "rolling_weekly_active_users",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS d
      FROM events
    ),
    spine AS (SELECT DISTINCT d FROM ud),
    contrib AS (
      SELECT user_id, CAST(d + CAST(o AS INTEGER) AS DATE) AS wday
      FROM ud, unnest(generate_series(0, 6)) AS t(o)
    )
    SELECT s.d AS day, count(DISTINCT c.user_id) AS wau
    FROM spine s JOIN contrib c ON c.wday = s.d
    GROUP BY s.d
    ORDER BY s.d
    """,
    doc="Rolling 7-day distinct users per day (WAU). COUNT(DISTINCT) "
    "over a sliding RANGE frame is not window-expressible in either "
    "engine, so the sliding window becomes a CONTRIBUTION explode: "
    "each (user, active-day) pair feeds the 7 window-end days it "
    "belongs to, then one distinct aggregate per day. The explode is a "
    "fixed x7 on the (user, day) DISTINCT pairs — already collapsed "
    "far below event volume — and the day spine keeps output to "
    "observed days. The standard scale answer to sliding distinct "
    "counts (swap in HLL registers per day for the approximate form).",
)
def rolling_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    spine = ud.select("d").distinct()
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("d"), F.date_add(F.col("d"), 6))).alias("wday"),
    )
    return (
        spine.join(contrib, spine["d"] == contrib["wday"])
        .groupBy(spine["d"].alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
        .orderBy("day")
    )


@register(
    "interval_overlap_counts",
    oracle="""
    WITH a AS (
      SELECT o_orderkey AS a_id,
             datediff('day', DATE '1970-01-01', o_orderdate) AS lo_a,
             datediff('day', DATE '1970-01-01', o_orderdate)
               + o_orderkey % 7 + 1 AS hi_a
      FROM orders WHERE o_orderkey % 2 = 1
    ),
    b AS (
      SELECT o_orderkey AS b_id,
             datediff('day', DATE '1970-01-01', o_orderdate) AS lo_b,
             datediff('day', DATE '1970-01-01', o_orderdate)
               + o_orderkey % 5 + 1 AS hi_b
      FROM orders WHERE o_orderkey % 2 = 0
    )
    SELECT a_id, count(*) AS n_overlaps,
           min(b_id) AS first_b, max(b_id) AS last_b
    FROM a JOIN b ON lo_a < hi_b AND lo_b < hi_a
    GROUP BY a_id
    """,
    doc="Interval x interval overlap join (big-big range join): both "
    "sides explode to coarse calendar bins, pairs meet on a bin "
    "equi-join, and the anchor-bin residual (pair counted only in the "
    "bin holding the overlap's start) makes each pair emit exactly "
    "once with NO post-join dedup shuffle. The oracle is the plain "
    "theta join - DuckDB can afford it, Spark's plan must never "
    "contain it. Integer day arithmetic: bit-exact.",
)
def interval_overlap_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.joins import interval_overlap_join

    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    days = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    a = o.filter(F.col("o_orderkey") % 2 == 1).select(
        F.col("o_orderkey").alias("a_id"),
        days.alias("lo_a"),
        (days + F.col("o_orderkey") % 7 + 1).alias("hi_a"),
    )
    b = o.filter(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("b_id"),
        days.alias("lo_b"),
        (days + F.col("o_orderkey") % 5 + 1).alias("hi_b"),
    )
    pairs = interval_overlap_join(a, b, "lo_a", "hi_a", "lo_b", "hi_b", bin_width=8.0)
    return pairs.groupBy("a_id").agg(
        F.count(F.lit(1)).alias("n_overlaps"),
        F.min("b_id").alias("first_b"),
        F.max("b_id").alias("last_b"),
    )


@register(
    "wow_revenue_change",
    oracle="""
    WITH wk AS (
      SELECT CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS DATE) AS week,
             CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS revenue
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1
    )
    SELECT c.week, c.revenue,
           p.revenue AS prev_revenue,
           round((c.revenue - p.revenue) / p.revenue, 4) AS pct_change
    FROM wk c JOIN wk p ON c.week = p.week + INTERVAL 7 DAY
    """,
    doc="Week-over-week revenue change built the scale-honest way: "
    "weekly totals from one hash aggregate, then a SELF-JOIN on "
    "week = prev_week + 7 days instead of a lag over a global "
    "order-only window (the join is an equi-join on the week key; the "
    "window form would single-partition the series and trip the "
    "registry window audit). Revenue sums as exact decimals so "
    "cross-engine order cannot move a cent.",
)
def wow_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase"
    )
    wk = ev.groupBy(
        F.to_date(
            F.date_trunc("week", F.col("ts").cast("timestamp"))
        ).alias("week")
    ).agg(
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("revenue")
    )
    prev = wk.select(
        F.date_add(F.col("week"), 7).alias("week"),
        F.col("revenue").alias("prev_revenue"),
    )
    return wk.join(prev, "week").select(
        "week",
        "revenue",
        "prev_revenue",
        F.round(
            (F.col("revenue") - F.col("prev_revenue")) / F.col("prev_revenue"), 4
        ).alias("pct_change"),
    )


_HOUR_US = 3_600_000_000


@register(
    "interp_hourly_linear",
    oracle=f"""
    WITH e AS (
      SELECT event_id, user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
             CAST(value AS DOUBLE) AS v
      FROM events
    ),
    b AS (SELECT user_id, min(t_us) AS mn, max(t_us) AS mx FROM e GROUP BY user_id),
    g AS (
      SELECT user_id,
             unnest(generate_series(
               (mn + {_HOUR_US - 1}) - ((((mn + {_HOUR_US - 1}) % {_HOUR_US}) + {_HOUR_US}) % {_HOUR_US}),
               mx, {_HOUR_US})) AS t_us
      FROM b
      WHERE (mn + {_HOUR_US - 1}) - ((((mn + {_HOUR_US - 1}) % {_HOUR_US}) + {_HOUR_US}) % {_HOUR_US}) <= mx
    ),
    u AS (
      SELECT user_id, t_us, 0 AS is_grid, event_id AS ord_id, v FROM e
      UNION ALL
      SELECT user_id, t_us, 1, NULL, NULL FROM g
    ),
    f AS (
      SELECT user_id, t_us, is_grid,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY t_us, is_grid, coalesce(ord_id, 0)
               ROWS UNBOUNDED PRECEDING) AS prev_v,
             last_value(CASE WHEN v IS NOT NULL THEN t_us END IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY t_us, is_grid, coalesce(ord_id, 0)
               ROWS UNBOUNDED PRECEDING) AS prev_t,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY t_us DESC, is_grid DESC, coalesce(ord_id, 0) DESC
               ROWS UNBOUNDED PRECEDING) AS next_v,
             last_value(CASE WHEN v IS NOT NULL THEN t_us END IGNORE NULLS) OVER (
               PARTITION BY user_id
               ORDER BY t_us DESC, is_grid DESC, coalesce(ord_id, 0) DESC
               ROWS UNBOUNDED PRECEDING) AS next_t
      FROM u
    )
    SELECT user_id, make_timestamp(t_us) AS grid_ts,
           round(CASE WHEN prev_t IS NULL THEN next_v
                      WHEN next_t IS NULL THEN prev_v
                      WHEN t_us = prev_t THEN prev_v
                      ELSE prev_v + ((next_v - prev_v) * (t_us - prev_t))
                                    / (next_t - prev_t)
                 END, 6) AS value
    FROM f WHERE is_grid = 1
    """,
    doc="Hourly regular grid per station, LINEARLY interpolated — "
    "resample_locf's sibling for continuous instrument series. Same "
    "integer-microsecond epoch-aligned grid, clamped inside each key's "
    "observation span so both neighbours always exist; one partitioned "
    "window pass in each direction carries (prev, next) value+time with "
    "last...ignore nulls — no as-of self-join, no per-gap explode. The "
    "interpolation arithmetic is parenthesized identically in both "
    "engines and rounded to 6dp, so the hash is stable.",
)
def interp_hourly_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import interpolate_linear

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    return interpolate_linear(
        ev, keys=["user_id"], ts_col="ts", id_col="event_id",
        value_col="value", step_s=3_600,
    )


@register(
    "time_weighted_avg",
    oracle="""
    WITH e AS (
      SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
             CAST(value AS DOUBLE) AS v, event_id
      FROM events WHERE value IS NOT NULL
    ),
    seg AS (
      SELECT user_id, v,
             lead(v) OVER w AS v2,
             lead(t_us) OVER w - t_us AS dt
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)
    )
    SELECT user_id,
           round(sum((v + v2) * 0.5 * dt) / sum(dt), 6) AS twa,
           count(*) + 1 AS n_obs
    FROM seg WHERE dt IS NOT NULL AND dt > 0
    GROUP BY user_id
    """,
    doc="Time-weighted average per station (trapezoidal integration over "
    "irregular sampling) — the correct mean for unevenly sampled sensors, "
    "where the arithmetic mean over-weights burst periods. One partitioned "
    "lead window builds the segments, one hash aggregate integrates; "
    "zero-length segments (duplicate timestamps) contribute nothing and "
    "are excluded identically in both engines.",
)
def time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    from ..functions.datetimes import epoch_us

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "user_id",
            epoch_us("ts").alias("t_us"),
            F.col("value").cast("double").alias("v"),
            "event_id",
        )
    )
    w = Window.partitionBy("user_id").orderBy("t_us", "event_id")
    seg = ev.select(
        "user_id",
        "v",
        F.lead("v").over(w).alias("v2"),
        (F.lead("t_us").over(w) - F.col("t_us")).alias("dt"),
    ).filter(F.col("dt").isNotNull() & (F.col("dt") > 0))
    return seg.groupBy("user_id").agg(
        F.round(
            F.sum((F.col("v") + F.col("v2")) * 0.5 * F.col("dt")) / F.sum("dt"), 6
        ).alias("twa"),
        (F.count(F.lit(1)) + 1).alias("n_obs"),
    )


@register(
    "ohlc_daily_value",
    oracle="""
    WITH e AS (
      SELECT event_type,
             CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS day,
             epoch_us(CAST(ts AS TIMESTAMP)) AS t_us,
             event_id, CAST(value AS DOUBLE) AS v
      FROM events WHERE value IS NOT NULL
    ),
    r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY t_us, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, day
                                ORDER BY t_us DESC, event_id DESC) AS rn_d
      FROM e
    )
    SELECT event_type, day,
           max(CASE WHEN rn_a = 1 THEN v END) AS open,
           max(v) AS high, min(v) AS low,
           max(CASE WHEN rn_d = 1 THEN v END) AS close,
           count(*) AS n_obs,
           round(sum(v), 6) AS volume
    FROM r GROUP BY event_type, day
    """,
    doc="OHLC candlestick resample: per type and day, the first / max / "
    "min / last value. ONE hash aggregate — open and close are "
    "argmin/argmax-by-struct on (t_us, event_id) (deterministic "
    "tie-break on the unique id), never a window sort of the raw rows; "
    "high/low/volume ride in the same aggregate.",
)
def ohlc_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.datetimes import epoch_us

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    day = F.date_trunc("day", F.col("ts")).cast(
        ev.schema["ts"].dataType.simpleString()
    )
    t_us = epoch_us("ts")
    key = F.struct(t_us.alias("t"), F.col("event_id").alias("i"))
    v = F.col("value").cast("double")
    return (
        ev.select(
            "event_type",
            day.alias("day"),
            key.alias("k"),
            v.alias("v"),
        )
        .groupBy("event_type", "day")
        .agg(
            F.min(F.struct("k", "v")).getField("v").alias("open"),
            F.max("v").alias("high"),
            F.min("v").alias("low"),
            F.max(F.struct("k", "v")).getField("v").alias("close"),
            F.count(F.lit(1)).alias("n_obs"),
            F.round(F.sum("v"), 6).alias("volume"),
        )
    )
