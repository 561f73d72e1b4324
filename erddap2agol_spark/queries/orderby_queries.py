"""ERDDAP tabledap ``orderBy*`` reductions, graded (round 4).

Protocol parity: tabledap servers the reference targets accept server-side
grouped reductions (``&orderByMax("stationID,time")``,
``&orderByClosest("stationID,time/6hours")``, ...). URL emission lives in
``sources/erddap_url.py``; the engine-side semantics live in
``operators/orderby.py``. Each variant is graded here over the events
table. Physical shapes: the argmax/argmin family is ONE hash aggregate
(max/min of a packed struct — deterministic lexicographic tie-break, never
a window); orderByLimit is the one window form, and it is partitioned.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import orderby
from ..sources.tables import load_table
from . import register


@register(
    "orderby_max_value",
    oracle="""
    SELECT event_type, value, event_id, ts FROM (
      SELECT event_type, value, event_id, CAST(ts AS TIMESTAMP) AS ts,
             row_number() OVER (
               PARTITION BY event_type
               ORDER BY value DESC, event_id DESC, ts DESC
             ) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    doc="orderByMax('event_type,value'): per type, the whole row where "
    "value peaks. Argmax-by-struct — one hash aggregate "
    "max(struct(value, event_id, ts)) with map-side combine; ties on "
    "value break deterministically on event_id (unique), mirrored in the "
    "oracle's ORDER BY chain. The oracle needs a window; the Spark plan "
    "does not.",
)
def orderby_max_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "event_id", "ts"
    )
    return orderby.order_by_max(
        ev, ["event_type"], "value", carry=["event_id", "ts"]
    )


@register(
    "orderby_minmax_ts",
    oracle="""
    SELECT event_type, 'min' AS extreme, CAST(ts AS TIMESTAMP) AS ts,
           event_id, value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY event_type
        ORDER BY CAST(ts AS TIMESTAMP), event_id, value
      ) AS rn FROM events
    ) WHERE rn = 1
    UNION ALL
    SELECT event_type, 'max' AS extreme, CAST(ts AS TIMESTAMP) AS ts,
           event_id, value
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY event_type
        ORDER BY CAST(ts AS TIMESTAMP) DESC, event_id DESC, value DESC
      ) AS rn FROM events
    ) WHERE rn = 1
    """,
    doc="orderByMinMax('event_type,time'): first and last row per type. "
    "ONE aggregate computes both packed extremes in a single scan and "
    "shuffle, then a 2-element explode splits min/max into labelled rows "
    "— vs the oracle's two window passes.",
)
def orderby_minmax_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts", "event_id", "value"
    )
    return orderby.order_by_minmax(
        ev, ["event_type"], "ts", carry=["event_id", "value"]
    )


@register(
    "orderby_count_cols",
    oracle="""
    SELECT event_type,
           count(event_id) AS event_id_count,
           count(ts) AS ts_count,
           count(user_id) AS user_id_count,
           count(value) AS value_count
    FROM events GROUP BY event_type
    """,
    doc="orderByCount('event_type'): per group, the non-null count of "
    "every other projected variable — one grouped aggregate, partial "
    "counts combined map-side.",
)
def orderby_count_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", "ts", "user_id", "value"
    )
    return orderby.order_by_count(ev, ["event_type"])


@register(
    "orderby_limit_first5",
    oracle="""
    SELECT user_id, ts, event_id, event_type FROM (
      SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type,
             row_number() OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
             ) AS rn
      FROM events
    ) WHERE rn <= 5
    """,
    doc="orderByLimit('user_id,5'): the first 5 events of every user in "
    "time order (event_id tie-break). Partitioned window row_number — "
    "each user sorts inside its hash partition; no global order exists "
    "in the plan.",
)
def orderby_limit_first5(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return orderby.order_by_limit(
        ev, ["user_id"], 5, order=[F.col("ts"), F.col("event_id")]
    )


_SIX_H_US = 6 * 3600 * 1_000_000


@register(
    "orderby_closest_6h",
    oracle=f"""
    WITH snapped AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id,
             (epoch_us(CAST(ts AS TIMESTAMP)) + {_SIX_H_US // 2})
               - ((((epoch_us(CAST(ts AS TIMESTAMP)) + {_SIX_H_US // 2})
                  % {_SIX_H_US}) + {_SIX_H_US}) % {_SIX_H_US}) AS tick_us
      FROM events
    )
    SELECT event_type, make_timestamp(tick_us) AS tick, ts, event_id FROM (
      SELECT *, row_number() OVER (
        PARTITION BY event_type, tick_us
        ORDER BY abs(epoch_us(ts) - tick_us), ts, event_id
      ) AS rn FROM snapped
    ) WHERE rn = 1
    """,
    doc="orderByClosest('event_type,time/6hours'): per type and 6-hour "
    "tick, the row nearest the tick. The tick is integer-exact column "
    "math per row (shift-mod snap — no double division at boundaries, no "
    "grid table to join); one hash aggregate on (type, tick) with "
    "argmin-by-struct on the distance.",
)
def orderby_closest_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "ts", "event_id")
    return orderby.order_by_closest(
        ev, ["event_type"], "ts", _SIX_H_US, carry=["event_id"]
    )


@register(
    "orderby_mean_value",
    oracle="""
    SELECT event_type, round(avg(value), 6) AS value_mean
    FROM events GROUP BY event_type
    """,
    doc="orderByMean('event_type,value'): per-group means — one hash "
    "aggregate with map-side combine, rounded so cross-engine summation "
    "order can't flip a bit. Completes the graded orderBy* protocol "
    "family (URL clause: &orderByMean(%22event_type%2Cvalue%22)).",
)
def orderby_mean_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return orderby.order_by_mean(ev, ["event_type"], ["value"])


@register(
    "orderby_sum_value",
    oracle="""
    SELECT event_type, round(sum(value), 6) AS value_sum
    FROM events GROUP BY event_type
    """,
    doc="orderBySum('event_type,value'): per-group sums — the same "
    "one-aggregate shape as orderByMean.",
)
def orderby_sum_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    return orderby.order_by_sum(ev, ["event_type"], ["value"])
