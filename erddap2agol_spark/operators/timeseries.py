"""Regular-grid resampling for irregular time series (gap fill / LOCF).

The reference's griddap side serves data on regular coordinate grids
while tabledap feeds arrive irregularly (SURVEY §2.1 S6/S7); regridding
an irregular series onto a uniform time axis with
last-observation-carried-forward is the tabular half of that bridge —
and the standard feature-alignment step for training-data pipelines
(sensor streams -> fixed-rate model inputs).

Scale shape — the union+window trick, no as-of join:

1. per-key bounds are one map-side-combinable aggregation;
2. grid timestamps come from ``sequence()`` on integer microseconds
   (generated, not stored — the grid never shuffles as data);
3. grid rows union with observations and ONE window per key ordered by
   (ts, is_grid, id) carries the last non-null value forward.

Total cost: one shuffle on the key — same as any per-key window — and
the output is exactly the grid rows.  An as-of join formulation would
shuffle both sides and build a range join; this is strictly cheaper
and AQE-splittable per key.

Integer-only grid arithmetic (epoch µs, modulo alignment, integer
``sequence``) keeps every grid point bit-identical in any engine; no
float epoch math anywhere.
"""

from __future__ import annotations

from collections.abc import Sequence as Seq

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.datetimes import epoch_us


def resample_locf(
    df: DataFrame,
    keys: Seq[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    step_s: int,
) -> DataFrame:
    """Per-key regular grid at ``step_s`` seconds, LOCF-filled.

    The grid is aligned to epoch multiples of the step and starts at the
    first aligned point AT or AFTER each key's first observation, so
    every emitted point has at least one preceding observation (no
    leading-null rows).  Ties at a grid instant resolve to the
    observation (is_grid sorts after), and duplicate-timestamp
    observations break ties on ``id_col`` — fully deterministic.

    Emits ``(*keys, grid_ts, value)``.
    """
    step_us = step_s * 1_000_000
    us = epoch_us(ts_col)

    bounds = df.groupBy(*keys).agg(
        F.min(us).alias("mn_us"), F.max(us).alias("mx_us")
    )
    # ceil-align with pure integer ops: q = mn + step - 1; lo = q - pmod(q,
    # step). Floor-mod, not `%`: Spark's % follows the dividend sign, which
    # snaps pre-1970 (negative-epoch) series one step late and silently
    # drops their first aligned grid point (review r5 — the same bug class
    # fixed in order_by_closest).
    q = F.col("mn_us") + F.lit(step_us - 1)
    grid = (
        bounds.withColumn("lo_us", q - F.pmod(q, F.lit(step_us)))
        .filter(F.col("lo_us") <= F.col("mx_us"))
        .select(
            *keys,
            F.explode(
                F.sequence("lo_us", "mx_us", F.lit(step_us))
            ).alias("t_us"),
        )
        .select(
            *keys,
            "t_us",
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("long").alias("ord_id"),
            F.lit(None).cast(df.schema[value_col].dataType).alias("v"),
        )
    )
    obs = df.select(
        *keys,
        us.alias("t_us"),
        F.lit(0).alias("is_grid"),
        F.col(id_col).cast("long").alias("ord_id"),
        F.col(value_col).alias("v"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("t_us", "is_grid", F.coalesce(F.col("ord_id"), F.lit(0)))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = obs.unionByName(grid).withColumn(
        "value", F.last("v", ignorenulls=True).over(w)
    )
    # grid_ts carries the INPUT column's timestamp flavor: timestamp_micros
    # always builds LTZ, and a collected LTZ renders in the client's local
    # zone (py4j uses the machine tz, not the session tz) — an NTZ input
    # must yield an NTZ grid or the output shifts on non-UTC drivers
    grid_ts = F.timestamp_micros(F.col("t_us"))
    ts_flavor = df.schema[ts_col].dataType.simpleString()
    if ts_flavor != "timestamp":
        grid_ts = grid_ts.cast(ts_flavor)  # LTZ->NTZ under the pinned-UTC session
    return filled.filter(F.col("is_grid") == 1).select(
        *keys, grid_ts.alias("grid_ts"), "value"
    )


def interpolate_linear(
    df: DataFrame,
    keys: Seq[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    step_s: int,
) -> DataFrame:
    """Per-key regular grid at ``step_s`` seconds, LINEARLY interpolated —
    the sibling of :func:`resample_locf` for instrument series where a
    step function misrepresents the physics (temperature, salinity).

    Same integer-microsecond grid (epoch-aligned, first point at/after the
    key's first observation, last at/before its last), same deterministic
    tie-breaks. Each grid point takes
    ``prev_v + ((next_v - prev_v) * (t - prev_t)) / (next_t - prev_t)``
    from the nearest observations on either side; a grid point landing ON
    an observation copies it exactly.

    Boundary contract: the grid span is clamped to the key's first/last
    observation ROW — including null-valued observations (a null reading
    is still a timestamped sample, so it anchors the instrument's active
    span). A grid point inside the span with a non-null neighbour on only
    ONE side (leading/trailing null readings) takes that neighbour's
    value — one-sided nearest-neighbour fallback, mirrored in the oracle.
    Both neighbours are guaranteed only when the boundary observations
    are non-null.

    Physical shape: one union, ONE partitioned-window pass in each
    direction (prev / next carried with ``last ... ignore nulls``) — no
    self-join, no range join, no per-gap explode. Null observations are
    carried as non-values (skipped by the ignore-nulls scan) exactly like
    resample_locf.

    Emits ``(*keys, grid_ts, value)`` with the value rounded to 6dp so the
    float is cross-engine stable.
    """
    step_us = step_s * 1_000_000
    us = epoch_us(ts_col)

    bounds = df.groupBy(*keys).agg(
        F.min(us).alias("mn_us"), F.max(us).alias("mx_us")
    )
    # floor-mod ceil-align — see resample_locf for the negative-epoch why
    q = F.col("mn_us") + F.lit(step_us - 1)
    grid = (
        bounds.withColumn("lo_us", q - F.pmod(q, F.lit(step_us)))
        .filter(F.col("lo_us") <= F.col("mx_us"))
        .select(
            *keys,
            F.explode(F.sequence("lo_us", "mx_us", F.lit(step_us))).alias("t_us"),
        )
        .select(
            *keys,
            "t_us",
            F.lit(1).alias("is_grid"),
            F.lit(None).cast("long").alias("ord_id"),
            F.lit(None).cast("double").alias("v"),
        )
    )
    obs = df.select(
        *keys,
        us.alias("t_us"),
        F.lit(0).alias("is_grid"),
        F.col(id_col).cast("long").alias("ord_id"),
        F.col(value_col).cast("double").alias("v"),
    )
    ordc = F.coalesce(F.col("ord_id"), F.lit(0))
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy("t_us", "is_grid", ordc)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_next = (
        Window.partitionBy(*keys)
        .orderBy(F.desc("t_us"), F.desc("is_grid"), ordc.desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    obs_t = F.when(F.col("v").isNotNull(), F.col("t_us"))
    u = (
        obs.unionByName(grid)
        .withColumn("prev_v", F.last("v", ignorenulls=True).over(w_prev))
        .withColumn("prev_t", F.last(obs_t, ignorenulls=True).over(w_prev))
        .withColumn("next_v", F.last("v", ignorenulls=True).over(w_next))
        .withColumn("next_t", F.last(obs_t, ignorenulls=True).over(w_next))
    )
    interp = (
        F.when(F.col("prev_t").isNull(), F.col("next_v"))
        .when(F.col("next_t").isNull(), F.col("prev_v"))
        .when(F.col("t_us") == F.col("prev_t"), F.col("prev_v"))
        .otherwise(
            F.col("prev_v")
            + (
                (F.col("next_v") - F.col("prev_v"))
                * (F.col("t_us") - F.col("prev_t"))
            )
            / (F.col("next_t") - F.col("prev_t"))
        )
    )
    grid_ts = F.timestamp_micros(F.col("t_us"))
    ts_flavor = df.schema[ts_col].dataType.simpleString()
    if ts_flavor != "timestamp":
        grid_ts = grid_ts.cast(ts_flavor)
    return u.filter(F.col("is_grid") == 1).select(
        *keys, grid_ts.alias("grid_ts"), F.round(interp, 6).alias("value")
    )


def ewma(
    df: DataFrame,
    keys: Seq[str],
    ts_col: str,
    id_col: str,
    value_col: str,
    alpha: float,
    span_rows: int,
) -> DataFrame:
    """Per-key exponentially weighted moving average over the last
    ``span_rows`` observations: the standard sensor-smoothing /
    feature-engineering primitive (EWMA is sequential state, which plain
    SQL window aggregates can't express).

    Determinism/scale shape: ONE bounded window per key collects the
    frame as (t, id, value) structs, ``array_sort`` pins the fold order
    (the same lexicographic struct sort both engines implement), and a
    left fold (``F.aggregate``) runs s -> alpha*x + (1-alpha)*s oldest
    to newest.  Because the fold ORDER is pinned and both engines fold
    left with the first element as the seed, the float result is
    bit-identical in any engine — same trick as the BM25 score fold
    (operators/search.py).  Frame size is bounded by ``span_rows``, so
    per-row state is O(span), never the whole key history, and the only
    shuffle is the window's hash on the key.

    Emits ``(*keys, id_col, ewma)`` — one row per observation.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_col, id_col)
        .rowsBetween(-(span_rows - 1), 0)
    )
    frame = F.collect_list(
        F.struct(
            epoch_us(ts_col).alias("t"),
            F.col(id_col).cast("long").alias("i"),
            F.col(value_col).cast("double").alias("x"),
        )
    ).over(w)
    vals = F.transform(F.array_sort(frame), lambda r: r["x"])
    a = F.lit(float(alpha))
    folded = F.aggregate(
        F.slice(vals, 2, span_rows),
        F.element_at(vals, 1),
        lambda acc, x: a * x + (F.lit(1.0) - a) * acc,
    )
    return df.select(*keys, F.col(id_col), folded.alias("ewma"))


def climatology(
    df: DataFrame, keys: Seq[str], ts_col: str, value_col: str
) -> DataFrame:
    """Month-of-year climatology per key: the oceanographic baseline
    aggregate (ERDDAP feeds are sensor series; anomaly-vs-climatology is
    the canonical downstream product).  A single map-side-combinable
    aggregation on (key, month) — at most 12x|keys| output rows, so the
    result broadcasts for the anomaly join no matter the input size.

    Emits ``(*keys, month, clim_mean, clim_n)``.
    """
    return (
        df.groupBy(*keys, F.month(F.col(ts_col)).alias("month"))
        .agg(
            F.avg(value_col).alias("clim_mean"),
            F.count(F.lit(1)).alias("clim_n"),
        )
    )


def anomaly_join(
    df: DataFrame,
    clim: DataFrame,
    keys: Seq[str],
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Anomaly = observation minus its (key, month) climatology.

    The climatology side is tiny by construction (<= 12 rows per key
    group), so the join is an explicit broadcast — observations never
    shuffle.  Emits the observation columns plus ``month``, ``clim_mean``
    and ``anomaly`` (both unrounded; callers round for cross-engine
    output).
    """
    obs = df.withColumn("month", F.month(F.col(ts_col)))
    j = obs.join(F.broadcast(clim), [*keys, "month"])
    return j.withColumn("anomaly", F.col(value_col) - F.col("clim_mean"))


def gap_stats(
    df: DataFrame, keys: Seq[str], ts_col: str, id_col: str, max_gap_s: int
) -> DataFrame:
    """Per-key sampling-health report: observation count, median step,
    largest gap, and the count of gaps exceeding ``max_gap_s`` — the
    diagnostic that decides whether LOCF output is trustworthy for a
    key.  One window + one aggregation on the same key."""
    w = Window.partitionBy(*keys).orderBy(ts_col, id_col)
    us = epoch_us(ts_col)
    gaps = df.select(*keys, (us - F.lag(us).over(w)).alias("gap_us"))
    # interpolate the median on INTEGER microseconds (both engines'
    # interpolation formulas are exact on integer endpoints; interpolating
    # on pre-divided doubles diverges in the last ulp), round the half-µs
    # midpoint with floor(x+0.5) — decimal round() hits exactly that
    # midpoint and engines disagree — then divide once
    return gaps.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_obs"),
        (
            F.floor(F.percentile(F.col("gap_us"), F.lit(0.5)) + F.lit(0.5))
            / F.lit(1e6)
        ).alias("median_step_s"),
        (F.max("gap_us") / F.lit(1e6)).alias("max_gap_s"),
        F.count(F.when(F.col("gap_us") > max_gap_s * 1_000_000, 1)).alias(
            "n_long_gaps"
        ),
    )
