"""ERDDAP tabledap ``orderBy*`` server-side reductions (protocol parity).

The reference compiles tabledap request URLs (src/data_wrangler.py:322-387)
against servers whose tabledap protocol accepts the ``orderBy*`` family of
server-side operators — ``&orderByMax("stationID,time")``,
``&orderByClosest("stationID,time/2hours")``, ``&orderByCount(...)``,
``&orderByLimit(...)``, ``&orderByMean(...)`` — each a grouped reduction the
server applies before shipping rows. A user pointing this engine at the same
datasets expects the same reductions, so each variant is implemented here as
a DataFrame operator with the Spark-native physical shape:

- ``orderByMax`` / ``Min`` / ``MinMax``: **argmax-by-struct** — one hash
  aggregate of ``max(struct(order_col, carry...))`` per group. Lexicographic
  struct comparison makes tie-breaking explicit and deterministic (ties on
  the order column fall through to the carried columns in order). One
  shuffle keyed on the group columns, map-side combinable — never a window,
  never a self-join.
- ``orderByClosest``: snap each row to its nearest time tick
  (``round(epoch / interval)`` — pure column math, no grid table to join),
  then per ``(group, tick)`` **argmin-by-struct** on the distance. Same
  single-aggregate shape; the tick grid never materializes.
- ``orderByCount`` / ``Mean`` / ``Sum``: plain grouped aggregates (non-null
  counts / means / sums of every carried column).
- ``orderByLimit``: first-N-per-group — a *partitioned* window
  ``row_number`` (scale-safe: each group sorts within its hash partition;
  there is no global order).

All functions take and return DataFrames lazily; nothing here triggers an
action.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _carry_cols(df: DataFrame, group: Sequence[str], exclude: Sequence[str]) -> list[str]:
    skip = set(group) | set(exclude)
    return [c for c in df.columns if c not in skip]


def _arg_extreme(
    df: DataFrame,
    group: Sequence[str],
    order_col: str,
    minimum: bool,
    carry: Sequence[str] | None = None,
) -> DataFrame:
    """One row per group: the row where ``order_col`` is extreme.

    ``struct`` comparison is lexicographic, so ties on ``order_col`` break
    deterministically on the carried columns in their listed order.
    """
    carry = list(carry) if carry is not None else _carry_cols(df, group, [order_col])
    # ERDDAP's orderByMin/Max ignore missing values; without this filter
    # Spark's struct ordering ranks a NULL first field SMALLEST and a
    # null-valued row would win every orderByMin
    df = df.filter(F.col(order_col).isNotNull())
    packed = F.struct(F.col(order_col), *[F.col(c) for c in carry])
    agg = F.min(packed) if minimum else F.max(packed)
    out = df.groupBy(*group).agg(agg.alias("_row"))
    return out.select(
        *group,
        F.col(f"_row.{order_col}").alias(order_col),
        *[F.col(f"_row.{c}").alias(c) for c in carry],
    )


def order_by_max(
    df: DataFrame,
    group: Sequence[str],
    order_col: str,
    carry: Sequence[str] | None = None,
) -> DataFrame:
    """``orderByMax("g1,...,order_col")``: per group, the row with the
    largest ``order_col``."""
    return _arg_extreme(df, group, order_col, minimum=False, carry=carry)


def order_by_min(
    df: DataFrame,
    group: Sequence[str],
    order_col: str,
    carry: Sequence[str] | None = None,
) -> DataFrame:
    """``orderByMin``: per group, the row with the smallest ``order_col``."""
    return _arg_extreme(df, group, order_col, minimum=True, carry=carry)


def order_by_minmax(
    df: DataFrame,
    group: Sequence[str],
    order_col: str,
    carry: Sequence[str] | None = None,
) -> DataFrame:
    """``orderByMinMax``: TWO rows per group — the min row and the max row,
    labelled by an ``extreme`` column ('min' / 'max').

    Physical shape: ONE aggregate computes both packed extremes (one scan,
    one shuffle), then a 2-element ``explode`` splits them into rows —
    never two scans unioned.
    """
    carry = list(carry) if carry is not None else _carry_cols(df, group, [order_col])
    # missing order values can never be an extreme (see _arg_extreme)
    df = df.filter(F.col(order_col).isNotNull())
    packed = F.struct(F.col(order_col), *[F.col(c) for c in carry])
    both = df.groupBy(*group).agg(
        F.min(packed).alias("_lo"), F.max(packed).alias("_hi")
    )
    pair = F.array(
        F.struct(F.lit("min").alias("extreme"), F.col("_lo").alias("row")),
        F.struct(F.lit("max").alias("extreme"), F.col("_hi").alias("row")),
    )
    ex = both.select(*group, F.explode(pair).alias("_e"))
    return ex.select(
        *group,
        F.col("_e.extreme").alias("extreme"),
        F.col(f"_e.row.{order_col}").alias(order_col),
        *[F.col(f"_e.row.{c}").alias(c) for c in carry],
    )


def order_by_count(df: DataFrame, group: Sequence[str]) -> DataFrame:
    """``orderByCount``: one row per group; each other column becomes its
    non-null count (ERDDAP counts non-NaN values per variable)."""
    carry = _carry_cols(df, group, [])
    return df.groupBy(*group).agg(
        *[F.count(F.col(c)).alias(f"{c}_count") for c in carry]
    )


def order_by_mean(
    df: DataFrame, group: Sequence[str], cols: Sequence[str], ndigits: int = 6
) -> DataFrame:
    """``orderByMean``: one row per group; each named numeric column becomes
    its mean (rounded so the value is summation-order-stable)."""
    return df.groupBy(*group).agg(
        *[F.round(F.avg(F.col(c)), ndigits).alias(f"{c}_mean") for c in cols]
    )


def order_by_sum(
    df: DataFrame, group: Sequence[str], cols: Sequence[str], ndigits: int = 6
) -> DataFrame:
    """``orderBySum``: one row per group; each named numeric column becomes
    its sum."""
    return df.groupBy(*group).agg(
        *[F.round(F.sum(F.col(c)), ndigits).alias(f"{c}_sum") for c in cols]
    )


def order_by_limit(
    df: DataFrame,
    group: Sequence[str],
    n: int,
    order: Sequence[str | Column] = (),
) -> DataFrame:
    """``orderByLimit("g1,...,n")``: the first ``n`` rows of each group.

    ERDDAP keeps rows in result order; a distributed engine has no ambient
    order, so callers pass the explicit sort (e.g. the time column plus a
    unique id as tie-break). The window is PARTITIONED on the group — each
    group sorts inside its hash partition; no global sort exists in the
    plan.
    """
    if not order:
        raise ValueError("order_by_limit needs an explicit per-group order")
    w = Window.partitionBy(*group).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def order_by_closest(
    df: DataFrame,
    group: Sequence[str],
    ts_col: str,
    interval_us: int,
    carry: Sequence[str] | None = None,
) -> DataFrame:
    """``orderByClosest("g1,...,ts/interval")``: per group and per time tick
    (every ``interval_us`` microseconds), the row whose ``ts_col`` is
    closest to the tick.

    The tick is computed per row — ``round(epoch / interval)`` in pure
    column math — so no tick grid is ever materialized or joined. One hash
    aggregate on ``(group, tick)`` with argmin-by-struct on the distance;
    equidistant rows (exactly between two ticks they snap to the later
    tick; equidistant *within* a tick cannot happen — distance is a
    function of ts, ties continue into the carried columns).
    """
    from ..functions.datetimes import epoch_us

    carry = list(carry) if carry is not None else _carry_cols(df, group, [ts_col])
    # epoch_us handles both timestamp flavors (the driver's session reads
    # parquet timestamps as TIMESTAMP_NTZ; unix_micros rejects NTZ)
    epoch = epoch_us(ts_col)
    half = interval_us // 2
    # integer-exact snap (no double division anywhere near tick
    # boundaries): tick = shifted - pmod(shifted, interval). pmod (floor
    # mod) rather than `%` (sign-following) so pre-1970 timestamps —
    # negative epochs, which historical ocean datasets carry and the
    # reference decodes (das_client.py:195-204) — snap to the correct
    # tick instead of one interval late.
    shifted = epoch + F.lit(half)
    tick_us = shifted - F.pmod(shifted, F.lit(interval_us))
    dist = F.abs(epoch - tick_us)
    # keep the input column's flavor on the tick (NTZ source -> NTZ tick)
    tick_ts = F.timestamp_micros(tick_us).cast(
        df.schema[ts_col].dataType.simpleString()
    )
    packed = F.struct(dist.alias("_d"), F.col(ts_col), *[F.col(c) for c in carry])
    out = (
        df.withColumn("_tick", tick_ts)
        .groupBy(*group, "_tick")
        .agg(F.min(packed).alias("_row"))
    )
    return out.select(
        *group,
        F.col("_tick").alias("tick"),
        F.col(f"_row.{ts_col}").alias(ts_col),
        *[F.col(f"_row.{c}").alias(c) for c in carry],
    )
