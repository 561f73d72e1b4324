"""Aggregation operators (SURVEY §2.5 A1-A7) plus the grouped-aggregation
surface the reference lacks but ERDDAP data naturally wants (per-station
stats, rollups) — noted free-upgrade in SURVEY §2.5.

All are single-pass hash aggregates: map-side partial aggregation then one
shuffle on the grouping key. No collect-and-loop.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def time_extent(
    df: DataFrame,
    ts_col: str,
    by: Sequence[str] = (),
    clamp_end_to: str | None = None,
) -> DataFrame:
    """A1 — (min, max) time extent, optionally per group, with the
    reference's future-clamp: an end time past "now" is clamped
    (reference src/das_client.py:195-204).
    """
    mx = F.max(ts_col)
    if clamp_end_to is not None:
        # literal typed to the COLUMN's flavor: least(NTZ, LTZ-literal)
        # would promote the whole aggregate to LTZ and shift at collect
        # on non-UTC clients
        flavor = df.schema[ts_col].dataType.simpleString()
        mx = F.least(mx, F.lit(clamp_end_to).cast(flavor))
    agg = df.groupBy(*by) if by else df.groupBy()
    return agg.agg(F.min(ts_col).alias("min_time"), mx.alias("max_time"))


def geo_extent(df: DataFrame, lat_col: str, lon_col: str) -> DataFrame:
    """A4 — geographic extent (reference ``getGeographicRange``,
    src/data_wrangler.py:224-233 reads NC_GLOBAL; here computed from data
    in one pass)."""
    return df.agg(
        F.min(lat_col).alias("lat_min"),
        F.max(lat_col).alias("lat_max"),
        F.min(lon_col).alias("lon_min"),
        F.max(lon_col).alias("lon_max"),
    )


def grouped_stats(
    df: DataFrame,
    by: Sequence[str],
    value_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group descriptive stats — the groupBy().agg() surface SURVEY
    §2.5 flags as a free upgrade over the reference. Rounding pins float
    output for cross-engine comparison."""
    return df.groupBy(*by).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(value_col), round_to).alias("sum_value"),
        F.round(F.avg(value_col), round_to).alias("avg_value"),
        F.round(F.min(value_col), round_to).alias("min_value"),
        F.round(F.max(value_col), round_to).alias("max_value"),
    )
