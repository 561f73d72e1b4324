"""Predicate operators (SURVEY §2.3 P4-P12).

Every filter here is a plain Column predicate so Catalyst pushes it into
the parquet scan (``PushedFilters`` in the physical plan). The reference
compiled the same predicates into ERDDAP URL query strings
(``src/data_wrangler.py:354-387``); in Spark the "URL" is the scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch_ns(ts: str) -> int:
    import calendar
    from datetime import datetime, timezone

    dt = datetime.fromisoformat(ts)
    if dt.tzinfo is not None:
        # explicit offset: convert, never reinterpret-as-UTC (a bare
        # replace() would silently shift the bound by the offset)
        dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
    # integer epoch math: datetime.timestamp() floats lose sub-µs at
    # 2024-scale epochs
    return calendar.timegm(dt.timetuple()) * 1_000_000_000 + dt.microsecond * 1000


def time_range(
    df: DataFrame, col: str, start: str | None = None, end: str | None = None
) -> DataFrame:
    """P4 — ``time>=start & time<=end`` pushdown
    (reference src/data_wrangler.py:354-375).

    When the table carries a raw-nanos shadow column (``{col}__ns``, see
    sources.tables.NANOS_TS_COLS), predicates compile against the RAW
    int64 column so they reach the parquet scan as pushed filters — the
    converted timestamp is a function of the stored column and would
    block pushdown. Literal bounds are whole microseconds, so raw-ns and
    truncated-µs comparison admit exactly the same rows.
    """
    ns_col = f"{col}__ns"
    out = df
    if ns_col in df.columns:
        if start is not None:
            out = out.filter(F.col(ns_col) >= F.lit(_epoch_ns(start)))
        if end is not None:
            # end-inclusive at µs precision: admit the whole microsecond
            out = out.filter(F.col(ns_col) < F.lit(_epoch_ns(end) + 1000))
        return out
    # literal typed to the COLUMN's own timestamp flavor: comparing a
    # TIMESTAMP_NTZ column against a TIMESTAMP literal would wrap the
    # column in a cast and block parquet pushdown (the driver's session
    # reads the test tables as NTZ; session tz is pinned UTC by
    # load_table, so the same wall-clock literal means the same instant
    # either way)
    lit_type = df.schema[col].dataType.simpleString()
    if start is not None:
        out = out.filter(F.col(col) >= F.lit(start).cast(lit_type))
    if end is not None:
        out = out.filter(F.col(col) <= F.lit(end).cast(lit_type))
    return out


def bbox(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
) -> DataFrame:
    """P6 — bounding-box predicate (reference src/core.py:575-591,
    src/data_wrangler.py:490-495). Two range filters; with data
    partitioned/z-ordered on (lat, lon) this prunes files at scale."""
    return df.filter(
        F.col(lat_col).between(lat_min, lat_max)
        & F.col(lon_col).between(lon_min, lon_max)
    )


def drop_invalid_coords(df: DataFrame, coord_cols: Sequence[str]) -> DataFrame:
    """P9 — drop rows with null/NaN coordinates
    (reference src/agol_wrangler.py:775-792)."""
    out = df
    for c in coord_cols:
        if dict(df.dtypes).get(c) in ("double", "float"):
            out = out.withColumn(c, F.when(F.isnan(F.col(c)), None).otherwise(F.col(c)))
    return out.na.drop(subset=list(coord_cols))


def row_range(
    df: DataFrame, order_by: Sequence[str], offset: int = 0, limit: int | None = None
) -> DataFrame:
    """P8/T3/T5 — deterministic rowOffset/rowLength over a total order
    (reference Converters/Json2GeoJSON.py:941-957; pagination
    src/core.py:191-197).

    Implemented with ``offset().limit()`` on a sorted frame — Spark turns
    this into a global-limit plan that short-circuits the scan rather than
    materializing a full sort at scale.
    """
    out = df.orderBy(*[F.col(c) for c in order_by]).offset(offset)
    return out.limit(limit) if limit is not None else out


def freshness_window(
    df: DataFrame, ts_col: str, days: int = 7, now: str | None = None
) -> DataFrame:
    """P11/W2 — the NRT moving window: rows within the trailing ``days``
    of ``now`` (reference src/data_wrangler.py:738-743, moving_window_days=7).

    When ``now`` is None, the anchor is the table's own max timestamp —
    computed as a scalar aggregate and joined back by Catalyst as a
    single-row broadcast (no per-row window function, no full shuffle).
    """
    if now is not None:
        anchor: Column = F.lit(now).cast("timestamp")
        return df.filter(F.col(ts_col) >= anchor - F.expr(f"INTERVAL {days} DAYS"))
    mx = df.agg(F.max(ts_col).alias("__mx"))
    return (
        df.crossJoin(F.broadcast(mx))
        .filter(F.col(ts_col) >= F.col("__mx") - F.expr(f"INTERVAL {days} DAYS"))
        .drop("__mx")
    )


def nonnull_columns(df: DataFrame, candidates: Sequence[str]) -> list[str]:
    """P7/S8 — attribute probe: keep columns with >=1 non-null value
    (reference src/erddap_wrangler.py:380-385). One aggregate pass over
    all candidates (single job, map-side combined)."""
    counts = df.agg(
        *[F.count(F.col(c)).alias(c) for c in candidates]
    ).first()
    return [c for c in candidates if counts[c] > 0]


def null_tally(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A5 — per-column null/missing tallies as a single-row DataFrame
    (reference Converters/Json2GeoJSON.py:296-303, 1110-1114)."""
    return df.agg(
        *[
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"{c}_nulls")
            for c in cols
        ],
        F.count(F.lit(1)).alias("total_rows"),
    )


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """U2 — deterministic dropDuplicates: keep the first row per key under
    a total order (reference add-to-cart dedup, src/core.py:233-248).

    ``dropDuplicates`` keeps an arbitrary row; a row_number window makes
    the survivor deterministic (required for oracle parity and for
    reproducible pipelines at scale).
    """
    w = Window.partitionBy(*keys).orderBy(*[F.col(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
