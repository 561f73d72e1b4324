"""Per-record error tracking (SURVEY §4 O13, §1.3 drift accounting).

The reference null-routes whole datasets through ``skipFromError``
decorators (src/data_wrangler.py:107-132). Record-grade version: parse/
cast failures become data, not exceptions — each risky conversion lands
in a value column plus an ``_errors`` array entry, and ``quarantine``
splits the frame into clean/rejected without re-computation. The same
idea as PERMISSIVE mode's ``columnNameOfCorruptRecord``, but usable on
arbitrary expressions and fully plan-native (``try_*`` functions, no
Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ERRORS_COL = "_errors"


def _ensure_errors(df: DataFrame) -> DataFrame:
    if ERRORS_COL in df.columns:
        return df
    return df.withColumn(ERRORS_COL, F.array().cast("array<string>"))


def safe_cast(df: DataFrame, col: str, to: str) -> DataFrame:
    """Cast that records failure instead of nulling silently: the value
    column becomes try_cast(col AS to); rows where the input was
    non-null but the cast failed get an error tag appended."""
    df = _ensure_errors(df)
    ok = F.expr(f"try_cast(`{col}` AS {to})")
    failed = F.col(col).isNotNull() & ok.isNull()
    return df.withColumn(
        ERRORS_COL,
        F.when(
            failed,
            F.array_append(F.col(ERRORS_COL), F.lit(f"cast_failed:{col}->{to}")),
        ).otherwise(F.col(ERRORS_COL)),
    ).withColumn(col, ok)


def safe_timestamp(df: DataFrame, col: str, out_col: str | None = None) -> DataFrame:
    """try_to_timestamp with error accounting (the F1 fast path, with
    failures surfaced instead of swallowed)."""
    df = _ensure_errors(df)
    out_col = out_col or col
    parsed = F.try_to_timestamp(F.col(col))
    failed = F.col(col).isNotNull() & parsed.isNull()
    return df.withColumn(
        ERRORS_COL,
        F.when(
            failed,
            F.array_append(F.col(ERRORS_COL), F.lit(f"timestamp_parse_failed:{col}")),
        ).otherwise(F.col(ERRORS_COL)),
    ).withColumn(out_col, parsed)


def require(df: DataFrame, condition: Column, tag: str) -> DataFrame:
    """Business-rule check: rows failing ``condition`` get ``tag``."""
    df = _ensure_errors(df)
    return df.withColumn(
        ERRORS_COL,
        F.when(
            ~F.coalesce(condition, F.lit(False)),
            F.array_append(F.col(ERRORS_COL), F.lit(tag)),
        ).otherwise(F.col(ERRORS_COL)),
    )


def quarantine(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, rejected): rejected rows keep their error tags for the
    data-quality report (the reference's unavailable/unused tallies,
    generalized)."""
    df = _ensure_errors(df)
    clean = df.filter(F.size(F.col(ERRORS_COL)) == 0).drop(ERRORS_COL)
    rejected = df.filter(F.size(F.col(ERRORS_COL)) > 0)
    return clean, rejected


def error_report(df: DataFrame) -> DataFrame:
    """Per-tag rejection counts — one aggregate over the exploded tags."""
    df = _ensure_errors(df)
    return (
        df.select(F.explode(F.col(ERRORS_COL)).alias("error"))
        .groupBy("error")
        .agg(F.count(F.lit(1)).alias("n"))
    )
