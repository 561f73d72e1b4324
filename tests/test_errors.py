"""Per-record error tracking (O13 record-grade) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from erddap2agol_spark.operators import errors


def _dirty(spark):
    return spark.createDataFrame(
        [
            ("1", "2024-01-05T10:00:00", 50.0),
            ("notanint", "2024-02-01", 30.0),
            ("3", "yesterday-ish", 20.0),
            (None, None, -5.0),
        ],
        schema="n string, when string, v double",
    )


def test_safe_cast_and_timestamp(spark):
    df = errors.safe_timestamp(errors.safe_cast(_dirty(spark), "n", "bigint"), "when")
    rows = {r.v: (r.n, r.when, list(r._errors)) for r in df.collect()}
    assert rows[50.0] == (1, rows[50.0][1], [])
    assert rows[30.0][0] is None and rows[30.0][2] == ["cast_failed:n->bigint"]
    assert rows[20.0][1] is None and rows[20.0][2] == ["timestamp_parse_failed:when"]
    # null inputs are not errors (missing, not malformed)
    assert rows[-5.0][2] == []


def test_require_and_quarantine(spark):
    df = errors.safe_cast(_dirty(spark), "n", "bigint")
    df = errors.require(df, F.col("v") > 0, "nonpositive_value")
    clean, rejected = errors.quarantine(df)
    assert clean.count() == 2  # rows 50.0 and 20.0 survive
    assert "_errors" not in clean.columns
    bad = {r.v: list(r._errors) for r in rejected.collect()}
    assert bad[30.0] == ["cast_failed:n->bigint"]
    assert bad[-5.0] == ["nonpositive_value"]


def test_error_report(spark):
    df = errors.require(
        errors.safe_cast(_dirty(spark), "n", "bigint"), F.col("v") > 0, "nonpositive_value"
    )
    rep = {r.error: r.n for r in errors.error_report(df).collect()}
    assert rep == {"cast_failed:n->bigint": 1, "nonpositive_value": 1}
