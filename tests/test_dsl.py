"""Extraction-DSL and case-transform unit tests (SURVEY §2.8)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.functions.cases import apply_case
from erddap2agol_spark.functions.dsl import compile_op, compile_ops


def _one(spark, col_value, ops):
    df = spark.createDataFrame([(col_value,)], schema="v string")
    return df.select(compile_ops(F.col("v"), ops).alias("out")).first().out


@pytest.mark.parametrize(
    "value,ops,expect",
    [
        ("hello world", [("offset", 6)], "world"),
        ("hello world", [("length", 5)], "hello"),
        ("key=value", [("start", "=")], "value"),
        ("key=value", [("end", "=")], "key"),
        ("no-sep", [("start", "=")], "no-sep"),  # absent separator -> unchanged
        ("ab", [("concat", "cd")], "abcd"),
        ("5", [("add", 3)], 8.0),
        ("5", [("sub", 3)], 2.0),
        ("5", [("mult", 3)], 15.0),
        ("6", [("div", 3)], 2.0),
        ("-4", ["abs"], 4.0),
        ("3", [("pow", 2)], 9.0),
        ("27", [("root", 3)], 3.0),
        (None, [("default", "fallback")], "fallback"),
        ("x", [("default", "fallback")], "x"),
        ("abcdef", [("width", 4)], "abcd"),
        ("ab", [("width", 4)], "ab  "),
        ("hello world", [("offset", 6), ("length", 3), ("case", "Upper")], "WOR"),
    ],
)
def test_dsl_ops(spark, value, ops, expect):
    got = _one(spark, value, ops)
    if isinstance(expect, float):
        assert got == pytest.approx(expect)
    else:
        assert got == expect


def test_dsl_field_operand(spark):
    df = spark.createDataFrame([(10.0, 2.5)], ["a", "b"])
    out = df.select(
        compile_op(F.col("a"), "mult", "field:b").alias("m"),
        compile_op(F.col("a"), "default", "field:b").alias("d"),
    ).first()
    assert out.m == 25.0 and out.d == 10.0


def test_dsl_rand_bounded(spark):
    df = spark.createDataFrame([(100.0,)], ["v"])
    got = df.select(compile_op(F.col("v"), "rand").alias("r")).first().r
    assert 0.0 <= got <= 100.0


def test_dsl_unknown_op_raises(spark):
    with pytest.raises(ValueError):
        compile_op(F.col("v"), "lambda", "evil()")  # eval surface banned


@pytest.mark.parametrize(
    "mode,value,expect",
    [
        ("Upper", "a tale of two", "A TALE OF TWO"),
        ("AllCapital", "ab", "AB"),
        ("Lower", "AB CD", "ab cd"),
        ("Capital", "hello world", "Hello world"),
        ("Title", "a tale of the sea", "A Tale of the Sea"),  # minor words stay
        ("Camel", "sea surface temp", "SeaSurfaceTemp"),
        ("camel", "sea surface temp", "seaSurfaceTemp"),
        ("Acronym", "gulf of mexico ocean observing", "GOMOO"),
    ],
)
def test_case_modes(spark, mode, value, expect):
    df = spark.createDataFrame([(value,)], ["v"])
    assert df.select(apply_case(F.col("v"), mode).alias("o")).first().o == expect


def test_case_unknown_raises():
    with pytest.raises(ValueError):
        apply_case(F.lit("x"), "Sponge")
