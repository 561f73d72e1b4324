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


# ---------------------------------------------------------------------------
# property fuzz: random pipelines vs an independent pure-Python mirror

from hypothesis import given, settings
from hypothesis import strategies as st

from erddap2agol_spark.functions.cases import TITLE_MINOR_WORDS

_WORD = st.text(
    alphabet="abcdefgXYZ0123. -_", min_size=0, max_size=12
)
_ARGS = st.text(alphabet="abcX.-", min_size=1, max_size=3)


def _py_cap(w: str) -> str:
    return (w[:1].upper() + w[1:].lower()) if w else ""


def _py_case(s: str, mode: str) -> str:
    words = s.split(" ")
    if mode in ("Upper", "AllCapital"):
        return s.upper()
    if mode == "Lower":
        return s.lower()
    if mode == "Capital":
        return s[:1].upper() + s[1:]
    if mode == "Title":
        return " ".join(
            w.lower() if i > 0 and w.lower() in TITLE_MINOR_WORDS else _py_cap(w)
            for i, w in enumerate(words)
        )
    if mode == "Camel":
        return "".join(_py_cap(w) for w in words)
    if mode == "camel":
        return "".join(
            w.lower() if i == 0 else _py_cap(w) for i, w in enumerate(words)
        )
    if mode == "Acronym":
        return "".join(w[:1] for w in words).upper()
    raise AssertionError(mode)


def _py_op(v, op, arg):
    """Pure-Python mirror of compile_op's STRING subset, including
    Spark null propagation."""
    if op == "default":
        return arg if v is None else v
    if v is None:
        return None
    if op == "offset":
        return v[int(arg):]
    if op == "length":
        return v[: int(arg)]
    if op == "start":
        i = v.find(arg)
        return v[i + len(arg):] if i >= 0 else v
    if op == "end":
        i = v.find(arg)
        return v[:i] if i >= 0 else v
    if op == "concat":
        return v + arg
    if op == "width":
        n = int(arg)
        return v[:n].ljust(n)
    if op == "case":
        return _py_case(v, arg)
    raise AssertionError(op)


_STR_OP = st.one_of(
    st.tuples(st.just("offset"), st.integers(0, 6)),
    st.tuples(st.just("length"), st.integers(0, 8)),
    st.tuples(st.just("start"), _ARGS),
    st.tuples(st.just("end"), _ARGS),
    st.tuples(st.just("concat"), _ARGS),
    st.tuples(st.just("default"), _ARGS),
    st.tuples(st.just("width"), st.integers(1, 10)),
    st.tuples(
        st.just("case"),
        st.sampled_from(
            ["Upper", "Lower", "Capital", "Title", "Camel", "camel", "Acronym"]
        ),
    ),
)


@given(
    values=st.lists(st.one_of(st.none(), _WORD), min_size=1, max_size=6),
    ops=st.lists(_STR_OP, min_size=1, max_size=4),
)
@settings(max_examples=25, deadline=None)
def test_dsl_string_pipelines_match_python_mirror(spark, values, ops):
    """Random string pipelines over random inputs (nulls included) give
    exactly what an independent Python interpretation of the reference
    op table gives — 1-based substring math, not-found fallthrough,
    null propagation and all 7 deterministic case modes included."""
    df = spark.createDataFrame([(v,) for v in values], "v string")
    got = [
        r["out"]
        for r in df.select(
            compile_ops(F.col("v"), ops).cast("string").alias("out")
        ).collect()
    ]
    want = []
    for v in values:
        for op, arg in ops:
            v = _py_op(v, op, arg)
        want.append(v)
    assert got == want, (values, ops)


@given(
    start=st.integers(-500, 500),
    num=st.lists(
        st.tuples(
            st.sampled_from(["add", "sub", "mult", "div", "abs"]),
            st.integers(-64, 64).filter(lambda x: x != 0),
        ),
        min_size=1,
        max_size=4,
    ),
)
@settings(max_examples=25, deadline=None)
def test_dsl_arithmetic_matches_ieee_python(spark, start, num):
    """Arithmetic pipelines over dyadic operands are bit-exact against
    Python's IEEE doubles (mult/div use powers of two so no rounding
    ambiguity enters; add/sub of small ints are exact)."""
    ops, want = [], float(start) / 8.0
    for op, k in num:
        if op == "abs":
            ops.append(("abs", None))
            want = abs(want)
        elif op in ("mult", "div"):
            arg = float(2 ** (abs(k) % 5))
            ops.append((op, arg))
            want = want * arg if op == "mult" else want / arg
        else:
            arg = float(k)
            ops.append((op, arg))
            want = want + arg if op == "add" else want - arg
    df = spark.createDataFrame([(str(start / 8.0),)], "v string")
    got = df.select(compile_ops(F.col("v"), ops).alias("out")).collect()[0][
        "out"
    ]
    assert got == want, (start, ops, got, want)


def test_dsl_arithmetic_on_garbage_yields_null_not_crash(spark):
    """Field values are untrusted document content: a non-numeric value
    through an arithmetic op must yield NULL for that row — under ANSI
    mode the old plain cast aborted the whole extraction job."""
    df = spark.createDataFrame(
        [("abc",), ("12.5",), ("",), (None,)], "v string"
    )
    for op in ("add", "sub", "mult", "div", "abs", "pow", "root", "rand"):
        arg = 2.0 if op not in ("abs", "rand") else None
        ops = [(op, arg)] if arg is not None else [(op, None)]
        rows = df.select(compile_ops(F.col("v"), ops).alias("out")).collect()
        vals = [r.out for r in rows]
        assert vals[0] is None and vals[2] is None and vals[3] is None, op
        assert vals[1] is not None, op
