"""Field-extraction DSL compiler (SURVEY §2.8).

The reference converters expose a per-field mini-DSL — an ordered list of
scalar ops applied to each extracted value (Converters/Json2GeoJSON.py:
113-160 function table, :402-431 INI keywords; identical copy in
Xml2GeoJSON.py:108-125). The reference interprets it per row in Python;
here each pipeline COMPILES to a single Column expression, so the whole
DSL runs inside whole-stage codegen — zero Python in the hot path.

The reference's ``lambda`` op (arbitrary ``eval`` of user config,
Json2GeoJSON.py:127) is deliberately NOT supported: SURVEY §7.4 flags it
as a security hazard; this whitelisted op set is the replacement.

Usage::

    col = compile_ops(F.col("name"), [("case", "Title"), ("width", 20)])
    df.select(col.alias("title"))
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

from .cases import apply_case

_MAXLEN = 1 << 30  # effectively "to end of string"


def _operand(arg: object) -> Column:
    """Numeric/string literal, or another field when prefixed ``field:``
    (the reference lets operands reference other fields,
    Json2GeoJSON.py:205-219)."""
    if isinstance(arg, str) and arg.startswith("field:"):
        return F.col(arg[len("field:") :])
    return F.lit(arg)


def _num(c: Column) -> Column:
    """Numeric coercion for the arithmetic ops: ``try_cast`` renders a
    non-numeric field value as NULL (the op yields NULL for that row)
    instead of an ANSI CAST_INVALID_INPUT abort of the whole extraction
    job — field values are untrusted document content (same rationale as
    ``numeric_prefix_cast`` below)."""
    return c.try_cast("double")


def compile_op(col: Column, op: str, arg: object = None) -> Column:
    """Compile one DSL op onto ``col``. Mirrors the reference op table
    (Converters/Json2GeoJSON.py:113-128)."""
    if op == "offset":  # substring from position n (0-based in reference)
        return F.substring(col, int(arg) + 1, _MAXLEN)
    if op == "length":  # first n chars
        return F.substring(col, 1, int(arg))
    if op == "start":  # substring after first occurrence of arg
        # substring_index(col, s, -1) is text after the LAST occurrence;
        # the reference wants the FIRST -> locate + substring.
        pos = F.locate(str(arg), col)
        after = F.substring(col, pos + len(str(arg)), _MAXLEN)
        return F.when(pos > 0, after).otherwise(col)
    if op == "end":  # substring before first occurrence of arg
        return F.substring_index(col, str(arg), 1)
    if op == "concat":
        return F.concat(col, _operand(arg).cast("string"))
    if op == "add":
        return _num(col) + _num(_operand(arg))
    if op == "sub":
        return _num(col) - _num(_operand(arg))
    if op == "mult":
        return _num(col) * _num(_operand(arg))
    if op == "div":
        return _num(col) / _num(_operand(arg))
    if op == "abs":
        return F.abs(_num(col))
    if op == "pow":
        return F.pow(_num(col), float(arg))
    if op == "root":
        return F.pow(_num(col), 1.0 / float(arg))
    if op == "rand":  # value × uniform(0,1) — reference Json2GeoJSON.py:124
        return _num(col) * F.rand()
    if op == "default":  # fallback when null (operand may be a field)
        return F.coalesce(col, _operand(arg))
    if op == "width":  # truncate or right-pad to exactly n chars
        n = int(arg)
        return F.rpad(F.substring(col, 1, n), n, " ")
    if op == "case":
        return apply_case(col, str(arg))
    raise ValueError(f"unknown DSL op {op!r}")


def compile_ops(col: Column, ops: Sequence[tuple[str, object] | str]) -> Column:
    """Fold an ordered op list into one Column expression."""
    out = col
    for item in ops:
        if isinstance(item, str):
            op, arg = item, None
        else:
            op, arg = item[0], item[1] if len(item) > 1 else None
        out = compile_op(out, op, arg)
    return out


def numeric_prefix_cast(col: Column, to: str = "double") -> Column:
    """F9 — strip at the first char outside ``0123456789+-.`` then cast
    (reference Converters/Json2GeoJSON.py:248-257).

    ``try_cast``, not ``cast``: the allowed-prefix alphabet admits
    non-numbers ("-", "...", "-+1"), and under ANSI mode (Spark 4
    default) a plain cast THROWS on them mid-job — the reference's
    behavior is a null fallback, and one malformed feed value must not
    kill a 100 TB ingest."""
    return F.regexp_extract(col, r"^[0-9+\-.]+", 0).try_cast(to)


def sanitize_name(col: Column) -> Column:
    """F7 — label → filename/id sanitizer (reference
    src/data_wrangler.py:594: ``[^A-Za-z0-9_-] -> _``)."""
    return F.regexp_replace(col, r"[^A-Za-z0-9_\-]", "_")
