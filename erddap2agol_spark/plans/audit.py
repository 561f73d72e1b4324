"""Plan audit — the repo's scale rules as a first-class library API.

The test suite pins these rules over the 199 registered queries
(tests/test_plans.py); this module exposes the same detectors so a USER
of the engine can vet their own DataFrame before paying for it on a
cluster: ``audit(df)`` returns the scale pathologies the plan carries,
``assert_scalable(df)`` raises on any.

Detected pathologies (each one is a "works at sf0.1, dies at 100 TB"
class this project hit and fixed during its own build):

- ``global-window``: a Window with an EMPTY partition spec over
  unbounded input — Spark moves the entire input to ONE partition.
  Windows above a limit (TakeOrderedAndProject / GlobalLimit) are
  exempt: their input is already driver-sized.
- ``cartesian`` / ``nested-loop``: CartesianProduct or
  BroadcastNestedLoopJoin — the pair space is |L|x|R|.  Bounded scalar
  broadcasts (one-row aggregates) are real and sometimes fine, which is
  why this is a report, not an unconditional error; the caller decides
  (the repo's own registry audit keeps an explicit justified-allowlist).
- ``unpruned-scan`` (optional, via ``expect_columns``): a parquet scan
  whose ReadSchema carries columns the query never needed.

The detectors parse ``explain("formatted")`` text — the same surface a
human reads — so findings quote the offending plan lines verbatim.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Finding:
    kind: str  # "global-window" | "cartesian" | "nested-loop" | "unpruned-scan"
    detail: str  # the offending plan fragment


def formatted_plan(df: DataFrame) -> str:
    """``df.explain("formatted")`` as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _top_level_bracket_groups(args: str) -> list[str]:
    """Split a formatted-explain ``Arguments:`` line into its top-level
    ``[...]`` groups (brackets may nest inside window-function exprs)."""
    groups: list[str] = []
    depth, cur = 0, []
    for ch in args:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def global_window_blocks(plan: str) -> list[str]:
    """Window ``Arguments:`` lines whose partition spec is EMPTY.

    Spark's formatted explain prints a partitioned window as THREE
    top-level bracket groups ``[fns], [partSpec], [orderSpec]`` but a
    global (order-only) window as TWO — ``[fns], [orderSpec]``."""
    blocks = re.findall(
        r"^\(\d+\) Window\n(?:.*\n)*?Arguments: (.*)$", plan, re.M
    )
    out = []
    for args in blocks:
        groups = _top_level_bracket_groups(args)
        if len(groups) == 2 and re.search(r"\b(ASC|DESC)\b", groups[1]):
            out.append(args)
    return out


def audit_plan(plan: str) -> list[Finding]:
    """Findings for an already-captured formatted plan string."""
    findings: list[Finding] = []
    for args in global_window_blocks(plan):
        if "TakeOrderedAndProject" in plan or "GlobalLimit" in plan:
            continue  # post-limit rank over driver-sized input
        findings.append(Finding("global-window", args[:200]))
    for op, kind in (
        ("CartesianProduct", "cartesian"),
        ("BroadcastNestedLoopJoin", "nested-loop"),
    ):
        for line in plan.splitlines():
            if re.match(rf"^\(\d+\) {op}", line):
                findings.append(Finding(kind, line.strip()))
    return findings


def audit(df: DataFrame, expect_columns: list[str] | None = None) -> list[Finding]:
    """Audit a DataFrame's physical plan for scale pathologies.

    ``expect_columns``: if given, any parquet ReadSchema column not in
    this list is reported as ``unpruned-scan`` — the caller's statement
    of which source columns the query legitimately needs."""
    plan = formatted_plan(df)
    findings = audit_plan(plan)
    if expect_columns is not None:
        want = set(expect_columns)
        for line in plan.splitlines():
            if "ReadSchema" in line:
                got = set(re.findall(r"(\w+):", line.split("struct<", 1)[-1]))
                extra = sorted(got - want)
                if extra:
                    findings.append(
                        Finding("unpruned-scan", f"extra columns {extra}")
                    )
    return findings


def assert_scalable(
    df: DataFrame, expect_columns: list[str] | None = None
) -> None:
    """Raise ``AssertionError`` listing every finding, or return None."""
    findings = audit(df, expect_columns)
    if findings:
        msg = "\n".join(f"[{f.kind}] {f.detail}" for f in findings)
        raise AssertionError(f"plan has scale pathologies:\n{msg}")
