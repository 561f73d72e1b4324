"""Fuzz grouped_row_number against a pure-Python mirror.

The operator replaces the one-task-per-stratum window for few huge
groups; it must produce EXACTLY the numbering ``row_number() over
(partition by g order by k, id)`` would — including NULL groups as
their own partition, duplicate order keys broken by the tiebreak
column, and single-row / single-group degenerate shapes.  Spark-side
Hypothesis cases are kept small and few (each example runs jobs);
the structure generator skews toward adversarial shapes: one giant
group, all-NULL groups, heavy duplicate order keys.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from erddap2agol_spark.operators.windows import grouped_row_number

_GROUP = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
# duplicate-heavy order keys (NULL included): small domain forces ties
# onto the tiebreak column (the unique id)
_KEY = st.one_of(st.none(), st.integers(min_value=-3, max_value=3))
_ROWS = st.lists(st.tuples(_GROUP, _KEY), min_size=1, max_size=24)


def _mirror(rows: list[tuple[str | None, int | None, int]]) -> dict[int, int]:
    """Independent mirror: per-group rank in (key, id) order.  NULL
    order keys sort FIRST (Spark ascending NULLS FIRST) — the sort key
    makes that explicit instead of relying on None being orderable."""
    out: dict[int, int] = {}
    groups: dict[object, list[tuple[int | None, int]]] = {}
    for g, k, i in rows:
        groups.setdefault(g, []).append((k, i))
    for g, lst in groups.items():
        ordered = sorted(lst, key=lambda t: (t[0] is not None, t[0] or 0, t[1]))
        for rank, (_, i) in enumerate(ordered, start=1):
            out[i] = rank
    return out


@pytest.mark.usefixtures("spark")
class TestGroupedRowNumberFuzz:
    @settings(max_examples=15, deadline=None)
    @given(rows=_ROWS)
    def test_matches_python_mirror(self, spark, rows):
        data = [(g, k, i) for i, (g, k) in enumerate(rows)]
        df = spark.createDataFrame(data, "g string, k int, id bigint")
        got = {
            r.id: r.rk
            for r in grouped_row_number(df, "g", ["k", "id"], name="rk").collect()
        }
        assert got == _mirror(data)

    def test_single_row_and_all_null_groups(self, spark):
        df = spark.createDataFrame([(None, 5, 0)], "g string, k int, id bigint")
        assert [
            r.rk for r in grouped_row_number(df, "g", ["k", "id"], name="rk").collect()
        ] == [1]
        df2 = spark.createDataFrame(
            [(None, 2, 0), (None, 1, 1), (None, 2, 2)],
            "g string, k int, id bigint",
        )
        got = {
            r.id: r.rk
            for r in grouped_row_number(df2, "g", ["k", "id"], name="rk").collect()
        }
        assert got == {1: 1, 0: 2, 2: 3}
