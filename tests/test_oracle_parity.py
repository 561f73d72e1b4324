"""The correctness gate, locally: every registered query must match its
DuckDB oracle at sf0.001 (fast) — the driver repeats this at sf0.01."""

from __future__ import annotations

import pytest

from erddap2agol_spark.queries import REGISTRY, _load_all

from .oracle_harness import compare, duckdb_conn

_load_all()
_WITH_ORACLE = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
_ROWS_ONLY = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, con, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    problems = compare(df, con, spec.oracle)
    assert not problems, f"{name}: " + "; ".join(problems)


@pytest.mark.parametrize("name", _ROWS_ONLY)
def test_rows_only_runs(spark, sf_dir, name):
    spec = REGISTRY[name]
    df = spec.spark(spark, sf_dir)
    assert df.count() >= 0
