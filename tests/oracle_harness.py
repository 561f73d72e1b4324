"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and
order-insensitive normalized values — stricter than necessary is fine;
anything failing here would fail the driver's hash compare.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import duckdb

from erddap2agol_spark.sources.tables import TABLE_NAMES, table_path

FLOAT_REL_TOL = 1e-12


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{table_path(sf_dir, name)}')"
        )
    return con


def _norm(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver hashes exact values; we normalize via repr of the double
        return repr(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm(x) for x in v)
    return v


def compare(spark_df, con: duckdb.DuckDBPyConnection, oracle: str) -> list[str]:
    """Return a list of mismatch descriptions (empty = pass)."""
    problems: list[str] = []
    oracle_rel = con.execute(oracle)
    o_cols = [d[0] for d in oracle_rel.description]
    o_rows = oracle_rel.fetchall()
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]

    if sorted(s_cols) != sorted(o_cols):
        problems.append(f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")

    # sort columns by name (driver behavior), normalize, sort rows
    s_idx = [s_cols.index(c) for c in sorted(s_cols)]
    o_idx = [o_cols.index(c) for c in sorted(o_cols)]
    s_norm = sorted(
        (tuple(_norm(r[i]) for i in s_idx) for r in s_rows), key=repr
    )
    o_norm = sorted(
        (tuple(_norm(r[i]) for i in o_idx) for r in o_rows), key=repr
    )
    if s_norm != o_norm:
        diffs = [(a, b) for a, b in zip(s_norm, o_norm) if a != b][:5]
        problems.append(f"values differ; first diffs: {diffs}")
    return problems
