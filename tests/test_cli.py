"""CLI surface (the reference's run.py CUI analog, SURVEY §3)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from erddap2agol_spark.__main__ import main


def test_cli_list_filters():
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["list", "--filter", "dedup"])
    out = buf.getvalue()
    assert rc == 0
    assert "dedup_exact" in out and "pricing_summary" not in out


def test_cli_oracle_prints_sql():
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(["oracle", "pricing_summary"])
    assert rc == 0
    assert "l_returnflag" in buf.getvalue()


def test_cli_unknown_query_rc2():
    assert main(["oracle", "no_such_query"]) == 2


def test_cli_audit_unknown_query_rc2():
    assert main(["audit", "no_such_query"]) == 2


def test_cli_audit_clean_query_rc0():
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(
            ["audit", "pricing_summary", "--sf-dir", "/root/testdata/sf0.001"]
        )
    assert rc == 0
    assert "OK" in buf.getvalue()


def test_cli_audit_does_not_stop_a_borrowed_session(spark):
    """Regression: `audit`/`run` grab the live session via getOrCreate;
    stopping it would kill the host application's (or this suite's)
    session for every later query. Ownership-conditional teardown."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(
            ["audit", "pricing_summary", "--sf-dir", "/root/testdata/sf0.001"]
        )
    assert rc == 0
    # the borrowed session must still be fully alive and usable
    assert spark.sparkContext._jsc is not None
    assert spark.range(3).count() == 3
