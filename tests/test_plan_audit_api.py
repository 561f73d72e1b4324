"""The public plan-audit API (plans/audit.py): the scale rules the test
suite enforces over the registry, packaged for users to run on their
own DataFrames."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from erddap2agol_spark.plans import audit


def test_flags_global_window_and_passes_partitioned(spark):
    base = spark.range(100).withColumn("g", F.col("id") % 7)
    offender = base.withColumn(
        "rn", F.row_number().over(Window.orderBy("id"))
    )
    kinds = [f.kind for f in audit.audit(offender)]
    assert "global-window" in kinds
    with pytest.raises(AssertionError, match="global-window"):
        audit.assert_scalable(offender)

    fine = base.withColumn(
        "rn", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert audit.audit(fine) == []

    # post-limit global rank is exempt (driver-sized input)
    limited = offender.orderBy("id").limit(5)
    assert all(f.kind != "global-window" for f in audit.audit(limited))


def test_flags_nested_loop_join(spark):
    a = spark.range(10).withColumnRenamed("id", "x")
    b = spark.range(10).withColumnRenamed("id", "y")
    theta = a.join(b, F.col("x") < F.col("y"))
    kinds = {f.kind for f in audit.audit(theta)}
    assert kinds & {"nested-loop", "cartesian"}
    equi = a.join(b, F.col("x") == F.col("y"))
    assert audit.audit(equi) == []


def test_flags_unpruned_scan(spark, tmp_path):
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        [(1, "a", 2.0)], "k bigint, s string, v double"
    ).write.parquet(p)
    df = spark.read.parquet(p).select("k", "v")
    assert audit.audit(df, expect_columns=["k", "v"]) == []
    wide = spark.read.parquet(p)  # scans s too
    findings = audit.audit(wide.select("k", "s", "v"), expect_columns=["k", "v"])
    assert any(
        f.kind == "unpruned-scan" and "s" in f.detail for f in findings
    )
