"""The erddap_sim Python Data Source: metadata-only planning, time-slice
partitions, filter pushdown with partition pruning (SURVEY §4 O1-O5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.sources import erddap_source
from erddap2agol_spark.sources.tables import load_table

PATH = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def sim(spark):
    erddap_source.register(spark)

    def make(chunk_size=200, path=PATH):
        return (
            spark.read.format("erddap_sim")
            .option("path", path)
            .option("time_col", "ts")
            .option("chunk_size", str(chunk_size))
            .load()
        )

    return make


def test_full_scan_matches_native(spark, sim):
    df = sim()
    native = load_table(spark, "/root/testdata/sf0.001", "events")
    assert df.count() == native.count() == 1000
    a = sorted(r.event_id for r in df.select("event_id").collect())
    b = sorted(r.event_id for r in native.select("event_id").collect())
    assert a == b
    # timestamps surface as us — identical to the native convention
    sa = {r.event_id: r.ts for r in df.select("event_id", "ts").collect()}
    sb = {r.event_id: r.ts for r in native.select("event_id", "ts").collect()}
    assert sa == sb


def test_chunk_partitioning(spark, sim):
    # 1000 rows / 200 per chunk -> 5 time-slice partitions
    assert sim(chunk_size=200).rdd.getNumPartitions() == 5
    assert sim(chunk_size=100000).rdd.getNumPartitions() == 1


def test_pushdown_prunes_partitions_and_matches(spark, sim):
    df = sim(chunk_size=100)
    cond = (F.col("ts") >= "2024-01-20") & (F.col("ts") < "2024-01-22")
    filtered = df.filter(cond)
    # a 2-of-30-days predicate must prune most of the 10 slices
    assert filtered.rdd.getNumPartitions() < 4
    native = load_table(spark, "/root/testdata/sf0.001", "events").filter(cond)
    assert sorted(r.event_id for r in filtered.collect()) == sorted(
        r.event_id for r in native.collect()
    )


def test_pushdown_empty_range(spark, sim):
    out = sim().filter(F.col("ts") >= "2031-01-01")
    assert out.count() == 0


def test_nontime_filters_still_applied(spark, sim):
    # filters the source declines are applied by Spark after the scan
    df = sim().filter((F.col("event_type") == "error") & (F.col("ts") >= "2024-01-15"))
    native = load_table(spark, "/root/testdata/sf0.001", "events").filter(
        (F.col("event_type") == "error") & (F.col("ts") >= "2024-01-15")
    )
    assert df.count() == native.count() > 0
