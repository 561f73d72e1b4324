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


def test_streaming_nrt_polling(spark, tmp_path):
    """The streaming form: each microbatch emits only rows past the last
    committed high-water mark; new files appearing in the dataset dir
    are the reference's 'new NRT data arrived' condition."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "nrt_ds")
    import os

    os.makedirs(src)

    def write_batch(fname, ids, day):
        tb = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(
                    [day * 86_400_000_000_000 + i * 1000 for i in ids],
                    pa.timestamp("ns"),
                ),
                "v": pa.array([float(i) for i in ids], pa.float64()),
            }
        )
        pq.write_table(tb, f"{src}/{fname}.parquet")

    write_batch("b1", [1, 2, 3], day=1)

    erddap_source.register(spark)
    stream = (
        spark.readStream.format("erddap_sim")
        .option("path", src)
        .option("time_col", "ts")
        .schema("event_id bigint, ts timestamp, v double")
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("nrt_sim")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = sorted(r.event_id for r in spark.sql("SELECT * FROM nrt_sim").collect())
        assert got1 == [1, 2, 3]
        # new file with LATER timestamps -> only those arrive
        write_batch("b2", [4, 5], day=2)
        q.processAllAvailable()
        got2 = sorted(r.event_id for r in spark.sql("SELECT * FROM nrt_sim").collect())
        assert got2 == [1, 2, 3, 4, 5]
        # re-delivering the same files adds nothing (high-water mark gate)
        q.processAllAvailable()
        assert (
            sorted(r.event_id for r in spark.sql("SELECT * FROM nrt_sim").collect())
            == got2
        )
    finally:
        q.stop()
