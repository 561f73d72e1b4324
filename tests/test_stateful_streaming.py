"""Cross-microbatch stateful operators (applyInPandasWithState)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.streaming import stateful


def _write_batch(spark, src, ids, tag, offset=0):
    spark.createDataFrame(
        [(i, f"{tag}_{i}", float(i + offset)) for i in ids],
        schema="k bigint, payload string, v double",
    ).coalesce(1).write.mode("append").parquet(src)


def test_stateful_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [1, 2, 3, 1], "a")  # in-batch dup of key 1

    schema = "k bigint, payload string, v double"
    stream = spark.readStream.schema(schema).parquet(src)
    out = stateful.stateful_dedup_stream(stream, "k")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = spark.sql("SELECT k FROM dedup_out").collect()
        assert sorted(r.k for r in got1) == [1, 2, 3]

        # second microbatch: keys 2,3 are dups across batches; 9 is new
        _write_batch(spark, src, [2, 3, 9], "b")
        q.processAllAvailable()
        got2 = spark.sql("SELECT k, payload FROM dedup_out").collect()
        assert sorted(r.k for r in got2) == [1, 2, 3, 9]
        # the surviving rows for 2,3 are from the FIRST batch
        by_key = {r.k: r.payload for r in got2}
        assert by_key[2].startswith("a_") and by_key[9].startswith("b_")
    finally:
        q.stop()


def test_running_max_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    _write_batch(spark, src, [1, 2], "a", offset=10)  # v: 11, 12

    schema = "k bigint, payload string, v double"
    stream = spark.readStream.schema(schema).parquet(src)
    out = stateful.running_max_stream(stream, "k", "v")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("hwm_out")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        _write_batch(spark, src, [1], "b", offset=100)  # v: 101 -> new max
        _write_batch(spark, src, [2], "c", offset=0)  # v: 2 -> below max
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM hwm_out").collect()
        latest = {}
        for r in rows:  # append mode: keep last emission per key
            latest[r.k] = r.running_max
        assert latest[1] == 101.0
        assert latest[2] == 12.0  # state held the old max
    finally:
        q.stop()
