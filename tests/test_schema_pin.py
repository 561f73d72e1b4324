"""Schema pinning + drift accounting tests (SURVEY §1.3)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from erddap2agol_spark.plans import schema_pin


def test_pin_roundtrip(spark, tmp_path):
    df = spark.range(3).select(
        F.col("id"), F.lit("x").alias("name"), F.lit(1.5).alias("v")
    )
    sink = str(tmp_path / "sink")
    schema_pin.save_pin(df.schema, sink)
    assert schema_pin.load_pin(sink) == df.schema


def test_drift_report():
    pinned = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
            T.StructField("c", T.DoubleType()),
        ]
    )
    incoming = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("c", T.StringType()),  # type changed
            T.StructField("d", T.StringType()),  # new
        ]
    )
    d = schema_pin.drift_report(pinned, incoming)
    assert d.unavailable == ("b",)
    assert d.unused == ("d",)
    assert d.type_changed == ("c",)
    assert not d.clean


def test_conform_replays_pin(spark):
    pinned = T.StructType(
        [
            T.StructField("a", T.LongType()),
            T.StructField("b", T.StringType()),
        ]
    )
    incoming = spark.range(2).select(
        F.col("id").cast("int").alias("a"),  # needs cast int->long
        F.lit(9).alias("extra"),  # unused -> dropped
        # 'b' unavailable -> null column
    )
    out = schema_pin.conform(incoming, pinned)
    # nullability is advisory in Spark; names+types must replay exactly
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in pinned.fields
    ]
    rows = out.collect()
    assert [r.a for r in rows] == [0, 1]
    assert all(r.b is None for r in rows)


def test_read_pinned_first_read_pins(spark, tmp_path):
    data = str(tmp_path / "data")
    sink = str(tmp_path / "sink")
    spark.range(5).select(F.col("id"), (F.col("id") * 2.0).alias("v")).write.parquet(data)
    df1 = schema_pin.read_pinned(spark, data, sink)
    assert schema_pin.load_pin(sink) == df1.schema
    # second read with a drifted file still conforms to the pin
    data2 = str(tmp_path / "data2")
    spark.range(2).select(F.col("id"), F.lit("s").alias("new_col")).write.parquet(data2)
    df2 = schema_pin.read_pinned(spark, data2, sink)
    assert df2.schema == df1.schema
    assert all(r.v is None for r in df2.collect())
