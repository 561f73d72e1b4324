"""Skew mitigation, bucketed co-located joins, fleet NRT refresh, TF-IDF."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.operators import skew
from erddap2agol_spark.operators.text import tfidf_features
from erddap2agol_spark.sources.tables import load_table
from erddap2agol_spark.streaming import nrt

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share one hot key
    return spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("uid"),
        (F.col("id") % 100).cast("double").alias("v"),
    )


def test_salted_agg_matches_plain(spark, skewed):
    plain = {
        (r.k): (r.n, r.s)
        for r in skewed.groupBy("k")
        .agg(F.count("v").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        (r.k): (r.v_count, r.v_sum)
        for r in skew.salted_agg(
            skewed, ["k"], {"v": "count"} | {}, "uid", n_salts=8
        ).join(
            skew.salted_agg(skewed, ["k"], {"v": "sum"}, "uid", n_salts=8), "k"
        ).collect()
    }
    assert plain == salted


def test_salted_agg_spreads_hot_key(spark, skewed):
    # stage-1 output has up to n_salts rows for the hot key
    salted = skewed.withColumn("__salt", skew.deterministic_salt("uid", 8))
    partial = salted.groupBy("k", "__salt").count()
    hot = partial.filter(F.col("k") == "HOT").count()
    assert hot > 1  # the hot key now occupies multiple reducers


def test_salted_join_matches_plain(spark, skewed):
    dim = spark.createDataFrame([("HOT", 1.5), ("cold", 2.0)], ["k", "w"])
    plain = skewed.join(dim, "k").agg(F.round(F.sum(F.col("v") * F.col("w")), 4)).first()[0]
    salted = (
        skew.salted_join(skewed, dim, "k", "uid", n_salts=4)
        .agg(F.round(F.sum(F.col("v") * F.col("w")), 4))
        .first()[0]
    )
    assert plain == salted


def test_deterministic_salt_stable(spark, skewed):
    a = skewed.select("uid", skew.deterministic_salt("uid", 8).alias("s")).collect()
    b = skewed.select("uid", skew.deterministic_salt("uid", 8).alias("s")).collect()
    assert a == b
    assert all(0 <= r.s < 8 for r in a)


def test_salted_agg_rejects_nonalgebraic(spark, skewed):
    with pytest.raises(ValueError):
        skew.salted_agg(skewed, ["k"], {"v": "median"}, "uid")


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """bucketBy co-located join: both sides bucketed on the key ->
    SortMergeJoin with ZERO Exchange in the plan (the 100 TB co-location
    strategy; at real scale this replaces the dominant shuffle)."""
    import contextlib
    import io
    import re

    # (warehouse dir is a static conf; bucketed tables land in the default
    # spark-warehouse/, dropped in the finally block)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    spark.conf.set("spark.sql.sources.bucketing.enabled", "true")
    try:
        li = load_table(spark, SF, "lineitem")
        orders = load_table(spark, SF, "orders")
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").mode("overwrite").saveAsTable("li_b")
        orders.selectExpr("o_orderkey AS l_orderkey", "o_totalprice").write.bucketBy(
            8, "l_orderkey"
        ).sortBy("l_orderkey").mode("overwrite").saveAsTable("o_b")
        joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 0, plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_refresh_many_fleet(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    datasets = {
        "ds_a": ev.filter(F.col("user_id") % 2 == 0),
        "ds_b": ev.filter(F.col("user_id") % 2 == 1),
        "ds_bad": ev.select(F.col("event_id").alias("no_ts_col")),  # will fail
    }
    report = nrt.refresh_many(datasets, "ts", str(tmp_path / "fleet"), max_workers=3)
    assert report["ds_a"]["published"] and report["ds_b"]["published"]
    assert not report["ds_bad"]["published"]  # isolated failure (O13)
    assert "error" in report["ds_bad"]["reason"]
    assert nrt.read_current(spark, str(tmp_path / "fleet/ds_a")).count() > 0


def test_tfidf_features(spark):
    docs = load_table(spark, SF, "documents").limit(50)
    feats = tfidf_features(docs, "doc_id", "text")
    rows = feats.collect()
    assert len(rows) == 50
    assert all(r.features.size == 1 << 12 for r in rows)
    assert any(r.features.numNonzeros() > 0 for r in rows)
