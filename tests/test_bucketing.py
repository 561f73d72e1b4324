"""Bucketed-layout plan assertions: the write-once shuffle contract.

A join between two tables bucketed on the join key with equal bucket
counts must compile with NO Exchange on either input; a re-aggregation
on the bucket key must likewise skip its exchange.  These are plan
facts, not timings — at test scale the shuffle is cheap, at 100 TB it
is the dominant cost this layout deletes.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest

from erddap2agol_spark.plans.bucketing import read_bucketed, write_bucketed
from erddap2agol_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed(spark):
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        n_buckets=8,
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_exchange(spark, bucketed):
    a = read_bucketed(spark, "b_orders")
    b = read_bucketed(spark, "b_lineitem")
    # disable broadcast so the join strategy is decided by partitioning,
    # as it would be for two large facts at cluster scale
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(a.join(b, "o_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert "SortMergeJoin" in plan
    assert not re.findall(r"^\(\d+\) Exchange", plan, re.M), plan


def test_bucketed_agg_no_exchange(spark, bucketed):
    from pyspark.sql import functions as F

    b = read_bucketed(spark, "b_lineitem")
    plan = _plan(b.groupBy("o_orderkey").agg(F.sum("l_quantity")))
    assert not re.findall(r"^\(\d+\) Exchange", plan, re.M), plan


def test_unbucketed_join_has_exchange(spark):
    """Control: the same join off bare parquet shuffles both sides —
    proving the bucket metadata (not luck) removed the exchanges."""
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(orders.join(li, "o_orderkey"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) >= 2


def test_date_partitioned_scan_prunes(spark, tmp_path):
    """A filter on the partition column must land in PartitionFilters
    (directory-level pruning — zero files opened for excluded days),
    not just PushedFilters."""
    from pyspark.sql import functions as F

    from erddap2agol_spark.plans.bucketing import write_partitioned

    ev = load_table(spark, SF, "events").withColumn(
        "day", F.to_date(F.col("ts"))
    )
    path = str(tmp_path / "events_by_day")
    write_partitioned(ev, path, "day")
    back = spark.read.parquet(path).filter(F.col("day") == "2024-03-05")
    plan = _plan(back)
    m = re.search(r"PartitionFilters: \[(.*?)\]", plan)
    assert m and "day" in m.group(1), plan


def test_dynamic_partition_pruning(spark, tmp_path):
    """Joining a date-partitioned fact to a FILTERED dim must inject a
    dynamic-pruning subquery into the fact scan (runtime partition
    pruning): the fact reads only the days the dim's surviving rows
    name, discovered at execution time — the optimizer feature that
    makes star joins over partitioned 100 TB facts affordable."""
    from pyspark.sql import functions as F

    from erddap2agol_spark.plans.bucketing import write_partitioned

    ev = load_table(spark, SF, "events").withColumn(
        "day", F.to_date(F.col("ts"))
    )
    import datetime

    path = str(tmp_path / "events_dpp")
    write_partitioned(ev, path, "day")
    fact = spark.read.parquet(path)
    # dim must be independent of the fact scan (a dim derived from the
    # same source defeats the DPP rewrite)
    dim = spark.createDataFrame(
        [
            (datetime.date(2024, 3, 5), "keep"),
            (datetime.date(2024, 3, 6), "keep"),
            (datetime.date(2024, 3, 7), "drop"),
        ],
        "day date, tag string",
    )
    joined = fact.join(dim.filter(F.col("tag") == "keep"), "day")
    plan = _plan(joined)
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_runtime_bloom_filter_injection(spark):
    """Catalyst's runtime bloom-filter semi-join reduction composes with
    this engine's plans: a selective dim filter on one side of a SHUFFLE
    join injects a might_contain probe into the fact scan side. The
    default thresholds (10 GiB application-side scan) are cluster-scale —
    right for 100 TB, never reached at test SF — so the test lowers them
    to prove the wiring, then restores."""
    from pyspark.sql import functions as F
    from erddap2agol_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        orders = load_table(spark, sf, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, sf, "lineitem")
        j = (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "might_contain" in plan, "no runtime bloom filter injected"
        # and the probed side is the fact (lineitem) scan
        probe_idx = plan.index("might_contain")
        assert "l_orderkey" in plan[probe_idx : probe_idx + 400]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_join_strategy_hints_respected(spark):
    """The engine's plans stay steerable: MERGE and SHUFFLE_HASH hints
    select SortMergeJoin / ShuffledHashJoin on the same equi-join (the
    lever for memory-vs-sort tradeoffs on cluster-sized joins, where a
    hash side that fits executor memory skips both sorts)."""
    from pyspark.sql import functions as F
    from erddap2agol_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
        orders = load_table(spark, sf, "orders").select("o_orderkey")

        def plan(df):
            return df._jdf.queryExecution().executedPlan().toString()

        merged = li.hint("MERGE").join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        assert "SortMergeJoin" in plan(merged)
        hashed = li.hint("SHUFFLE_HASH").join(
            orders, F.col("l_orderkey") == F.col("o_orderkey")
        )
        p = plan(hashed)
        assert "ShuffledHashJoin" in p and "SortMergeJoin" not in p
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
