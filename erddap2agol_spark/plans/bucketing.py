"""Bucketed storage layout — the shuffle-you-pay-once join strategy.

The reference refreshes the same feature services against the same key
columns every cycle (NRT updates join on dataset id / station id each
run; `nrtUpdate` in the reference re-derives the same keyed lookups per
cycle).  At 100 TB the equivalent is: any join or aggregation key that
recurs across runs should be paid for ONCE at write time, not on every
query.  ``bucketBy`` hashes rows into a fixed number of buckets per key
at write; two tables bucketed on the same key with the same bucket
count then join with ZERO exchange on either side — Catalyst sees the
compatible output partitioning and drops both shuffles (and, with
``sortBy``, the sort).  Re-aggregations on the bucket key likewise skip
their exchange.

This is the cluster analog of the reference's date-cache: an artifact
keyed by the workload's recurring access pattern, amortized across
every later run.

Bucketed tables are metastore tables (parquet files + bucket metadata),
so writers use ``saveAsTable`` into the session warehouse rather than
bare ``parquet(path)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int = 32,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hash-bucketed (and optionally sorted) by ``key``.

    ``n_buckets`` is a layout contract shared by every table that wants
    exchange-free joins on this key — pick it once per key domain and
    size it so a bucket of the LARGEST table fits an executor
    (~100-500 MB of parquet per bucket at cluster scale).
    """
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.mode(mode).bucketBy(n_buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back WITH its bucket metadata (a bare
    ``spark.read.parquet`` on the files would lose the layout and
    reintroduce the shuffle)."""
    return spark.table(table)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` hive-partitioned (one directory per value).

    The directory column becomes metadata, so a filter on it prunes
    entire partitions BEFORE any file is opened (``PartitionFilters``
    in the scan, vs ``PushedFilters`` which still touches footers).
    Use for the coarse recurring predicate — almost always the date
    bucket of the time column (day for NRT feeds) — and keep
    cardinality bounded: one directory per partition value per write,
    so thousands of values per batch fragments the store.
    """
    cols = (
        [partition_cols] if isinstance(partition_cols, str) else list(partition_cols)
    )
    df.write.mode(mode).partitionBy(*cols).parquet(path)
