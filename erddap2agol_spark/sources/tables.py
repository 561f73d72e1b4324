"""Parquet table loaders for the driver-provided test tables.

At 100 TB these reads are the dominant cost; everything here is designed so
Catalyst's column pruning and predicate pushdown reach the parquet scan —
loaders return the raw ``DataFrame`` with no eager action, no ``.cache()``,
no schema inference work (parquet carries its schema).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Columns stored as parquet TIMESTAMP(NANOS), which the Spark parquet
#: reader rejects. Convention: read them as raw int64 nanos
#: (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microsecond
#: timestamps (integer ``div 1000`` — no double round-trip, int64 nanos
#: exceed 2^53). Oracle SQL mirrors this with ``CAST(ts AS TIMESTAMP)``
#: (DuckDB ns->us truncation).
NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: Dimension tables small enough to broadcast at any realistic scale factor —
#: the Spark analog of the reference's in-memory dict lookups
#: (src/erddap_wrangler.py:315-321, src/core.py:150-155).
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table. No action is triggered."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # set defensively at runtime: the driver's own session won't carry our
    # builder configs (UTC matters for oracle-comparable timestamps)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    nanos_cols = NANOS_TS_COLS.get(name, ())
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    for c in nanos_cols:
        if dict(df.dtypes).get(c) == "bigint":
            # keep the RAW nanos column: predicates on the converted
            # timestamp wrap it in a function and lose parquet pushdown;
            # operators.filters.time_range pushes on `{c}__ns` instead
            df = df.withColumn(f"{c}__ns", F.col(c)).withColumn(
                c, F.timestamp_micros(F.expr(f"`{c}` div 1000"))
            )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so the SQL API works alongside
    the DataFrame API (same Catalyst plans either way)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
