"""ERDDAP catalog model (SURVEY §2.1 S1-S3, §2.4 J2/J3, §2.7 T3/U2).

The reference consumes ERDDAP's "table JSON" wire format —
``{"table": {"columnNames": [...], "rows": [[...]]}}`` — for both the
``allDatasets`` catalog and search results (erddap_wrangler.py:269-327),
keeps a ``{id: (minTime, maxTime)}`` date cache built from the catalog
(erddap_wrangler.py:238-266), and restores authoritative dates onto
search results (core.py:150-155).

Spark-first: the wire format parses into a small dimension DataFrame;
filters/search are Column predicates; the date cache is a broadcast
enrichment join. Catalogs are small (10^2..10^5 rows) — they live on the
broadcast side of every plan they appear in.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.joins import enrich

#: case-insensitive column aliases the reference locates in catalog JSON
CANONICAL_COLUMNS = {
    "datasetid": "dataset_id",
    "title": "title",
    "tabledap": "tabledap",
    "griddap": "griddap",
    "mintime (utc)": "min_time",
    "mintime": "min_time",
    "maxtime (utc)": "max_time",
    "maxtime": "max_time",
}


def parse_table_json(spark: SparkSession, text: str) -> DataFrame:
    """S2: the table-JSON wire format -> DataFrame, with case-insensitive
    canonical column naming. Unknown columns pass through untouched."""
    doc = json.loads(text)
    table = doc["table"]
    names = [
        CANONICAL_COLUMNS.get(str(n).strip().lower(), str(n)) for n in table["columnNames"]
    ]
    rows = [tuple(r) for r in table["rows"]]
    df = spark.createDataFrame(rows, schema=names)
    for c in ("min_time", "max_time"):
        if c in df.columns:
            # try_to_timestamp: a malformed date in remote catalog JSON
            # is a NULL bound for that dataset, not an ANSI scan abort
            df = df.withColumn(c, F.try_to_timestamp(F.col(c)))
    return df


def catalog_from_url(
    spark: SparkSession,
    url: str,
    attempts: int = 3,
    timeout_s: float = 120.0,
) -> DataFrame:
    """S2 on the wire: GET the server's allDatasets table-JSON
    (``erddap_url.all_datasets_url`` output) with bounded retry and
    parse it — the reference's catalog bootstrap (one ~catalog-sized
    document; driver-side by design, the same class of planner fetch as
    the DAS sweep)."""
    from .http_fetch import fetch_with_retry

    text = fetch_with_retry(url, attempts=attempts, timeout_s=timeout_s).decode()
    return parse_table_json(spark, text)


def catalog_datasets(df: DataFrame, protocol: str = "tabledap") -> DataFrame:
    """S2 row filters: drop blank-protocol rows and the ``allDatasets``
    self-row (erddap_wrangler.py:310-313)."""
    return df.filter(
        F.col(protocol).isNotNull()
        & (F.trim(F.col(protocol)) != "")
        & (F.col("dataset_id") != "allDatasets")
    )


def search(df: DataFrame, keywords: list[str]) -> DataFrame:
    """S3 as a local predicate (all keywords must hit the title,
    case-insensitive) — the pushdown variant keeps this in the REST query
    of a DSv2 connector; semantics identical."""
    cond = F.lit(True)
    for kw in keywords:
        cond = cond & F.lower(F.col("title")).contains(kw.lower())
    return df.filter(cond)


def build_date_cache(catalog: DataFrame) -> DataFrame:
    """J2 cache build: authoritative (min_time, max_time) per dataset."""
    return catalog.select(
        "dataset_id",
        F.col("min_time").alias("cached_min_time"),
        F.col("max_time").alias("cached_max_time"),
    ).dropDuplicates(["dataset_id"])


def restore_dates(results: DataFrame, date_cache: DataFrame) -> DataFrame:
    """J2 enrichment: cache dates win over whatever the search returned
    (coalesce(cache, search), core.py:150-155). Broadcast left join."""
    return enrich(
        results,
        date_cache,
        "dataset_id",
        coalesce_cols={"min_time": "cached_min_time", "max_time": "cached_max_time"},
    )


def paginate(df: DataFrame, page: int, page_size: int = 50) -> DataFrame:
    """T3: the CUI's page slice (page_size default 50, clamped 1..100 as
    in core.py:82-97) over a deterministic title/id order."""
    page_size = max(1, min(100, page_size))
    return (
        df.orderBy("dataset_id")
        .offset((page - 1) * page_size)
        .limit(page_size)
    )


def add_to_cart(cart: DataFrame, additions: DataFrame) -> DataFrame:
    """U2: union + dedup on dataset_id (add-to-cart semantics,
    core.py:233-248)."""
    return cart.unionByName(additions).dropDuplicates(["dataset_id"])
