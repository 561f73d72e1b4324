"""ERDDAP ``csvp`` ingestion — the tabledap wire format (SURVEY §2.1 S6
physical path).

The reference requests ``.csvp`` responses (src/data_wrangler.py:324:
``generateUrl(dataformat="csvp")``) and processes them with pandas
(:609, src/agol_wrangler.py:767-775 ``pointTableToGeojsonLine`` keys on
the literal headers ``"longitude (degrees_east)"`` / ``"latitude
(degrees_north)"``).  csvp carries each column's units inline in its
ONE header row as ``name (units)``; missing values are the literal
string ``NaN``.

Spark-first: the file(s) load through ``spark.read.csv`` (distributed,
splittable, schema inference on), and the units are lifted OUT of the
column names into a sidecar dict so downstream operators address clean
names — the reference instead hardcodes the parenthesized headers at
every use site.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

#: "name (units)" — units greedy up to the LAST close-paren so nested
#: parens in units (rare but legal) survive
_HDR = re.compile(r"^(?P<name>[^(]+?)\s*\((?P<units>.*)\)\s*$")


def split_csvp_name(header: str) -> tuple[str, str | None]:
    """One csvp header cell -> (clean name, units or None)."""
    m = _HDR.match(header.strip())
    if m:
        return m.group("name"), m.group("units")
    return header.strip(), None


def read_csvp(
    spark: SparkSession, path: str
) -> tuple[DataFrame, dict[str, str | None]]:
    """Read csvp file(s) -> (DataFrame with clean column names, units
    map).  ``NaN`` strings parse as null/NaN via the csv reader's
    nanValue; schema inference types numeric columns.  The read is a
    plain distributed csv scan — splittable, no driver-side pandas."""
    from pyspark.sql import functions as F

    raw = (
        spark.read.option("header", True)
        .option("inferSchema", True)
        .option("nanValue", "NaN")
        .csv(path)
    )
    units: dict[str, str | None] = {}
    clean = raw
    for col in raw.columns:
        name, u = split_csvp_name(col)
        units[name] = u
        if name != col:
            clean = clean.withColumnRenamed(col, name)
    # ERDDAP's literal NaN means MISSING (the reference nulls it before
    # filtering, F8 NaN->null); the csv reader parses it as a float NaN,
    # which would survive isNotNull filters — normalize to null here
    for f in clean.schema.fields:
        if f.dataType.simpleString() in ("double", "float"):
            clean = clean.withColumn(
                f.name,
                F.when(F.isnan(f.name), None).otherwise(F.col(f.name)),
            )
    return clean, units
