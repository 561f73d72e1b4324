"""Graded queries for blocked fuzzy record linkage (operators/linkage.py).

Variant-spelling mining over the part-name catalog: the quadratic
edit-distance work runs on the VALUE DICTIONARY (distinct names — one
corpus-sized hash aggregate collapses 100 TB of rows to a vocabulary),
blocked by the name's second token so candidates come from an equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.linkage import fuzzy_variant_pairs
from ..sources.tables import load_table
from . import register

_MAX_LEV = 3
_MAX_BLOCK = 64


@register(
    "fuzzy_name_variants",
    oracle=f"""
    WITH d AS (
      SELECT p_name AS value, count(*) AS support FROM part GROUP BY p_name
    ),
    dd AS (
      SELECT value, support, split_part(value, ' ', 2) AS blk,
             len(value) AS ln,
             count(*) OVER (PARTITION BY split_part(value, ' ', 2)) AS bn
      FROM d
    )
    SELECT a.value AS value_a, b.value AS value_b,
           a.support AS support_a, b.support AS support_b,
           levenshtein(a.value, b.value) AS lev
    FROM dd a JOIN dd b ON a.blk = b.blk AND a.value < b.value
    WHERE a.bn <= {_MAX_BLOCK} AND b.bn <= {_MAX_BLOCK}
      AND abs(a.ln - b.ln) <= {_MAX_LEV}
      AND levenshtein(a.value, b.value) <= {_MAX_LEV}
    """,
    doc="Blocked fuzzy variant mining over the part-name dictionary: "
    "distinct names + row supports from one hash aggregate (the only "
    "corpus-sized stage), then an equi-join on the second name token "
    f"with a {_MAX_BLOCK}-entry block cap and an in-join length prune "
    "before the levenshtein (JVM codegen, never a UDF) — the "
    "entity-resolution shape that survives 100 TB because the n^2 is "
    "dictionary-sized and per-block bounded. Integer distances and "
    "supports: bit-stable across engines.",
)
def fuzzy_name_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return fuzzy_variant_pairs(
        part,
        "p_name",
        block=F.split_part(F.col("value"), F.lit(" "), F.lit(2)),
        max_distance=_MAX_LEV,
        max_block=_MAX_BLOCK,
    )
