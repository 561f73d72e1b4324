"""Blocked fuzzy record linkage: edit-distance matching over a value
dictionary.

The entity-resolution pattern a 100 TB pipeline actually runs: never
edit-distance the raw rows — first collapse the match column to its
value dictionary (one hash aggregation, after which cardinality is
vocabulary-sized and independent of corpus row count), then do the
quadratic work inside blocks of the dictionary, then (if needed)
broadcast the match verdicts back onto the rows.

Blocking is the standard guard: candidate pairs come from an EQUI-join
on a cheap block key (here: a token of the value), so the plan is
hash-partitioned — never a cross join.  ``max_block`` is the analog of
the n-gram df cap (operators/dedup.py): mega-blocks (a degenerate key
like the empty string) are dropped *before* the self-join, bounding the
per-block fan-out at max_block² no matter how skewed the dictionary is.

Scoring is ``levenshtein`` — built-in, JVM-side, whole-stage codegen
(never a Python UDF).  DuckDB ships the same function, which is what
makes these queries oracle-checkable bit-for-bit (integer distances).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def value_dictionary(df: DataFrame, value_col: str) -> DataFrame:
    """Collapse a column to ``(value, support)`` — the one corpus-sized
    aggregation; everything downstream runs on the dictionary."""
    return (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).alias("value"))
        .agg(F.count(F.lit(1)).alias("support"))
    )


def blocked_fuzzy_pairs(
    dictionary: DataFrame,
    block: Column,
    max_distance: int,
    max_block: int | None = None,
) -> DataFrame:
    """Candidate variant pairs within blocks of a value dictionary:
    ``(value_a, value_b, support_a, support_b, lev)`` with
    ``value_a < value_b`` and ``lev <= max_distance``.

    ``block`` is a Column expression over ``value`` (e.g. a token, a
    phonetic key, a length bucket).  The join is an equi-join on the
    block key; ``max_block`` drops blocks larger than the cap before
    the self-join (count once, semi-filter — the skew guard).

    An in-join length prune (``abs(len_a - len_b) <= max_distance``)
    rejects most non-candidates before the O(len²) distance runs —
    the same cheap-bound-first discipline as the n-gram length prune.
    """
    d = dictionary.select(
        "value", "support", block.alias("blk"), F.length("value").alias("ln")
    )
    if max_block is not None:
        sizes = d.groupBy("blk").agg(F.count(F.lit(1)).alias("bn"))
        d = d.join(F.broadcast(sizes.where(F.col("bn") <= max_block)), "blk").drop("bn")
    a = d.select(
        F.col("blk"),
        F.col("value").alias("value_a"),
        F.col("support").alias("support_a"),
        F.col("ln").alias("ln_a"),
    )
    b = d.select(
        F.col("blk"),
        F.col("value").alias("value_b"),
        F.col("support").alias("support_b"),
        F.col("ln").alias("ln_b"),
    )
    return (
        a.join(b, "blk")
        .where(
            (F.col("value_a") < F.col("value_b"))
            & (F.abs(F.col("ln_a") - F.col("ln_b")) <= max_distance)
        )
        # compute the O(len^2) distance ONCE: Spark does not CSE across
        # Filter and Project, so filter on the named column
        .withColumn("lev", F.levenshtein("value_a", "value_b"))
        .where(F.col("lev") <= max_distance)
        .select("value_a", "value_b", "support_a", "support_b", "lev")
    )


def fuzzy_variant_pairs(
    df: DataFrame,
    value_col: str,
    block: Column,
    max_distance: int,
    max_block: int | None = None,
) -> DataFrame:
    """End-to-end: dictionary build + blocked fuzzy matching."""
    return blocked_fuzzy_pairs(
        value_dictionary(df, value_col), block, max_distance, max_block
    )
