"""Skew mitigation (SURVEY §4 / the 100 TB checklist).

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in session.py); these
helpers cover the two patterns AQE can't re-plan:

- a HOT GROUPING KEY in an aggregation (one reducer gets the world):
  :func:`salted_agg` does a two-stage aggregate — partial by
  (key, salt), final by key. Works for any algebraic aggregate.
- a HOT JOIN KEY against a small-but-not-broadcastable side:
  :func:`salted_join` replicates the small side per salt and spreads the
  big side's hot key across ``n_salts`` partitions.

Salts are deterministic (hash of a unique column, not rand()) so runs
are reproducible and retried tasks produce identical output.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deterministic_salt(unique_col: str | Column, n_salts: int) -> Column:
    """Stable salt in [0, n_salts): xxhash of a unique column. rand()
    would break task-retry determinism."""
    c = F.col(unique_col) if isinstance(unique_col, str) else unique_col
    return F.pmod(F.xxhash64(c), F.lit(n_salts)).cast("int")


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str | Sequence[str]],
    unique_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation for hot keys. ``aggs`` maps column -> one or
    more of sum|count|min|max (algebraic, so partials compose). Stage 1
    shuffles on (keys, salt) — the hot key spreads over ``n_salts``
    reducers; stage 2 combines ``n_salts`` tiny partials per key."""
    salted = df.withColumn("__salt", deterministic_salt(unique_col, n_salts))
    partial_exprs = []
    final_exprs = []
    for col, ops in aggs.items():
        for op in (ops,) if isinstance(ops, str) else ops:
            p = f"__p_{col}_{op}"
            if op == "count":
                partial_exprs.append(F.count(col).alias(p))
                final_exprs.append(F.sum(p).alias(f"{col}_count"))
            elif op == "sum":
                partial_exprs.append(F.sum(col).alias(p))
                final_exprs.append(F.sum(p).alias(f"{col}_sum"))
            elif op == "min":
                partial_exprs.append(F.min(col).alias(p))
                final_exprs.append(F.min(p).alias(f"{col}_min"))
            elif op == "max":
                partial_exprs.append(F.max(col).alias(p))
                final_exprs.append(F.max(p).alias(f"{col}_max"))
            else:
                raise ValueError(f"non-algebraic aggregate {op!r}")
    partial = salted.groupBy(*keys, "__salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)


def key_profile(df: DataFrame, cols: Sequence[str], k: int = 10) -> DataFrame:
    """Heavy-hitter diagnostic: the top-``k`` values of each candidate
    key column with absolute count and corpus share — the measurement
    that decides WHEN :func:`salted_agg`/:func:`salted_join` (or a
    broadcast) is needed, instead of guessing.

    Scale shape: per column, one keyed count aggregation (map-side
    partial combine) followed by ``orderBy(...).limit(k)`` — Catalyst
    compiles that to TakeOrderedAndProject (per-partition top-k, merged
    on the driver), never a global sort. The union is over ``k * len
    (cols)`` rows and the grand total joins in as a broadcast of one row.
    Ties break on the stringified value so output is deterministic.
    """
    from functools import reduce as _reduce

    total = df.agg(F.count(F.lit(1)).alias("__total"))
    parts = []
    for c in cols:
        top = (
            df.groupBy(F.col(c).cast("string").alias("key_value"))
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.desc("n"), F.col("key_value"))
            .limit(k)
        )
        parts.append(top.select(F.lit(c).alias("key_col"), "key_value", "n"))
    u = _reduce(DataFrame.unionByName, parts)
    from pyspark.sql import Window

    w = Window.partitionBy("key_col").orderBy(F.desc("n"), F.col("key_value"))
    return (
        u.crossJoin(F.broadcast(total))
        .select(
            "key_col",
            "key_value",
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
        )
        .withColumn("rk", F.row_number().over(w))
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    unique_col: str,
    n_salts: int = 8,
) -> DataFrame:
    """Equi-join with the big side's hot keys spread over ``n_salts``
    partitions: big rows get a deterministic salt; the small side is
    replicated once per salt value (size x n_salts — keep n_salts
    moderate). Returns the joined frame without helper columns."""
    b = big.withColumn("__salt", deterministic_salt(unique_col, n_salts))
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)])).alias("__salt")
    s = small.select("*", salts)
    return b.join(s, [key, "__salt"], "inner").drop("__salt")
