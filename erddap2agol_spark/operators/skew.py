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
