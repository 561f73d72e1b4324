"""Snapshot diff — CDC-style comparison of two versions of a keyed table.

The change-detection analog of the reference's overwrite/update decision
(it re-publishes a layer when content changed; see ``OverwriteFS``-style
update gating summarized in SURVEY §2.9 ST3/ST4): given an *old* and a
*new* snapshot, classify every key as added / removed / changed /
unchanged and name the columns that differ.

Scale shape: ONE full-outer hash join on the key — both sides shuffle
on the same key, AQE splits skewed keys, and the per-row classification
is pure column algebra inside whole-stage codegen. Nothing is collected;
the diff itself is a DataFrame that composes with downstream filters
(e.g. ``status != 'unchanged'``) which push straight into the join.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """Full-outer diff of two snapshots on ``keys``.

    Returns one row per key present in either side with:

    - ``status``: 'added' (new only) | 'removed' (old only) |
      'changed' (both, any compare col differs, null-safe) | 'unchanged'
    - ``changed_cols``: comma-joined names of differing columns ('' when
      none) — stable order (the order of ``compare_cols``).
    """
    o = old.select(
        *keys,
        F.lit(True).alias("__in_old"),
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
    )
    n = new.select(
        *keys,
        F.lit(True).alias("__in_new"),
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
    )
    j = o.join(n, list(keys), "full_outer")
    both = F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull()
    diffs = [
        (c, both & ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")))
        for c in compare_cols
    ]
    any_diff = reduce(lambda a, b: a | b, [d for _, d in diffs])
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(any_diff, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    changed_cols = F.concat_ws(
        ",", *[F.when(d, F.lit(c)) for c, d in diffs]
    )
    return j.select(*keys, status.alias("status"), changed_cols.alias("changed_cols"))
