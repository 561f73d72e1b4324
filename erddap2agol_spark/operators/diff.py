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


def merge_upsert(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    delete_col: str | None = None,
) -> DataFrame:
    """MERGE INTO semantics over DataFrames: apply a keyed change set to
    a base snapshot — update matched keys, insert unmatched ones, and
    (when ``delete_col`` names a boolean column in ``changes``) delete
    matched keys flagged for removal.  Returns the merged snapshot plus
    a ``_merge_action`` column (``insert|update|delete|keep``) so the
    caller can audit counts before committing the swap (the
    reference's overwrite flow is all-or-nothing; this is the
    incremental form, pairing with ``streaming.nrt.atomic_overwrite``
    for the exactly-once publish).

    Scale shape: ONE full-outer hash join on the key — the same single
    exchange as :func:`snapshot_diff`; action classification is pure
    column algebra.  ``changes`` must be unique per key (enforce
    upstream with a last-writer-wins window if needed).
    """
    value_cols = [c for c in base.columns if c != key]
    ch_cols = [
        c for c in changes.columns if c != key and c != delete_col
    ]
    if set(ch_cols) != set(value_cols):
        raise ValueError(
            f"changes columns {sorted(ch_cols)} != base columns {sorted(value_cols)}"
        )
    b = base.select(
        F.col(key).alias("_bk"), *[F.col(c).alias(f"_b_{c}") for c in value_cols]
    )
    c = changes.select(
        F.col(key).alias("_ck"),
        *[F.col(cc).alias(f"_c_{cc}") for cc in value_cols],
        *(
            [F.coalesce(F.col(delete_col), F.lit(False)).alias("_del")]
            if delete_col
            else [F.lit(False).alias("_del")]
        ),
    )
    j = b.join(c, b["_bk"] == c["_ck"], "full_outer")
    action = (
        F.when(c["_ck"].isNull(), "keep")
        .when(F.col("_del") & b["_bk"].isNotNull(), "delete")
        .when(b["_bk"].isNull() & ~F.col("_del"), "insert")
        .when(b["_bk"].isNotNull() & ~F.col("_del"), "update")
        .otherwise("noop_delete")  # delete of a key that never existed
    )
    merged = j.select(
        F.coalesce(b["_bk"], c["_ck"]).alias(key),
        *[
            F.when(
                c["_ck"].isNotNull(), F.col(f"_c_{v}")
            ).otherwise(F.col(f"_b_{v}")).alias(v)
            for v in value_cols
        ],
        action.alias("_merge_action"),
    )
    return merged.filter(~F.col("_merge_action").isin("delete", "noop_delete"))
