"""Join operators (SURVEY §2.4 J1-J6).

The reference's join-shaped logic is all small-keyed dict lookups — in
Spark every one of them is a broadcast join (no shuffle of the big side).
The helpers force ``F.broadcast`` on the dimension side so the plan is a
``BroadcastHashJoin`` regardless of statistics; at 100 TB the fact side
never moves.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def anti_join_new(
    incoming: DataFrame, existing: DataFrame, key: str | Sequence[str]
) -> DataFrame:
    """J1/U1 — NRT anti-join: keep datasets not already present
    (reference ``findExistingNRT``, src/core.py:763-781:
    ``new = set(list) - set(existing)``)."""
    keys = [key] if isinstance(key, str) else list(key)
    return incoming.join(F.broadcast(existing.select(*keys).distinct()), keys, "left_anti")


def semi_join_existing(
    incoming: DataFrame, existing: DataFrame, key: str | Sequence[str]
) -> DataFrame:
    """J4 — existence semi-join (reference ``check_dataset_exists``,
    src/core.py:753-761)."""
    keys = [key] if isinstance(key, str) else list(key)
    return incoming.join(F.broadcast(existing.select(*keys).distinct()), keys, "left_semi")


def match_by_name_or_ordinal(
    left: DataFrame,
    right: DataFrame,
    name_col: str,
    by_order: bool = False,
    order_col: str | None = None,
) -> DataFrame:
    """J5 — the layer-swap correlation: pair rows by ``name_col``, or by
    ordinal position when ``by_order`` (the reference's ``byLayerOrder``
    option, OverwriteFS.py:1284-1743). Ordinal pairing materializes a
    row_number per side over a deterministic order — an as-of-by-position
    join. Right-side columns are suffixed ``_right``."""
    from pyspark.sql import Window

    r = right.select(
        *[F.col(c).alias(c if c == name_col else f"{c}_right") for c in right.columns]
    )
    if not by_order:
        return left.join(F.broadcast(r), name_col, "inner")
    lkey = order_col or name_col
    rkey = lkey if lkey == name_col else f"{lkey}_right"
    l2 = left.withColumn("__ord", F.row_number().over(Window.orderBy(F.col(lkey))))
    r2 = r.withColumn("__ord", F.row_number().over(Window.orderBy(F.col(rkey))))
    return l2.join(F.broadcast(r2.drop(name_col)), "__ord", "inner").drop("__ord")


def enrich(
    facts: DataFrame,
    dim: DataFrame,
    key: str | Sequence[str],
    coalesce_cols: dict[str, str] | None = None,
) -> DataFrame:
    """J2/J3 — broadcast left-join enrichment with authoritative-value
    coalesce (reference date-cache restore, src/core.py:150-155: cache
    value wins over search value when present).

    ``coalesce_cols`` maps fact column -> dim column; the output keeps the
    fact column name with ``coalesce(dim_value, fact_value)`` semantics.
    """
    keys = [key] if isinstance(key, str) else list(key)
    joined = facts.join(F.broadcast(dim), keys, "left")
    for fact_col, dim_col in (coalesce_cols or {}).items():
        joined = joined.withColumn(fact_col, F.coalesce(F.col(dim_col), F.col(fact_col))).drop(
            dim_col
        )
    return joined


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: Sequence[str] = (),
    bin_width: float | None = None,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Point-in-interval join: rows of ``points`` matched to rows of
    ``intervals`` where ``lo <= point < hi`` (half-open; a NULL ``hi``
    means unbounded above).

    Spark has no native range join, and the naive theta join degenerates
    to a nested-loop cross product. Two scale strategies, picked by what
    the data offers:

    - ``on`` keys present: plain hash equi-join on the keys with the
      range predicate as a join residual — the shuffle is keyed, the
      range check rides along at zero extra cost. Set
      ``broadcast_intervals`` when the interval side is a small dim.
    - keyless + ``bin_width``: each interval explodes into the coarse
      bins it overlaps (``sequence(floor(lo/w), floor(hi/w))``) and each
      point maps to exactly ONE bin, so the equi-join on the bin meets
      every qualifying pair exactly once — no post-join dedup — and the
      pair space shrinks from |P|x|I| to per-bin occupancy. Pick
      ``bin_width`` near the typical interval length: wider bins raise
      false candidates, narrower raise the explode factor.
    """
    rng = F.col(point_col) >= F.col(lo_col)
    rng &= F.col(hi_col).isNull() | (F.col(point_col) < F.col(hi_col))
    if on:
        iv = F.broadcast(intervals) if broadcast_intervals else intervals
        cond = rng
        for k in on:
            cond = (points[k] == iv[k]) & cond
        return points.join(iv, cond).drop(*[iv[k] for k in on])
    if bin_width is None:
        raise ValueError("keyless interval_join requires bin_width")
    p = points.withColumn(
        "__bin", F.floor(F.col(point_col) / F.lit(bin_width)).cast("long")
    )
    iv = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bin_width)).cast("long"),
                # NULL hi would make the sequence unbounded; keyless
                # unbounded-above intervals need the keyed strategy
                F.floor(F.col(hi_col) / F.lit(bin_width)).cast("long"),
            )
        ),
    )
    return p.join(iv, (p["__bin"] == iv["__bin"]) & rng).drop("__bin")


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
) -> DataFrame:
    """Interval × interval overlap join: every (left, right) pair whose
    half-open ranges intersect (``l_lo < r_hi AND r_lo < l_hi``) —
    sessions × maintenance windows, promotions × shipping windows.

    Big-big shape: BOTH sides explode to the coarse bins their range
    covers, pairs meet on a bin equi-join, and each qualifying pair is
    emitted EXACTLY ONCE without a post-join dedup: the residual keeps
    the pair only in the bin that contains the overlap's start
    (``floor(greatest(l_lo, r_lo) / w)``).  A pair overlapping across
    five shared bins matches the bin predicate in exactly one of them,
    so the dedup that would otherwise need a corpus-wide shuffle is a
    free per-row comparison.

    Shuffle cost is the two binned explodes (each row duplicated
    ``range/bin_width`` times — pick ``bin_width`` near the typical
    interval length), hash-partitioned on well-spread bin ids; AQE
    splits hot calendar bins.  No nested loop anywhere.
    """
    w = float(bin_width)

    def binned(df: DataFrame, lo: str, hi: str) -> DataFrame:
        return df.withColumn(
            "__bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(lo) / F.lit(w)).cast("long"),
                    F.floor(F.col(hi) / F.lit(w)).cast("long"),
                )
            ),
        )
    l = binned(left, left_lo, left_hi)
    r = binned(right, right_lo, right_hi)
    overlap = (l[left_lo] < r[right_hi]) & (r[right_lo] < l[left_hi])
    anchor = l["__bin"] == F.floor(
        F.greatest(l[left_lo], r[right_lo]) / F.lit(w)
    ).cast("long")
    return (
        l.join(r, (l["__bin"] == r["__bin"]) & overlap & anchor)
        .drop(l["__bin"])
        .drop(r["__bin"])
    )


def asof_backward_cogrouped(
    left: "DataFrame",
    right: "DataFrame",
    key_col: str,
    ts_col: str,
    id_col: str,
    out_col: str,
) -> "DataFrame":
    """Backward as-of pairing via ``cogroup().applyInPandas`` — the
    SURVEY §2.10 per-partition-imperative cell exercised on a real
    operator: for each left row, the latest right ``ts_col`` at or
    before it (order (ts, id), exactly the union-window form's
    semantics — graded against the same SQL oracle).

    Spark co-shuffles BOTH inputs on the key and hands each group's two
    pandas frames to one Python call: the per-key scan is a linear
    cummax, state never crosses keys, and the shuffle is the same one
    the window form pays. Use the window form in production (JVM-only);
    this exists to pin the cogroup API to an oracle so a custom pandas
    pairing algorithm (DTW, optimal matching) has a verified template.
    """
    import pandas as pd

    flavor = left.schema[ts_col].dataType.simpleString()
    out_schema = (
        f"{id_col} long, {ts_col} {flavor}, {key_col} long, {out_col} {flavor}"
    )

    def pair(key, lf: pd.DataFrame, rf: pd.DataFrame) -> pd.DataFrame:
        if lf.empty:
            return pd.DataFrame(
                columns=[id_col, ts_col, key_col, out_col]
            ).astype({id_col: "int64", key_col: "int64"})
        lf = lf.assign(_is_r=0)
        rf = rf.assign(_is_r=1)
        allr = pd.concat([lf, rf], ignore_index=True).sort_values(
            [ts_col, id_col], kind="mergesort"
        )
        marked = allr[ts_col].where(allr["_is_r"] == 1)
        # rows are ts-ascending, so the carried-forward last marked value
        # IS the running max (and pandas cummax does not skip NaT on
        # datetime64[us] anyway)
        allr[out_col] = marked.ffill()
        out = allr[allr["_is_r"] == 0]
        return out[[id_col, ts_col, key_col, out_col]]

    return (
        left.groupBy(key_col)
        .cogroup(right.groupBy(key_col))
        .applyInPandas(pair, schema=out_schema)
    )
