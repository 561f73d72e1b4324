"""Temperature-weighted corpus mixing — deterministic group rebalancing.

Training-data pipelines rarely take a corpus as-is: the standard recipe
(multilingual LMs, domain mixtures) reweights group shares ``p_g`` to
``p_g^alpha / sum(p^alpha)`` — ``alpha < 1`` flattens head groups and
lifts tails — then samples each group at the rate that realizes the new
mixture inside a total budget.

Everything is decided by arithmetic on group COUNTS plus one md5 hash
per row, so the sample is deterministic, reproducible, and exactly
mirrorable in SQL:

- group stats are one map-side-combinable aggregation (L rows for L
  groups — broadcasts);
- the float sum ``sum(p^alpha)`` folds in group-sorted order (the
  pinned-order pattern from BM25) so it is bit-identical cross-engine;
- each row's keep decision is ``u48(salt:id) < rate_g`` — a map-side
  broadcast join + filter, no shuffle of the corpus itself.

Downsampling only (rate caps at 1): a hash filter cannot emit a row
twice.  Upsampling tails is a separate epoch-repeat concern that
belongs in the training loader, not the corpus build.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sketch import KMV_NIBBLES


def _u48(id_col: Column, salt: str) -> Column:
    h = F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string")))
    hv = F.conv(F.substring(h, 1, KMV_NIBBLES), 16, 10).cast("long")
    return hv / F.lit(float(16**KMV_NIBBLES))


def temperature_rates(
    df: DataFrame, group_col: str, alpha: float, budget_ratio: float
) -> DataFrame:
    """Per-group keep rates ``(group, n, rate)`` realizing the
    temperature-``alpha`` mixture inside ``budget_ratio * N`` rows.

    ``rate_g = min(1, budget*N*q_g / n_g)`` with ``q_g = p_g^alpha /
    sum(p^alpha)``.  The ``sum(p^alpha)`` folds in group-sorted order so
    the denominator (hence every rate) is bit-identical cross-engine."""
    stats = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n")
    )
    # fold totals inside ONE collected row (L groups — tiny by contract)
    # instead of crossJoin-ing stats with aggregates of itself: no
    # self-join lineage, and the float normalizer folds in group-sorted
    # order so it is bit-identical cross-engine.
    one = (
        stats.agg(F.collect_list(F.struct("grp", "n")).alias("gs"))
        .select(
            "gs",
            F.aggregate(
                F.col("gs"), F.lit(0).cast("long"), lambda acc, s: acc + s["n"]
            ).alias("N"),
        )
        .select(
            "gs",
            "N",
            F.aggregate(
                F.array_sort(F.col("gs")),
                F.lit(0.0),
                lambda acc, s: acc + F.pow(s["n"] / F.col("N"), F.lit(alpha)),
            ).alias("sw"),
        )
    )
    g = F.col("g")
    return one.select(F.explode("gs").alias("g"), "N", "sw").select(
        g["grp"].alias("grp"),
        g["n"].alias("n"),
        F.least(
            F.lit(1.0),
            F.lit(budget_ratio)
            * F.col("N")
            * (F.pow(g["n"] / F.col("N"), F.lit(alpha)) / F.col("sw"))
            / g["n"],
        ).alias("rate"),
    )


def temperature_mix(
    df: DataFrame,
    id_col: str,
    group_col: str,
    alpha: float,
    budget_ratio: float,
    salt: str = "mix",
) -> DataFrame:
    """Annotate every row with its group ``rate`` and ``kept`` decision.

    The corpus side never shuffles: rates broadcast (L rows) and the
    keep test is a per-row hash compare inside the scan stage.  Filter
    on ``kept`` for the sampled corpus; aggregate for audit reports."""
    rates = temperature_rates(df, group_col, alpha, budget_ratio)
    return (
        df.join(
            F.broadcast(rates), df[group_col] == rates["grp"], "inner"
        )
        .drop("grp")
        .withColumn("kept", _u48(F.col(id_col), salt) < F.col("rate"))
    )
