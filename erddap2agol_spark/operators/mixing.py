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


#: hashed-feature space for importance weighting (2 hex chars -> 256)
DSIR_BUCKETS = 256


def _token_buckets(
    df: DataFrame, id_col: str, text_col: str, salt: str = "dsir"
) -> DataFrame:
    """One row per token OCCURRENCE: ``(doc, bucket)`` with bucket =
    first 2 md5 hex chars of the salted token — the hashed-n-gram
    featurization of DSIR (Xie et al. 2023, "Data Selection for Language
    Models via Importance Resampling"): a fixed small feature space no
    matter how large the vocabulary, so the distribution estimates below
    are B-row tables, never vocabulary-sized."""
    return df.select(
        F.col(id_col).alias("doc"),
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("tok"),
    ).select(
        "doc",
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{salt}:"), F.col("tok"))), 1, 2),
            16,
            10,
        )
        .cast("int")
        .alias("bucket"),
    )


def dsir_log_ratios(
    source: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    salt: str = "dsir",
) -> DataFrame:
    """Per-bucket importance log-ratio ``log p_target(b) - log q_source(b)``
    over the hashed feature space, add-0.5 smoothed so unseen buckets are
    defined.  Two token-count aggregates (each collapses to <=256 rows,
    map-side combinable) + a full bucket spine — the result is a tiny
    broadcastable table; the corpora themselves never shuffle.  Ratios
    round to 6dp so downstream per-doc sums are engine-identical."""
    spark = source.sparkSession
    B = DSIR_BUCKETS
    pc = (
        _token_buckets(target, id_col, text_col, salt)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("np"))
    )
    qc = (
        _token_buckets(source, id_col, text_col, salt)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("nq"))
    )
    tp = pc.agg(F.sum("np").alias("tp"))
    tq = qc.agg(F.sum("nq").alias("tq"))
    spine = spark.range(B).select(F.col("id").cast("int").alias("bucket"))
    return (
        spine.join(F.broadcast(pc), "bucket", "left")
        .join(F.broadcast(qc), "bucket", "left")
        .join(F.broadcast(tp))
        .join(F.broadcast(tq))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("np"), F.lit(0)) + 0.5)
                    / (F.col("tp") + 0.5 * B)
                )
                - F.log(
                    (F.coalesce(F.col("nq"), F.lit(0)) + 0.5)
                    / (F.col("tq") + 0.5 * B)
                ),
                6,
            ).alias("log_ratio"),
        )
    )


def dsir_weights(
    source: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str,
    salt: str = "dsir",
) -> DataFrame:
    """DSIR importance weight per source document: the length-normalized
    sum of its tokens' bucket log-ratios — ``(doc, n_tokens,
    dsir_weight)``, weight rounded to 4dp.

    Plan shape at 100 TB: the ratio table (256 rows) broadcasts onto the
    token stream inside the scan stage; the only corpus-sized exchange is
    the per-doc hash aggregate, carrying (doc, partial sum, count) after
    map-side combine — never tokens.  Resampling then composes with
    ``sampling.weighted_hash_sample`` (sigmoid- or clip-normalized
    weight) or a top-k, both deterministic."""
    ratios = dsir_log_ratios(source, target, id_col, text_col, salt)
    return (
        _token_buckets(source, id_col, text_col, salt)
        .join(F.broadcast(ratios), "bucket")
        .groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("log_ratio"), 4).alias("dsir_weight"),
        )
    )


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
