"""Graded queries for temperature corpus mixing (operators/mixing.py).

alpha = 0.5, budget = 60% of the corpus: the skewed lang mixture
(en 44% of docs at sf0.01) flattens toward uniform — visible in
share_before vs share_after of `mix_summary`, membership exact in
`mix_keep_list`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.mixing import temperature_mix
from ..operators.sketch import KMV_NIBBLES, duckdb_hex_int
from ..sources.tables import load_table
from . import register

_ALPHA, _BUDGET = 0.5, 0.6
_SCALE = float(16**KMV_NIBBLES)

_RATES_SQL = f"""
    stats AS (SELECT lang AS grp, count(*) AS n FROM documents GROUP BY lang),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total FROM stats),
    wts AS (
      SELECT grp, n, n_total, power(n / CAST(n_total AS DOUBLE), {_ALPHA}) AS w
      FROM stats CROSS JOIN tot
    ),
    z AS (SELECT list_aggregate(list(w ORDER BY grp), 'sum') AS sw FROM wts),
    rates AS (
      SELECT grp, n, least(1.0, {_BUDGET} * n_total * (w / sw) / n) AS rate
      FROM wts CROSS JOIN z
    ),
    kept AS (
      SELECT doc_id, d.lang
      FROM documents d JOIN rates ON d.lang = rates.grp
      WHERE {duckdb_hex_int("'mix:' || CAST(doc_id AS VARCHAR)", KMV_NIBBLES)}
            / {_SCALE!r} < rate
    )
"""


@register(
    "mix_keep_list",
    oracle=f"WITH {_RATES_SQL} SELECT doc_id, lang FROM kept",
    doc="Documents surviving the temperature-0.5 mix at a 60% budget: "
    "group rates from one tiny aggregation (pinned-order float fold for "
    "the normalizer), keep decision a per-row hash compare in the scan "
    "stage — the corpus never shuffles.",
)
def mix_keep_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = temperature_mix(docs, "doc_id", "lang", _ALPHA, _BUDGET)
    return out.filter(F.col("kept")).select("doc_id", "lang")


@register(
    "mix_summary",
    oracle=f"""
    WITH {_RATES_SQL},
    after AS (SELECT lang, count(*) AS n_after FROM kept GROUP BY lang),
    tot_after AS (SELECT CAST(sum(n_after) AS BIGINT) AS m_total FROM after)
    SELECT grp AS lang, n AS n_before, n_after,
           round(n / CAST(n_total AS DOUBLE), 4) AS share_before,
           round(n_after / CAST(m_total AS DOUBLE), 4) AS share_after,
           round(rate, 4) AS keep_rate
    FROM rates JOIN after ON rates.grp = after.lang
    CROSS JOIN tot CROSS JOIN tot_after
    """,
    doc="Mixture audit: per-lang shares before/after the temperature "
    "rebalance plus realized keep rates — the report that shows the "
    "head flattening (en 44% -> ~1/3) without any row-level data moving.",
)
def mix_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    mixed = temperature_mix(docs, "doc_id", "lang", _ALPHA, _BUDGET)
    n_tot = docs.count()
    after = (
        mixed.filter(F.col("kept"))
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_after"))
    )
    m_tot = after.agg(F.sum("n_after").alias("M"))
    rates = mixed.select("lang", "n", "rate").distinct()
    return (
        rates.join(after, "lang")
        .crossJoin(F.broadcast(m_tot))
        .select(
            "lang",
            F.col("n").alias("n_before"),
            "n_after",
            F.round(F.col("n") / F.lit(float(n_tot)), 4).alias("share_before"),
            F.round(F.col("n_after") / F.col("M"), 4).alias("share_after"),
            F.round("rate", 4).alias("keep_rate"),
        )
    )
