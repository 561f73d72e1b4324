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


_DSIR_CTE = """
    toks AS (
      SELECT doc_id AS doc, lang,
             unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    tb AS (
      SELECT doc, lang,
             CAST(('0x' || substring(md5('dsir:' || tok), 1, 2)) AS BIGINT)
               AS bucket
      FROM toks
    ),
    pc AS (SELECT bucket, count(*) AS np FROM tb WHERE lang = 'en'
           GROUP BY bucket),
    qc AS (SELECT bucket, count(*) AS nq FROM tb GROUP BY bucket),
    tot AS (SELECT (SELECT count(*) FROM tb) AS tq,
                   (SELECT count(*) FROM tb WHERE lang = 'en') AS tp),
    ratio AS (
      SELECT s.bucket,
             round(ln((COALESCE(np, 0) + 0.5) / (tp + 0.5 * 256))
                 - ln((COALESCE(nq, 0) + 0.5) / (tq + 0.5 * 256)), 6)
               AS log_ratio
      FROM (SELECT unnest(generate_series(0, 255)) AS bucket) s
      LEFT JOIN pc ON pc.bucket = s.bucket
      LEFT JOIN qc ON qc.bucket = s.bucket
      CROSS JOIN tot
    ),
    wts AS (
      SELECT doc, count(*) AS n_tokens,
             round(avg(log_ratio), 4) AS dsir_weight
      FROM tb JOIN ratio ON ratio.bucket = tb.bucket
      GROUP BY doc
    )
"""


@register(
    "dsir_lang_lift",
    oracle=f"""
    WITH {_DSIR_CTE}
    SELECT lang, count(*) AS n_docs,
           round(avg(dsir_weight), 4) AS avg_weight
    FROM wts JOIN documents ON doc_id = doc
    GROUP BY lang
    ORDER BY avg_weight DESC, lang
    """,
    doc="DSIR importance weighting (hashed-n-gram features, Xie et al. "
    "2023), audited per language: with lang='en' documents as the "
    "target distribution, English documents must average the highest "
    "importance weight — the per-lang lift IS the check that the "
    "estimator works. The 256-bucket ratio table broadcasts onto the "
    "token stream; the only corpus-sized shuffle carries per-doc "
    "partial sums.",
)
def dsir_lang_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mixing import dsir_weights

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    w = dsir_weights(docs, target, "doc_id", "text")
    return (
        w.join(docs.select("doc_id", "lang"), w["doc"] == F.col("doc_id"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("dsir_weight"), 4).alias("avg_weight"),
        )
        .orderBy(F.desc("avg_weight"), "lang")
    )


@register(
    "dsir_weights_topk",
    oracle=f"""
    WITH {_DSIR_CTE}
    SELECT doc, n_tokens, dsir_weight
    FROM wts
    ORDER BY dsir_weight DESC, doc
    LIMIT 40
    """,
    doc="The 40 source documents most target-like under the DSIR "
    "importance weight (target = lang='en'). Ranking uses the "
    "4dp-rounded length-normalized weight with the doc id as "
    "tie-break, so the top-k is engine-portable; compiles to "
    "TakeOrderedAndProject — per-partition top-40, no global sort.",
)
def dsir_weights_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mixing import dsir_weights

    docs = load_table(spark, sf_dir, "documents")
    target = docs.filter(F.col("lang") == "en")
    return (
        dsir_weights(docs, target, "doc_id", "text")
        .select("doc", "n_tokens", "dsir_weight")
        .orderBy(F.desc("dsir_weight"), "doc")
        .limit(40)
    )


@register(
    "source_token_kl",
    oracle="""
    WITH toks AS (
      SELECT source, unnest(regexp_split_to_array(lower(text), '\\s+')) AS tok
      FROM documents
    ),
    tb AS (
      SELECT source,
             CAST(('0x' || substring(md5('dsir:' || tok), 1, 2)) AS BIGINT)
               AS bucket
      FROM toks
    ),
    qc AS (SELECT bucket, count(*) AS nq FROM tb GROUP BY bucket),
    tot AS (SELECT count(*) AS tq FROM tb),
    sc AS (SELECT source, bucket, count(*) AS ns FROM tb GROUP BY source, bucket),
    st AS (SELECT source, count(*) AS ts FROM tb GROUP BY source),
    terms AS (
      SELECT sc.source,
             round((ns + 0.5) / (ts + 0.5 * 256) *
                   (ln((ns + 0.5) / (ts + 0.5 * 256))
                  - ln((nq + 0.5) / (tq + 0.5 * 256))), 8) AS term
      FROM sc
      JOIN st ON st.source = sc.source
      JOIN qc ON qc.bucket = sc.bucket
      CROSS JOIN tot
    )
    SELECT source, round(list_aggregate(list(term ORDER BY term), 'sum'), 6)
             AS kl_bits
    FROM terms
    GROUP BY source
    ORDER BY kl_bits DESC, source
    """,
    doc="Per-source KL divergence from the corpus token distribution "
    "over the 256-bucket hashed feature space (smoothed) — the drift / "
    "odd-one-out diagnostic for crawl buckets: a source whose text "
    "distribution diverges from the pool surfaces at the top. Both "
    "distribution tables are <=256 rows per source and the KL fold "
    "sums its terms in PINNED (term-sorted) order so the float sum is "
    "bit-identical cross-engine. Only the token bucketing touches "
    "corpus-sized data, as one map + one aggregate.",
)
def source_token_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.mixing import _token_buckets

    docs = load_table(spark, sf_dir, "documents")
    tb = _token_buckets(
        docs.withColumnRenamed("source", "src"), "src", "text"
    ).withColumnRenamed("doc", "source")
    qc = tb.groupBy("bucket").agg(F.count(F.lit(1)).alias("nq"))
    tot = tb.agg(F.count(F.lit(1)).alias("tq"))
    sc = tb.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("ns"))
    st = tb.groupBy(F.col("source").alias("s2")).agg(
        F.count(F.lit(1)).alias("ts")
    )
    B = 256
    p = (F.col("ns") + 0.5) / (F.col("ts") + 0.5 * B)
    q = (F.col("nq") + 0.5) / (F.col("tq") + 0.5 * B)
    terms = (
        sc.join(F.broadcast(st), F.col("s2") == F.col("source"))
        .join(F.broadcast(qc), "bucket")
        .join(F.broadcast(tot))
        .select("source", F.round(p * (F.log(p) - F.log(q)), 8).alias("term"))
    )
    return (
        terms.groupBy("source")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list("term")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                6,
            ).alias("kl_bits")
        )
        .orderBy(F.desc("kl_bits"), "source")
    )
