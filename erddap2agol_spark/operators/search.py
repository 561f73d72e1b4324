"""Full-text retrieval primitives: inverted index + BM25 ranking.

The reference exposes dataset full-text search through ERDDAP's
``search/index.json`` endpoint (SURVEY §2.1 S3) — the server ranks; the
client only pages.  This module is the engine-side equivalent for a
corpus that lives in the lake: build the postings table with DataFrame
algebra, score with Lucene-form BM25, and take the top-k without a
global sort.

Scale shape:

- ``inverted_index``: explode -> distinct(term, doc) -> one aggregation
  keyed by term.  The classic skew (stopword posting lists) is handled
  the way real systems do — a ``max_df_ratio`` cap that drops terms
  present in more than that share of documents BEFORE the postings
  aggregate, so no reducer ever materializes a stopword's list.
- ``bm25_topk``: query terms broadcast (an ``isin`` literal list —
  evaluated inside the scan stage); per-doc stats join on doc id only;
  the final top-k is ``orderBy().limit()`` = TakeOrderedAndProject.

Determinism: BM25 sums per-term contributions through an
``array_sort`` + left-fold (``F.aggregate``), so the floating-point
addition ORDER is pinned (term-lexicographic) and identical in any
engine — groupBy-sum order nondeterminism never reaches the score.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens


def doc_terms(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """One row per distinct (term, doc): explode + distinct — the map
    side of every retrieval statistic."""
    return (
        docs.select(F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("toks"))
        .select("doc", F.explode("toks").alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )


def inverted_index(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    max_df_ratio: float | None = None,
) -> DataFrame:
    """Postings table ``(term, df, postings)`` with doc ids ascending,
    serialized as CSV so downstream comparison is canon-safe.

    ``max_df_ratio`` drops terms whose document frequency exceeds that
    share of the corpus (stopword suppression) *before* the posting
    list aggregate — the df pass is a tiny (term, count) aggregation, so
    the cap costs one extra map-side-combinable pass, not a second scan
    of the text."""
    td = doc_terms(docs, id_col, text_col)
    if max_df_ratio is not None:
        n_docs = docs.select(id_col).distinct().count()
        dfs = td.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
        keep = dfs.filter(F.col("df") <= max_df_ratio * n_docs).select("term")
        td = td.join(F.broadcast(keep), "term")
    return td.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"),
        F.concat_ws(
            ",",
            F.transform(
                F.sort_array(F.collect_list(F.col("doc"))),
                lambda d: d.cast("string"),
            ),
        ).alias("postings"),
    )


def bm25_topk(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: Sequence[str],
    k: int,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Lucene-form BM25 top-k: ``idf = ln(1 + (N - df + .5)/(df + .5))``,
    ``tf`` saturated by ``k1`` with length normalization ``b``.

    ``avgdl`` is computed as an exact integer token-count sum divided by
    the doc count, so it is bit-identical cross-engine; the per-doc
    score folds term contributions in term-sorted order (see module
    docstring).  Output: ``(doc, score, rk)`` — ranked on the ROUNDED
    score with doc id tie-break, so ranking is engine-portable too."""
    q = [t.lower() for t in query_terms]
    toks = docs.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("toks")
    ).select("doc", F.size("toks").alias("dl"), F.explode("toks").alias("term"))

    # exact integer avgdl inputs: sum of per-doc lengths / doc count
    dls = toks.select("doc", "dl").distinct()
    totals = dls.agg(
        F.sum("dl").alias("sum_dl"), F.count(F.lit(1)).alias("n_docs")
    )

    qt = toks.filter(F.col("term").isin(q))
    tf = qt.groupBy("doc", "dl", "term").agg(F.count(F.lit(1)).alias("tf"))

    dfs = qt.select("term", "doc").distinct().groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )

    scored = (
        tf.join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(totals))
        .withColumn("avgdl", F.col("sum_dl") / F.col("n_docs"))
        .withColumn(
            "idf",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "contrib",
            F.col("idf")
            * F.col("tf")
            * (k1 + 1)
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per_doc = (
        scored.groupBy("doc")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "contrib"))),
                F.lit(0.0),
                lambda acc, s: acc + s["contrib"],
            ).alias("raw")
        )
        .select("doc", F.round("raw", 4).alias("score"))
    )
    top = per_doc.orderBy(F.desc("score"), "doc").limit(k)
    # rank recomputed over the k-row result (post-limit window on a
    # bounded input — the token_histogram pattern, not a global sort)
    w = Window.orderBy(F.desc("score"), "doc")
    return top.select("doc", "score", F.row_number().over(w).alias("rk"))


def cooccurrence_pmi(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    min_df: int = 2,
    max_df_ratio: float = 0.5,
    min_pair_n: int = 2,
) -> DataFrame:
    """Within-document term co-occurrence with pointwise mutual
    information: ``pmi(a,b) = ln(n_ab * N / (df_a * df_b))`` over
    document-level presence counts.

    Skew control IS the algorithm here: terms outside ``[min_df,
    max_df_ratio * N]`` are dropped *before* the in-document self-join —
    stopwords would otherwise pair with everything (quadratic fan-out on
    exactly the hottest keys) and hapaxes only produce noise pairs.  The
    surviving per-doc term count bounds the join fan-out; pairing is an
    equi-join ON the doc id, so co-occurrence never leaves the doc's
    partition.

    Determinism: every count is an integer; the single float op is one
    ``ln`` of a ratio of exact integer products, rounded to 4.
    """
    td = doc_terms(docs, id_col, text_col)
    n_docs = docs.select(F.count(F.lit(1)).alias("n_docs"))
    dfs = td.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    eligible = (
        dfs.crossJoin(F.broadcast(n_docs))
        .filter(
            (F.col("df") >= min_df)
            & (F.col("df") <= F.lit(max_df_ratio) * F.col("n_docs"))
        )
        .select("term", "df")
    )
    tdf = td.join(F.broadcast(eligible.select("term")), "term")
    pairs = (
        tdf.alias("x")
        .join(tdf.alias("y"), "doc")
        .filter(F.col("x.term") < F.col("y.term"))
        .groupBy(
            F.col("x.term").alias("term_a"), F.col("y.term").alias("term_b")
        )
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair_n)
    )
    da = eligible.select(F.col("term").alias("term_a"), F.col("df").alias("df_a"))
    db = eligible.select(F.col("term").alias("term_b"), F.col("df").alias("df_b"))
    return (
        pairs.join(F.broadcast(da), "term_a")
        .join(F.broadcast(db), "term_b")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term_a",
            "term_b",
            "n_ab",
            F.round(
                F.log(
                    (F.col("n_ab") * F.col("n_docs"))
                    / (F.col("df_a") * F.col("df_b"))
                ),
                4,
            ).alias("pmi"),
        )
    )
