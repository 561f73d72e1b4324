"""Graded queries for full-text retrieval (operators/search.py).

BM25 determinism notes (why these hash-match across engines):
- ``avgdl`` is an exact integer sum / count — no float accumulation.
- per-doc scores fold term contributions in term-sorted order on BOTH
  sides (Spark ``F.aggregate`` left fold; DuckDB ``list(... ORDER BY
  term)`` + ``list_aggregate 'sum'``), so addition order is pinned.
- ranking happens on the ROUNDED score with doc-id tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.search import bm25_topk, inverted_index
from ..sources.tables import load_table
from . import register

_QUERY_TERMS = ("spark", "hash", "merge", "window")
_K = 10
_TOK = "regexp_split_to_array(lower(text), '\\s+')"


@register(
    "inverted_index",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id AS doc, unnest({_TOK}) AS term FROM documents
    ),
    td AS (SELECT DISTINCT doc, term FROM tok WHERE term <> '')
    SELECT term, count(*) AS df,
           string_agg(CAST(doc AS VARCHAR), ',' ORDER BY doc) AS postings
    FROM td GROUP BY term
    """,
    doc="Inverted index over the corpus: explode -> distinct(term, doc) "
    "-> one postings aggregation; ids ascending, CSV-serialized for "
    "canon safety. At scale the max_df_ratio cap suppresses stopword "
    "lists before the aggregate (see operators/search.py).",
)
def inverted_index_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return inverted_index(docs, "doc_id", "text")


@register(
    "bm25_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id AS doc, len({_TOK}) AS dl, unnest({_TOK}) AS term
      FROM documents
    ),
    totals AS (
      SELECT CAST(CAST(sum(dl) AS BIGINT) AS DOUBLE) / count(*) AS avgdl,
             count(*) AS n_docs
      FROM (SELECT DISTINCT doc, dl FROM tok)
    ),
    qt AS (
      SELECT doc, dl, term FROM tok
      WHERE term IN ('spark', 'hash', 'merge', 'window')
    ),
    tf AS (SELECT doc, dl, term, count(*) AS tf FROM qt GROUP BY doc, dl, term),
    dfs AS (SELECT term, count(DISTINCT doc) AS df FROM qt GROUP BY term),
    scored AS (
      SELECT tf.doc, tf.term,
             ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)) * tf * 2.2
               / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)) AS contrib
      FROM tf JOIN dfs USING (term) CROSS JOIN totals
    ),
    per_doc AS (
      SELECT doc,
             round(list_aggregate(list(contrib ORDER BY term), 'sum'), 4)
               AS score
      FROM scored GROUP BY doc
    )
    SELECT doc, score, row_number() OVER (ORDER BY score DESC, doc) AS rk
    FROM (SELECT doc, score FROM per_doc ORDER BY score DESC, doc LIMIT {_K})
    """,
    doc="BM25 top-10 for a four-term query: tf/df/avgdl statistics from "
    "one explode pass, query terms broadcast as an isin literal, final "
    "top-k via TakeOrderedAndProject — never a global sort.",
)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return bm25_topk(docs, "doc_id", "text", list(_QUERY_TERMS), _K)
