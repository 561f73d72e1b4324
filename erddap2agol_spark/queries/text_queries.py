"""Text-analysis queries over the ``documents`` table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import text as T
from ..sources.tables import load_table
from . import register


@register(
    "text_tokens",
    oracle="""
    SELECT doc_id,
           len(regexp_split_to_array(lower(text), '\\s+')) AS n_tokens,
           CAST(ceil(length(text) / 4) AS BIGINT) AS est_bpe_tokens,
           length(text) AS n_chars_actual
    FROM documents
    """,
    doc="Token counting: whitespace tokens + BPE-ish chars/4 estimate.",
)
def text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        T.token_count(c).alias("n_tokens"),
        T.token_estimate(c).alias("est_bpe_tokens"),
        F.length(c).alias("n_chars_actual"),
    )


@register(
    "text_quality",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t, text FROM documents
    ),
    m AS (
      SELECT doc_id,
        round(list_sum(list_transform(t, w -> length(w)))
              / greatest(len(t), 1), 6) AS avg_word_len,
        round(CAST(len(list_filter(t, w -> list_contains(
                ['the','a','of','and','to','in','is','it','for','on'], w))) AS DOUBLE)
              / greatest(len(t), 1), 6) AS stop_ratio,
        len(t) AS n
      FROM toks
    )
    SELECT doc_id, avg_word_len, stop_ratio AS stopword_ratio,
           round(CAST((CASE WHEN n BETWEEN 5 AND 10000 THEN 0.4 ELSE 0.0 END)
               + (CASE WHEN stop_ratio >= 0.05 THEN 0.3 ELSE 0.0 END)
               + (CASE WHEN avg_word_len BETWEEN 2.5 AND 10 THEN 0.3 ELSE 0.0 END)
               AS DOUBLE), 2) AS quality
    FROM m
    """,
    doc="Quality scoring: length/stopword/word-shape heuristics in [0,1] "
    "— the cheap pre-filters of an LLM-corpus pipeline.",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    c = F.col("text")
    return docs.select(
        "doc_id",
        T.avg_word_len(c).alias("avg_word_len"),
        T.stopword_ratio(c).alias("stopword_ratio"),
        T.quality_score(c).alias("quality"),
    )


def _dd_hits(words: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in words)
    return (
        "len(list_filter(regexp_split_to_array(lower(text), '\\s+'), "
        f"w -> list_contains([{lst}], w)))"
    )


_LANG_CASES = " ".join(
    f"WHEN {_dd_hits(words)} = best AND best > 0 THEN '{lang}'"
    for lang, words in T.LANG_MARKERS.items()
)
_BEST = "greatest(" + ", ".join(_dd_hits(w) for w in T.LANG_MARKERS.values()) + ")"


@register(
    "text_langid",
    oracle=f"""
    SELECT doc_id,
           CASE {_LANG_CASES.replace('best', _BEST)} ELSE 'und' END AS pred_lang
    FROM documents
    """,
    doc="Stopword-marker language ID: argmax of per-language marker hits "
    "(first language wins ties, 'und' when nothing matches).",
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.lang_id(F.col("text")).alias("pred_lang"))


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(array_to_string(regexp_split_to_array(lower(text), '\\s+'), ' '))
             AS fingerprint
    FROM documents
    """,
    doc="Document fingerprinting over normalized text (ST3/ST4 "
    "change-detection analog).",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", T.fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "doc_chunking",
    oracle="""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS t FROM documents
    ),
    starts AS (
      SELECT doc_id, t,
             unnest(generate_series(1, greatest(len(t) - 8, 1), 24)) AS start,
             generate_subscripts(generate_series(1, greatest(len(t) - 8, 1), 24), 1) AS pos
      FROM toks
    )
    SELECT doc_id, CAST(pos - 1 AS INTEGER) AS chunk_idx,
           array_to_string(t[start:start+31], ' ') AS chunk_text,
           CAST(least(len(t) - start + 1, 32) AS INTEGER) AS n_chunk_tokens
    FROM starts
    """,
    doc="Context-length packing: overlapping 32-token chunks with 8-token "
    "overlap — one explode, no shuffle; the training-data windowing op.",
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.chunk_documents(
        load_table(spark, sf_dir, "documents"), "doc_id", "text",
        max_tokens=32, overlap=8,
    )
