"""Corpus-curation queries: deterministic sampling, train/val/test
splitting, and embedding quantization over ``documents``/``embeddings``.

All decisions derive from md5 buckets or pure float arithmetic, so every
query is bit-comparable against its DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import sampling
from ..operators.similarity import quantize_int8
from ..sources.tables import load_table
from . import register

_HEX = "0123456789abcdef"


def _bucket_sql(salt: str) -> str:
    """DuckDB mirror of sampling.hash_bucket: first 4 md5 hex chars as a
    16-bit int (DuckDB has no conv(); nibble arithmetic via instr)."""
    return f"""
      SELECT doc_id,
             (instr('{_HEX}', h[1]) - 1) * 4096 + (instr('{_HEX}', h[2]) - 1) * 256 +
             (instr('{_HEX}', h[3]) - 1) * 16   + (instr('{_HEX}', h[4]) - 1) AS bucket
      FROM (SELECT doc_id, md5('{salt}:' || CAST(doc_id AS VARCHAR)) AS h FROM documents)
    """


@register(
    "doc_hash_split",
    oracle=f"""
    WITH b AS ({_bucket_sql("split")})
    SELECT doc_id, bucket,
           CASE WHEN bucket < 52428 THEN 'train'
                WHEN bucket < 58982 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    doc="Deterministic 80/10/10 train/val/test assignment from an md5 "
    "bucket of the doc id — a narrow map (no shuffle), stable under "
    "corpus growth so eval sets never leak into train.",
)
def doc_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = sampling.hash_split(
        docs, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    return out.select(
        "doc_id",
        sampling.hash_bucket(F.col("doc_id"), "split").alias("bucket"),
        "split",
    )


@register(
    "doc_hash_sample",
    oracle=f"""
    WITH b AS ({_bucket_sql("sample")})
    SELECT doc_id FROM b WHERE bucket < 16384
    """,
    doc="Deterministic ~25% corpus sample: membership is a pure function "
    "of the id (stable under retries and partition changes, unlike "
    "rand()-based sampling).",
)
def doc_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return sampling.hash_sample(docs, "doc_id", 0.25).select("doc_id")


@register(
    "emb_quantize",
    oracle="""
    SELECT vec_id AS id,
           CASE WHEN amax > 0 THEN
             list_transform(v, x -> CAST(floor(x * (127.0 / amax) + 0.5) AS INTEGER))
           END AS q8,
           CASE WHEN amax > 0 THEN round(127.0 / amax, 6) END AS scale
    FROM (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS amax
      FROM embeddings
    )
    """,
    doc="Symmetric int8 embedding quantization (scale = 127/max|x|, "
    "floor(x*scale+0.5) so rounding is engine-independent) — pure array "
    "algebra, no shuffle; the 4x storage compression step before ANN "
    "serving.",
)
def emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return quantize_int8(emb, "vec_id", "embedding")
