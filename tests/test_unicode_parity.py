"""Unicode cross-engine parity: the text operators must agree with DuckDB
on multibyte content (CJK, emoji, combining accents) — Java regex vs RE2,
UTF-8 length/substr semantics, md5-of-unicode all have room to diverge.
The full-registry audit (2026-08-15) was clean; this permanent subset
covers the most string-intensive oracled queries so a regression can't
land silently."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.queries import REGISTRY, _load_all
from erddap2agol_spark.sources.tables import TABLE_NAMES

from .oracle_harness import compare, duckdb_conn

_load_all()

_TEXT_QUERIES = [
    "text_langid",
    "text_quality",
    "text_tokens",
    "char_stats",
    "doc_fingerprint",
    "doc_chunks_overlap",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "token_histogram",
    "pii_redaction",
    "sanitize_names",
]


@pytest.fixture(scope="module")
def uni_sf(spark, tmp_path_factory):
    src = "/root/testdata/sf0.001"
    d = str(tmp_path_factory.mktemp("uni_sf"))
    for t in TABLE_NAMES:
        p = os.path.join(src, f"{t}.parquet")
        if t == "documents":
            df = spark.read.parquet(p)
            uni = F.concat(
                F.lit("héllo wörld 海洋观测 \U0001F30A "),
                F.col("text"),
                F.lit(" café naïve Über Ελλάς"),
            )
            df = df.withColumn("text", uni).withColumn("n_chars", F.length("text"))
            tmp = os.path.join(d, "_docs_dir")
            df.coalesce(1).write.mode("overwrite").parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            shutil.move(part, os.path.join(d, "documents.parquet"))
            shutil.rmtree(tmp)
        else:
            os.symlink(p, os.path.join(d, f"{t}.parquet"))
    return d


@pytest.mark.parametrize("name", _TEXT_QUERIES)
def test_unicode_parity(spark, uni_sf, name):
    spec = REGISTRY[name]
    con = duckdb_conn(uni_sf)
    try:
        problems = compare(spec.spark(spark, uni_sf), con, spec.oracle)
    finally:
        con.close()
    assert not problems, f"{name}: " + "; ".join(problems)
