"""Unit coverage for the corpus-hygiene operators: intra-doc repetition,
benchmark contamination, and embedding label centroids — planted fixtures
with hand-computed expectations (the oracle-parity suite covers them on
the real tables)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.operators import similarity
from erddap2agol_spark.operators import text as T


def _profile(spark, rows):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = T.repetition_profile(df, "doc_id", "text").collect()
    return {r.doc_id: r for r in out}


def test_repetition_planted(spark):
    got = _profile(
        spark,
        [
            (1, "a a a a"),          # fully repeated
            (2, "w x y z"),          # fully distinct
            (3, "spam ham spam ham spam"),  # alternating
        ],
    )
    r1 = got[1]
    assert r1.n_tokens == 4
    assert r1.dup_word_frac == pytest.approx(0.75)
    assert r1.top_bigram_frac == pytest.approx(1.0)  # "a a" is every bigram
    r2 = got[2]
    assert r2.dup_word_frac == 0.0
    assert r2.top_bigram_frac == pytest.approx(1 / 3)  # all bigrams unique
    r3 = got[3]
    assert r3.dup_word_frac == pytest.approx(1 - 2 / 5)
    assert r3.top_bigram_frac == pytest.approx(2 / 4)  # "spam ham" twice


def test_repetition_single_token_doc(spark):
    got = _profile(spark, [(1, "alone")])
    assert got[1].n_tokens == 1
    assert got[1].dup_word_frac == 0.0
    assert got[1].top_bigram_frac == 0.0  # no bigrams; doc still present


def test_word_ngrams_shorter_than_n(spark):
    df = spark.createDataFrame([("a b c",)], ["text"])
    got = df.select(T.word_ngrams(F.col("text"), 5).alias("g")).head()
    assert got.g == []
    got3 = df.select(T.word_ngrams(F.col("text"), 3).alias("g")).head()
    assert got3.g == ["a b c"]


def test_contamination_planted(spark):
    bench_text = "one two three four five six"
    docs = spark.createDataFrame(
        [
            (0, bench_text, "bench"),
            # shares the 5-gram "two three four five six" with the benchmark
            (1, "zz two three four five six yy", "web"),
            (2, "p q r s t u v", "web"),  # disjoint vocabulary
        ],
        ["doc_id", "text", "source"],
    )
    out = {
        r.doc_id: r
        for r in T.contamination_counts(docs, bench_sources=("bench",), n=5).collect()
    }
    assert set(out) == {1, 2}  # benchmark docs excluded from the report
    assert out[1].n_contaminated == 1 and out[1].flagged
    assert out[1].n_ngrams == 3
    assert out[1].contamination_frac == pytest.approx(round(1 / 3, 6))
    assert out[2].n_contaminated == 0 and not out[2].flagged


def test_label_centroids_math(spark):
    df = spark.createDataFrame(
        [
            (1, [1.0, 2.0], 0),
            (2, [3.0, 4.0], 0),
            (3, [10.0, -10.0], 1),
        ],
        ["vec_id", "embedding", "label"],
    )
    out = {
        (r.label, r.dim): r
        for r in similarity.label_centroids(df, "embedding", "label").collect()
    }
    assert out[(0, 0)].centroid == pytest.approx(2.0)
    assert out[(0, 1)].centroid == pytest.approx(3.0)
    assert out[(0, 0)].n_vecs == 2
    assert out[(1, 0)].centroid == pytest.approx(10.0)
    assert out[(1, 1)].n_vecs == 1
