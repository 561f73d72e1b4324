"""Fuzz the MinHash front end (word_shingles / band_keys) against an
independent Python mirror — the banding feeds batch LSH AND the
streaming ingest gate, so a drift here silently changes which documents
the whole dedup family considers near-duplicates."""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from erddap2agol_spark.operators import dedup

_WORD = st.text(
    alphabet=st.characters(
        whitelist_categories=("Ll", "Lu", "Nd"), max_codepoint=0x2FF
    ),
    min_size=1,
    max_size=8,
)
_TEXT = st.lists(_WORD, min_size=0, max_size=12).map(" ".join)


def _mirror_shingles(text: str, n: int) -> list[str]:
    """Independent mirror of word_shingles: lowercase, split on runs of
    whitespace, distinct n-grams in first-occurrence order."""
    toks = re.split(r"\s+", text.lower())
    grams = [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
    seen: dict[str, None] = {}
    for g in grams:
        seen.setdefault(g)
    return list(seen)


@pytest.mark.usefixtures("spark")
class TestShingleFuzz:
    @settings(max_examples=25, deadline=None)
    @given(texts=st.lists(_TEXT, min_size=1, max_size=6), n=st.integers(1, 4))
    def test_word_shingles_match_python_mirror(self, spark, texts, n):
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id bigint, text string"
        )
        got = {
            r.doc_id: list(r.sh)
            for r in df.select(
                "doc_id", dedup.word_shingles(F.col("text"), n).alias("sh")
            ).collect()
        }
        for i, t in enumerate(texts):
            assert got[i] == _mirror_shingles(t, n), (t, n)

    @settings(max_examples=10, deadline=None)
    @given(
        n_docs=st.integers(1, 5),
        n_perm=st.sampled_from([4, 8]),
        rows_per_band=st.sampled_from([1, 2]),
    )
    def test_band_keys_cover_exactly_the_signature(
        self, spark, n_docs, n_perm, rows_per_band
    ):
        """Every (doc, band) appears exactly once, band ids are dense
        0..n_bands-1, and the band_sig is the |-join of that band's
        signature slice — the invariant both LSH consumers rely on."""
        docs = spark.createDataFrame(
            [(i, f"w{i} w{i+1} w{i+2} w{i+3} w{i+4}") for i in range(n_docs)],
            "doc_id bigint, text string",
        )
        sig = dedup.minhash_signatures(docs, "doc_id", "text", n_perm=n_perm)
        wide = {r.doc: r.asDict() for r in sig.collect()}
        bands = dedup.band_keys(sig, n_perm, rows_per_band).collect()
        n_bands = n_perm // rows_per_band
        assert len(bands) == n_docs * n_bands
        seen = set()
        for r in bands:
            assert 0 <= r.band < n_bands
            assert (r.doc, r.band) not in seen
            seen.add((r.doc, r.band))
            expect = "|".join(
                wide[r.doc][f"m{r.band * rows_per_band + k}"]
                for k in range(rows_per_band)
            )
            assert r.band_sig == expect


def test_sibling_shingle_projections_do_not_cross_bind(spark):
    """Three shingle widths co-projected over the same column — the
    lambda-capture cross-binding class found in the geometry parsers
    (VERDICT r4 work): siblings must not leak arrays between their
    transforms' lambda variables."""
    texts = ["a b c d e", "x", "", "one two three four five six"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id bigint, t string"
    )
    from pyspark.sql import functions as F

    rows = {
        r.id: r
        for r in df.select(
            "id",
            dedup.word_shingles(F.col("t"), 2).alias("s2"),
            dedup.word_shingles(F.col("t"), 3).alias("s3"),
            dedup.word_shingles(F.col("t"), 4).alias("s4"),
        ).collect()
    }
    for i, t in enumerate(texts):
        for n, col in ((2, "s2"), (3, "s3"), (4, "s4")):
            assert list(rows[i][col]) == _mirror_shingles(t, n), (t, n)
