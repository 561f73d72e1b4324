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


def test_funnel_ordering_semantics(spark, tmp_path):
    """A click BEFORE the first view must not count as stage 2."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    rows = [
        # user 1: view -> click -> purchase, in order: stage 3
        (1, 1, "view", 10), (2, 1, "click", 20), (3, 1, "purchase", 30),
        # user 2: click precedes the only view: stage 1 only
        (4, 2, "click", 5), (5, 2, "view", 10),
        # user 3: view then purchase but no click between: stage 1
        (6, 3, "view", 10), (7, 3, "purchase", 30),
    ]
    base = dt.datetime(2024, 1, 1)
    tb = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [base + dt.timedelta(minutes=r[3]) for r in rows],
                pa.timestamp("ns"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([0.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tb, str(tmp_path / "events.parquet"))
    from erddap2agol_spark.queries import REGISTRY, _load_all

    _load_all()
    out = {
        r.user_id: r
        for r in REGISTRY["funnel_stages"].spark(spark, str(tmp_path)).collect()
    }
    assert out[1].stage_reached == 3
    assert out[2].stage_reached == 1 and out[2].click_ts is None
    assert out[3].stage_reached == 1 and out[3].purchase_ts is None


def test_bloom_contamination_no_false_negatives(spark):
    """The Bloom probe's one-sided-error guarantee: every document the
    EXACT n-gram check flags must also be flagged by the Bloom pass
    (false positives are allowed, false negatives never — dropping a
    truly contaminated doc is the unrecoverable failure)."""
    from erddap2agol_spark.operators import text as T
    from erddap2agol_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    exact = {
        r.doc_id: r.n_contaminated
        for r in T.contamination_counts(docs, ("src0", "src1"), n=5).collect()
    }
    bloom = {
        r.doc_id: r.n_maybe_contaminated
        for r in T.bloom_contamination(docs, ("src0", "src1"), n=5).collect()
    }
    assert set(bloom) == set(exact)  # same per-doc coverage
    flagged_exact = {d for d, n in exact.items() if n > 0}
    flagged_bloom = {d for d, n in bloom.items() if n > 0}
    assert flagged_exact <= flagged_bloom
    # and per-doc: bloom count dominates the exact count
    assert all(bloom[d] >= n for d, n in exact.items())


def test_cross_doc_tile_dedup_planted(spark):
    """A doc that repeats an earlier doc's text verbatim is flagged as
    fully duplicated; the first occurrence stays clean; an unrelated doc
    stays clean (ExactSubstr tile approximation)."""
    from erddap2agol_spark.operators.dedup import cross_doc_tile_dedup

    body = " ".join(f"w{i}" for i in range(32))  # 4 exact 8-token tiles
    other = " ".join(f"x{i}" for i in range(32))
    df = spark.createDataFrame(
        [(1, body), (2, body), (3, other)], ["doc_id", "text"]
    )
    got = {r["doc"]: r for r in cross_doc_tile_dedup(df, "doc_id", "text").collect()}
    assert got[1]["n_dup_tiles"] == 0           # first occurrence keeps all
    assert got[2]["dup_frac"] == 1.0            # verbatim copy fully flagged
    assert got[3]["n_dup_tiles"] == 0           # disjoint vocabulary clean
    assert all(g["n_tiles"] == 4 for g in got.values())


def test_cross_doc_tile_dedup_partial_overlap(spark):
    from erddap2agol_spark.operators.dedup import cross_doc_tile_dedup

    shared = " ".join(f"s{i}" for i in range(16))   # 2 shared tiles
    unique = " ".join(f"u{i}" for i in range(16))
    df = spark.createDataFrame(
        [(1, shared), (2, shared + " " + unique)], ["doc_id", "text"]
    )
    got = {r["doc"]: r for r in cross_doc_tile_dedup(df, "doc_id", "text").collect()}
    assert got[2]["n_tiles"] == 4 and got[2]["n_dup_tiles"] == 2
    assert got[2]["dup_frac"] == 0.5


def test_char_entropy_known_values(spark):
    """Closed-form cases: H('aabb')=1, H(uniform 4 chars)=2, single
    char=0, empty=0; prose lands in the natural-language band."""
    from pyspark.sql import functions as F

    from erddap2agol_spark.operators.text import char_entropy

    df = spark.createDataFrame(
        [
            (1, "aabb"),
            (2, "abcd"),
            (3, "aaaa"),
            (4, ""),
            (5, "the quick brown fox jumps over the lazy dog"),
        ],
        "id int, text string",
    )
    got = {
        r["id"]: r["h"]
        for r in df.select("id", char_entropy(F.col("text")).alias("h")).collect()
    }
    assert got[1] == 1.0
    assert got[2] == 2.0
    assert got[3] == 0.0
    assert got[4] == 0.0
    assert 3.5 <= got[5] <= 4.8  # English prose band


def test_char_entropy_null_text_stays_null(spark):
    """NULL text -> NULL entropy (relational semantics, matching the
    char_entropy_filter oracle); empty string stays the 0.0 convention."""
    from pyspark.sql import functions as F

    from erddap2agol_spark.operators.text import char_entropy

    df = spark.createDataFrame([(1, None), (2, "")], "id int, text string")
    got = {
        r["id"]: r["h"]
        for r in df.select("id", char_entropy(F.col("text")).alias("h")).collect()
    }
    assert got[1] is None and got[2] == 0.0
