"""Unit tests for inverted index + BM25 (operators/search.py)."""

from __future__ import annotations

from erddap2agol_spark.operators.search import bm25_topk, doc_terms, inverted_index

_DOCS = [
    (1, "whale shark reef"),
    (2, "reef coral reef"),
    (3, "shark shark shark bay"),
    (4, "the the the the"),
]


def _docs(spark, rows=_DOCS):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_doc_terms_distinct(spark):
    got = {(r["term"], r["doc"]) for r in doc_terms(_docs(spark), "doc_id", "text").collect()}
    assert ("reef", 2) in got
    # repeated terms collapse
    assert sum(1 for t, d in got if t == "shark" and d == 3) == 1


def test_inverted_index_postings_sorted(spark):
    idx = {r["term"]: r for r in inverted_index(_docs(spark), "doc_id", "text").collect()}
    assert idx["reef"]["df"] == 2 and idx["reef"]["postings"] == "1,2"
    assert idx["shark"]["df"] == 2 and idx["shark"]["postings"] == "1,3"
    assert idx["the"]["df"] == 1


def test_inverted_index_max_df_cap_drops_stopwords(spark):
    rows = [(i, "common word" + str(i)) for i in range(10)]
    idx = inverted_index(_docs(spark, rows), "doc_id", "text", max_df_ratio=0.5)
    terms = {r["term"] for r in idx.collect()}
    assert "common" not in terms  # df=10 > 0.5*10
    assert "word3" in terms


def test_bm25_prefers_matching_docs_and_rare_terms(spark):
    got = bm25_topk(_docs(spark), "doc_id", "text", ["shark", "bay"], k=4).collect()
    ranked = [r["doc"] for r in got]
    # doc 3 matches both terms (and 'bay' is rarest) -> top
    assert ranked[0] == 3
    # doc 2 and 4 match nothing -> absent
    assert set(ranked) == {3, 1}
    assert [r["rk"] for r in got] == list(range(1, len(got) + 1))


def test_bm25_k_bounds_output(spark):
    rows = [(i, "fish reef") for i in range(30)]
    got = bm25_topk(_docs(spark, rows), "doc_id", "text", ["reef"], k=5).collect()
    assert len(got) == 5


def test_bm25_plan_is_topk(spark):
    df = bm25_topk(_docs(spark), "doc_id", "text", ["shark"], k=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
