"""Corpus-wide boilerplate-segment removal (operators/text.py:
segment_array / boilerplate_hot_segments / boilerplate_removal) — the
CCNet/RefinedWeb line-dedup pass. LLM-pipeline surface; the reference
engine has no analog.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from erddap2agol_spark.operators import text as T

# "a b c" appears in 5 docs -> hot at max_df=3; every other segment is
# unique. doc 40 is shorter than one segment; doc 50 is empty.
_ROWS = (
    [(i, f"a b c x{i} y{i} z{i}") for i in range(5)]
    + [(10 + i, f"p{i} q{i} r{i} s{i} t{i} u{i}") for i in range(4)]
    + [(40, "tail pair"), (50, "")]
)


def _docs(spark):
    return spark.createDataFrame(_ROWS, "doc_id int, text string")


def test_hot_set_is_exactly_the_shared_segment(spark):
    hot = T.boilerplate_hot_segments(_docs(spark), "doc_id", "text").collect()
    assert [(r.seg, r.df) for r in hot] == [("a b c", 5)]


def test_hot_segment_counts_distinct_docs_not_occurrences(spark):
    # one doc repeating the segment 10 times contributes df=1
    docs = _docs(spark).union(
        _docs(spark).sparkSession.createDataFrame(
            [(99, " ".join(["a b c"] * 10))], "doc_id int, text string"
        )
    )
    hot = T.boilerplate_hot_segments(docs, "doc_id", "text").collect()
    assert [(r.seg, r.df) for r in hot] == [("a b c", 6)]


def test_clean_docs_remove_hot_and_preserve_order(spark):
    out = {
        r.doc_id: r
        for r in T.boilerplate_removal(_docs(spark), "doc_id", "text").collect()
    }
    assert len(out) == len(_ROWS)
    r0 = out[0]
    assert (r0.n_segments, r0.n_removed, r0.clean_text) == (2, 1, "x0 y0 z0")
    assert r0.removed_frac == 0.5
    # untouched doc: segments rejoin to the original (single-spaced) text
    r10 = out[10]
    assert (r10.n_segments, r10.n_removed) == (2, 0)
    assert r10.clean_text == "p0 q0 r0 s0 t0 u0"
    # sub-segment-length doc survives as its own short segment
    assert (out[40].n_segments, out[40].clean_text) == (1, "tail pair")
    # empty doc: one empty segment, kept (df('')=1 here)
    assert (out[50].n_segments, out[50].n_removed, out[50].clean_text) == (1, 0, "")


def test_hot_segment_moved_mid_doc_still_removed(spark):
    docs = _docs(spark).sparkSession.createDataFrame(
        [(i, "w%d v%d k%d a b c" % (i, i, i)) for i in range(4)],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in T.boilerplate_removal(docs, "doc_id", "text").collect()}
    assert all(r.clean_text == "w%d v%d k%d" % (i, i, i) for i, r in out.items())


def test_no_hot_segments_leaves_corpus_intact(spark):
    docs = _docs(spark).filter(F.col("doc_id") >= 10)
    out = T.boilerplate_removal(docs, "doc_id", "text")
    assert out.agg(F.sum("n_removed")).collect()[0][0] == 0


def test_clean_docs_plan_broadcasts_hot_set_one_corpus_shuffle(spark):
    """The rebuild path must NOT shuffle the corpus: the only shuffle
    Exchanges allowed are the hot-set doc-frequency aggregate plus the
    ensure_parallelism repartition of the small local input; the hot set
    reaches the docs as a broadcast (1-row array -> BNLJ)."""
    import contextlib
    import io

    df = T.boilerplate_removal(_docs(spark), "doc_id", "text")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastNestedLoopJoin" in plan  # the bounded 1-row hot array
    shuffles = re.findall(r"^\(\d+\) Exchange", plan, re.M)
    assert len(shuffles) <= 2, plan


def test_null_text_doc_retained_with_zero_segments(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None)], "doc_id int, text string"
    )
    out = {r.doc_id: r for r in T.boilerplate_removal(docs, "doc_id", "text").collect()}
    assert (out[2].n_segments, out[2].n_removed, out[2].clean_text) == (0, 0, "")
    assert out[2].removed_frac is None
