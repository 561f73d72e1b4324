"""jaccard_pairs_auto regime dispatch (VERDICT r4 #2): the sum(df^2)
probe promoted from a docstring note to a dispatching operator, with a
planted fixture for each regime."""

from __future__ import annotations

import pytest

from erddap2agol_spark.operators import dedup


@pytest.fixture(scope="module")
def uniform_docs(spark):
    """30 docs with fully disjoint vocabularies — every shingle df=1,
    fan-out ratio 1: the posting-join regime."""
    rows = [
        (i, " ".join(f"u{i}w{j}" for j in range(12))) for i in range(30)
    ]
    # one planted near-dup pair so the result is non-empty
    rows.append((100, rows[0][1] + " extraword"))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def skewed_docs(spark):
    """300 docs sharing one boilerplate sentence (hot shingles df=300)
    plus unique bodies — the web-corpus skew regime where the posting
    join's sum(df^2) explodes and prefix filtering wins."""
    boiler = "all rights reserved copyright two thousand site inc"
    rows = []
    for i in range(300):
        base = i - 1 if i in (1, 3) else i
        toks = [f"s{base}w{j}" for j in range(10)]
        if i in (1, 3):
            toks[-1] = "CHANGED"
        rows.append((i, " ".join(toks) + " " + boiler))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_probe_picks_posting_on_uniform(spark, uniform_docs):
    assert dedup.jaccard_regime_probe(uniform_docs, "doc_id", "text") == "posting"


def test_probe_picks_prefix_on_boilerplate_skew(spark, skewed_docs):
    # default threshold: the planted df=300 boilerplate pushes the mean
    # pair fan-out per posting row past 64
    assert dedup.jaccard_regime_probe(skewed_docs, "doc_id", "text") == "prefix"


def _pairs(df):
    return {(r.doc_a, r.doc_b): round(r.jaccard, 6) for r in df.collect()}


def test_auto_posting_branch_matches_definition(spark, uniform_docs):
    auto = dedup.jaccard_pairs_auto(uniform_docs, "doc_id", "text", threshold=0.5)
    assert auto.columns == ["doc_a", "doc_b", "jaccard"]
    direct = dedup.ngram_jaccard_pairs(
        uniform_docs, "doc_id", "text", threshold=0.5
    )
    got = _pairs(auto)
    assert got == _pairs(direct)
    assert (0, 100) in got  # the planted near-dup survives


def test_auto_prefix_branch_matches_posting_result(spark, skewed_docs):
    """The two regimes are different PLANS for the same answer: on the
    skew fixture (auto dispatches to prefix) the result must equal the
    posting join's, pair for pair and score for score."""
    auto = dedup.jaccard_pairs_auto(skewed_docs, "doc_id", "text", threshold=0.5)
    assert auto.columns == ["doc_a", "doc_b", "jaccard"]
    direct = dedup.ngram_jaccard_pairs(
        skewed_docs, "doc_id", "text", threshold=0.5
    )
    got = _pairs(auto)
    assert got == _pairs(direct)
    assert (0, 1) in got and (2, 3) in got


def test_sampled_probe_agrees_with_exact(spark, uniform_docs, skewed_docs):
    """The 100 TB probe mode: a deterministic half-rate doc sample with
    the 1/r fan-out correction picks the same regime as the exact pass
    on both planted fixtures."""
    assert (
        dedup.jaccard_regime_probe(
            uniform_docs, "doc_id", "text", sample_rate=0.5
        )
        == "posting"
    )
    assert (
        dedup.jaccard_regime_probe(skewed_docs, "doc_id", "text", sample_rate=0.5)
        == "prefix"
    )
    with pytest.raises(ValueError, match="sample_rate"):
        dedup.jaccard_regime_probe(uniform_docs, "doc_id", "text", sample_rate=0.0)


def test_small_rate_probe_is_unbiased_on_uniform(spark):
    """ADVICE r5: under binomial doc thinning E[sum(df_s^2)/sum(df_s)]
    ~ r*ratio + (1-r), so a plain `/ r` correction inflates a perfectly
    uniform corpus (true ratio ~1) to ~1/r — at the 100 TB sample rates
    (r < 1/64) that mis-dispatched uniform corpora to the ~40x-slower
    prefix regime. The additive-term-subtracting correction must keep
    the uniform fixture in the posting regime at a 1% sample."""
    rows = [
        (i, " ".join(f"u{i}w{j}" for j in range(12))) for i in range(2000)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    assert (
        dedup.jaccard_regime_probe(docs, "doc_id", "text", sample_rate=0.01)
        == "posting"
    )


def test_fanout_threshold_is_the_dispatch_knob(spark, uniform_docs):
    # forcing the threshold below 1 flips even the uniform corpus to the
    # prefix branch — proving dispatch consults the probe, not the data
    assert (
        dedup.jaccard_regime_probe(
            uniform_docs, "doc_id", "text", fanout_threshold=0.5
        )
        == "prefix"
    )
