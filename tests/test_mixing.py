"""Unit tests for temperature corpus mixing (operators/mixing.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from erddap2agol_spark.operators.mixing import temperature_mix, temperature_rates


def _corpus(spark, sizes: dict[str, int]):
    rows, i = [], 0
    for g, n in sizes.items():
        for _ in range(n):
            rows.append((i, g))
            i += 1
    return spark.createDataFrame(rows, "id long, grp_col string")


def test_alpha_one_is_proportional(spark):
    df = _corpus(spark, {"a": 100, "b": 50, "c": 10})
    rates = {r["grp"]: r["rate"] for r in temperature_rates(df, "grp_col", 1.0, 0.5).collect()}
    # alpha=1 keeps the mixture as-is: every group samples at the budget
    assert all(abs(v - 0.5) < 1e-12 for v in rates.values())


def test_alpha_zero_targets_uniform(spark):
    df = _corpus(spark, {"a": 300, "b": 100, "c": 100})
    rates = {r["grp"]: r["rate"] for r in temperature_rates(df, "grp_col", 0.0, 0.6).collect()}
    # uniform target: 0.6*500/3 = 100 rows per group
    assert abs(rates["a"] - 100 / 300) < 1e-12
    assert abs(rates["b"] - 1.0) < 1e-12  # capped: target >= group size
    assert abs(rates["c"] - 1.0) < 1e-12


def test_flattening_monotonic_in_alpha(spark):
    df = _corpus(spark, {"head": 400, "tail": 50})
    r_half = {r["grp"]: r["rate"] for r in temperature_rates(df, "grp_col", 0.5, 0.5).collect()}
    r_one = {r["grp"]: r["rate"] for r in temperature_rates(df, "grp_col", 1.0, 0.5).collect()}
    # lower alpha suppresses the head harder and lifts the tail
    assert r_half["head"] < r_one["head"]
    assert r_half["tail"] > r_one["tail"]


def test_mix_kept_is_deterministic_and_near_budget(spark):
    df = _corpus(spark, {"a": 400, "b": 200, "c": 100})
    out = temperature_mix(df, "id", "grp_col", 0.5, 0.6)
    kept1 = sorted(r["id"] for r in out.filter("kept").collect())
    kept2 = sorted(r["id"] for r in out.filter("kept").collect())
    assert kept1 == kept2
    # realized total within sampling noise of the 60% budget (420 rows)
    assert abs(len(kept1) - 420) < 60


def test_mix_salt_changes_membership_not_rates(spark):
    df = _corpus(spark, {"a": 200, "b": 100})
    a = temperature_mix(df, "id", "grp_col", 0.5, 0.5, salt="s1")
    b = temperature_mix(df, "id", "grp_col", 0.5, 0.5, salt="s2")
    ka = {r["id"] for r in a.filter("kept").collect()}
    kb = {r["id"] for r in b.filter("kept").collect()}
    assert ka != kb
    ra = {(r["grp_col"], r["rate"]) for r in a.select("grp_col", "rate").distinct().collect()}
    rb = {(r["grp_col"], r["rate"]) for r in b.select("grp_col", "rate").distinct().collect()}
    assert ra == rb


def test_corpus_never_shuffles(spark):
    df = _corpus(spark, {"a": 50, "b": 20})
    out = temperature_mix(df, "id", "grp_col", 0.5, 0.5).filter("kept")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the rates side aggregates (exchanges allowed); the corpus side must
    # join by broadcast, never sort-merge
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# DSIR importance weighting (round 4)
# ---------------------------------------------------------------------------


def _bilingual_corpus(spark):
    """Two sharply separated vocabularies: 'latin' docs vs 'greek' docs."""
    rows = []
    for i in range(40):
        rows.append((i, "lorem ipsum dolor sit amet consectetur", "latin"))
    for i in range(40, 60):
        rows.append((i, "alpha beta gamma delta epsilon zeta", "greek"))
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_dsir_separates_target_vocabulary(spark):
    from erddap2agol_spark.operators.mixing import dsir_weights

    docs = _bilingual_corpus(spark)
    target = docs.filter("lang = 'latin'")
    w = dsir_weights(docs, target, "doc_id", "text")
    got = {r["doc"]: r["dsir_weight"] for r in w.collect()}
    latin = [got[i] for i in range(40)]
    greek = [got[i] for i in range(40, 60)]
    # every latin doc must outweigh every greek doc — disjoint vocab
    assert min(latin) > max(greek)


def test_dsir_ratio_table_is_full_spine(spark):
    from erddap2agol_spark.operators.mixing import (
        DSIR_BUCKETS,
        dsir_log_ratios,
    )

    docs = _bilingual_corpus(spark)
    ratios = dsir_log_ratios(docs, docs.filter("lang = 'latin'"), "doc_id", "text")
    rows = ratios.collect()
    assert len(rows) == DSIR_BUCKETS
    assert all(r["log_ratio"] is not None for r in rows)


def test_dsir_corpus_side_broadcasts(spark):
    from erddap2agol_spark.operators.mixing import dsir_weights

    docs = _bilingual_corpus(spark)
    out = dsir_weights(docs, docs.filter("lang = 'latin'"), "doc_id", "text")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # ratio table joins the token stream by broadcast only
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
