"""Unit tests for deterministic sketches (operators/sketch.py)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from erddap2agol_spark.operators.sketch import (
    KMV_NIBBLES,
    countmin_cells,
    countmin_estimates,
    duckdb_hex_int,
    kmv_distinct,
)


def _keys(spark, n, dup=1):
    return spark.range(n * dup).select(
        (F.col("id") % n).cast("string").alias("k")
    )


def test_kmv_exhaustive_when_under_k(spark):
    [r] = kmv_distinct(_keys(spark, 40, dup=3), F.col("k"), k=64).collect()
    assert r["n_kept"] == 40
    assert r["est_distinct"] == 40.0  # sketch is exact below k


def test_kmv_estimate_within_expected_error(spark):
    # k=64 -> relative std err ~ 1/sqrt(k-2) ~ 12.7%; allow 4 sigma
    [r] = kmv_distinct(_keys(spark, 2000), F.col("k"), k=64).collect()
    assert r["n_kept"] == 64
    assert abs(r["est_distinct"] - 2000) / 2000 < 0.5
    # duplicates never change a distinct sketch
    [r2] = kmv_distinct(_keys(spark, 2000, dup=4), F.col("k"), k=64).collect()
    assert r2["est_distinct"] == r["est_distinct"]


def test_kmv_global_plan_is_topk_not_sort(spark):
    df = kmv_distinct(_keys(spark, 2000), F.col("k"), k=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_kmv_grouped_matches_global_per_group(spark):
    df = _keys(spark, 500).withColumn("grp", F.lit("a"))
    [g] = kmv_distinct(df, F.col("k"), k=64, by=F.col("grp")).collect()
    [s] = kmv_distinct(df, F.col("k"), k=64).collect()
    assert g["kth_hash"] == s["kth_hash"]
    assert g["est_distinct"] == s["est_distinct"]


def test_duckdb_hex_int_matches_spark_conv(spark):
    vals = [("alpha",), ("beta",), ("42",)]
    df = spark.createDataFrame(vals, "s string").select(
        F.conv(F.substring(F.md5("s"), 1, KMV_NIBBLES), 16, 10)
        .cast("long")
        .alias("hv"),
        "s",
    )
    got = {r["s"]: r["hv"] for r in df.collect()}
    con = duckdb.connect()
    for (s,) in vals:
        [(hv,)] = con.execute(
            f"SELECT {duckdb_hex_int(f'{s!r}', KMV_NIBBLES)}"
        ).fetchall()
        assert got[s] == hv, s


def test_countmin_mass_conservation_and_overcount(spark):
    df = _keys(spark, 100, dup=7)
    cells = countmin_cells(df, F.col("k"), depth=3, width=16)
    per_row = {
        r["j"]: r["s"]
        for r in cells.groupBy("j").agg(F.sum("cnt").alias("s")).collect()
    }
    # every hash row sees every input row exactly once
    assert per_row == {0: 700, 1: 700, 2: 700}
    est = countmin_estimates(df, F.col("k"), depth=3, width=16).collect()
    assert len(est) == 100
    assert all(r["n_est"] >= r["n_true"] for r in est)
    assert all(r["n_true"] == 7 for r in est)


def test_countmin_wide_sketch_is_near_exact(spark):
    df = _keys(spark, 20, dup=5)
    est = countmin_estimates(df, F.col("k"), depth=3, width=4096).collect()
    # 20 keys in 4096 buckets x 3 rows: collisions in all three rows are
    # vanishingly unlikely -> min over rows recovers the exact count
    assert all(r["overcount"] == 0 for r in est)


def test_countmin_cells_bounded(spark):
    cells = countmin_cells(_keys(spark, 5000), F.col("k"), depth=3, width=32)
    assert cells.count() <= 3 * 32


def test_hll_registers_merge_by_max(spark):
    """The mergeable-sketch property: sketching two shards independently
    and taking the register-wise max equals sketching the union — the
    reason HLL replaces COUNT(DISTINCT) at fleet scale."""
    from pyspark.sql import functions as F

    from erddap2agol_spark.operators.sketch import hll_registers

    a = spark.range(0, 400).select(F.col("id").cast("string").alias("k"))
    b = spark.range(300, 700).select(F.col("id").cast("string").alias("k"))
    u = a.union(b)
    ra = hll_registers(a, F.col("k"), reg_nibbles=1)
    rb = hll_registers(b, F.col("k"), reg_nibbles=1)
    merged = (
        ra.union(rb).groupBy("reg").agg(F.max("mx").alias("mx")).orderBy("reg")
    )
    direct = hll_registers(u, F.col("k"), reg_nibbles=1).orderBy("reg")
    assert [tuple(r) for r in merged.collect()] == [
        tuple(r) for r in direct.collect()
    ]


def test_hll_estimate_tracks_cardinality(spark):
    from pyspark.sql import functions as F

    from erddap2agol_spark.operators.sketch import hll_estimate

    df = spark.range(0, 2000).select(F.col("id").cast("string").alias("k"))
    row = hll_estimate(df, F.col("k"), reg_nibbles=2).first()
    # m=256 registers: standard error ~1.04/sqrt(m) ~ 6.5%; allow 3 sigma
    assert abs(row["raw_estimate"] - 2000) / 2000 < 0.2


def test_kmv_pair_jaccard_tracks_truth(spark):
    """Planted overlap: estimates within sketch error of the truth,
    disjoint pairs exactly zero."""
    from pyspark.sql import functions as F

    from erddap2agol_spark.operators.sketch import kmv_pair_jaccard

    rows = (
        [("A", i) for i in range(1000)]
        + [("B", i) for i in range(500, 1500)]
        + [("C", i) for i in range(5000, 5100)]
    )
    df = spark.createDataFrame(rows, "grp string, uid int")
    out = {
        (r.grp_a, r.grp_b): (r.est_jaccard, r.est_union, r.est_intersection)
        for r in kmv_pair_jaccard(
            df, F.col("uid").cast("string"), F.col("grp"), k=256
        ).collect()
    }
    j, u, i = out[("A", "B")]
    assert abs(j - 1 / 3) < 0.08
    assert abs(u - 1500) < 250
    assert abs(i - 500) < 150
    assert out[("A", "C")][0] == 0.0 and out[("B", "C")][0] == 0.0


def test_kmv_pair_jaccard_exact_when_small(spark):
    """Groups smaller than k: the sketch IS the set, so every estimate
    is exact."""
    from pyspark.sql import functions as F

    from erddap2agol_spark.operators.sketch import kmv_pair_jaccard

    rows = [("X", i) for i in range(10)] + [("Y", i) for i in range(5, 15)]
    df = spark.createDataFrame(rows, "grp string, uid int")
    r = kmv_pair_jaccard(
        df, F.col("uid").cast("string"), F.col("grp"), k=64
    ).collect()[0]
    assert (r.est_jaccard, r.est_union, r.est_intersection) == (
        round(5 / 15, 4),
        15.0,
        round(5 / 15 * 15, 4),
    )


def test_cms_join_size_never_underestimates(spark):
    from pyspark.sql import functions as F

    from erddap2agol_spark.operators.sketch import cms_join_size

    left = spark.createDataFrame([(i % 7,) for i in range(100)], "k int")
    right = spark.createDataFrame([(i % 5,) for i in range(60)], "k int")
    true_size = left.join(right, "k").count()
    r = cms_join_size(
        left, right, F.col("k").cast("string"), F.col("k").cast("string"),
        depth=3, width=32,
    ).collect()[0]
    assert r.est_join_size >= true_size  # CMS inner product overcounts
    assert r.max_depth_estimate >= r.est_join_size


def test_histogram_bins_merge_by_sum(spark):
    """Mergeable-summary property: the histogram of a union equals the
    bin-wise SUM of per-shard histograms (what lets shards sketch
    independently at 100 TB and merge in O(n_bins))."""
    from erddap2agol_spark.operators.sketch import histogram_bins

    a = spark.range(0, 5000).select((F.col("id") % 97).cast("double").alias("v"))
    b = spark.range(0, 3000).select((F.col("id") % 53).cast("double").alias("v"))
    whole = histogram_bins(a.unionAll(b), F.col("v"), 0.0, 100.0, 16)
    parts = (
        histogram_bins(a, F.col("v"), 0.0, 100.0, 16)
        .unionAll(histogram_bins(b, F.col("v"), 0.0, 100.0, 16))
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, parts.collect())
    )


def test_histogram_bins_clamps_out_of_range(spark):
    """Values outside [lo, hi) land in the edge bins — never a negative
    or overflowing bin id (the zorder_key clamp lesson, ADVICE r3)."""
    from erddap2agol_spark.operators.sketch import histogram_bins

    df = spark.createDataFrame(
        [(-1e9,), (-0.001,), (0.0,), (99.999,), (100.0,), (1e9,)], ["v"]
    )
    rows = {
        r["bin"]: r["cnt"]
        for r in histogram_bins(df, F.col("v"), 0.0, 100.0, 10).collect()
    }
    assert set(rows) == {0, 9}
    assert rows[0] == 3 and rows[9] == 3


def test_histogram_quantiles_error_bounded_by_bin_width(spark):
    """|est - exact| <= one bin width for every requested quantile, on
    data with empty interior bins (gaps exercise the fold's crossing
    logic: interpolation happens inside the crossing bin only)."""
    from erddap2agol_spark.operators.sketch import histogram_quantiles

    df = (
        spark.range(0, 4000)
        .select(
            F.when(F.col("id") % 3 == 0, (F.col("id") % 100).cast("double"))
            .otherwise((F.col("id") % 100).cast("double") + 900.0)
            .alias("v")
        )
    )
    qs = [0.1, 0.5, 0.9, 0.99]
    width = (1000.0 - 0.0) / 64
    got = {
        r["q"]: r["est_value"]
        for r in histogram_quantiles(
            df, F.col("v"), qs, 0.0, 1000.0, 64
        ).collect()
    }
    exact = df.agg(
        F.percentile(F.col("v"), F.array(*[F.lit(q) for q in qs])).alias("e")
    ).collect()[0]["e"]
    for q, ev in zip(qs, exact):
        assert abs(got[q] - ev) <= width, (q, got[q], ev)


def test_histogram_quantiles_plan_is_agg_only(spark):
    """The readout plan carries NO Window and NO join: bin map + one
    bounded hash aggregate + one-row fold (the shape that survives
    100x — contrast exact percentile(), which buffers every value in a
    single aggregation state)."""
    import contextlib
    import io

    from erddap2agol_spark.operators.sketch import histogram_quantiles

    df = spark.range(0, 1000).select(F.col("id").cast("double").alias("v"))
    out = histogram_quantiles(df, F.col("v"), [0.5, 0.9], 0.0, 1000.0, 32)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan
    assert "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final bin count


def test_histogram_excludes_nulls_like_percentile(spark):
    """NULLs are excluded from the sketch — the same rows percentile()
    ignores (without the filter, Spark's null-skipping greatest() would
    silently fold NULL into bin 0 and corrupt every readout)."""
    from erddap2agol_spark.operators.sketch import (
        histogram_bins,
        histogram_quantiles,
    )

    df = spark.createDataFrame(
        [(1.0,), (None,), (None,), (50.0,)], "v double"
    )
    bins = {
        r["bin"]: r["cnt"]
        for r in histogram_bins(df, F.col("v"), 0.0, 100.0, 10).collect()
    }
    assert bins == {0: 1, 5: 1}
    out = histogram_quantiles(df, F.col("v"), [0.5], 0.0, 100.0, 10).collect()
    assert out[0]["n_rows"] == 2  # NULLs out of the rank base too
    # rank contract on this (sparse) pair: the 0.5*2 = 1st order
    # statistic is 1.0, which lives in bin 0 — est stays in bin 0
    assert 0.0 <= out[0]["est_value"] <= 10.0


def test_histogram_rank_guarantee_on_sparse_tail(spark):
    """The documented accuracy contract on gapped data: the estimate
    lies inside the bin holding the q*n-th order statistic, even where
    the INTERPOLATING exact-percentile definition reaches across an
    empty-bin gap to a far-away value (est != interpolated exact by
    more than a bin width is expected and fine there)."""
    from erddap2agol_spark.operators.sketch import histogram_quantiles

    vals = [(0.1,)] * 9 + [(999.0,)]
    df = spark.createDataFrame(vals, "v double")
    width = 1000.0 / 64
    out = histogram_quantiles(df, F.col("v"), [0.9], 0.0, 1000.0, 64)
    est = out.collect()[0]["est_value"]
    # rank 0.9*10 = 9: the 9th order statistic is 0.1, which lives in
    # bin 0 -> the estimate must lie within bin 0's value range
    assert 0.0 <= est <= width


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters
# ---------------------------------------------------------------------------


def _zipfish(spark, parts=6):
    # planted skew: key "hot" 600x, "warm" 120x, 300 singletons
    rows = (
        [("hot",)] * 600 + [("warm",)] * 120 + [(f"cold_{i}",) for i in range(300)]
    )
    return spark.createDataFrame(rows, "k string").repartition(parts)


def test_mg_candidates_bounded_and_superset(spark):
    from erddap2agol_spark.operators.sketch import mg_partition_candidates

    df = _zipfish(spark, parts=6)
    k = 8
    cand = mg_partition_candidates(df, "k", k)
    rows = cand.collect()
    # bounded: at most k rows per partition
    assert len(rows) <= k * 6
    names = {r["k"] for r in rows}
    # superset guarantee: every key with global count > N/(k+1) survives
    n_total = 600 + 120 + 300
    assert 600 > n_total / (k + 1) and 120 > n_total / (k + 1)
    assert {"hot", "warm"} <= names
    # and the summary actually pruned the tail (not a disguised groupBy)
    assert len(names) < 300


def test_heavy_hitters_exact_matches_bruteforce(spark):
    from erddap2agol_spark.operators.sketch import heavy_hitters_exact

    df = _zipfish(spark)
    k = 8
    got = {
        (r["k"], r["n_rows"]) for r in heavy_hitters_exact(df, "k", k).collect()
    }
    exact = (
        df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") * (k + 1) > F.lit(1020))
    )
    want = {(r["k"], r["n_rows"]) for r in exact.collect()}
    assert got == want == {("hot", 600), ("warm", 120)}


def test_heavy_hitters_ignores_null_keys(spark):
    from erddap2agol_spark.operators.sketch import heavy_hitters_exact

    df = spark.createDataFrame(
        [("a",)] * 10 + [(None,)] * 90, "k string"
    ).repartition(3)
    # N counts only non-null rows: threshold 10/(k+1) with k=3 -> a (10) wins
    got = heavy_hitters_exact(df, "k", 3).collect()
    assert [(r["k"], r["n_rows"]) for r in got] == [("a", 10)]
