"""Unit tests for triangle counting (operators/graph.py) and
co-occurrence PMI (operators/search.py)."""

from __future__ import annotations

import math

from erddap2agol_spark.operators.graph import (
    node_degrees,
    orient_by_degree,
    triangle_count,
)
from erddap2agol_spark.operators.search import cooccurrence_pmi


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "a long, b long")


def test_triangle_count_known_graphs(spark):
    # K4 has 4 triangles
    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)]
    [r] = triangle_count(_edges(spark, k4)).collect()
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    # a path has none
    [r] = triangle_count(_edges(spark, [(1, 2), (2, 3), (3, 4)])).collect()
    assert r["n_triangles"] == 0
    # two triangles sharing an edge
    bowtie = [(1, 2), (2, 3), (1, 3), (3, 4), (2, 4)]
    [r] = triangle_count(_edges(spark, bowtie)).collect()
    assert r["n_triangles"] == 2


def test_orientation_is_a_dag_with_bounded_outdegree(spark):
    # star + rim: hub 0 connects to 1..5, rim edges 1-2, 3-4
    edges = [(0, i) for i in range(1, 6)] + [(1, 2), (3, 4)]
    o = orient_by_degree(_edges(spark, edges))
    rows = [(r["src"], r["dst"]) for r in o.collect()]
    assert len(rows) == len(edges)  # every edge oriented exactly once
    deg = {r["node"]: r["deg"] for r in node_degrees(_edges(spark, edges)).collect()}
    for s, d in rows:
        # edges point from lower-(deg, id) to higher-(deg, id)
        assert (deg[s], s) < (deg[d], d)
    # the hub (highest degree) receives everything: out-degree 0
    assert all(s != 0 for s, _ in rows)


def test_pmi_values_and_caps(spark):
    # 'a' and 'b' always co-occur; 'z' co-occurs with nothing; 'the' is
    # everywhere (df cap) and 'rare' appears once (min_df)
    docs = [
        (1, "a b the"),
        (2, "a b the"),
        (3, "a b the rare"),
        (4, "z the"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = cooccurrence_pmi(
        df, "doc_id", "text", min_df=2, max_df_ratio=0.8, min_pair_n=2
    )
    got = {(r["term_a"], r["term_b"]): r for r in out.collect()}
    # 'the' (df=4 > 0.8*4) and 'rare'/'z' (df=1 < 2) never pair
    assert all("the" not in k and "rare" not in k and "z" not in k for k in got)
    r = got[("a", "b")]
    assert r["n_ab"] == 3
    # pmi = ln(3*4 / (3*3)) = ln(4/3)
    assert abs(r["pmi"] - round(math.log(4 / 3), 4)) < 1e-9


def test_pmi_pairing_stays_in_doc(spark):
    # terms in different docs never pair
    docs = [(1, "x y"), (2, "p q"), (3, "x y"), (4, "p q")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = cooccurrence_pmi(df, "doc_id", "text", min_df=2, max_df_ratio=0.9, min_pair_n=2)
    got = {(r["term_a"], r["term_b"]) for r in out.collect()}
    assert got == {("x", "y"), ("p", "q")}


def test_kcore_planted_triangle_with_tail(spark):
    """Triangle + pendant chain: the 2-core is exactly the triangle,
    each member with in-core degree 2."""
    from erddap2agol_spark.operators.graph import kcore

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], ["a", "b"]
    )
    got = {r["node"]: r["deg"] for r in kcore(edges, k=2, iterations=4).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_kcore_fixed_iterations_past_convergence(spark):
    """Peeling is monotone: once converged, extra rounds are exact
    no-ops — the property the unrolled oracle relies on."""
    from erddap2agol_spark.operators.graph import kcore
    from erddap2agol_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    p = li.distinct()
    x = p.select("l_orderkey", F.col("l_partkey").alias("pa"))
    y = p.select("l_orderkey", F.col("l_partkey").alias("pb"))
    edges = (
        x.join(y, "l_orderkey")
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 2)
        .select("pa", "pb")
    )
    a = sorted(map(tuple, kcore(edges, 2, 8, a="pa", b="pb").collect()))
    b = sorted(map(tuple, kcore(edges, 2, 10, a="pa", b="pb").collect()))
    assert a == b and len(a) > 0
