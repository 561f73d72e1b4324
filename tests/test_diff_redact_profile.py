"""Unit tests for the round-2 hygiene/diagnostic operators: snapshot
diff, PII redaction, heavy-hitter key profiling, and cell-bucketed
embedding near-dup pairs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.operators.diff import snapshot_diff
from erddap2agol_spark.operators.skew import key_profile
from erddap2agol_spark.operators.text import redact_text


def test_snapshot_diff_classifies_all_states(spark):
    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0), (4, "d", None)],
        "id int, cat string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0), (5, "e", 5.0)],
        "id int, cat string, v double",
    )
    got = {
        r["id"]: (r["status"], r["changed_cols"])
        for r in snapshot_diff(old, new, ["id"], ["cat", "v"]).collect()
    }
    assert got[1] == ("unchanged", "")
    assert got[2] == ("changed", "cat")
    assert got[3] == ("removed", "")
    # null -> value is a change (null-safe compare), and only v changed
    assert got[4] == ("changed", "v")
    assert got[5] == ("added", "")


def test_snapshot_diff_multi_col_change_order(spark):
    old = spark.createDataFrame([(1, "a", 1.0)], "id int, cat string, v double")
    new = spark.createDataFrame([(1, "x", 9.0)], "id int, cat string, v double")
    [r] = snapshot_diff(old, new, ["id"], ["cat", "v"]).collect()
    # changed_cols order follows compare_cols order, not alphabetical
    assert r["changed_cols"] == "cat,v"


def test_redact_counts_and_rule_order(spark):
    df = spark.createDataFrame(
        [
            (1, "write a@b.io or c@d.org now"),
            (2, "host 10.0.0.1 dials 555-1234"),
            (3, "plain text, nothing to hide"),
        ],
        "id int, text string",
    )
    got = {r["id"]: r for r in redact_text(df, "text").collect()}
    assert got[1]["n_email"] == 2 and got[1]["redacted"] == "write <EMAIL> or <EMAIL> now"
    assert (got[2]["n_ipv4"], got[2]["n_phone"]) == (1, 1)
    assert got[2]["redacted"] == "host <IP> dials <PHONE>"
    assert got[3]["redacted"] == got[3]["text"]
    # digits inside an already-masked email never double-count: the ip
    # rule runs on the email-redacted text
    df2 = spark.createDataFrame([(1, "mail 10.0.0.1@h.example please")], "id int, text string")
    [r2] = redact_text(df2, "text").collect()
    assert (r2["n_email"], r2["n_ipv4"]) == (1, 0)


def test_key_profile_counts_shares_and_rank(spark):
    df = spark.createDataFrame(
        [("a", 1)] * 6 + [("b", 1)] * 3 + [("c", 2)], "k string, g int"
    )
    out = key_profile(df, ["k", "g"], k=2)
    rows = {(r["key_col"], r["key_value"]): r for r in out.collect()}
    # k=2 keeps only the top 2 of the 3 k-values
    assert ("k", "c") not in rows
    assert rows[("k", "a")]["n"] == 6 and rows[("k", "a")]["rk"] == 1
    assert rows[("k", "b")]["rk"] == 2
    assert rows[("k", "a")]["share"] == 0.6
    assert rows[("g", "1")]["n"] == 9 and rows[("g", "2")]["n"] == 1


def test_key_profile_is_top_k_plan(spark):
    df = spark.createDataFrame([("a", 1)], "k string, g int")
    plan = key_profile(df, ["k"], k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_cell_near_dup_pairs_subset_of_brute_force(spark, sf_dir):
    from erddap2agol_spark.operators.similarity import (
        cell_near_dup_pairs,
        with_norm,
        cosine,
    )
    from erddap2agol_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    got = cell_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, n_probe=2
    ).collect()
    assert got, "expected at least one near-dup pair at threshold 0.4"
    # every reported pair is a TRUE pair: exact cosine >= threshold and
    # canonical orientation (id_a < id_b), each pair reported once
    seen = set()
    for r in got:
        assert r["id_a"] < r["id_b"] and r["cos_sim"] >= 0.4
        assert (r["id_a"], r["id_b"]) not in seen
        seen.add((r["id_a"], r["id_b"]))
    # and the cell-bucketed set is a subset of the exhaustive pair set
    a = with_norm(emb, "vec_id", "embedding").alias("av")
    b = with_norm(emb, "vec_id", "embedding").alias("bv")
    brute = {
        (r["id_a"], r["id_b"])
        for r in a.join(b, F.col("av.id") < F.col("bv.id"))
        .select(
            F.col("av.id").alias("id_a"),
            F.col("bv.id").alias("id_b"),
            cosine("av", "bv").alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= 0.4)
        .collect()
    }
    assert seen <= brute


def test_merge_upsert_actions(spark):
    from erddap2agol_spark.operators.diff import merge_upsert

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [(2, "B", False), (3, None, True), (4, "d", False), (9, "x", True)],
        ["k", "v", "rm"],
    )
    out = {r["k"]: r for r in merge_upsert(base, changes, "k", "rm").collect()}
    assert out[1]["_merge_action"] == "keep" and out[1]["v"] == "a"
    assert out[2]["_merge_action"] == "update" and out[2]["v"] == "B"
    assert 3 not in out                      # deleted
    assert out[4]["_merge_action"] == "insert"
    assert 9 not in out                      # delete of a nonexistent key: no-op


def test_merge_upsert_rejects_schema_mismatch(spark):
    import pytest

    from erddap2agol_spark.operators.diff import merge_upsert

    base = spark.createDataFrame([(1, "a")], ["k", "v"])
    changes = spark.createDataFrame([(1, "a", 2)], ["k", "v", "extra"])
    with pytest.raises(ValueError):
        merge_upsert(base, changes, "k")


def test_cell_near_dup_regimes_agree_and_empty_input(spark, sf_dir):
    """VERDICT r6 #3: the single-node small-corpus kernel and the
    distributed join form are the SAME operator — byte-equal output on
    the same corpus — and the empty corpus degrades to an empty frame
    with the contract schema in both regimes."""
    from erddap2agol_spark.operators.similarity import cell_near_dup_pairs
    from erddap2agol_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    local = cell_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, n_probe=2
    )
    dist = cell_near_dup_pairs(
        emb, "vec_id", "embedding", threshold=0.4, n_probe=2,
        broadcast_elems=0,  # force the distributed form
    )
    assert set(map(tuple, local.collect())) == set(map(tuple, dist.collect()))
    empty = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    for be in (0, 8_000_000):
        out = cell_near_dup_pairs(
            empty, "vec_id", "embedding", threshold=0.4, broadcast_elems=be
        )
        assert out.columns == ["id_a", "id_b", "cos_sim"]
        assert out.count() == 0


def test_cell_near_dup_null_and_zero_norm_vectors(spark):
    """Review r7: NULL vectors must be dropped (their cosine is NULL in
    the SQL form — they can never pair), and an all-zero vector (NaN
    cosine) must get the deterministic NaN-greatest assignment instead
    of crashing the int64 key build — in BOTH regimes, which must agree."""
    from erddap2agol_spark.operators.similarity import cell_near_dup_pairs

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (2, [1.0, 0.01, 0.0, 0.0], 0),
        (3, None, 0),                      # NULL vector
        (4, [0.0, 0.0, 0.0, 0.0], 1),      # zero norm -> NaN cosine
        (5, [0.0, 1.0, 0.0, 0.0], 1),
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    local = cell_near_dup_pairs(
        corpus, "vec_id", "embedding", threshold=0.9, n_probe=2,
        broadcast_elems=1 << 30,
    )
    dist = cell_near_dup_pairs(
        corpus, "vec_id", "embedding", threshold=0.9, n_probe=2,
        broadcast_elems=1,
    )
    lrows = sorted(tuple(r) for r in local.collect())
    drows = sorted(tuple(r) for r in dist.collect())
    assert lrows == drows
    ids_in_pairs = {i for r in lrows for i in (r[0], r[1])}
    assert 3 not in ids_in_pairs and 4 not in ids_in_pairs
    assert (1, 2) in {(r[0], r[1]) for r in lrows}  # the real near-dup


def test_cell_near_dup_duplicate_ids_no_self_pairs(spark):
    """ADVICE r7: on a corpus with DUPLICATE ids, both regimes must obey
    the old SQL join's a.id < b.id contract — no self-pairs (id_a ==
    id_b), and the id-pair multiplicity collapses to one min-cosine row
    — identically in the local kernel and the distributed form."""
    from erddap2agol_spark.operators.similarity import cell_near_dup_pairs

    rows = [
        (1, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [1.0, 0.005, 0.0, 0.0], 0),   # duplicate id, near-identical vec
        (2, [1.0, 0.01, 0.0, 0.0], 0),
        (3, [0.0, 1.0, 0.0, 0.0], 1),
    ]
    corpus = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    local = cell_near_dup_pairs(
        corpus, "vec_id", "embedding", threshold=0.9, n_probe=2,
        broadcast_elems=1 << 30,
    )
    dist = cell_near_dup_pairs(
        corpus, "vec_id", "embedding", threshold=0.9, n_probe=2,
        broadcast_elems=1,
    )
    lrows = sorted(tuple(r) for r in local.collect())
    drows = sorted(tuple(r) for r in dist.collect())
    assert lrows == drows
    assert all(a < b for a, b, _ in lrows)           # no self-pairs, a<b
    pair_keys = [(a, b) for a, b, _ in lrows]
    assert len(pair_keys) == len(set(pair_keys))     # one row per id pair
    assert (1, 2) in set(pair_keys)


def test_ivf_topk_deterministic_tolerates_null_vectors(spark):
    """ADVICE r7 (medium): a NULL embedding row crashed the vectorized
    assign path (_stack_rows/np.vstack) that ivf_topk_deterministic now
    feeds the raw corpus into; NULL rows must be dropped on BOTH sides,
    matching cell_near_dup_pairs / brute_force_topk_matrix."""
    from erddap2agol_spark.operators.similarity import ivf_topk_deterministic

    corpus = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [0.9, 0.1], 0),
            (3, None, 0),            # NULL corpus vector: must not crash
            (4, [0.0, 1.0], 1),
        ],
        "vec_id long, embedding array<double>, label int",
    )
    queries = spark.createDataFrame(
        [(10, [1.0, 0.05], 0), (11, None, 0)],
        "vec_id long, embedding array<double>, label int",
    )
    out = ivf_topk_deterministic(
        queries, corpus, "vec_id", "embedding", k=3, n_probe=2
    ).collect()
    assert {r["query_id"] for r in out} == {10}      # NULL query dropped
    assert 3 not in {r["neighbor_id"] for r in out}  # NULL corpus dropped
    assert any(r["neighbor_id"] in (1, 2) for r in out)


def test_cell_near_dup_hot_cell_auto_split(spark, sf_dir):
    """VERDICT r7 #4: a degenerate quantizer (ONE cell holding the whole
    corpus) must not concentrate the corpus in a single pandas group —
    cells over max_cell_elems hash-split into block pairs — and the
    split must be output-invisible vs the unsplit distributed form and
    the local kernel."""
    from erddap2agol_spark.operators.similarity import cell_near_dup_pairs
    from erddap2agol_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "one_cell", F.lit(0)
    )
    split = cell_near_dup_pairs(
        emb, "vec_id", "embedding", label_col="one_cell", threshold=0.4,
        n_probe=1, broadcast_elems=0, max_cell_elems=64 * 40,  # 40-vec blocks
    )
    unsplit = cell_near_dup_pairs(
        emb, "vec_id", "embedding", label_col="one_cell", threshold=0.4,
        n_probe=1, broadcast_elems=0,  # default cap >> corpus: no split
    )
    local = cell_near_dup_pairs(
        emb, "vec_id", "embedding", label_col="one_cell", threshold=0.4,
        n_probe=1, broadcast_elems=1 << 30,
    )
    srows = sorted(tuple(r) for r in split.collect())
    assert srows == sorted(tuple(r) for r in unsplit.collect())
    assert srows == sorted(tuple(r) for r in local.collect())
    assert len(srows) > 0


def test_cell_near_dup_split_consistency_random(spark):
    """Multi-seed randomized consistency: for random corpora (clustered
    + uniform vectors, varying dims/labels), the hot-cell SPLIT
    distributed form, the unsplit distributed form, and the local
    kernel must agree row-for-row."""
    import random

    from erddap2agol_spark.operators.similarity import cell_near_dup_pairs

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        dims = rng.choice((4, 8))
        n_labels = rng.choice((1, 2, 3))
        rows = []
        for i in range(rng.randint(30, 60)):
            base = [rng.uniform(-1, 1) for _ in range(dims)]
            rows.append((i, base, rng.randrange(n_labels)))
            if rng.random() < 0.3:  # planted near-dup
                rows.append(
                    (
                        1000 + i,
                        [x + rng.uniform(-0.01, 0.01) for x in base],
                        rng.randrange(n_labels),
                    )
                )
        corpus = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, label int"
        )
        outs = []
        for kwargs in (
            {"broadcast_elems": 0, "max_cell_elems": dims * 7},  # split
            {"broadcast_elems": 0},                              # unsplit
            {"broadcast_elems": 1 << 30},                        # local
        ):
            df = cell_near_dup_pairs(
                corpus, "vec_id", "embedding", threshold=0.8, n_probe=2,
                **kwargs,
            )
            outs.append(sorted(tuple(r) for r in df.collect()))
        assert outs[0] == outs[1] == outs[2], f"seed {seed} diverged"
