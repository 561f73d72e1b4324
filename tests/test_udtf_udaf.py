"""Python UDTF and grouped-agg Pandas UDF surface (SURVEY §2.10)."""

from __future__ import annotations

from pyspark.sql import functions as F

from erddap2agol_spark.functions.udtf import make_sentence_udtf, weighted_median


def test_sentence_udtf_lateral_join(spark):
    SentenceSplit = make_sentence_udtf()
    spark.udtf.register("sentence_split", SentenceSplit)
    df = spark.createDataFrame(
        [(1, "Hello world. How are you? Fine!"), (2, "One sentence"), (3, None)],
        "doc_id int, text string",
    )
    df.createOrReplaceTempView("sdocs")
    rows = spark.sql(
        """
        SELECT s.doc_id, s.sent_idx, s.sentence, s.start_char
        FROM sdocs, LATERAL sentence_split(doc_id, text) s
        ORDER BY s.doc_id, s.sent_idx
        """
    ).collect()
    got = [(r.doc_id, r.sent_idx, r.sentence, r.start_char) for r in rows]
    assert got == [
        (1, 0, "Hello world.", 0),
        (1, 1, "How are you?", 13),
        (1, 2, "Fine!", 26),
        (2, 0, "One sentence", 0),
    ]
    # the offset contract: text[start_char:] begins with the sentence
    text = "Hello world. How are you? Fine!"
    for _, _, sent, start in got[:3]:
        assert text[start : start + len(sent)] == sent


def test_sentence_udtf_matches_column_algebra_counts(spark):
    """The UDTF's sentence counts agree with a pure Column-algebra
    formulation on terminator-only text (the docstring's testability
    claim)."""
    SentenceSplit = make_sentence_udtf()
    spark.udtf.register("sentence_split2", SentenceSplit)
    docs = spark.createDataFrame(
        [(i, f"{'a. ' * (i + 1)}") for i in range(5)], "doc_id int, text string"
    )
    docs.createOrReplaceTempView("sdocs2")
    udtf_counts = {
        r.doc_id: r.n
        for r in spark.sql(
            "SELECT s.doc_id, count(*) AS n FROM sdocs2, "
            "LATERAL sentence_split2(doc_id, text) s GROUP BY s.doc_id"
        ).collect()
    }
    col_counts = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id",
            F.size(
                F.filter(
                    F.split(F.col("text"), r"\."),
                    lambda s: F.trim(s) != "",
                )
            ).alias("n"),
        ).collect()
    }
    assert udtf_counts == col_counts


def test_weighted_median_grouped_agg(spark):
    df = spark.createDataFrame(
        [
            ("a", 1.0, 1.0),
            ("a", 2.0, 1.0),
            ("a", 100.0, 0.1),  # tiny weight cannot drag the median
            ("b", 5.0, 10.0),
            ("b", 50.0, 1.0),
        ],
        "grp string, v double, w double",
    )
    got = {
        r.grp: r.wm
        for r in df.groupBy("grp")
        .agg(weighted_median("v", "w").alias("wm"))
        .collect()
    }
    assert got == {"a": 2.0, "b": 5.0}


def test_weighted_median_uniform_weights_is_lower_median(spark):
    df = spark.createDataFrame(
        [("g", float(v), 1.0) for v in (3, 1, 4, 1, 5, 9, 2, 6)],
        "grp string, v double, w double",
    )
    r = df.groupBy("grp").agg(weighted_median("v", "w").alias("wm")).collect()[0]
    assert r.wm == 3.0  # lower-interpolation median of 8 values
