"""Streaming MinHash-LSH ingest dedup (streaming/neardup.py): the online
near-dup gate — accepted history is an append-only band-bucket store,
each micro-batch is probed against it with broadcast-only joins, and the
per-batch partition overwrite makes replays idempotent."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from erddap2agol_spark.streaming import neardup

_WORDS = [
    "alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
    "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
    "oscar", "papa", "quebec", "romeo", "sierra", "tango", "uniform",
    "victor", "whiskey", "xray", "yankee", "zulu", "one", "two", "three",
    "four", "five", "six", "seven", "eight", "nine", "ten", "eleven",
    "twelve", "thirteen", "fourteen",
]
# Deterministic fixtures, band collisions verified once and pinned:
# A ~ A_VAR share 3 of 4 bands, B ~ B_VAR share 4, C collides with
# nothing (disjoint vocabularies).
TEXT_A = " ".join(_WORDS)
TEXT_A_VAR = " ".join(_WORDS[:-1] + ["fifteen"])  # one word changed
TEXT_B = " ".join(w + "x" for w in _WORDS)
TEXT_B_VAR = " ".join([w + "x" for w in _WORDS[:-1]] + ["endx"])
TEXT_C = " ".join(w + "q" for w in _WORDS)

_SCHEMA = "doc_id bigint, text string"


def _write_batch(spark, src, rows):
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)


def _accepted_ids(spark, out_dir):
    return sorted(
        r.doc_id for r in neardup.read_accepted(spark, out_dir).collect()
    )


def test_lsh_ingest_rejects_across_and_within_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: A and B distinct; doc 10 is an exact dup of B in the SAME
    # batch -> bucket-min keeps doc 2
    _write_batch(spark, src, [(1, TEXT_A), (2, TEXT_B), (10, TEXT_B)])
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = neardup.start_lsh_dedup_ingest(stream, store, out, ckpt)
    try:
        q.processAllAvailable()
        assert _accepted_ids(spark, out) == [1, 2]

        # batch 2: exact dup of A (3), near-dup of A (4), fresh C (5)
        _write_batch(spark, src, [(3, TEXT_A), (4, TEXT_A_VAR), (5, TEXT_C)])
        q.processAllAvailable()
        assert _accepted_ids(spark, out) == [1, 2, 5]

        # batch 3: near-dup of B (6) -> rejected against batch-1 history
        _write_batch(spark, src, [(6, TEXT_B_VAR)])
        q.processAllAvailable()
        assert _accepted_ids(spark, out) == [1, 2, 5]
    finally:
        q.stop()

    # the store holds band keys ONLY for accepted docs — never text
    st = spark.read.parquet(store)
    assert sorted(r.doc for r in st.select("doc").distinct().collect()) == [1, 2, 5]
    assert set(st.columns) >= {"doc", "band", "band_sig"}
    assert "text" not in st.columns


def test_ingest_batch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once — replaying a batch id must
    overwrite its partition, not double-append."""
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    b1 = spark.createDataFrame([(1, TEXT_A), (2, TEXT_B)], _SCHEMA)
    b2 = spark.createDataFrame([(4, TEXT_A_VAR), (5, TEXT_C)], _SCHEMA)

    assert neardup.ingest_batch(b1, 0, store, out) == 2
    assert neardup.ingest_batch(b2, 1, store, out) == 1  # 4 rejected
    before = _accepted_ids(spark, out)
    n_store = spark.read.parquet(store).count()

    # replay batch 1 (same id, same data): byte-stable outcome
    assert neardup.ingest_batch(b2, 1, store, out) == 1
    assert _accepted_ids(spark, out) == before == [1, 2, 5]
    assert spark.read.parquet(store).count() == n_store


def test_ingest_batch_empty_batch_is_noop(spark, tmp_path):
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    empty = spark.createDataFrame([], _SCHEMA)
    assert neardup.ingest_batch(empty, 0, store, out) == 0
    assert not os.path.exists(out)


def test_ingest_probe_plan_broadcasts_the_batch_side(spark, tmp_path):
    """The store probe must never shuffle accepted history: with a store
    in place, the batch's band keys are the broadcast side and the store
    scan stays map-only (no SortMergeJoin / ShuffledHashJoin touching
    the store relation)."""
    import contextlib
    import io

    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    b1 = spark.createDataFrame([(1, TEXT_A), (2, TEXT_B)], _SCHEMA)
    neardup.ingest_batch(b1, 0, store, out)

    from erddap2agol_spark.operators import dedup

    b2 = spark.createDataFrame([(4, TEXT_A_VAR), (5, TEXT_C)], _SCHEMA)
    sig = dedup.minhash_signatures(b2, "doc_id", "text")
    bands = dedup.band_keys(sig, 8, 2)
    st = neardup._store_bands(spark, store)
    probe = st.join(
        F.broadcast(bands.select("band", "band_sig").distinct()),
        ["band", "band_sig"],
        "left_semi",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        probe.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
