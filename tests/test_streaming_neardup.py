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


def test_restart_from_checkpoint_keeps_gate_state(spark, tmp_path):
    """A NEW query over the same checkpoint resumes the batch-id
    sequence, so the store written by the first run keeps rejecting
    near-dups after a restart and nothing is reprocessed."""
    src = str(tmp_path / "src")
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, src, [(1, TEXT_A), (2, TEXT_B)])
    stream = spark.readStream.schema(_SCHEMA).parquet(src)
    q = neardup.start_lsh_dedup_ingest(stream, store, out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _accepted_ids(spark, out) == [1, 2]

    # restart: a near-dup of pre-restart history must still be rejected
    _write_batch(spark, src, [(4, TEXT_A_VAR), (5, TEXT_C)])
    stream2 = spark.readStream.schema(_SCHEMA).parquet(src)
    q2 = neardup.start_lsh_dedup_ingest(stream2, store, out, ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    assert _accepted_ids(spark, out) == [1, 2, 5]


def test_compact_store_preserves_the_gate(spark, tmp_path):
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    b = [
        spark.createDataFrame([(1, TEXT_A)], _SCHEMA),
        spark.createDataFrame([(2, TEXT_B)], _SCHEMA),
        spark.createDataFrame([(5, TEXT_C)], _SCHEMA),
    ]
    for i, df in enumerate(b):
        neardup.ingest_batch(df, i, store, out)

    n_before = spark.read.parquet(store).count()
    assert neardup.compact_store(spark, store, keep_last=1, n_files=2) == 2
    # two batch partitions folded into ingest_batch=-1; batch 2 intact
    dirs = sorted(d for d in os.listdir(store) if d.startswith("ingest_batch="))
    assert dirs == ["ingest_batch=-1", "ingest_batch=2"]
    assert spark.read.parquet(store).count() == n_before

    # the gate still rejects near-dups of compacted history
    b3 = spark.createDataFrame([(6, TEXT_B_VAR), (7, TEXT_A)], _SCHEMA)
    assert neardup.ingest_batch(b3, 3, store, out) == 0
    # second compaction folds batch 2 + merges the existing compacted part
    assert neardup.compact_store(spark, store, keep_last=1, n_files=2) == 1
    assert spark.read.parquet(store).count() == n_before
    # idempotent when nothing to fold
    assert neardup.compact_store(spark, store, keep_last=1) == 0


def test_compact_store_recovers_from_crashed_attempt(spark, tmp_path):
    """A crash before the staging rename leaves an orphan dot-dir that
    Spark never lists; the next compaction cleans it and proceeds, and
    history survives every window (review finding r4)."""
    store = str(tmp_path / "store")
    out = str(tmp_path / "out")
    for i, t in enumerate((TEXT_A, TEXT_B, TEXT_C)):
        neardup.ingest_batch(
            spark.createDataFrame([(i + 1, t)], _SCHEMA), i, store, out
        )
    n = spark.read.parquet(store).count()
    # simulate a crashed attempt: orphan staging dir with junk
    os.makedirs(os.path.join(store, ".compact_staging"))
    with open(os.path.join(store, ".compact_staging", "junk"), "w") as f:
        f.write("partial")
    assert neardup.compact_store(spark, store, keep_last=1) == 2
    dirs = sorted(d for d in os.listdir(store) if not d.startswith("."))
    assert dirs == ["ingest_batch=-1", "ingest_batch=2"]
    assert not os.path.exists(os.path.join(store, ".compact_staging"))
    assert spark.read.parquet(store).count() == n
    # gate still rejects against compacted history
    dup = spark.createDataFrame([(9, TEXT_A)], _SCHEMA)
    assert neardup.ingest_batch(dup, 3, store, out) == 0


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
