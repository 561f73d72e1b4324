"""Manifest-based snapshot tables (plans/snapshots.py): metadata-only
commits, time travel, optimistic concurrency, file-level copy-on-write."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.plans import snapshots as snap


def _df(spark, ids):
    return spark.createDataFrame([(i, f"r{i}") for i in ids], "id long, s string")


def test_append_overwrite_time_travel(spark, tmp_path):
    root = str(tmp_path / "tbl")
    v1 = snap.append(_df(spark, [1, 2]), root)
    v2 = snap.append(_df(spark, [3]), root)
    assert (v1, v2) == (1, 2)
    assert sorted(r.id for r in snap.read(spark, root).collect()) == [1, 2, 3]
    # time travel: v1 still reads exactly its own files
    assert sorted(r.id for r in snap.read(spark, root, version=1).collect()) == [1, 2]
    v3 = snap.overwrite(_df(spark, [9]), root)
    assert [r.id for r in snap.read(spark, root).collect()] == [9]
    # history carries lineage
    ops = [h["op"] for h in snap.history(root)]
    assert ops == ["append", "append", "overwrite"]
    assert snap.manifest(root, v3)["parent"] == v2


def test_reader_isolation_across_commits(spark, tmp_path):
    root = str(tmp_path / "tbl2")
    snap.append(_df(spark, [1, 2]), root)
    old = snap.read(spark, root)  # plan pinned to v1's file list
    snap.overwrite(_df(spark, [7]), root)
    # the old plan still reads v1's immutable files
    assert sorted(r.id for r in old.collect()) == [1, 2]


def test_commit_conflict_is_explicit(spark, tmp_path):
    root = str(tmp_path / "tbl3")
    snap.append(_df(spark, [1]), root)
    # another writer races version 2: pre-create its manifest
    os.makedirs(snap._snap_dir(root), exist_ok=True)
    open(snap._manifest_path(root, 2), "w").write("{}")
    with pytest.raises(snap.SnapshotConflict):
        snap.append(_df(spark, [2]), root)


def test_delete_where_rewrites_only_touched_files(spark, tmp_path):
    root = str(tmp_path / "tbl4")
    # two appends with DISJOINT id ranges -> distinct files with distinct
    # footer ranges
    snap.append(_df(spark, [1, 2, 3]).coalesce(1), root)
    snap.append(_df(spark, [100, 101]).coalesce(1), root)
    v, rewritten, carried = snap.delete_where(spark, root, "id", 100, 100)
    assert rewritten == 1 and carried == 1  # footer stats pruned file 1
    assert sorted(r.id for r in snap.read(spark, root).collect()) == [1, 2, 3, 101]
    # time travel still sees the deleted row
    assert 100 in {r.id for r in snap.read(spark, root, version=2).collect()}


def test_delete_where_stats_with_nested_column_ahead(spark, tmp_path):
    """Row-group stats are indexed over flattened parquet LEAVES: with a
    struct column ahead of the predicate column, the Arrow top-level
    field index reads the wrong chunk's stats and can prune a file that
    contains matching rows (ADVICE r4). The leaf is resolved by
    path_in_schema now."""
    root = str(tmp_path / "tbl_nested")

    def nested(ids):
        return spark.createDataFrame(
            [((f"a{i}", i * 10), i) for i in ids],
            "meta struct<tag string, w long>, id long",
        )

    snap.append(nested([1, 2, 3]).coalesce(1), root)
    snap.append(nested([100, 101]).coalesce(1), root)
    v, rewritten, carried = snap.delete_where(spark, root, "id", 100, 100)
    # must rewrite the file that actually holds id=100 and carry the other
    assert rewritten == 1 and carried == 1
    assert sorted(r.id for r in snap.read(spark, root).collect()) == [1, 2, 3, 101]


def test_batch_id_survives_retention_after_rewrites(spark, tmp_path):
    """Exactly-once must hold across retention: overwrite/delete_where
    manifests now carry the last streamed batch_id forward, so
    expire_versions dropping the append's manifest cannot resurrect a
    crash-replayed micro-batch (ADVICE r4)."""
    root = str(tmp_path / "tbl_bid")
    sink = snap.streaming_append(root)
    sink(_df(spark, [1, 2]), 0)  # streamed batch 0
    snap.overwrite(_df(spark, [7]).coalesce(1), root)  # rewriting commit
    snap.delete_where(spark, root, "id", 99, 99)  # another, no-op rewrite
    # retention drops the manifest that originally held batch_id=0
    snap.expire_versions(root, keep_last=1, min_age_s=0.0)
    assert snap._last_batch_id(root) == 0
    v = snap.current_version(root)
    sink(_df(spark, [1, 2]), 0)  # crash replay of batch 0
    assert snap.current_version(root) == v  # skipped, not re-appended
    assert sorted(r.id for r in snap.read(spark, root).collect()) == [7]


def test_empty_table_read_raises(spark, tmp_path):
    root = str(tmp_path / "tbl5")
    snap.init(root)
    with pytest.raises(ValueError, match="empty"):
        snap.read(spark, root)


def test_read_changes_append_only_feed(spark, tmp_path):
    root = str(tmp_path / "tbl6")
    snap.append(_df(spark, [1, 2]), root)
    snap.append(_df(spark, [3]), root)
    snap.append(_df(spark, [4, 5]), root)
    got = sorted(r.id for r in snap.read_changes(spark, root, 1).collect())
    assert got == [3, 4, 5]
    got = sorted(r.id for r in snap.read_changes(spark, root, 1, 2).collect())
    assert got == [3]
    # a rewriting commit in range poisons the feed -> explicit error
    snap.delete_where(spark, root, "id", 3, 3)
    with pytest.raises(ValueError, match="not append-only"):
        snap.read_changes(spark, root, 1)


def test_streaming_append_exactly_once(spark, tmp_path):
    """foreachBatch sink: batch ids recorded in manifests make replays
    no-ops — restart from the same checkpoint appends nothing twice."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    root = str(tmp_path / "tbl_stream")
    _df(spark, [1, 2]).coalesce(1).write.mode("append").parquet(src)

    def run_once():
        stream = spark.readStream.schema("id long, s string").parquet(src)
        q = (
            stream.writeStream.foreachBatch(snap.streaming_append(root))
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    assert sorted(r.id for r in snap.read(spark, root).collect()) == [1, 2]
    v1 = snap.current_version(root)

    # manual replay of batch 0 (the crash-replay shape): skipped entirely
    snap.streaming_append(root)(_df(spark, [1, 2]), 0)
    assert snap.current_version(root) == v1

    # new data -> batch 1 appends; restart consumes only the new file
    _df(spark, [3]).coalesce(1).write.mode("append").parquet(src)
    run_once()
    assert sorted(r.id for r in snap.read(spark, root).collect()) == [1, 2, 3]
    # the change feed sees exactly the streamed appends
    got = sorted(r.id for r in snap.read_changes(spark, root, v1).collect())
    assert got == [3]


def test_compact_and_expire(spark, tmp_path):
    root = str(tmp_path / "tbl7")
    for ids in ([1], [2], [3, 4]):
        snap.append(_df(spark, ids).coalesce(1), root)
    assert len(snap.manifest(root)["files"]) == 3
    v = snap.compact(spark, root, target_files=1)
    assert len(snap.manifest(root, v)["files"]) == 1
    assert sorted(r.id for r in snap.read(spark, root).collect()) == [1, 2, 3, 4]
    # old versions still readable pre-expiry (files are immutable)
    assert sorted(r.id for r in snap.read(spark, root, version=2).collect()) == [1, 2]
    # default grace window protects freshly spooled batch dirs (a racing
    # writer's uncommitted spool looks exactly like this)
    dropped, deleted = snap.expire_versions(root, keep_last=1)
    assert deleted == 0
    dropped2, deleted = snap.expire_versions(root, keep_last=1, min_age_s=0.0)
    assert dropped + dropped2 == 3 and deleted == 3  # three pre-compaction batches
    # head unaffected; expired version gone
    assert sorted(r.id for r in snap.read(spark, root).collect()) == [1, 2, 3, 4]
    import pytest as _pt
    with _pt.raises(FileNotFoundError):
        snap.manifest(root, 2)


def test_randomized_ops_match_python_model(spark, tmp_path):
    """Seeded random walks over append/overwrite/delete_where vs a pure
    dict model: head contents and every retained version's time travel
    must match the model exactly."""
    import random

    for seed in (3, 17):
        rng = random.Random(seed)
        root = str(tmp_path / f"rand_{seed}")
        model: dict[int, set[int]] = {}  # version -> expected id set
        cur: set[int] = set()
        next_id = 0
        for _ in range(12):
            op = rng.choice(["append", "append", "overwrite", "delete"])
            if op == "append":
                ids = [next_id + i for i in range(rng.randint(1, 4))]
                next_id += len(ids)
                v = snap.append(_df(spark, ids), root)
                cur = cur | set(ids)
            elif op == "overwrite":
                ids = [next_id + i for i in range(rng.randint(1, 3))]
                next_id += len(ids)
                v = snap.overwrite(_df(spark, ids), root)
                cur = set(ids)
            else:
                if not cur:
                    continue
                lo = rng.choice(sorted(cur))
                hi = lo + rng.randint(0, 3)
                v, _, _ = snap.delete_where(spark, root, "id", lo, hi)
                cur = {i for i in cur if not (lo <= i <= hi)}
            model[v] = set(cur)
        for v, want in model.items():
            if not want:
                continue
            got = {r.id for r in snap.read(spark, root, version=v).collect()}
            assert got == want, (v, got, want)


def test_concurrent_appends_serialize_or_conflict(spark, tmp_path):
    """Two writers racing the same table: the O_EXCL manifest lock
    serializes them — with a retry loop both land, every version's
    lineage is consistent, and no rows are lost or duplicated."""
    import threading

    root = str(tmp_path / "race")
    snap.append(_df(spark, [0]), root)
    errors = []

    def writer(ids):
        df = _df(spark, ids)
        for _ in range(10):
            try:
                snap.append(df, root)
                return
            except snap.SnapshotConflict:
                continue
        errors.append(ids)

    t1 = threading.Thread(target=writer, args=([1, 2],))
    t2 = threading.Thread(target=writer, args=([3, 4],))
    t1.start(); t2.start(); t1.join(); t2.join()
    assert not errors
    assert snap.current_version(root) == 3
    got = sorted(r.id for r in snap.read(spark, root).collect())
    assert got == [0, 1, 2, 3, 4]
    # lineage is a clean chain
    parents = [snap.manifest(root, v)["parent"] for v in (2, 3)]
    assert parents == [1, 2]


def test_stale_base_commit_conflicts_not_lost_update(spark, tmp_path):
    """THE optimistic-concurrency contract: a writer whose base file list
    went stale (someone committed after it read the manifest) must get
    SnapshotConflict — committing its stale base would silently DROP the
    interloper's files. Simulated by interleaving the internals exactly
    at the race window."""
    root = str(tmp_path / "stale")
    snap.append(_df(spark, [1]), root)
    m = snap.manifest(root)          # writer B reads its base at v1...
    snap.append(_df(spark, [2]), root)   # ...writer A lands v2 meanwhile
    new_files = snap._write_batch(_df(spark, [3]), root)
    with pytest.raises(snap.SnapshotConflict):
        snap._commit(root, m["files"] + new_files, "append",
                     parent=m["version"])
    # B retries from the fresh head: nothing lost
    m2 = snap.manifest(root)
    snap._commit(root, m2["files"] + new_files, "append", parent=m2["version"])
    got = sorted(r.id for r in snap.read(spark, root).collect())
    assert got == [1, 2, 3]


def test_schema_evolution_across_appends(spark, tmp_path):
    root = str(tmp_path / "tbl_evo")
    snap.append(_df(spark, [1, 2]), root)
    widened = spark.createDataFrame(
        [(3, "r3", 9.5)], "id long, s string, score double"
    )
    snap.append(widened, root)
    got = snap.read(spark, root, merge_schema=True)
    assert set(got.columns) == {"id", "s", "score"}
    by_id = {r.id: r.score for r in got.collect()}
    # pre-evolution rows surface the new column as NULL
    assert by_id[1] is None and by_id[3] == 9.5


def test_manifest_io_on_memory_fs():
    """The fsio seam (VERDICT r5 #4): the manifest/HEAD protocol —
    optimistic-lock commits, head publish, history, retention — runs
    unchanged on a non-POSIX filesystem (MemoryFS: create_exclusive is
    check-and-insert, atomic publish is an object put, directories are
    implicit). Data files are faked through the same client; Spark never
    runs here."""
    from erddap2agol_spark.plans import snapshots
    from erddap2agol_spark.sinks import fsio

    mem = fsio.MemoryFS()
    fsio.register_filesystem("memtest", mem)
    root = "memtest://tbl"
    try:
        snapshots.init(root)
        # fake two immutable data files through the client
        for b, name in (("batch-a", "part-00000-x.parquet"),
                        ("batch-b", "part-00000-y.parquet")):
            with mem.open(f"tbl/data/{b}/{name}", "w") as f:
                f.write("bytes")
        v1 = snapshots._commit(root, ["data/batch-a/part-00000-x.parquet"],
                               "append", parent=None)
        v2 = snapshots._commit(
            root,
            ["data/batch-a/part-00000-x.parquet",
             "data/batch-b/part-00000-y.parquet"],
            "append", parent=v1)
        assert (v1, v2) == (1, 2)
        assert snapshots.current_version(root) == 2
        assert len(snapshots.manifest(root, 1)["files"]) == 1
        assert [m["version"] for m in snapshots.history(root)] == [1, 2]
        # optimistic lock holds on the dict store too
        import pytest as _pytest

        with _pytest.raises(snapshots.SnapshotConflict):
            snapshots._commit(root, [], "append", parent=v1)
        # retention through the client: v1 manifest dropped, its
        # now-unreferenced batch dir swept once past the grace window
        mem.mtimes = {k: 0.0 for k in mem.mtimes}  # age everything
        dropped, deleted = snapshots.expire_versions(root, keep_last=1)
        assert dropped == 1 and deleted == 0  # batch-a still in v2's list
        v3 = snapshots._commit(
            root, ["data/batch-b/part-00000-y.parquet"], "overwrite", parent=v2)
        mem.mtimes = {k: 0.0 for k in mem.mtimes}
        dropped, deleted = snapshots.expire_versions(root, keep_last=1)
        assert dropped == 1 and deleted == 1  # batch-a now unreferenced
        assert not mem.exists("tbl/data/batch-a")
        assert snapshots.current_version(root) == v3
    finally:
        fsio._REGISTRY.pop("memtest", None)


def test_overwrite_dependency_gate(spark, tmp_path):
    """OverwriteFS-style pre-overwrite verification (VERDICT r8 #8):
    stale plain views, change-tracking views, and WFS dependents refuse
    the swap; touch/unregister/force unblock it; a refused overwrite
    leaves version AND data untouched."""
    root = str(tmp_path / "tbl")
    v1 = snap.overwrite(_df(spark, [1, 2]), root)
    assert v1 == 1
    snap.register_view(root, "dash")
    assert snap.list_views(root)[0]["acked_version"] == 1
    # view current -> allowed
    v2 = snap.overwrite(_df(spark, [3]), root)
    assert v2 == 2
    # view now stale -> refused, state untouched
    with pytest.raises(snap.OverwriteBlocked, match="stale at version 1"):
        snap.overwrite(_df(spark, [4]), root)
    assert snap.current_version(root) == 2
    assert [r.id for r in snap.read(spark, root).collect()] == [3]
    # multiple refusals are ALL reported (reference outcome item list)
    snap.register_view(root, "wfs_feed", kind="wfs")
    snap.register_view(root, "audit", change_tracking=True)
    reasons = snap.verify_overwrite(root)
    assert len(reasons) == 3
    # force overrides the gate and stamps the manifest
    v3 = snap.overwrite(_df(spark, [5]), root, force=True)
    assert v3 == 3 and snap.manifest(root)["forced"] is True
    # clear the blockers: touch + unregister -> allowed again
    snap.unregister_view(root, "wfs_feed")
    snap.unregister_view(root, "audit")
    snap.touch_view(root, "dash")
    assert snap.overwrite(_df(spark, [6]), root) == 4
