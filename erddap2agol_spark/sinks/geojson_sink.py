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
``spool_path`` option separates where tasks spool parts from where the
committed artifacts land (distinct roots: e.g. a staging prefix vs the
published prefix); at commit, parts are copied through the filesystem
clients into the final root, so the committed directory is always
self-contained.  With plain local paths and no spool option the
behavior is the old one: one directory, rename-committed parts.  The
committer still verifies every reported part is readable before
committing and raises instead of publishing a partial manifest.

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

from .fsio import for_path

HEADER = '{"type":"FeatureCollection","features":['
FOOTER = "]}"


@dataclass
class _PartMessage(WriterCommitMessage):
    index: int
    filename: str
    n_features: int


class GeoJSONDataSource(DataSource):
    """``format("geojson_fc")``: input must be a single STRING column of
    rendered Feature JSON (build it with ``sinks.geojson.features_df``)."""

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
        )


class GeoJSONWriter(DataSourceWriter):
    def __init__(
        self,
        path: str,
        column: str,
        overwrite: bool,
        assemble: bool,
        spool: str | None = None,
    ):
        self.path = path
        self.column = column
        self.overwrite = overwrite
        self.assemble = assemble
        if spool and spool != path:
            # a UNIQUE job-owned subdirectory under the caller's spool
            # prefix: concurrent writers sharing one staging prefix can
            # never see (or delete) each other's parts, and overwrite
            # mode never rmtree's a directory this writer doesn't own
            # (review r6)
            # joined at the URL level so the scheme survives re-resolution
            self.spool = spool.rstrip("/") + f"/.spool-{uuid.uuid4().hex}"
            sfs, sp = for_path(self.spool)
            sfs.makedirs(sp)
        else:
            self.spool = path
        fs, p = for_path(self.path)
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
        fs, sp = for_path(self.spool)
        fs.makedirs(sp)
        tmp = fs.join(sp, f".{fname}.inprogress")
        with fs.open(tmp, "w") as f:
            for row in iterator:
                f.write(row[self.column])
                f.write("\n")
                n += 1
        fs.rename(tmp, fs.join(sp, fname))
        return _PartMessage(index=index, filename=fname, n_features=n)

    # runs on the DRIVER after every task succeeded
    def commit(self, messages) -> None:
        sfs, sp = for_path(self.spool)
        dfs, dp = for_path(self.path)
        parts = sorted(
            (m for m in messages if m is not None), key=lambda m: m.index
        )
        # reachability guard: a part an executor reported but the driver
        # cannot read through the spool filesystem means the spool is
        # misconfigured (e.g. executor-local path without a client) —
        # fail loudly instead of committing a partial manifest/collection
        missing = [
            m.filename
            for m in parts
            if not sfs.exists(sfs.join(sp, m.filename))
        ]
        if missing:
            raise FileNotFoundError(
                f"{len(missing)} committed part(s) not readable from the "
                f"driver (e.g. {missing[0]}): the spool root must be "
                "reachable through its filesystem client (fsio.for_path)"
            )
        if self.spool != self.path:
            # distinct spool/commit roots: publish parts into the final
            # root through the clients, so the committed directory is
            # self-contained and the spool can be garbage-collected.
            # Chunked streaming — a part is never slurped whole into
            # driver memory (review r6)
            for m in parts:
                with sfs.open(sfs.join(sp, m.filename), "rb") as src, dfs.open(
                    dfs.join(dp, m.filename), "wb"
                ) as dst:
                    while True:
                        chunk = src.read(1 << 20)
                        if not chunk:
                            break
                        dst.write(chunk)
        manifest = {
            "parts": [
                {"file": m.filename, "n_features": m.n_features} for m in parts
            ],
            "n_features": sum(m.n_features for m in parts),
        }
        if self.spool == self.path:
            # best-effort sweep of retry/speculation strays (a zombie
            # attempt finishing after this sweep is why readers must use
            # the manifest)
            referenced = {m.filename for m in parts}
            for f in sfs.listdir(sp):
                if f.endswith(".inprogress") or (
                    f.endswith(".ndjson") and f not in referenced
                ):
                    try:
                        sfs.remove(sfs.join(sp, f))
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
        fs, sp = for_path(self.spool)
        if self.spool != self.path:
            try:
                fs.rmtree(sp)  # job-owned staging dir
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
    spark.dataSource.register(GeoJSONDataSource)
