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

Filesystem requirement (ADVICE r4): tasks spool parts with plain
``open``/``os.rename`` against ``path`` and the driver's commit step
reads those same paths — so driver and executors MUST share the target
filesystem (local mode, or a shared mount such as NFS/FUSE-mounted
object storage). On a multi-node cluster with executor-local disks,
point ``path`` at a shared mount; the sink raises at commit when a
manifest-listed part is missing rather than silently emitting a partial
collection.

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
import os
import shutil
import uuid
from collections.abc import Iterator
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceWriter,
    WriterCommitMessage,
)

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
        )


class GeoJSONWriter(DataSourceWriter):
    def __init__(self, path: str, column: str, overwrite: bool, assemble: bool):
        self.path = path
        self.column = column
        self.overwrite = overwrite
        self.assemble = assemble
        if os.path.exists(path):
            if overwrite:
                shutil.rmtree(path)
            elif os.listdir(path):
                raise FileExistsError(
                    f"{path} exists and is non-empty; use mode('overwrite')"
                )
        os.makedirs(path, exist_ok=True)

    # runs on EXECUTORS
    def write(self, iterator: Iterator) -> _PartMessage:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        index = ctx.partitionId() if ctx is not None else 0
        fname = f"part-{index:05d}-{uuid.uuid4().hex}.ndjson"
        n = 0
        tmp = os.path.join(self.path, f".{fname}.inprogress")
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(row[self.column])
                f.write("\n")
                n += 1
        os.rename(tmp, os.path.join(self.path, fname))
        return _PartMessage(index=index, filename=fname, n_features=n)

    # runs on the DRIVER after every task succeeded
    def commit(self, messages) -> None:
        parts = sorted(
            (m for m in messages if m is not None), key=lambda m: m.index
        )
        # shared-filesystem guard (module docstring): a part an executor
        # reported but the driver cannot see means the target is NOT a
        # shared mount — fail loudly instead of committing a partial
        # manifest/collection
        missing = [
            m.filename
            for m in parts
            if not os.path.exists(os.path.join(self.path, m.filename))
        ]
        if missing:
            raise FileNotFoundError(
                f"{len(missing)} committed part(s) not visible from the "
                f"driver (e.g. {missing[0]}): geojson_fc requires driver "
                "and executors to share the target filesystem"
            )
        manifest = {
            "parts": [
                {"file": m.filename, "n_features": m.n_features} for m in parts
            ],
            "n_features": sum(m.n_features for m in parts),
        }
        # best-effort sweep of retry/speculation strays (a zombie attempt
        # finishing after this sweep is why readers must use the manifest)
        referenced = {m.filename for m in parts}
        for f in os.listdir(self.path):
            full = os.path.join(self.path, f)
            if f.endswith(".inprogress") or (
                f.endswith(".ndjson") and f not in referenced
            ):
                try:
                    os.remove(full)
                except OSError:
                    pass
        if self.assemble:
            out = os.path.join(self.path, "collection.geojson")
            with open(out, "w") as dst:
                dst.write(HEADER)
                first = True
                for m in parts:
                    with open(os.path.join(self.path, m.filename)) as src:
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
        with open(os.path.join(self.path, "_manifest.json"), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.filename))
                except OSError:
                    pass


def register(spark) -> None:
    spark.dataSource.register(GeoJSONDataSource)
