"""Schema pinning + drift accounting (SURVEY §1.3).

The reference infers a schema on first read, persists it to an INI
sidecar, and replays it verbatim thereafter; fields missing from later
data are tallied ``unavailable``, new fields ``unused``
(Converters/Json2GeoJSON.py:841-857, 1121-1136, 296-303). AGOL overwrite
requires new data to match the published schema (OverwriteFS.py:1749).

Spark-first version: pin the ``StructType`` as JSON next to the sink,
enforce with ``spark.read.schema(pinned)``, and compute drift as a
first-class report. Delta-style schema enforcement is the cluster-grade
analog; this file-based form has no extra dependencies.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def pin_path(sink_dir: str) -> str:
    return os.path.join(sink_dir, "_pinned_schema.json")


def save_pin(schema: T.StructType, sink_dir: str) -> str:
    os.makedirs(sink_dir, exist_ok=True)
    path = pin_path(sink_dir)
    with open(path, "w") as f:
        f.write(schema.json())
    return path


def load_pin(sink_dir: str) -> T.StructType | None:
    path = pin_path(sink_dir)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return T.StructType.fromJson(json.load(f))


@dataclass(frozen=True)
class Drift:
    unavailable: tuple[str, ...]  # pinned but missing from the new data
    unused: tuple[str, ...]  # present in new data but not pinned
    type_changed: tuple[str, ...]  # same name, different type

    @property
    def clean(self) -> bool:
        return not (self.unavailable or self.unused or self.type_changed)


def drift_report(pinned: T.StructType, incoming: T.StructType) -> Drift:
    """The reference's unavailable/unused tallies as a schema diff."""
    p = {f.name: f.dataType for f in pinned.fields}
    i = {f.name: f.dataType for f in incoming.fields}
    return Drift(
        unavailable=tuple(sorted(set(p) - set(i))),
        unused=tuple(sorted(set(i) - set(p))),
        type_changed=tuple(sorted(n for n in set(p) & set(i) if p[n] != i[n])),
    )


def conform(df: DataFrame, pinned: T.StructType) -> DataFrame:
    """Replay the pinned schema over incoming data: select pinned columns
    in pinned order, casting where needed, nulling columns that went
    unavailable, dropping unused ones — the 'replay the INI verbatim'
    semantics, minus the silent breakage."""
    from pyspark.sql import functions as F

    cols = []
    have = {f.name: f.dataType for f in df.schema.fields}
    for f in pinned.fields:
        if f.name in have:
            c = F.col(f.name)
            if have[f.name] != f.dataType:
                c = c.cast(f.dataType)
            cols.append(c.alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def read_pinned(
    spark: SparkSession, data_path: str, sink_dir: str, fmt: str = "parquet"
) -> DataFrame:
    """First read infers + pins; later reads enforce the pin."""
    pinned = load_pin(sink_dir)
    reader = spark.read.format(fmt)
    if pinned is None:
        df = reader.load(data_path)
        save_pin(df.schema, sink_dir)
        return df
    return conform(reader.load(data_path), pinned)
