"""ERDDAP-simulator data source — the custom connector SURVEY §4 calls
the genuinely new Spark work (O1-O4), built on PySpark 4's Python Data
Source API.

What the reference does imperatively, this source does declaratively
inside Spark's scan planning:

- O4 metadata-only planning: row count and the time column's min/max are
  read from the parquet FOOTER (statistics), never the data — the
  ``ncHeader``/DAS-actual_range analog.
- O5/W4 chunked scan: the time range splits into
  ``ceil(row_count / chunk_size)`` equal-duration slices, one
  ``InputPartition`` per slice — the reference's chunk URLs become scan
  partitions (one task each).
- O2/P4 predicate pushdown: time-range filters arrive via
  ``pushFilters``; consumed filters both PRUNE partitions (slices wholly
  outside the range never run) and filter rows inside ``read``.
- Arrow-native read path: ``read`` yields pyarrow RecordBatches.

In production this same class shape would issue HTTP range requests to a
real ERDDAP server per partition; here each partition reads its slice of
a local parquet file — identical planning, local I/O.

Usage::

    spark.dataSource.register(ErddapSimDataSource)
    df = (spark.read.format("erddap_sim")
          .option("path", ".../events.parquet")
          .option("time_col", "ts").option("chunk_size", "100000").load())
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
)
from pyspark.sql import types as T

DEFAULT_CHUNK_SIZE = 100_000


def _dataset_paths(path: str) -> list[str]:
    """A dataset is one parquet file or a DIRECTORY of them (sorted for
    deterministic planning)."""
    import glob
    import os

    if os.path.isdir(path):
        paths = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not paths:
            raise FileNotFoundError(f"erddap_sim: no *.parquet under {path}")
        return paths
    return [path]


def _ts_to_ns(v) -> int:
    """datetime (or raw int ns) -> epoch nanoseconds, integer arithmetic
    throughout (``datetime.timestamp()`` floats lose sub-us precision at
    2024-scale epochs: ulp ~ 0.4 us)."""
    import calendar
    import datetime as _dt

    if isinstance(v, (int, float)):
        return int(v)
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        sec = calendar.timegm(v.timetuple())
        return sec * 1_000_000_000 + v.microsecond * 1000
    raise TypeError(f"unsupported time literal {v!r}")


@dataclass
class TimeSlicePartition(InputPartition):
    start_ns: int  # inclusive
    end_ns: int  # exclusive
    path: str | None = None  # file this partition scans (None = reader's path)


class ErddapSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "erddap_sim"

    def schema(self):
        import pyarrow.parquet as pq

        schema = pq.read_schema(_dataset_paths(self.options["path"])[0])
        fields = []
        for f in schema:
            t = str(f.type)
            if t.startswith("timestamp"):
                # tz-less parquet timestamps are WALL CLOCKS: expose them
                # as TIMESTAMP_NTZ so no session/machine timezone ever
                # reinterprets the value (an LTZ mapping renders in the
                # client zone at collect time); only tz-tagged storage is
                # a real instant
                has_tz = getattr(f.type, "tz", None) is not None
                fields.append(
                    T.StructField(
                        f.name,
                        T.TimestampType() if has_tz else T.TimestampNTZType(),
                    )
                )
            elif t == "int64":
                fields.append(T.StructField(f.name, T.LongType()))
            elif t == "int32":
                fields.append(T.StructField(f.name, T.IntegerType()))
            elif t == "double":
                fields.append(T.StructField(f.name, T.DoubleType()))
            elif t == "float":
                fields.append(T.StructField(f.name, T.FloatType()))
            elif t == "string" or t == "large_string":
                fields.append(T.StructField(f.name, T.StringType()))
            else:
                raise TypeError(f"erddap_sim: unmapped arrow type {t} for {f.name}")
        return T.StructType(fields)

    def reader(self, schema) -> "ErddapSimReader":
        return ErddapSimReader(self.options, schema)

    def simpleStreamReader(self, schema) -> "ErddapSimStreamReader":
        return ErddapSimStreamReader(self.options, schema)


class ErddapSimReader(DataSourceReader):
    def __init__(self, options, schema):
        self.path = options["path"]
        self.time_col = options.get("time_col", "time")
        self.chunk_size = int(options.get("chunk_size", DEFAULT_CHUNK_SIZE))
        self.schema = schema
        # pushed time bounds (ns, inclusive start / exclusive end)
        self.lo_ns: int | None = None
        self.hi_ns: int | None = None

    # -- O2: predicate pushdown -------------------------------------------
    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        # Spark compares µs-truncated values (read() floors ns -> µs), so a
        # CONSUMED bound must reproduce the comparison against trunc(t),
        # not raw file ns: every file value in [v, v+1000) is the same
        # Spark-visible microsecond as the literal v.  Bounds therefore
        # align to whole truncation buckets — e.g. t > v keeps buckets
        # strictly after v's, i.e. t_ns >= v+1000, and t <= v keeps
        # t_ns < v+1000.  Literals from Spark are datetimes (µs-aligned);
        # raw-int literals with sub-µs digits are aligned the same way.
        for f in filters:
            col = f.attribute[0] if isinstance(f.attribute, tuple) else f.attribute
            if col != self.time_col:
                yield f  # not ours: Spark applies it after the scan
                continue
            if isinstance(f, (GreaterThan, GreaterThanOrEqual)):
                v = _ts_to_ns(f.value)
                if isinstance(f, GreaterThan):
                    lo = (v // 1000) * 1000 + 1000  # trunc(t) > v
                else:
                    lo = -(-v // 1000) * 1000  # trunc(t) >= v
                self.lo_ns = lo if self.lo_ns is None else max(self.lo_ns, lo)
            elif isinstance(f, (LessThan, LessThanOrEqual)):
                v = _ts_to_ns(f.value)
                if isinstance(f, LessThan):
                    hi = -(-v // 1000) * 1000  # trunc(t) < v
                else:
                    hi = (v // 1000) * 1000 + 1000  # trunc(t) <= v
                self.hi_ns = hi if self.hi_ns is None else min(self.hi_ns, hi)
            elif isinstance(f, EqualTo):
                v = _ts_to_ns(f.value)
                b = (v // 1000) * 1000
                if v == b:  # trunc(t) == v  <=>  t_ns in [v, v+1000)
                    lo, hi = b, b + 1000
                else:  # sub-µs literal: no truncated value can equal it
                    lo, hi = b + 1000, b
                self.lo_ns = lo if self.lo_ns is None else max(self.lo_ns, lo)
                self.hi_ns = hi if self.hi_ns is None else min(self.hi_ns, hi)
            elif isinstance(f, IsNotNull):
                pass  # subsumed by the range read
            else:
                yield f
                continue
            # consumed: do NOT yield

    # -- O4/O5: metadata-only chunk planning ------------------------------
    def _file_stats(self) -> list[tuple[str, int, int, int]]:
        """Per file: (path, row_count, min_ns, max_ns_exclusive) from
        parquet footer statistics — no data read."""
        import pyarrow.parquet as pq

        out = []
        for p in _dataset_paths(self.path):
            pf = pq.ParquetFile(p)
            md = pf.metadata
            idx = pf.schema_arrow.get_field_index(self.time_col)
            lo = hi = None
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(idx).statistics
                if st is None or not st.has_min_max:
                    raise ValueError("erddap_sim: time column lacks footer stats")
                mn, mx = _ts_to_ns(st.min), _ts_to_ns(st.max)
                lo = mn if lo is None else min(lo, mn)
                hi = mx if hi is None else max(hi, mx)
            # a zero-row file has no row groups and therefore no stats —
            # skip it (nothing to scan) instead of erroring the planner
            if lo is None:
                continue
            # footer statistics surface ns timestamps truncated to us; pad
            # the exclusive upper bound by a full microsecond so the true
            # max row (sub-us digits > 0) stays inside the final slice
            out.append((p, md.num_rows, lo, hi + 1000))
        return out

    def _footer_stats(self) -> tuple[int, int, int]:
        """(row_count, min_ns, max_ns_exclusive) over the whole dataset."""
        stats = self._file_stats()
        if not stats:  # every file is zero-row
            return (0, 0, 0)
        return (
            sum(n for _, n, _, _ in stats),
            min(lo for _, _, lo, _ in stats),
            max(hi for _, _, _, hi in stats),
        )

    def partitions(self) -> list[TimeSlicePartition]:
        import math

        files = self._file_stats()
        if not files:  # dataset of only zero-row files: one no-op task
            return [TimeSlicePartition(0, 0)]
        row_count = sum(n for _, n, _, _ in files)
        data_lo = min(lo for _, _, lo, _ in files)
        data_hi = max(hi for _, _, _, hi in files)
        lo = data_lo if self.lo_ns is None else max(data_lo, self.lo_ns)
        hi = data_hi if self.hi_ns is None else min(data_hi, self.hi_ns)
        if lo >= hi:
            # fully pruned; Spark still expects >=1 partition object
            return [TimeSlicePartition(0, 0)]
        k = max(1, math.ceil(row_count / self.chunk_size))
        span = data_hi - data_lo
        out = []
        for i in range(k):
            s = data_lo + span * i // k
            e = data_hi if i == k - 1 else data_lo + span * (i + 1) // k
            # partition pruning: slice must intersect the pushed range
            if e <= lo or s >= hi:
                continue
            s, e = max(s, lo), min(e, hi)
            # one task per (slice, file) whose footer range intersects —
            # a multi-file dataset fans out without any file reading two
            # slices' worth of data (file pruning here, row-group pruning
            # inside read())
            for p, _, flo, fhi in files:
                if fhi > s and flo < e:
                    out.append(TimeSlicePartition(s, e, path=p))
        return out or [TimeSlicePartition(0, 0)]

    def _prune_row_groups(self, pf, start_ns: int, end_ns: int) -> list[int]:
        """Row-group pruning: with k time-slice partitions a whole-file
        read per partition is k× I/O amplification — keep only groups
        whose footer [min, max] intersects [start_ns, end_ns) (stats are
        µs-truncated, so pad the upper edge a full µs)."""
        idx = pf.schema_arrow.get_field_index(self.time_col)
        groups = []
        for rg in range(pf.metadata.num_row_groups):
            st = pf.metadata.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                groups.append(rg)
                continue
            mn = _ts_to_ns(st.min)
            mx = _ts_to_ns(st.max) + 1000
            if mx > start_ns and mn < end_ns:
                groups.append(rg)
        return groups

    # -- the per-partition scan -------------------------------------------
    def read(self, partition: TimeSlicePartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if partition.start_ns >= partition.end_ns:
            return  # fully-pruned sentinel partition
        pf = pq.ParquetFile(partition.path or self.path)
        groups = self._prune_row_groups(pf, partition.start_ns, partition.end_ns)
        if not groups:
            return
        wanted = [f.name for f in self.schema.fields]
        table = pf.read_row_groups(groups, columns=wanted)
        tcol = table[self.time_col]
        if not str(tcol.type).startswith("timestamp[ns"):
            tcol = pc.cast(tcol, pa.timestamp("ns"))
        ns = pc.cast(tcol, pa.int64())
        mask = pc.and_(
            pc.greater_equal(ns, pa.scalar(partition.start_ns)),
            pc.less(ns, pa.scalar(partition.end_ns)),
        )
        sliced = table.filter(mask)
        # normalize ns -> us so the Spark-facing type is TimestampType
        cols = []
        for name in sliced.column_names:
            c = sliced[name]
            if str(c.type).startswith("timestamp[ns"):
                c = pc.cast(
                    pc.floor_temporal(c, unit="microsecond"), pa.timestamp("us")
                )
            cols.append(c)
        out = pa.table(dict(zip(sliced.column_names, cols)))
        yield from out.to_batches(max_chunksize=1 << 16)


class ErddapSimStreamReader(SimpleDataSourceStreamReader):
    """ST1/S11 as a custom STREAMING source: each microbatch polls the
    dataset directory and emits only rows with event time past the last
    committed offset — the reference's NRT 'download the window, skip if
    not newer' loop expressed as a streaming offset protocol. Offsets are
    the high-water mark in ns; exactly-once comes from Spark's offset
    log + the downstream sink commit.
    """

    def __init__(self, options, schema):
        self.dir = options["path"]
        self.time_col = options.get("time_col", "time")
        self.schema_ = schema

    def initialOffset(self) -> dict:
        return {"hwm_ns": -(1 << 62)}

    def _scan(self, after_ns: int):
        import glob
        import os

        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        paths = (
            sorted(glob.glob(os.path.join(self.dir, "*.parquet")))
            if os.path.isdir(self.dir)
            else [self.dir]
        )
        tables = []
        hwm = after_ns
        for p in paths:
            t = pq.read_table(p)
            ns = pc.cast(t[self.time_col], pa.int64())
            mask = pc.greater(ns, pa.scalar(after_ns))
            t = t.filter(mask)
            if t.num_rows:
                hwm = max(hwm, pc.max(pc.cast(t[self.time_col], pa.int64())).as_py())
                tables.append(t)
        return tables, hwm

    def read(self, start: dict):
        import pyarrow as pa
        import pyarrow.compute as pc

        after = start["hwm_ns"]
        tables, hwm = self._scan(after)
        rows: list[tuple] = []
        for t in tables:
            cols = []
            for name in t.column_names:
                c = t[name]
                if str(c.type).startswith("timestamp[ns"):
                    c = pc.cast(
                        pc.floor_temporal(c, unit="microsecond"), pa.timestamp("us")
                    )
                cols.append(c)
            rows.extend(pa.table(dict(zip(t.column_names, cols))).to_pylist())
        field_names = [f.name for f in self.schema_.fields]
        # iter(list): the prefetch cache needs an ITERATOR it can also
        # copy.copy() — generators can't be copied, bare lists can't next()
        return iter([tuple(r[n] for n in field_names) for r in rows]), {"hwm_ns": hwm}

    def readBetweenOffsets(self, start: dict, end: dict):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq
        import glob
        import os

        paths = (
            sorted(glob.glob(os.path.join(self.dir, "*.parquet")))
            if os.path.isdir(self.dir)
            else [self.dir]
        )
        rows: list[tuple] = []
        field_names = [f.name for f in self.schema_.fields]
        for p in paths:
            t = pq.read_table(p)
            ns = pc.cast(t[self.time_col], pa.int64())
            mask = pc.and_(
                pc.greater(ns, pa.scalar(start["hwm_ns"])),
                pc.less_equal(ns, pa.scalar(end["hwm_ns"])),
            )
            t = t.filter(mask)
            cols = []
            for name in t.column_names:
                c = t[name]
                if str(c.type).startswith("timestamp[ns"):
                    c = pc.cast(
                        pc.floor_temporal(c, unit="microsecond"), pa.timestamp("us")
                    )
                cols.append(c)
            rows.extend(pa.table(dict(zip(t.column_names, cols))).to_pylist())
        return [tuple(r[n] for n in field_names) for r in rows]


def register(spark) -> None:
    # pushFilters requires the python filter-pushdown flag (runtime conf)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(ErddapSimDataSource)
