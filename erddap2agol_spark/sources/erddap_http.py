"""Live-HTTP ERDDAP connector (S6's real physical path, VERDICT r4 #1).

``erddap_source.py`` plans tabledap scans against local parquet;
this source performs the actual wire exchange: every chunk URL emitted
by ``erddap_url.tabledap_chunk_urls`` becomes one ``InputPartition``,
and each Spark SCAN TASK GETs its URL with the per-URL timeout/retry
policy the reference applies from its driver-side download loop
(``/root/reference/erddap2agol/src/data_wrangler.py:556-723`` — 120 s
timeout, 3 attempts, 413 = give up). The reference's deque requeue is a
single-process work queue; under Spark the equivalent fleet behavior is
the scheduler's task retry + this source's bounded in-task attempts, so
a flaky chunk never blocks the other chunks (they are other tasks).

Rows never touch the driver: the csvp text is parsed task-side with
pandas and handed to Spark as Arrow batches. The one driver-side fetch
is OPTIONAL plan-time schema inference (first chunk URL); production
callers pass ``schema_ddl`` and no driver fetch happens at all.

Usage::

    spark.dataSource.register(ErddapCsvpHttpDataSource)
    urls = tabledap_chunk_urls(server, dataset_id, cols, chunks)
    df = (spark.read.format("erddap_csvp_http")
          .option("urls", "\\n".join(urls))
          .option("schema_ddl", "time timestamp_ntz, latitude double, ...")
          .load())
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import types as T
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


@dataclass
class UrlPartition(InputPartition):
    url: str


_DDL_TYPES = {
    "timestamp": T.TimestampType,
    "timestamp_ntz": T.TimestampNTZType,
    "double": T.DoubleType,
    "float": T.FloatType,
    "bigint": T.LongType,
    "long": T.LongType,
    "int": T.IntegerType,
    "integer": T.IntegerType,
    "string": T.StringType,
    "boolean": T.BooleanType,
}


def _schema_from_ddl(ddl: str) -> T.StructType:
    """Flat 'name type, name type' DDL, parsed without a SparkSession —
    ``StructType.fromDDL`` needs an active session, and the Python data
    source plans in a worker process that has none. csvp columns are
    always flat scalars, so this tiny grammar is the whole surface."""
    fields = []
    for part in ddl.split(","):
        name, _, typ = part.strip().rpartition(" ")
        cls = _DDL_TYPES.get(typ.strip().lower())
        if not name or cls is None:
            raise ValueError(f"erddap_csvp_http: bad schema_ddl entry {part!r}")
        fields.append(T.StructField(name.strip(), cls()))
    return T.StructType(fields)


def _clean_columns(pdf):
    from .csvp import split_csvp_name

    pdf.columns = [split_csvp_name(c)[0] for c in pdf.columns]
    return pdf


def _read_csvp_text(text: str):
    """csvp body -> pandas frame with clean column names; the literal
    string ``NaN`` is ERDDAP's missing-value marker (F8)."""
    import io

    import pandas as pd

    return _clean_columns(pd.read_csv(io.StringIO(text), na_values=["NaN"]))


def parse_iso_utc_naive(series):
    """ISO-8601 string Series -> naive-UTC datetime64[us] — the one
    typed-time coercion every csvp ingestion path shares (this
    connector's schema coercion and nrt.refresh_http_csvp)."""
    import pandas as pd

    return (
        pd.to_datetime(series, utc=True, format="ISO8601")
        .dt.tz_localize(None)
        .astype("datetime64[us]")
    )


def _table_for_schema(pdf, schema: T.StructType):
    """Coerce a parsed chunk to the scan schema, in schema column order,
    as one Arrow table (timestamps as naive UTC microseconds)."""
    import pandas as pd
    import pyarrow as pa

    arrays = []
    for field in schema.fields:
        s = pdf[field.name]
        t = field.dataType.simpleString()
        if t in ("timestamp", "timestamp_ntz"):
            arrays.append(pa.array(parse_iso_utc_naive(s), type=pa.timestamp("us")))
        elif t == "double":
            arrays.append(pa.array(pd.to_numeric(s), type=pa.float64()))
        elif t == "float":
            arrays.append(pa.array(pd.to_numeric(s), type=pa.float32()))
        elif t == "bigint":
            arrays.append(pa.array(s, type=pa.int64()))
        elif t == "int":
            arrays.append(pa.array(s, type=pa.int32()))
        elif t == "string":
            arrays.append(pa.array(s.astype("string"), type=pa.string()))
        elif t == "boolean":
            # from_pandas: NaN cells (missing booleans) become nulls
            # instead of ArrowInvalid in the scan task
            arrays.append(pa.array(s, type=pa.bool_(), from_pandas=True))
        else:
            raise TypeError(f"erddap_csvp_http: unmapped type {t} for {field.name}")
    return pa.Table.from_arrays(arrays, names=[f.name for f in schema.fields])


class ErddapCsvpHttpDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "erddap_csvp_http"

    def _urls(self) -> list[str]:
        urls = [u for u in self.options["urls"].split("\n") if u.strip()]
        if not urls:
            raise ValueError("erddap_csvp_http: option 'urls' is empty")
        return urls

    def schema(self) -> T.StructType:
        ddl = self.options.get("schema_ddl")
        if ddl:
            return _schema_from_ddl(ddl)
        # dev convenience: infer from the FIRST chunk (one driver-side
        # fetch; production passes schema_ddl and skips this entirely)
        from .http_fetch import fetch_with_retry

        text = fetch_with_retry(
            self._urls()[0],
            attempts=int(self.options.get("attempts", 3)),
            timeout_s=float(self.options.get("timeout_s", 120.0)),
        ).decode()
        pdf = _read_csvp_text(text)
        time_col = self.options.get("time_col", "time")
        fields = []
        for name, dtype in pdf.dtypes.items():
            if name == time_col:
                fields.append(T.StructField(name, T.TimestampNTZType()))
            elif str(dtype).startswith("int"):
                fields.append(T.StructField(name, T.LongType()))
            elif str(dtype).startswith("float"):
                fields.append(T.StructField(name, T.DoubleType()))
            else:
                fields.append(T.StructField(name, T.StringType()))
        return T.StructType(fields)

    def reader(self, schema: T.StructType) -> "ErddapCsvpHttpReader":
        return ErddapCsvpHttpReader(self._urls(), schema, self.options)

    def simpleStreamReader(self, schema: T.StructType) -> "ErddapCsvpHttpStreamReader":
        url = self.options.get("stream_url")
        if not url:
            raise ValueError(
                "erddap_csvp_http streaming needs option 'stream_url' "
                "(a tabledap .csvp URL with projection, no time constraint)"
            )
        if not self.options.get("schema_ddl"):
            raise ValueError(
                "erddap_csvp_http streaming needs an explicit schema_ddl "
                "(no plan-time inference on a stream)"
            )
        return ErddapCsvpHttpStreamReader(url, schema, self.options)


class ErddapCsvpHttpReader(DataSourceReader):
    def __init__(self, urls: list[str], schema: T.StructType, options):
        self.urls = urls
        self.schema = schema
        self.attempts = int(options.get("attempts", 3))
        self.timeout_s = float(options.get("timeout_s", 120.0))
        self.backoff_s = float(options.get("backoff_s", 0.5))

    def partitions(self) -> list[UrlPartition]:
        # one chunk URL = one scan task; fleet-level retry/requeue is
        # Spark's scheduler re-running the failed TASK
        return [UrlPartition(u) for u in self.urls]

    def read(self, partition: UrlPartition) -> Iterator:
        from .http_fetch import fetch_with_retry

        text = fetch_with_retry(
            partition.url,
            attempts=self.attempts,
            timeout_s=self.timeout_s,
            backoff_s=self.backoff_s,
        ).decode()
        pdf = _read_csvp_text(text)
        if len(pdf) == 0:
            return
        yield from _table_for_schema(pdf, self.schema).to_batches(
            max_chunksize=1 << 16
        )


class ErddapCsvpHttpStreamReader(SimpleDataSourceStreamReader):
    """ST1 over the wire as a Structured Streaming SOURCE: each
    microbatch polls the tabledap endpoint for rows with event time
    STRICTLY past the committed high-water mark — the reference's NRT
    loop ('download the window, skip when nothing is newer') expressed
    through Spark's offset protocol, so exactly-once comes from the
    offset log + sink commit, not hand-rolled state.

    Offsets are the ISO-Z high-water mark (lexicographic == chronologic
    for a fixed ISO layout). ``readBetweenOffsets`` replays a committed
    batch by re-fetching ``(start, end]`` — deterministic because an
    ERDDAP archive's PAST window is immutable (late data lands with new
    event times and is picked up by a later batch; watermark/late
    semantics compose downstream).

    One GET per microbatch, driver-side — the NRT window is bounded by
    cadence, not the archive; backfill at scale is the chunked batch
    scan. The ``time_col`` option names the hwm column (default
    ``time``).
    """

    _EPOCH = "1970-01-01T00:00:00Z"

    def __init__(self, url: str, schema: T.StructType, options):
        self.url = url
        self.schema_ = schema
        self.time_col = options.get("time_col", "time")
        self.attempts = int(options.get("attempts", 3))
        self.timeout_s = float(options.get("timeout_s", 120.0))

    def initialOffset(self) -> dict:
        return {"hwm": self._EPOCH}

    def _fetch_rows(self, lo: str, hi: str | None) -> list[dict]:
        from .http_fetch import fetch_with_retry

        url = f"{self.url}&{self.time_col}%3E{lo}"
        if hi is not None:
            url += f"&{self.time_col}%3C%3D{hi}"
        text = fetch_with_retry(
            url, attempts=self.attempts, timeout_s=self.timeout_s
        ).decode()
        pdf = _read_csvp_text(text)
        if len(pdf) == 0:
            return []
        return _table_for_schema(pdf, self.schema_).to_pylist()

    def _tuples(self, rows: list[dict]) -> list[tuple]:
        names = [f.name for f in self.schema_.fields]
        return [tuple(r[n] for n in names) for r in rows]

    def read(self, start: dict):
        rows = self._fetch_rows(start["hwm"], None)
        if not rows:
            # iter(list): the prefetch cache copy.copy()s the iterator
            return iter([]), start
        # Microsecond precision (still fixed-layout => lexicographic ==
        # chronologic): truncating to whole seconds would commit a hwm
        # BELOW the delivered max for fractional-second datasets, so the
        # next poll (time>hwm) re-delivers rows in (hwm, max] and replay
        # returns fewer rows than originally delivered (ADVICE r5).
        hwm = max(r[self.time_col] for r in rows).strftime(
            "%Y-%m-%dT%H:%M:%S.%fZ"
        )
        return iter(self._tuples(rows)), {"hwm": hwm}

    def readBetweenOffsets(self, start: dict, end: dict) -> list[tuple]:
        return self._tuples(self._fetch_rows(start["hwm"], end["hwm"]))


def register(spark) -> None:
    spark.dataSource.register(ErddapCsvpHttpDataSource)
