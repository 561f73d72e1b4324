"""The erddap_sim Python Data Source: metadata-only planning, time-slice
partitions, filter pushdown with partition pruning (SURVEY §4 O1-O5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.sources import erddap_source
from erddap2agol_spark.sources.tables import load_table

PATH = "/root/testdata/sf0.001/events.parquet"


@pytest.fixture(scope="module")
def sim(spark):
    erddap_source.register(spark)

    def make(chunk_size=200, path=PATH):
        return (
            spark.read.format("erddap_sim")
            .option("path", path)
            .option("time_col", "ts")
            .option("chunk_size", str(chunk_size))
            .load()
        )

    return make


def test_full_scan_matches_native(spark, sim):
    df = sim()
    native = load_table(spark, "/root/testdata/sf0.001", "events")
    assert df.count() == native.count() == 1000
    a = sorted(r.event_id for r in df.select("event_id").collect())
    b = sorted(r.event_id for r in native.select("event_id").collect())
    assert a == b
    # timestamps surface as us — identical to the native convention
    sa = {r.event_id: r.ts for r in df.select("event_id", "ts").collect()}
    sb = {r.event_id: r.ts for r in native.select("event_id", "ts").collect()}
    assert sa == sb


def test_chunk_partitioning(spark, sim):
    # 1000 rows / 200 per chunk -> 5 time-slice partitions
    assert sim(chunk_size=200).rdd.getNumPartitions() == 5
    assert sim(chunk_size=100000).rdd.getNumPartitions() == 1


def test_pushdown_prunes_partitions_and_matches(spark, sim):
    df = sim(chunk_size=100)
    cond = (F.col("ts") >= "2024-01-20") & (F.col("ts") < "2024-01-22")
    filtered = df.filter(cond)
    # a 2-of-30-days predicate must prune most of the 10 slices
    assert filtered.rdd.getNumPartitions() < 4
    native = load_table(spark, "/root/testdata/sf0.001", "events").filter(cond)
    assert sorted(r.event_id for r in filtered.collect()) == sorted(
        r.event_id for r in native.collect()
    )


def test_pushdown_empty_range(spark, sim):
    out = sim().filter(F.col("ts") >= "2031-01-01")
    assert out.count() == 0


def test_nontime_filters_still_applied(spark, sim):
    # filters the source declines are applied by Spark after the scan
    df = sim().filter((F.col("event_type") == "error") & (F.col("ts") >= "2024-01-15"))
    native = load_table(spark, "/root/testdata/sf0.001", "events").filter(
        (F.col("event_type") == "error") & (F.col("ts") >= "2024-01-15")
    )
    assert df.count() == native.count() > 0


def _write_subus(path: str):
    """5 rows whose ns timestamps straddle µs-truncation buckets around
    base+1µs: trunc values are [0, 0.5->0? no:] ids 1..5 at offsets
    [0ns, 500ns, 1µs, 1µs+500ns, 2µs] -> Spark-visible (µs) offsets
    [0, 0, 1, 1, 2]."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    base = 1_700_000_000_000_000_000  # µs-aligned epoch ns
    offs = [0, 500, 1_000, 1_500, 2_000]
    tb = pa.table(
        {
            "event_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "ts": pa.array([base + o for o in offs], pa.timestamp("ns")),
        }
    )
    pq.write_table(tb, path)
    return base


def test_pushdown_subus_truncation_boundaries(spark, tmp_path):
    """Consumed time filters must compare against the µs-TRUNCATED value
    Spark sees, not raw file ns (ADVICE r1-high): t > X must exclude rows
    whose sub-µs remainder lands inside X's microsecond, and t <= X /
    t == X must include them."""
    import datetime as dt

    p = str(tmp_path / "subus.parquet")
    base = _write_subus(p)
    erddap_source.register(spark)
    df = (
        spark.read.format("erddap_sim")
        .option("path", p)
        .option("time_col", "ts")
        .load()
    )
    x = dt.datetime.utcfromtimestamp(base // 1_000_000_000).replace(
        microsecond=(base % 1_000_000_000) // 1000 + 1
    )  # base + 1µs, µs precision — what a Spark literal carries

    def ids(cond):
        return sorted(r.event_id for r in df.filter(cond).collect())

    # µs-visible offsets: id1->0, id2->0, id3->1, id4->1, id5->2
    assert ids(F.col("ts") > F.lit(x)) == [5]
    assert ids(F.col("ts") >= F.lit(x)) == [3, 4, 5]
    assert ids(F.col("ts") < F.lit(x)) == [1, 2]
    assert ids(F.col("ts") <= F.lit(x)) == [1, 2, 3, 4]
    assert ids(F.col("ts") == F.lit(x)) == [3, 4]


def test_row_group_pruning(spark, tmp_path):
    """read() must touch only row groups whose footer stats intersect the
    partition slice (VERDICT r1 #5: whole-file read per partition is k×
    I/O amplification)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from erddap2agol_spark.sources.erddap_source import (
        ErddapSimReader,
        TimeSlicePartition,
    )

    p = str(tmp_path / "rg.parquet")
    n = 1000
    base = 1_700_000_000_000_000_000
    tb = pa.table(
        {
            "event_id": pa.array(list(range(n)), pa.int64()),
            "ts": pa.array(
                [base + i * 1_000_000_000 for i in range(n)], pa.timestamp("ns")
            ),
        }
    )
    pq.write_table(tb, p, row_group_size=100)  # 10 row groups, ts-sorted
    pf = pq.ParquetFile(p)
    assert pf.metadata.num_row_groups == 10

    reader = ErddapSimReader({"path": p, "time_col": "ts"}, None)
    # a slice covering rows [150, 250) must touch exactly groups 1 and 2
    s = base + 150 * 1_000_000_000
    e = base + 250 * 1_000_000_000
    assert reader._prune_row_groups(pf, s, e) == [1, 2]
    # and the partition read returns exactly those rows
    reader.schema = spark.createDataFrame(
        [], "event_id bigint, ts timestamp"
    ).schema
    got = []
    for batch in reader.read(TimeSlicePartition(s, e)):
        got.extend(batch.column("event_id").to_pylist())
    assert sorted(got) == list(range(150, 250))
    # end-to-end through Spark: counts still correct on the multi-group file
    erddap_source.register(spark)
    df = (
        spark.read.format("erddap_sim")
        .option("path", p)
        .option("time_col", "ts")
        .option("chunk_size", "100")
        .load()
    )
    assert df.count() == n


def test_streaming_nrt_polling(spark, tmp_path):
    """The streaming form: each microbatch emits only rows past the last
    committed high-water mark; new files appearing in the dataset dir
    are the reference's 'new NRT data arrived' condition."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "nrt_ds")
    import os

    os.makedirs(src)

    def write_batch(fname, ids, day):
        tb = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(
                    [day * 86_400_000_000_000 + i * 1000 for i in ids],
                    pa.timestamp("ns"),
                ),
                "v": pa.array([float(i) for i in ids], pa.float64()),
            }
        )
        pq.write_table(tb, f"{src}/{fname}.parquet")

    write_batch("b1", [1, 2, 3], day=1)

    erddap_source.register(spark)
    stream = (
        spark.readStream.format("erddap_sim")
        .option("path", src)
        .option("time_col", "ts")
        .schema("event_id bigint, ts timestamp, v double")
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("nrt_sim")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = sorted(r.event_id for r in spark.sql("SELECT * FROM nrt_sim").collect())
        assert got1 == [1, 2, 3]
        # new file with LATER timestamps -> only those arrive
        write_batch("b2", [4, 5], day=2)
        q.processAllAvailable()
        got2 = sorted(r.event_id for r in spark.sql("SELECT * FROM nrt_sim").collect())
        assert got2 == [1, 2, 3, 4, 5]
        # re-delivering the same files adds nothing (high-water mark gate)
        q.processAllAvailable()
        assert (
            sorted(r.event_id for r in spark.sql("SELECT * FROM nrt_sim").collect())
            == got2
        )
    finally:
        q.stop()


def test_directory_dataset_multi_file(spark, tmp_path):
    """A dataset directory fans out to (slice x file) partitions; counts,
    pushdown, and values match a native multi-file read."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "ds")
    os.makedirs(src)
    base = 1_700_000_000_000_000_000
    for f in range(3):  # 3 files x 200 rows, disjoint time ranges
        ids = list(range(f * 200, (f + 1) * 200))
        tb = pa.table(
            {
                "event_id": pa.array(ids, pa.int64()),
                "ts": pa.array(
                    [base + i * 1_000_000_000 for i in ids], pa.timestamp("ns")
                ),
            }
        )
        pq.write_table(tb, f"{src}/part-{f}.parquet", row_group_size=50)

    erddap_source.register(spark)
    df = (
        spark.read.format("erddap_sim")
        .option("path", src)
        .option("time_col", "ts")
        .option("chunk_size", "150")
        .load()
    )
    assert df.count() == 600
    # 600 rows / 150 -> 4 slices; each slice overlaps 1-2 files
    assert df.rdd.getNumPartitions() >= 4
    got = sorted(r.event_id for r in df.collect())
    assert got == list(range(600))
    # pushdown across files: a one-day range touching a subset of files
    cond = (F.col("ts") >= "2023-11-14") & (F.col("ts") < "2023-11-15")
    filtered = sorted(r.event_id for r in df.filter(cond).collect())
    # ground truth from raw arithmetic: day window in ns
    import calendar, datetime as dt
    s_ns = calendar.timegm(dt.datetime(2023, 11, 14).timetuple()) * 1_000_000_000
    e_ns = calendar.timegm(dt.datetime(2023, 11, 15).timetuple()) * 1_000_000_000
    expect = [i for i in range(600)
              if s_ns <= base + i * 1_000_000_000 < e_ns]
    assert filtered == expect


# ---------------------------------------------------------------------------
# csvp wire format (round 4)
# ---------------------------------------------------------------------------


def test_csvp_header_units_split():
    from erddap2agol_spark.sources.csvp import split_csvp_name

    assert split_csvp_name("latitude (degrees_north)") == (
        "latitude",
        "degrees_north",
    )
    assert split_csvp_name("time (UTC)") == ("time", "UTC")
    assert split_csvp_name("station_id") == ("station_id", None)
    assert split_csvp_name("ratio (m (per) s)") == ("ratio", "m (per) s")


def test_csvp_read_nan_is_missing(spark, tmp_path):
    from erddap2agol_spark.sources.csvp import read_csvp

    p = tmp_path / "t.csvp"
    p.write_text(
        "time (UTC),v (m)\n2024-01-01T00:00:00Z,1.5\n2024-01-01T01:00:00Z,NaN\n"
    )
    df, units = read_csvp(spark, str(p))
    assert units == {"time": "UTC", "v": "m"}
    rows = df.orderBy("time").collect()
    assert rows[0]["v"] == 1.5
    assert rows[1]["v"] is None  # literal NaN = ERDDAP missing, not float NaN


# ---------------------------------------------------------------------------
# property fuzz: csvp header splitting


from hypothesis import given, settings
from hypothesis import strategies as st

from erddap2agol_spark.sources.csvp import split_csvp_name

_NAME = st.text(
    alphabet="abcXYZ09_ -", min_size=1, max_size=12
).filter(lambda s: "(" not in s and s.strip())
_UNITS = st.text(alphabet="abc09_ -()", max_size=10).filter(
    lambda s: s.count("(") == s.count(")")
)


@given(name=_NAME, units=_UNITS)
@settings(max_examples=200, deadline=None)
def test_split_csvp_name_roundtrip(name, units):
    """Any 'name (units)' header — including nested parens inside the
    units, the case the greedy-to-LAST-paren regex exists for — splits
    back to exactly (stripped name, units); headers with no
    parenthesized suffix come back unchanged with units None."""
    n, u = split_csvp_name(f"{name} ({units})")
    assert (n, u) == (name.strip(), units)
    n2, u2 = split_csvp_name(name)
    assert (n2, u2) == (name.strip(), None)
