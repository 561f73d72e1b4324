"""NRT / streaming semantics tests (SURVEY §2.9 ST1-ST6)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from erddap2agol_spark.sources.tables import load_table
from erddap2agol_spark.streaming import nrt


def _events(spark, n=200, offset=0, start="2024-01-01"):
    return spark.range(offset, offset + n).select(
        F.col("id").alias("event_id"),
        (F.lit(start).cast("timestamp") + F.make_interval(mins=F.col("id"))).alias("ts"),
        (F.col("id") % 5).alias("user_id"),
        (F.col("id") * 1.5).alias("value"),
    )


def test_refresh_publish_then_skip(spark, tmp_path):
    sink = str(tmp_path / "sink")
    df = _events(spark)
    r1 = nrt.refresh(df, "ts", sink, window_days=7, now="2024-01-01 06:00:00")
    assert r1["published"] is True
    out1 = nrt.read_current(spark, sink)
    assert out1.count() == df.filter("ts <= '2024-01-01 06:00:00'").count()

    # same data, same window -> watermark gate skips (no rows newer)
    r2 = nrt.refresh(df, "ts", sink, window_days=7, now="2024-01-01 06:00:00")
    assert r2["published"] is False and "high-water" in r2["reason"]


def test_refresh_incremental_advance(spark, tmp_path):
    sink = str(tmp_path / "sink")
    nrt.refresh(_events(spark, 100), "ts", sink, now="2024-01-01 12:00:00")
    # new rows arrive
    more = _events(spark, 300)
    r = nrt.refresh(more, "ts", sink, now="2024-01-01 12:00:00")
    assert r["published"] is True
    # published snapshot is the full window, not only the delta
    assert nrt.read_current(spark, sink).count() == 300


def test_ab_swap_alternates_and_readers_never_partial(spark, tmp_path):
    sink = str(tmp_path / "sink")
    t1 = nrt.atomic_overwrite(_events(spark, 10), sink)
    assert t1.endswith("data_a")
    before = nrt.read_current(spark, sink).count()
    t2 = nrt.atomic_overwrite(_events(spark, 20), sink)
    assert t2.endswith("data_b")  # blue/green alternation (K7)
    assert before == 10 and nrt.read_current(spark, sink).count() == 20


def test_content_fingerprint_gate(spark, tmp_path):
    sink = str(tmp_path / "sink")
    df = _events(spark, 50)
    assert nrt.content_changed(df, sink) is True  # first sight
    assert nrt.content_changed(df, sink) is False  # identical content
    # same rows, different order -> same fingerprint (order-insensitive)
    assert nrt.content_changed(df.orderBy(F.desc("event_id")), sink) is False
    assert nrt.content_changed(_events(spark, 51), sink) is True


def test_watermark_filter_pushdown(spark, tmp_path):
    sink = str(tmp_path / "sink")
    nrt.save_state(sink, {"high_water_mark": "2024-01-01 01:00:00"})
    df = nrt.newer_than_watermark(_events(spark, 200), "ts", sink)
    assert df.count() == 200 - 61  # minutes 61..199 are strictly newer


def test_structured_streaming_windowed_counts(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.write.parquet(src)
    agg = nrt.windowed_counts_stream(spark, src, ev.schema, window="1 day")
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("nrt_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        out = spark.sql("SELECT * FROM nrt_counts")
        total = out.agg(F.sum("n")).first()[0]
        assert total == ev.count()
        days = out.select("bucket_start").distinct().count()
        assert days == ev.select(F.date_trunc("day", "ts")).distinct().count()
    finally:
        q.stop()


def test_foreachbatch_atomic_publish(spark, tmp_path):
    """ST1 end-to-end: streaming windowed counts committed through the
    atomic A/B sink per microbatch — readers always see a complete
    snapshot of the latest aggregate state."""
    src = str(tmp_path / "src")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.write.parquet(src)
    sink = str(tmp_path / "agg_sink")
    agg = nrt.windowed_counts_stream(spark, src, ev.schema, window="1 day")

    def commit(batch_df, epoch_id):
        nrt.atomic_overwrite(batch_df, sink)

    q = (
        agg.writeStream.outputMode("complete")
        .foreachBatch(commit)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = nrt.read_current(spark, sink)
    assert out.agg(F.sum("n")).first()[0] == ev.count()
    assert set(out.columns) == {"bucket_start", "event_type", "n"}


def test_session_window_stream(spark, tmp_path):
    """ST5 + W-family: native session windows merge gap-adjacent events
    per user and agree with the batch sessionization gap rule."""
    import datetime as dt

    src = str(tmp_path / "sess_src")
    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: two bursts separated by > 30 min -> 2 sessions (3 + 1)
        (1, base), (1, base + dt.timedelta(minutes=10)),
        (1, base + dt.timedelta(minutes=20)),
        (1, base + dt.timedelta(minutes=80)),
        # user 2: one burst -> 1 session of 2
        (2, base), (2, base + dt.timedelta(minutes=29)),
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    df.write.parquet(src)
    agg = nrt.session_counts_stream(
        spark, src, df.schema, ts_col="ts", key_col="user_id", gap="30 minutes"
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        out = {
            (r.user_id, r.n_events)
            for r in spark.sql("SELECT * FROM sess_counts").collect()
        }
        assert out == {(1, 3), (1, 1), (2, 2)}
        spans = {
            (r.user_id, r.n_events): (r.session_end - r.session_start)
            for r in spark.sql("SELECT * FROM sess_counts").collect()
        }
        # a session spans first event .. last event + gap
        assert spans[(1, 3)] == dt.timedelta(minutes=50)
        assert spans[(2, 2)] == dt.timedelta(minutes=59)
    finally:
        q.stop()


def test_checkpoint_restart_exactly_once(spark, tmp_path):
    """ST6 under restart: stop the stream, land more files, restart a
    NEW query from the SAME checkpoint — the offset log must replay
    nothing and pick up only the unseen files, so the final aggregate
    equals one clean pass over all data (exactly-once accounting across
    the restart boundary)."""
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.write.parquet(src)

    def run_until_idle():
        agg = nrt.windowed_counts_stream(spark, src, ev.schema, window="1 day")
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("restart_counts")
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_until_idle()
    n1 = spark.sql("SELECT sum(n) FROM restart_counts").first()[0]
    assert n1 == first.count()

    # stream is DOWN while new data lands — the recovery-after-outage shape
    second.write.mode("append").parquet(src)
    run_until_idle()
    n2 = spark.sql("SELECT sum(n) FROM restart_counts").first()[0]
    assert n2 == ev.count()  # every event exactly once across the restart


def test_stream_static_enrichment(spark, tmp_path):
    """J2/ST1 composed: a streaming scan enriched by a static dim joins
    per micro-batch with the stream side unshuffled; totals match the
    batch join exactly."""
    src = str(tmp_path / "src")
    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    ev.write.parquet(src)
    dim = spark.createDataFrame(
        [("click", 2.0), ("view", 1.0), ("purchase", 5.0)],
        ["event_type", "weight"],
    )
    enriched = nrt.enriched_stream(spark, src, ev.schema, dim, "event_type")
    q = (
        enriched.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("weight").alias("w"))
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("enriched_counts")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            r.event_type: (r.n, r.w)
            for r in spark.sql("SELECT * FROM enriched_counts").collect()
        }
    finally:
        q.stop()
    want = {
        r.event_type: (r.n, r.w)
        for r in ev.join(dim, "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("weight").alias("w"))
        .collect()
    }
    assert got == want and got  # non-empty and identical


def test_dedup_within_watermark_across_batches(spark, tmp_path):
    """Streaming dedup with bounded state: a duplicate landing in a
    LATER micro-batch (within the watermark) is dropped; the surviving
    row set equals batch dropDuplicates on the keys."""
    src = str(tmp_path / "dsrc")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").filter(F.col("event_id") < 200)
    first = ev.filter(F.col("event_id") % 2 == 0)
    first.write.parquet(src)
    # second batch: new odd rows PLUS a re-delivery of 30 even rows
    ev.filter(F.col("event_id") % 2 == 1).unionAll(
        first.filter(F.col("event_id") % 10 == 0).limit(30)
    ).write.mode("append").parquet(src)

    out = nrt.deduped_stream(spark, src, ev.schema, ["event_id"])
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT count(*) n, count(DISTINCT event_id) d FROM dedup_stream").first()
    finally:
        q.stop()
    want = ev.count()
    assert (got.n, got.d) == (want, want)  # every id exactly once


def test_stream_stream_join_time_bounded(spark, tmp_path):
    """Watermarked stream-stream join: totals equal the equivalent
    batch join with the same time-bound residual."""
    import datetime

    left_dir = str(tmp_path / "l")
    right_dir = str(tmp_path / "r")
    ev = load_table(spark, "/root/testdata/sf0.001", "events").filter(F.col("event_id") < 400)
    lhs = ev.filter(F.col("event_id") % 2 == 0)
    rhs = ev.filter(F.col("event_id") % 2 == 1)
    lhs.write.parquet(left_dir)
    rhs.write.parquet(right_dir)

    out = nrt.stream_stream_join(
        spark, left_dir, right_dir, ev.schema, key="user_id"
    )
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .start()
    )
    try:
        q.processAllAvailable()
        got = spark.sql("SELECT count(*) FROM ss_join").first()[0]
    finally:
        q.stop()

    lb = nrt._ltz_event_time(lhs, "ts").select("user_id", "ts")
    rb = nrt._ltz_event_time(rhs, "ts").select(
        F.col("user_id").alias("r_key"), F.col("ts").alias("r_ts")
    )
    want = lb.join(
        rb,
        (lb.user_id == rb.r_key)
        & (rb.r_ts >= lb.ts)
        & (rb.r_ts <= lb.ts + F.expr("INTERVAL 1 hour")),
    ).count()
    assert got == want and got > 0


def test_streaming_histogram_sketch_matches_batch(spark, tmp_path):
    """The mergeable quantile sketch streams: histogram_bins is a plain
    combinable count aggregate, so the SAME binning expression runs as
    a streaming aggregation (complete mode), and the streamed bin table
    equals the batch sketch bit-for-bit — batch/stream unification of
    the 100 TB percentile path (readout then happens on the tiny bin
    table, micro-batch by micro-batch)."""
    from erddap2agol_spark.operators.sketch import histogram_bins

    src = str(tmp_path / "hist_src")
    li = load_table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_extendedprice"
    )
    li.write.parquet(src)

    lo, hi, nb = 900.0, 105000.0, 64
    stream = spark.readStream.schema(li.schema).parquet(src)
    # the operator itself runs on the streaming frame — the assertion
    # is about THE shipped expression, not a hand-copied double
    agg = histogram_bins(stream, F.col("l_extendedprice"), lo, hi, nb)
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("hist_stream")
        .start()
    )
    try:
        q.processAllAvailable()
        streamed = {
            r["bin"]: r["cnt"]
            for r in spark.sql("SELECT * FROM hist_stream").collect()
        }
        batch = {
            r["bin"]: r["cnt"]
            for r in histogram_bins(
                li, F.col("l_extendedprice"), lo, hi, nb
            ).collect()
        }
        assert streamed == batch
    finally:
        q.stop()
