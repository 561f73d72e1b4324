"""Window / ordered operators (SURVEY §2.6 W1-W5).

The reference's only true window-shaped computation is the glider
consecutive-point line builder (src/agol_wrangler.py:785-808) — a pandas
row loop there, a ``lead()`` window here. Partitioning by track key means
each partition's window state is independent: scales linearly with tracks.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def track_segments(
    df: DataFrame,
    track_col: str,
    ts_col: str,
    x_col: str,
    y_col: str,
    carry_cols: Sequence[str] = (),
    tiebreak: Sequence[str] = (),
) -> DataFrame:
    """W1/J6 — pair each point with the next point of the same track,
    producing one segment row per consecutive pair.

    Reference semantics (src/agol_wrangler.py:785-808): points taken in
    time order; segment properties come from the segment's SECOND point;
    segments with a null endpoint are skipped.

    Spark shape: ``lead() over (partitionBy(track).orderBy(ts))`` — no
    self-join, one shuffle on the track key.
    """
    w = Window.partitionBy(track_col).orderBy(
        *[F.col(c) for c in (ts_col, *tiebreak)]
    )
    out = (
        df.withColumn("x2", F.lead(x_col).over(w))
        .withColumn("y2", F.lead(y_col).over(w))
        .withColumn("ts2", F.lead(ts_col).over(w))
    )
    for c in carry_cols:
        # properties from the SECOND point of the segment
        out = out.withColumn(c, F.lead(c).over(w))
    return (
        out.filter(
            F.col(x_col).isNotNull()
            & F.col(y_col).isNotNull()
            & F.col("x2").isNotNull()
            & F.col("y2").isNotNull()
        )
        .select(
            F.col(track_col),
            F.col(ts_col).alias("seg_start"),
            F.col("ts2").alias("seg_end"),
            F.col(x_col).alias("x1"),
            F.col(y_col).alias("y1"),
            "x2",
            "y2",
            *carry_cols,
        )
    )


def tumbling(
    df: DataFrame, ts_col: str, unit: str = "day", label: bool = True
) -> DataFrame:
    """W3 — tumbling calendar buckets: day / ISO week / month, with the
    reference's human label suffixes (``griddapDivider``,
    src/data_wrangler.py:190-221: ``W{wk}-{year}``, ``Jan-2025``).

    ``date_trunc`` keeps the bucket computation inside codegen; grouping
    on the truncated column is an ordinary hash aggregate.
    """
    if unit not in ("day", "week", "month"):
        raise ValueError(f"unit must be day|week|month, got {unit!r}")
    bucket = F.date_trunc(unit, F.col(ts_col)).alias("bucket_start")
    out = df.withColumn("bucket_start", bucket)
    if label:
        if unit == "day":
            lab = F.date_format("bucket_start", "yyyy-MM-dd")
        elif unit == "week":
            lab = F.concat(
                F.lit("W"),
                F.lpad(F.weekofyear("bucket_start").cast("string"), 2, "0"),
                F.lit("-"),
                F.date_format("bucket_start", "YYYY"),  # ISO week-year
            )
        else:
            lab = F.date_format("bucket_start", "MMM-yyyy")
        out = out.withColumn("bucket_label", lab)
    return out


def chunk_buckets(
    df: DataFrame, order_cols: Sequence[str], n_chunks: int
) -> DataFrame:
    """W4/O5 — uniform chunking: assign each row to one of ``n_chunks``
    equal-count buckets in ``order_cols`` order (reference
    ``calculateTimeSubset`` src/data_wrangler.py:281-314 splits downloads
    into <=100k-row slices; ``ntile`` is the same math).

    Note: at scale prefer ``repartitionByRange`` (no global window); the
    ntile form exists for parity with the reference's exact chunk
    assignment semantics.
    """
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn("chunk_id", F.ntile(n_chunks).over(w))


def with_row_number(df: DataFrame, order_cols: Sequence[str], name: str = "rowid") -> DataFrame:
    """W5 — the converters' ``ROWID@`` pseudo-field
    (Converters/Json2GeoJSON.py:171-172)."""
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(name, F.row_number().over(w))
