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
    # date_trunc always yields LTZ; keep the input column's flavor so an
    # NTZ source stays NTZ (collected LTZ renders in the CLIENT zone)
    bucket = (
        F.date_trunc(unit, F.col(ts_col))
        .cast(df.schema[ts_col].dataType.simpleString())
        .alias("bucket_start")
    )
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


def _order_split_bounds(
    df: DataFrame, key: str, n_parts: int
) -> list:
    """Deterministic range-split points for ``key``: a SEEDED sample of
    the column (one column-pruned pass, the classic total-order-
    partitioner sketch), sorted driver-side, split points at the
    n_parts-quantiles.  Works for any orderable type (numeric,
    timestamp, string); duplicates collapse, which only merges adjacent
    ranges."""
    cnt = df.count()
    if cnt == 0:
        return []
    fraction = min(1.0, (n_parts * 200) / cnt)
    vals = sorted(
        r[0]
        for r in df.select(key).na.drop(subset=[key]).sample(False, fraction, seed=42).collect()
    )
    if not vals:
        return []
    picks = {vals[min(len(vals) - 1, (i * len(vals)) // n_parts)] for i in range(1, n_parts)}
    return sorted(picks)


def uniform_hex_bounds(n_parts: int, width: int = 8) -> list[str]:
    """Analytic split points for a key KNOWN to be a uniform lowercase
    hex string (md5/sha prefixes): ``n_parts - 1`` evenly spaced
    ``width``-hex-digit prefixes.  Lexicographic comparison against a
    prefix bound ranges the full string correctly, so a hash-ordered
    numbering can skip the count + sample jobs the sampling sketch
    (:func:`_order_split_bounds`) would otherwise spend."""
    if n_parts > 16**width:
        raise ValueError(
            f"n_parts={n_parts} exceeds the {width}-hex-digit key space "
            f"({16 ** width}): step would floor to 0 and every bound "
            "would collapse to one range — widen `width`"
        )
    step = 16**width // n_parts
    return [format(i * step, f"0{width}x") for i in range(1, n_parts)]


def _stamp_range_pid(
    df: DataFrame, key_col: str, bounds: list | None = None
) -> DataFrame:
    """Stamp a deterministic range id ``__pid`` from split points on
    ``key_col``.

    The range id is a PURE FUNCTION of the row (a sum of boolean casts
    against literal split points, whole-stage codegen) — NOT
    ``spark_partition_id()`` after ``repartitionByRange``, whose sampled
    boundaries are recomputed per job and can disagree between an
    offset-count job and the numbering job (observed at sf0.01: shifted
    offsets, duplicate row ids).  Every job stamps identical ids, so
    counts always match numbering.  No HOF lambda either: an outer
    column reference inside one mis-binds through a later join.  Null
    keys coalesce to range 0, matching NULLS FIRST ascending order.
    """
    if bounds is None:
        n_parts = max(
            df.sparkSession.sparkContext.defaultParallelism,
            df.rdd.getNumPartitions(),
        )
        bounds = _order_split_bounds(df, key_col, n_parts)
    elif bounds:
        # caller-supplied bounds whose type mismatches the key would
        # cast to NULL and silently stamp EVERY row into range 0 — the
        # exact parallelism collapse the stamp exists to prevent.
        # Cheap driver-side guard: python type must match the column
        # category (string bounds for string keys, numeric for numeric).
        from pyspark.sql.types import NumericType, StringType

        kt = df.schema[key_col].dataType
        ok = (
            all(isinstance(b, str) for b in bounds)
            if isinstance(kt, StringType)
            else all(
                isinstance(b, (int, float)) and not isinstance(b, bool)
                for b in bounds
            )
            if isinstance(kt, NumericType)
            else True
        )
        if not ok:
            raise TypeError(
                f"bounds {type(bounds[0]).__name__} values do not match "
                f"key column {key_col!r} of type {kt.simpleString()}; a "
                "failed cast would stamp every row into one range"
            )
    if bounds:
        key_type = df.schema[key_col].dataType
        key = F.col(key_col)
        pid = F.coalesce(
            sum(
                (F.lit(b).cast(key_type) <= key).cast("int") for b in bounds
            ),
            F.lit(0),
        )
    else:
        pid = F.lit(0)
    return df.withColumn("__pid", pid)


def _ranged_row_number(
    df: DataFrame, order_cols: Sequence[str], name: str
) -> DataFrame:
    """Global row numbering WITHOUT a single-partition window: assign a
    range id from deterministic split points on the first order column
    (see :func:`_stamp_range_pid`), number rows inside each range, then
    add per-range offsets (one tiny aggregate, broadcast back).

    Total order follows ``order_cols``; rows tying on the first column
    land in the same range, so ties order by the remaining columns —
    pass a unique tiebreak column for full determinism.
    """
    cols = [F.col(c) for c in order_cols]
    stamped = _stamp_range_pid(df, order_cols[0])
    counts = stamped.groupBy("__pid").agg(F.count(F.lit(1)).alias("__n"))
    rows = sorted((r["__pid"], r["__n"]) for r in counts.collect())
    offsets, acc = [], 0
    for p, n in rows:
        offsets.append((p, acc))
        acc += n
    off = df.sparkSession.createDataFrame(offsets, "__pid int, __off long")
    w = Window.partitionBy("__pid").orderBy(*cols)
    return (
        stamped.join(F.broadcast(off), "__pid")
        .withColumn(name, F.row_number().over(w) + F.col("__off"))
        .drop("__pid", "__off")
    )


def grouped_row_number(
    df: DataFrame,
    group_col: str,
    order_cols: Sequence[str],
    name: str = "rowid",
    bounds: list | None = None,
    max_offset_rows: int = 1_000_000,
) -> DataFrame:
    """Per-group row numbering whose parallelism does NOT collapse to
    one task per group — the scale form for FEW, HUGE strata (a plain
    ``row_number() over (partition by stratum order by ...)`` runs one
    task per stratum: five languages over a 100 TB corpus = five tasks).

    Same discipline as :func:`_ranged_row_number`: deterministic range
    ids stamped as a pure function of the first order column (see
    :func:`_stamp_range_pid`), so the (group, range) count job and the
    numbering job always agree.  The offset table is |groups| x
    |ranges| rows — collected and broadcast, so ``group_col`` must be
    LOW-CARDINALITY by contract (languages, sources, splits: the same
    bound as a broadcast dimension).  Window partitions become
    (group, range): parallelism ~ range count regardless of how few
    groups exist.  Ties on the first order column land in one range;
    pass a unique tiebreak column for full determinism.  NULL group
    values are their own group, exactly as a plain window's
    ``partitionBy`` treats them (offsets join null-safely).

    Pass ``bounds`` when the order key's distribution is known (e.g.
    :func:`uniform_hex_bounds` for an md5 key) to skip the sampling
    sketch's count + sample jobs — two fewer passes over the input.
    """
    cols = [F.col(c) for c in order_cols]
    stamped = _stamp_range_pid(df, order_cols[0], bounds=bounds)
    counts = stamped.groupBy(group_col, "__pid").agg(
        F.count(F.lit(1)).alias("__n")
    )
    # DRIVER-SIZE GUARD (VERDICT r8 #4): the offset table is |groups| x
    # |ranges| rows on the driver — bounded by contract (few strata),
    # but a caller passing a high-cardinality group_col would OOM the
    # driver silently.  The limit-capped collect holds at most
    # max_offset_rows + 1 rows and fails LOUDLY past the cap instead.
    capped = counts.limit(max_offset_rows + 1).collect()
    if len(capped) > max_offset_rows:
        raise ValueError(
            f"grouped_row_number offset table exceeds {max_offset_rows} "
            f"(groups x ranges) rows — group_col {group_col!r} must be "
            "low-cardinality (languages/sources/splits); for "
            "high-cardinality groups use a plain window partitioned on "
            "the group, or raise max_offset_rows deliberately"
        )
    # group values need identity only (a NULL group is a real group, and
    # group types need not be mutually orderable driver-side): bucket
    # per group, order by range id within each
    by_group: dict = {}
    for r in capped:
        by_group.setdefault(r[group_col], []).append((r["__pid"], r["__n"]))
    offsets = []
    for g, lst in by_group.items():
        acc = 0
        for p, n in sorted(lst):
            offsets.append((g, p, acc))
            acc += n
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    off_schema = StructType(
        [
            StructField(group_col, df.schema[group_col].dataType),
            StructField("__pid", IntegerType()),
            StructField("__off", LongType()),
        ]
    )
    off = (
        df.sparkSession.createDataFrame(offsets, off_schema)
        .withColumnRenamed(group_col, "__g")
        .withColumnRenamed("__pid", "__opid")
    )
    w = Window.partitionBy(group_col, "__pid").orderBy(*cols)
    return (
        stamped.join(
            F.broadcast(off),
            F.col(group_col).eqNullSafe(F.col("__g"))
            & (F.col("__pid") == F.col("__opid")),
        )
        .withColumn(name, F.row_number().over(w) + F.col("__off"))
        .drop("__pid", "__opid", "__off", "__g")
    )


def chunk_buckets(
    df: DataFrame,
    order_cols: Sequence[str],
    n_chunks: int,
    scalable: bool = False,
) -> DataFrame:
    """W4/O5 — uniform chunking: assign each row to one of ``n_chunks``
    equal-count buckets in ``order_cols`` order (reference
    ``calculateTimeSubset`` src/data_wrangler.py:281-314 splits downloads
    into <=100k-row slices; ``ntile`` is the same math).

    ``scalable=False`` is the parity form: a global-window ``ntile``
    (single-partition shuffle — fine for the reference's <=100k-row
    download planning, wrong for a large table).  ``scalable=True``
    computes the identical assignment from a range-partitioned global
    row number plus ntile's closed-form bucket boundaries — no
    single-partition stage anywhere.
    """
    if not scalable:
        w = Window.orderBy(*[F.col(c) for c in order_cols])
        return df.withColumn("chunk_id", F.ntile(n_chunks).over(w))
    out = _ranged_row_number(df, order_cols, "__rid")
    # ntile(k) over N rows: first N % k buckets take ceil(N/k) rows.
    n_total = out.count()
    base, extra = divmod(n_total, n_chunks)
    boundary = (base + 1) * extra
    rid = F.col("__rid")
    chunk = F.when(
        rid <= boundary, ((rid - 1) / (base + 1)).cast("long") + 1
    ).otherwise(extra + ((rid - 1 - boundary) / F.greatest(F.lit(base), F.lit(1))).cast("long") + 1)
    return out.withColumn("chunk_id", chunk.cast("int")).drop("__rid")


def with_row_number(
    df: DataFrame,
    order_cols: Sequence[str],
    name: str = "rowid",
    scalable: bool = False,
) -> DataFrame:
    """W5 — the converters' ``ROWID@`` pseudo-field
    (Converters/Json2GeoJSON.py:171-172).  ``scalable=True`` swaps the
    global window for the range-partition + offset form (see
    :func:`_ranged_row_number`) — same numbering, no single-partition
    shuffle."""
    if scalable:
        return _ranged_row_number(df, order_cols, name)
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(name, F.row_number().over(w))
