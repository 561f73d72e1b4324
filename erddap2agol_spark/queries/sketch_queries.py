"""Graded queries for the deterministic sketches (operators/sketch.py).

The point of grading an *approximate* operator: because both sketches
are pure md5 + integer arithmetic, the estimates are bit-identical
across engines, so the DuckDB oracle checks the sketch itself — not a
tolerance band.  Each query also emits the exact answer next to the
estimate so the error is visible in the graded output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.sketch import (
    KMV_NIBBLES,
    KMV_SCALE,
    countmin_estimates,
    duckdb_hex_int,
    kmv_distinct,
)
from ..sources.tables import load_table
from . import register

_K = 64
_DEPTH, _WIDTH = 3, 32


@register(
    "kmv_distinct_by_type",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type AS grp,
             {duckdb_hex_int("CAST(user_id AS VARCHAR)", KMV_NIBBLES)} AS hv
      FROM events
    ),
    ranked AS (
      SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rk
      FROM h
    ),
    sk AS (
      SELECT grp, count(*) AS n_kept, max(hv) AS kth_hash
      FROM ranked WHERE rk <= {_K} GROUP BY grp
    ),
    truth AS (
      SELECT event_type AS grp, count(DISTINCT user_id) AS true_distinct
      FROM events GROUP BY event_type
    )
    SELECT sk.grp AS event_type, n_kept, kth_hash,
           round(CASE WHEN n_kept < {_K} THEN CAST(n_kept AS DOUBLE)
                      ELSE ({_K} - 1) / (kth_hash / {KMV_SCALE!r}) END, 4)
             AS est_distinct,
           true_distinct
    FROM sk JOIN truth USING (grp)
    """,
    doc="KMV distinct-user estimate per event type, next to the exact "
    "count: k smallest 48-bit hashes per group (bounded window), "
    "estimator (k-1)/u_k. The sketch state is k rows per group at any "
    "input scale; the exact side is only here to show the error.",
)
def kmv_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sk = kmv_distinct(
        ev, F.col("user_id").cast("string"), _K, by=F.col("event_type")
    )
    truth = ev.groupBy(F.col("event_type").alias("grp")).agg(
        F.count_distinct("user_id").alias("true_distinct")
    )
    return sk.join(truth, "grp").select(
        F.col("grp").alias("event_type"),
        "n_kept",
        "kth_hash",
        "est_distinct",
        "true_distinct",
    )


@register(
    "cms_user_counts",
    oracle=f"""
    WITH src AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events),
    rows_h AS (
      SELECT key, j,
             {duckdb_hex_int("CAST(j AS VARCHAR) || '|' || key", 4)} % {_WIDTH}
               AS bucket
      FROM src CROSS JOIN (VALUES (0), (1), (2)) AS d(j)
    ),
    cells AS (SELECT j, bucket, count(*) AS cnt FROM rows_h GROUP BY j, bucket),
    probes AS (SELECT DISTINCT key, j, bucket FROM rows_h),
    est AS (
      SELECT key, min(cnt) AS n_est
      FROM probes JOIN cells USING (j, bucket) GROUP BY key
    ),
    truth AS (SELECT key, count(*) AS n_true FROM src GROUP BY key)
    SELECT CAST(key AS BIGINT) AS user_id, n_true, n_est,
           n_est - n_true AS overcount
    FROM truth JOIN est USING (key)
    """,
    doc="Count-min per-user frequency estimate vs truth: 3 salted hash "
    "rows x 32 buckets; estimate = min over the key's cells (always an "
    "overcount). The build is one map-side-combinable aggregation with "
    "<= d*w output rows at any scale, so the sketch broadcasts for "
    "probing.",
)
def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = countmin_estimates(
        ev, F.col("user_id").cast("string"), _DEPTH, _WIDTH
    )
    return out.select(
        F.col("key").cast("long").alias("user_id"), "n_true", "n_est", "overcount"
    )


@register(
    "hll_distinct_users",
    oracle="""
    WITH h AS (
      SELECT md5(CAST(user_id AS VARCHAR)) AS hx FROM events
    ),
    rv AS (
      SELECT CAST(('0x' || substring(hx, 1, 1)) AS BIGINT) AS reg,
             CAST(('0x' || substring(hx, 2, 12)) AS BIGINT) AS v
      FROM h
    ),
    mx AS (
      SELECT s.reg, COALESCE(max(CASE WHEN v = 0 THEN 49
                                      ELSE 48 - CAST(floor(log2(v)) AS INT)
                                 END), 0) AS mx
      FROM (SELECT unnest(generate_series(0, 15)) AS reg) s
      LEFT JOIN rv ON rv.reg = s.reg
      GROUP BY s.reg
    ),
    fold AS (
      SELECT list_aggregate(list(pow(2.0, -mx) ORDER BY reg), 'sum') AS s,
             count(CASE WHEN mx = 0 THEN 1 END) AS n_zero_registers
      FROM mx
    )
    SELECT 16 AS n_registers, CAST(n_zero_registers AS INT) AS n_zero_registers,
           round(0.673 * 256 / s, 1) AS raw_estimate,
           CASE WHEN n_zero_registers > 0
                THEN round(16.0 * ln(16.0 / n_zero_registers), 1)
           END AS linear_count,
           (SELECT count(DISTINCT user_id) FROM events) AS exact_distinct
    FROM fold
    """,
    doc="HyperLogLog distinct-user readout (16 registers, 48-bit rank "
    "field, Flajolet alpha): register build is one map-side-combinable "
    "max aggregate emitting m rows at ANY corpus size — the mergeable "
    "sketch that replaces COUNT(DISTINCT)'s full shuffle at 100 TB. "
    "The harmonic sum folds in register-sorted order (pinned-order "
    "float fold) and both the raw and the small-range linear estimates "
    "emit unconditionally, so no float boundary can flip a branch; "
    "exact_distinct sits beside them as the accuracy witness.",
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_estimate

    ev = load_table(spark, sf_dir, "events")
    est = hll_estimate(ev, F.col("user_id").cast("string"), reg_nibbles=1)
    exact = ev.agg(F.countDistinct("user_id").alias("exact_distinct"))
    return est.join(F.broadcast(exact)).select(
        "n_registers",
        F.col("n_zero_registers").cast("int").alias("n_zero_registers"),
        "raw_estimate",
        "linear_count",
        "exact_distinct",
    )


@register(
    "hll_weekly_rollup",
    oracle="""
    WITH h AS (
      SELECT CAST(floor((CAST(CAST(ts AS TIMESTAMP) AS DATE)
                         - DATE '2024-01-01') / 7) AS INT) AS wk,
             md5(CAST(user_id AS VARCHAR)) AS hx
      FROM events
    ),
    rv AS (
      SELECT wk,
             CAST(('0x' || substring(hx, 1, 1)) AS BIGINT) AS reg,
             CAST(('0x' || substring(hx, 2, 12)) AS BIGINT) AS v
      FROM h
    ),
    daily AS (
      SELECT wk, reg, max(CASE WHEN v = 0 THEN 49
                               ELSE 48 - CAST(floor(log2(v)) AS INT) END) AS mx
      FROM rv GROUP BY wk, reg
    ),
    fold AS (
      SELECT wk,
             list_aggregate(list(pow(2.0, -mx) ORDER BY reg), 'sum')
               + (16 - count(*)) AS s,
             CAST(16 - count(*) AS INT) AS n_zero_registers
      FROM daily GROUP BY wk
    ),
    exact AS (
      SELECT CAST(floor((CAST(CAST(ts AS TIMESTAMP) AS DATE)
                         - DATE '2024-01-01') / 7) AS INT) AS wk,
             count(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY wk
    )
    SELECT f.wk AS week, n_zero_registers,
           round(0.673 * 256 / s, 1) AS raw_estimate,
           CASE WHEN n_zero_registers > 0
                THEN round(16.0 * ln(16.0 / n_zero_registers), 1) END
             AS linear_count,
           exact_distinct
    FROM fold f JOIN exact e ON e.wk = f.wk
    ORDER BY week
    """,
    doc="Grouped HLL rollup: per-week distinct users from 16-register "
    "sketches built per week, beside the exact count. Present-register "
    "rows only (absent = implicit zero, derived as m - n_present), "
    "pinned-order harmonic fold per group — the shape that lets daily "
    "sketches roll up to weeks/months by register-wise max without "
    "touching raw data again.",
)
def hll_weekly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_readout, hll_registers_by

    ev = load_table(spark, sf_dir, "events")
    wk = F.floor(
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date")) / 7
    ).cast("int")
    regs = hll_registers_by(
        ev, F.col("user_id").cast("string"), wk, reg_nibbles=1
    )
    est = hll_readout(regs, reg_nibbles=1)
    exact = ev.groupBy(wk.alias("wk")).agg(
        F.countDistinct("user_id").alias("exact_distinct")
    )
    return (
        est.join(exact, est["grp"] == exact["wk"])
        .select(
            F.col("grp").alias("week"),
            "n_zero_registers",
            "raw_estimate",
            "linear_count",
            "exact_distinct",
        )
        .orderBy("week")
    )


_PJ_K = 128


@register(
    "kmv_pair_overlap",
    oracle=f"""
    WITH h AS (
      SELECT DISTINCT event_type AS grp,
             {duckdb_hex_int("CAST(user_id AS VARCHAR)", KMV_NIBBLES)} AS hv
      FROM events
    ),
    sk AS (
      SELECT grp, hv FROM (
        SELECT grp, hv, row_number() OVER (PARTITION BY grp ORDER BY hv) AS rk
        FROM h
      ) WHERE rk <= {_PJ_K}
    ),
    pr AS (
      SELECT a.grp AS grp_a, b.grp AS grp_b
      FROM (SELECT DISTINCT grp FROM sk) a, (SELECT DISTINCT grp FROM sk) b
      WHERE a.grp < b.grp
    ),
    ext AS (
      SELECT pr.grp_a, pr.grp_b, s.hv, 1 AS in_a, 0 AS in_b
      FROM pr JOIN sk s ON s.grp = pr.grp_a
      UNION ALL
      SELECT pr.grp_a, pr.grp_b, s.hv, 0, 1
      FROM pr JOIN sk s ON s.grp = pr.grp_b
    ),
    mb AS (
      SELECT grp_a, grp_b, hv, max(in_a) AS a, max(in_b) AS b
      FROM ext GROUP BY grp_a, grp_b, hv
    ),
    tk AS (
      SELECT * FROM (
        SELECT grp_a, grp_b, hv, a, b,
               row_number() OVER (PARTITION BY grp_a, grp_b ORDER BY hv) AS rk
        FROM mb
      ) WHERE rk <= {_PJ_K}
    ),
    est AS (
      SELECT grp_a, grp_b, count(*) AS n_kept, max(hv) AS kth,
             CAST(sum(a * b) AS BIGINT) AS n_both
      FROM tk GROUP BY grp_a, grp_b
    )
    SELECT grp_a, grp_b,
           round(n_both / CAST(n_kept AS DOUBLE), 4) AS est_jaccard,
           round(CASE WHEN n_kept < {_PJ_K} THEN CAST(n_kept AS DOUBLE)
                      ELSE ({_PJ_K} - 1) / (kth / {KMV_SCALE!r}) END, 4) AS est_union,
           round((n_both / CAST(n_kept AS DOUBLE)) *
                 CASE WHEN n_kept < {_PJ_K} THEN CAST(n_kept AS DOUBLE)
                      ELSE ({_PJ_K} - 1) / (kth / {KMV_SCALE!r}) END, 4)
             AS est_intersection
    FROM est
    """,
    doc="Sketch set algebra (Beyer et al. 2007): estimated Jaccard, "
    "union and intersection sizes between every pair of event-stream "
    "user sets, from their KMV sketches alone. After the per-group "
    "k-min build (bounded window), everything runs on 2k rows per "
    "pair -- comparing a thousand feeds costs pairs x k rows, never a "
    "second corpus pass. Pure md5 + integer arithmetic until the "
    "final rounded divisions: bit-identical across engines.",
)
def kmv_pair_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import kmv_pair_jaccard

    ev = load_table(spark, sf_dir, "events")
    return kmv_pair_jaccard(
        ev, F.col("user_id").cast("string"), F.col("event_type"), k=_PJ_K
    )


@register(
    "cms_join_size_estimate",
    oracle=f"""
    WITH lsrc AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events
                  WHERE event_type = 'click'),
    rsrc AS (SELECT CAST(user_id AS VARCHAR) AS key FROM events
             WHERE event_type = 'purchase'),
    lrows AS (
      SELECT key, j,
             {duckdb_hex_int("CAST(j AS VARCHAR) || '|' || key", 4)} % {_WIDTH}
               AS bucket
      FROM lsrc CROSS JOIN (VALUES (0), (1), (2)) AS d(j)
    ),
    rrows AS (
      SELECT key, j,
             {duckdb_hex_int("CAST(j AS VARCHAR) || '|' || key", 4)} % {_WIDTH}
               AS bucket
      FROM rsrc CROSS JOIN (VALUES (0), (1), (2)) AS d(j)
    ),
    lc AS (SELECT j, bucket, count(*) AS cnt FROM lrows GROUP BY j, bucket),
    rc AS (SELECT j, bucket, count(*) AS cnt_b FROM rrows GROUP BY j, bucket),
    ip0 AS (
      SELECT lc.j, CAST(sum(lc.cnt * rc.cnt_b) AS BIGINT) AS ip
      FROM lc JOIN rc ON lc.j = rc.j AND lc.bucket = rc.bucket
      GROUP BY lc.j
    ),
    ip AS (
      SELECT d.j, coalesce(ip0.ip, 0) AS ip
      FROM (VALUES (0), (1), (2)) AS d(j) LEFT JOIN ip0 ON d.j = ip0.j
    ),
    est AS (
      SELECT min(ip) AS est_join_size,
             round(avg(ip), 1) AS avg_depth_estimate,
             max(ip) AS max_depth_estimate
      FROM ip
    ),
    truth AS (
      SELECT CAST(count(*) AS BIGINT) AS true_join_size
      FROM lsrc JOIN rsrc USING (key)
    )
    SELECT est_join_size, avg_depth_estimate, max_depth_estimate,
           true_join_size
    FROM est CROSS JOIN truth
    """,
    doc="Join-size estimation without executing the join (AMS inner "
    "product over count-min sketches): |clicks x purchases per user| "
    "estimated from two d x w cell tables -- each one map-side "
    "aggregation, the estimate d x w multiplies, min across depths. "
    "The planner question ('will this join blow up?') answered at "
    "sketch cost; the exact join size rides along to show the "
    "overcount. Bit-exact across engines (md5 + integer arithmetic).",
)
def cms_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import cms_join_size

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click")
    buys = ev.where(F.col("event_type") == "purchase")
    est = cms_join_size(
        clicks,
        buys,
        F.col("user_id").cast("string"),
        F.col("user_id").cast("string"),
        _DEPTH,
        _WIDTH,
    )
    lk = clicks.select(F.col("user_id").alias("k"))
    rk = buys.select(F.col("user_id").alias("k"))
    truth = lk.join(rk, "k").agg(F.count(F.lit(1)).alias("true_join_size"))
    return est.crossJoin(F.broadcast(truth))


_QLO, _QHI, _QNB = 900.0, 105000.0, 512
_QW = (_QHI - _QLO) / _QNB  # 203.3203125 — dyadic, exact in a double
_QQS = [0.25, 0.5, 0.75, 0.9, 0.99]


@register(
    "quantile_sketch_prices",
    oracle="""
    WITH counts AS (
      SELECT LEAST(511, GREATEST(0,
               CAST(FLOOR((CAST(l_extendedprice AS DOUBLE) - 900.0)
                          / 203.3203125) AS INT))) AS bin,
             count(*) AS cnt
      FROM lineitem GROUP BY 1
    ),
    packed AS (
      SELECT CAST(sum(cnt) AS DOUBLE) AS n,
             CAST(sum(cnt) AS BIGINT) AS n_rows
      FROM counts
    ),
    cum AS (
      SELECT bin, cnt,
             CAST(sum(cnt) OVER (ORDER BY bin) AS DOUBLE) AS cum_after,
             CAST(sum(cnt) OVER (ORDER BY bin) - cnt AS DOUBLE) AS cum_before
      FROM counts
    ),
    qs(q, pos) AS (VALUES (CAST(0.25 AS DOUBLE), 1),
                          (CAST(0.5 AS DOUBLE), 2),
                          (CAST(0.75 AS DOUBLE), 3),
                          (CAST(0.9 AS DOUBLE), 4),
                          (CAST(0.99 AS DOUBLE), 5)),
    ex AS (
      SELECT quantile_cont(CAST(l_extendedprice AS DOUBLE),
                           [0.25, 0.5, 0.75, 0.9, 0.99]) AS exl
      FROM lineitem
    ),
    est AS (
      SELECT qs.q, qs.pos, p.n_rows,
             round(900.0 + (c.bin + (qs.q * p.n - c.cum_before) / c.cnt)
                   * 203.3203125, 6) AS est_value
      FROM qs, packed p, cum c
      WHERE c.cum_after >= qs.q * p.n AND c.cum_before < qs.q * p.n
    )
    SELECT e.q, e.est_value, e.n_rows,
           round(ex.exl[e.pos], 6) AS exact_value,
           round(abs(e.est_value - round(ex.exl[e.pos], 6)), 6) AS abs_err,
           round(abs(e.est_value - round(ex.exl[e.pos], 6)), 6)
             <= 203.3203125 AS within_tol
    FROM est e, ex
    ORDER BY e.q
    """,
    doc="Mergeable quantile sketch (fixed-grid histogram CDF): binning "
    "is a narrow map, the bin table is ONE map-side-combinable count "
    "aggregate of at most 512 rows at ANY input scale, and the "
    "quantile readout folds the collected bin array in bin-sorted "
    "order (pinned-order float fold; no order-only Window, no "
    "unbounded join) — the 100 TB percentile path where exact "
    "percentile() buffers every value. Per-shard histograms merge by "
    "bin-wise count sum. Exact percentiles ride along as the accuracy "
    "witness; the hard guarantee is rank-based (the estimate lies in "
    "the bin holding the q*n-th order statistic) and within_tol "
    "witnesses that on this dense column the estimate also lands "
    "within one bin width of the interpolated exact percentile.",
)
def quantile_sketch_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import histogram_quantiles

    li = load_table(spark, sf_dir, "lineitem")
    est = histogram_quantiles(
        li, F.col("l_extendedprice"), _QQS, _QLO, _QHI, _QNB
    )
    exact = li.agg(
        F.percentile(
            F.col("l_extendedprice").cast("double"),
            F.array(*[F.lit(q) for q in _QQS]),
        ).alias("exl")
    )
    pos = F.array_position(
        F.array(*[F.lit(float(q)) for q in _QQS]), F.col("q")
    ).cast("int")
    exact_value = F.round(F.element_at(F.col("exl"), pos), 6)
    abs_err = F.round(F.abs(F.col("est_value") - exact_value), 6)
    return (
        est.crossJoin(F.broadcast(exact))
        .select(
            "q",
            "est_value",
            "n_rows",
            exact_value.alias("exact_value"),
            abs_err.alias("abs_err"),
            (abs_err <= F.lit(_QW)).alias("within_tol"),
        )
        .orderBy("q")
    )


_MG_K = 200


@register(
    "heavy_hitters_users",
    oracle=f"""
    SELECT user_id, count(*) AS n_rows
    FROM events
    WHERE user_id IS NOT NULL
    GROUP BY user_id
    HAVING count(*) * {_MG_K + 1} > (
      SELECT count(*) FROM events WHERE user_id IS NOT NULL
    )
    """,
    doc="EXACT heavy hitters (users with > N/(k+1) of all events) via "
    "two passes: per-partition Misra-Gries(k) candidate summaries "
    "(mergeable-summaries batch form — bounded k rows per partition, "
    "provable superset), then one exact aggregate over the candidate "
    "semi-join with an integer-exact threshold. The full frequency "
    "table — the thing that doesn't scale when the key space is "
    "billions — is never built; the oracle builds it, and the results "
    "are provably identical.",
)
def heavy_hitters_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import heavy_hitters_exact

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters_exact(ev, "user_id", _MG_K)
