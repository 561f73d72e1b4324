"""Reference-surface queries (SURVEY §2.1-2.8) over the driver test tables.

Each query exercises one operator family from the SURVEY §2 inventory,
mapped onto the TPC-H-ish star schema + ``events`` table the driver
provides. Oracle SQL is DuckDB dialect over the same parquet (views are
pre-registered by the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.cases import apply_case
from ..functions.dsl import compile_ops, sanitize_name
from ..operators import aggregates, filters, joins, windows
from ..operators.projection import metadata_projection
from ..sources.tables import load_table
from . import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# Flagship — full scan -> hash aggregate (TPC-H Q1 shape; SURVEY §2.5)
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 6)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="Flagship: scan -> pushed filter -> map-side partial agg -> 6-group hash agg.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 4).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 6).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Scans / catalog (S2, S3, P12)
# ---------------------------------------------------------------------------


@register(
    "catalog_scan",
    oracle="""
    SELECT o_orderkey AS dataset_id, o_orderpriority AS title,
           o_orderdate AS min_time
    FROM orders WHERE o_orderstatus <> 'P'
    """,
    doc="S2/P12: catalog scan with protocol/blank-row filter + projection.",
)
def catalog_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    # orders stands in for allDatasets.json rows; status 'P' for the
    # blank-protocol rows the reference skips (erddap_wrangler.py:310-313).
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") != "P")
        .select(
            F.col("o_orderkey").alias("dataset_id"),
            F.col("o_orderpriority").alias("title"),
            F.col("o_orderdate").alias("min_time"),
        )
    )


@register(
    "catalog_search",
    oracle="""
    SELECT p_partkey AS dataset_id, p_name AS title
    FROM part
    WHERE lower(p_name) LIKE '%small%' AND lower(p_type) LIKE '%economy%'
    """,
    doc="S3: full-text catalog search — multi-keyword AND over title fields.",
)
def catalog_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.filter(
        F.lower(F.col("p_name")).contains("small")
        & F.lower(F.col("p_type")).contains("economy")
    ).select(F.col("p_partkey").alias("dataset_id"), F.col("p_name").alias("title"))


# ---------------------------------------------------------------------------
# Projection (P1) — metadata-driven column pruning
# ---------------------------------------------------------------------------


@register(
    "metadata_projection",
    oracle="""
    SELECT l_orderkey AS obs_id, l_linenumber AS line_no,
           l_quantity AS quantity, l_extendedprice AS extendedprice
    FROM lineitem
    """,
    doc="P1: QC-suffix/single-char columns dropped by a name rule computed "
    "at plan time; pruning reaches the parquet ReadSchema.",
)
def metadata_projection_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("obs_id"),
        F.col("l_linenumber").alias("line_no"),
        F.col("l_quantity").alias("quantity"),
        F.col("l_extendedprice").alias("extendedprice"),
        F.col("l_discount").alias("discount_qc_agg"),  # QC suffix -> dropped
        F.col("l_tax").alias("qartod_tax"),  # qartod prefix -> dropped
        F.col("l_returnflag").alias("s"),  # single-char -> dropped
    )
    return metadata_projection(li, required=["obs_id"])


# ---------------------------------------------------------------------------
# Filters (P4, P6, P8, P11/W2)
# ---------------------------------------------------------------------------


@register(
    "time_filter",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-10 00:00:00'
      AND CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-17 00:00:00'
    """,
    doc="P4: time-range predicate pushed to the parquet scan.",
)
def time_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return filters.time_range(ev, "ts", "2024-01-10 00:00:00", "2024-01-17 00:00:00").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@register(
    "bbox_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_quantity BETWEEN 10 AND 20 AND l_extendedprice BETWEEN 1000 AND 5000
    """,
    doc="P6: bounding-box two-range predicate (lat/lon stand-ins).",
)
def bbox_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return filters.bbox(li, "l_quantity", "l_extendedprice", 10, 20, 1000, 5000).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@register(
    "row_range",
    oracle="""
    SELECT event_id, event_type, value FROM events
    ORDER BY event_id LIMIT 50 OFFSET 100
    """,
    doc="P8/T3/T5: deterministic rowOffset/rowLength pagination.",
)
def row_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    return filters.row_range(ev, ["event_id"], offset=100, limit=50)


@register(
    "nrt_window",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >= (SELECT CAST(max(ts) AS TIMESTAMP) - INTERVAL 7 DAY FROM events)
    """,
    doc="P11/W2: the NRT 7-day moving window anchored at the table's max ts.",
)
def nrt_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return filters.freshness_window(ev, "ts", days=7).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@register(
    "null_tally",
    oracle="""
    SELECT CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS value_nulls,
           CAST(sum(CASE WHEN props IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS props_nulls,
           count(*) AS total_rows
    FROM events
    """,
    doc="A5/P7: per-column missing-value tallies in one aggregate pass.",
)
def null_tally_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.agg(
        F.sum(F.when(F.col("value").isNull(), 1).otherwise(0)).alias("value_nulls"),
        F.sum(F.when(F.col("props").isNull(), 1).otherwise(0)).alias("props_nulls"),
        F.count(F.lit(1)).alias("total_rows"),
    )


# ---------------------------------------------------------------------------
# Joins (J1, J2/J3, J4)
# ---------------------------------------------------------------------------


@register(
    "anti_join_new",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="J1/U1: NRT anti-join — entities with no existing published item.",
)
def anti_join_new(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return joins.anti_join_new(cust, orders, "c_custkey")


@register(
    "semi_join_existing",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    doc="J4: existence semi-join.",
)
def semi_join_existing(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    orders = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return joins.semi_join_existing(cust, orders, "c_custkey")


@register(
    "enrich_revenue_by_region",
    oracle="""
    SELECT r_name, n_name,
           round(sum(o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
    doc="J2/J3: dimension-enrichment joins -> grouped revenue.  The dim "
    "CHAIN is denormalized first — nation⋈region (25 rows, broadcast "
    "FORCED: always dim-safe per tables.BROADCAST_TABLES) folds into "
    "customer, then one chain join carries it to the fact scan — "
    "instead of three joins walking the snowflake one hop at a time.  "
    "The customer-chain join is deliberately left to cost-based "
    "planning, NOT hinted: customer is excluded from BROADCAST_TABLES "
    "because it scales with the fact data — at catalog scale the "
    "optimizer broadcasts it (the plan test sees 3 broadcast joins), "
    "at 100 TB it correctly degrades to a shuffle hash join on the "
    "customer key rather than OOMing on a forced broadcast.",
)
def enrich_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region")
    dims = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey", "n_name", "r_name")
    )
    return (
        o.join(dims, o.o_custkey == dims.c_custkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Windows / ordered (W1, W3, W4, W5) and top-k
# ---------------------------------------------------------------------------


@register(
    "track_segments",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey AS track_id,
             o_orderdate AS seg_start,
             lead(o_orderdate)     OVER w AS seg_end,
             o_totalprice          AS x1,
             lead(o_totalprice)    OVER w AS x2,
             lead(o_orderpriority) OVER w AS carried_priority
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ) WHERE x2 IS NOT NULL
    """,
    doc="W1/J6: consecutive-point segment builder via lead() — properties "
    "from the segment's second point; no self-join.",
)
def track_segments_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        o.select(
            F.col("o_custkey").alias("track_id"),
            F.col("o_orderdate").alias("seg_start"),
            F.lead("o_orderdate").over(w).alias("seg_end"),
            F.col("o_totalprice").alias("x1"),
            F.lead("o_totalprice").over(w).alias("x2"),
            F.lead("o_orderpriority").over(w).alias("carried_priority"),
        )
        .filter(F.col("x2").isNotNull())
    )


@register(
    "tumbling_daily",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_start,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1
    """,
    doc="W3: tumbling calendar-day buckets with per-bucket aggregates.",
)
def tumbling_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = windows.tumbling(_t(spark, sf_dir, "events"), "ts", "day", label=False)
    return ev.groupBy("bucket_start").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value")
    )


@register(
    "tumbling_week_label",
    oracle="""
    SELECT 'W' || lpad(CAST(weekofyear(ts) AS VARCHAR), 2, '0') || '-' ||
           CAST(isoyear(ts) AS VARCHAR) AS bucket_label,
           count(*) AS n
    FROM events GROUP BY 1
    """,
    doc="W3: ISO-week tumbling buckets with the reference's W{wk}-{year} labels "
    "(src/data_wrangler.py:190-221).",
)
def tumbling_week_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ISO week-year via the Thursday rule (Spark >=3 rejects the 'YYYY'
    # week-year pattern): the ISO year of a date is the calendar year of
    # the Thursday in its ISO week.
    iso_year = F.year(F.date_add(F.to_date(F.date_trunc("week", F.col("ts"))), 3))
    ev = _t(spark, sf_dir, "events").withColumn(
        "bucket_label",
        F.concat(
            F.lit("W"),
            F.lpad(F.weekofyear("ts").cast("string"), 2, "0"),
            F.lit("-"),
            iso_year.cast("string"),
        ),
    )
    return ev.groupBy("bucket_label").agg(F.count(F.lit(1)).alias("n"))


@register(
    "tumbling_month_label",
    oracle="""
    SELECT strftime(CAST(ts AS TIMESTAMP), '%b-%Y') AS bucket_label,
           count(*) AS n, round(sum(value), 4) AS sum_value
    FROM events GROUP BY 1
    """,
    doc="W3: calendar-month buckets with the reference's 'Jan-2025' "
    "labels (griddapDivider, src/data_wrangler.py:190-221).",
)
def tumbling_month_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = windows.tumbling(_t(spark, sf_dir, "events"), "ts", "month", label=True)
    return ev.groupBy("bucket_label").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value")
    )


@register(
    "coord_cleaning",
    oracle="""
    SELECT l_orderkey, l_linenumber, lat, lon FROM (
      SELECT l_orderkey, l_linenumber,
             CASE WHEN l_quantity < 5 THEN CAST('NaN' AS DOUBLE) ELSE l_quantity END AS lat,
             CASE WHEN l_discount > 0.09 THEN NULL ELSE l_extendedprice END AS lon
      FROM lineitem
    ) WHERE NOT isnan(lat) AND lon IS NOT NULL
    """,
    doc="P9/F8: invalid-coordinate cleaning — NaN normalized to null, "
    "rows with missing coordinates dropped (the glider pre-filter).",
)
def coord_cleaning(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        F.when(F.col("l_quantity") < 5, F.lit(float("nan")))
        .otherwise(F.col("l_quantity"))
        .alias("lat"),
        F.when(F.col("l_discount") > 0.09, F.lit(None))
        .otherwise(F.col("l_extendedprice"))
        .alias("lon"),
    )
    return filters.drop_invalid_coords(li, ["lat", "lon"])


@register(
    "chunk_plan",
    oracle="""
    SELECT chunk_id, count(*) AS n, min(ts) AS chunk_start, max(ts) AS chunk_end
    FROM (SELECT CAST(ts AS TIMESTAMP) AS ts,
                 ntile(6) OVER (ORDER BY CAST(ts AS TIMESTAMP), event_id) AS chunk_id
          FROM events)
    GROUP BY chunk_id
    """,
    doc="W4/O5: uniform chunk planning — ntile over time order, per-chunk extents "
    "(the reference's calculateTimeSubset math).",
)
def chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = windows.chunk_buckets(
        _t(spark, sf_dir, "events").select("ts", "event_id"),
        ["ts", "event_id"],
        6,
        scalable=True,  # range-partition + closed-form boundaries: no
        # single-partition ntile stage (VERDICT r3 #2)
    )
    return ev.groupBy("chunk_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("chunk_start"),
        F.max("ts").alias("chunk_end"),
    )


@register(
    "topk_per_group",
    oracle="""
    SELECT event_type, event_id, value, rk FROM (
      SELECT event_type, event_id, value,
             row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rk
      FROM events
    ) WHERE rk <= 3
    """,
    doc="Top-K per group — window row_number (free upgrade noted in SURVEY §2.5).",
)
def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.col("event_id"))
    return (
        ev.select("event_type", "event_id", "value", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 3)
    )


# ---------------------------------------------------------------------------
# Aggregations (A1, A4) + grouped stats + rollup
# ---------------------------------------------------------------------------


@register(
    "time_extent",
    oracle="""
    SELECT event_type, CAST(min(ts) AS TIMESTAMP) AS min_time,
           least(CAST(max(ts) AS TIMESTAMP), TIMESTAMP '2024-01-25 00:00:00') AS max_time
    FROM events GROUP BY event_type
    """,
    doc="A1: per-group time extent with the reference's future-end clamp "
    "(src/das_client.py:195-204).",
)
def time_extent_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return aggregates.time_extent(
        _t(spark, sf_dir, "events"), "ts", by=["event_type"], clamp_end_to="2024-01-25 00:00:00"
    )


@register(
    "geo_extent",
    oracle="""
    SELECT min(l_quantity) AS lat_min, max(l_quantity) AS lat_max,
           min(l_extendedprice) AS lon_min, max(l_extendedprice) AS lon_max
    FROM lineitem
    """,
    doc="A4: geographic extent (min/max over two coordinate columns).",
)
def geo_extent_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return aggregates.geo_extent(_t(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice")


@register(
    "grouped_stats",
    oracle="""
    SELECT event_type, count(*) AS n,
           round(sum(value), 6) AS sum_value, round(avg(value), 6) AS avg_value,
           round(min(value), 6) AS min_value, round(max(value), 6) AS max_value
    FROM events GROUP BY event_type
    """,
    doc="Grouped descriptive stats per key (SURVEY §2.5 free upgrade).",
)
def grouped_stats_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    return aggregates.grouped_stats(_t(spark, sf_dir, "events"), ["event_type"], "value")


@register(
    "rollup_revenue",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_extendedprice), 2) AS revenue, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP grouping sets (SURVEY §2.5: cube/rollup exposed as free upgrades).",
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_extendedprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "pivot_by_type",
    oracle="""
    SELECT user_id,
           round(coalesce(sum(CASE WHEN event_type = 'click'    THEN value END), 0), 4) AS click_value,
           round(coalesce(sum(CASE WHEN event_type = 'view'     THEN value END), 0), 4) AS view_value,
           round(coalesce(sum(CASE WHEN event_type = 'purchase' THEN value END), 0), 4) AS purchase_value,
           round(coalesce(sum(CASE WHEN event_type = 'signup'   THEN value END), 0), 4) AS signup_value,
           round(coalesce(sum(CASE WHEN event_type = 'error'    THEN value END), 0), 4) AS error_value
    FROM events GROUP BY user_id
    """,
    doc="Pivot (conditional aggregation form — stable output column names).",
)
def pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")

    def piv(t: str) -> F.Column:
        return F.round(
            F.coalesce(F.sum(F.when(F.col("event_type") == t, F.col("value"))), F.lit(0.0)), 4
        ).alias(f"{t}_value")

    return ev.groupBy("user_id").agg(
        piv("click"), piv("view"), piv("purchase"), piv("signup"), piv("error")
    )


# ---------------------------------------------------------------------------
# Set ops (U1, U2, U3)
# ---------------------------------------------------------------------------


@register(
    "dedup_cart",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id, event_type
                               ORDER BY CAST(ts AS TIMESTAMP), event_id) = 1
    """,
    doc="U2: deterministic dropDuplicates — first row per key under a total order.",
)
def dedup_cart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("event_id", "ts", "user_id", "event_type", "value")
    return filters.dedup_keep_first(ev, ["user_id", "event_type"], ["ts", "event_id"])


@register(
    "except_ids",
    oracle="""
    SELECT user_id FROM events EXCEPT SELECT c_custkey AS user_id FROM customer
    """,
    doc="U1: set difference (new ids minus existing inventory).",
)
def except_ids(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id")
    cust = _t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("user_id"))
    return ev.subtract(cust)


@register(
    "union_chunks",
    oracle="""
    SELECT event_type, count(*) AS n FROM (
      SELECT * FROM events WHERE ts <  TIMESTAMP '2024-01-15 00:00:00'
      UNION ALL
      SELECT * FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
    ) GROUP BY event_type
    """,
    doc="U3: union of chunk slices back into one relation.",
)
def union_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    a = ev.filter(F.col("ts") < F.lit("2024-01-15 00:00:00").cast("timestamp"))
    b = ev.filter(F.col("ts") >= F.lit("2024-01-15 00:00:00").cast("timestamp"))
    return a.unionAll(b).groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Scalar function layer (§2.8): DSL, dates, json, sanitization
# ---------------------------------------------------------------------------


@register(
    "extraction_dsl",
    oracle="""
    SELECT p_partkey,
           array_to_string(list_transform(string_split(p_name, ' '),
               w -> upper(w[1]) || lower(w[2:])), '') AS name_camel,
           upper(array_to_string(list_transform(string_split(p_name, ' '),
               w -> w[1]), '')) AS name_acronym,
           rpad(p_name[1:12], 12, ' ') AS name_fixed12,
           round(p_retailprice * 1.08, 4) AS price_with_tax,
           substring(p_name, 2) AS name_offset1
    FROM part
    """,
    doc="§2.8 extraction DSL compiled to Column expressions: case Camel/"
    "Acronym, width, mult, offset — all inside codegen, no Python UDFs.",
)
def extraction_dsl(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        "p_partkey",
        apply_case(name, "Camel").alias("name_camel"),
        apply_case(name, "Acronym").alias("name_acronym"),
        compile_ops(name, [("width", 12)]).alias("name_fixed12"),
        F.round(compile_ops(F.col("p_retailprice"), [("mult", 1.08)]), 4).alias(
            "price_with_tax"
        ),
        compile_ops(name, [("offset", 1)]).alias("name_offset1"),
    )


@register(
    "iso_format",
    oracle="""
    SELECT event_id, strftime(ts, '%Y-%m-%dT%H:%M:%SZ') AS iso_ts FROM events
    """,
    doc="F3: ISO-8601 Z formatting (src/data_wrangler.py:363-365).",
)
def iso_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("iso_ts")
    )


@register(
    "epoch_convert",
    oracle="""
    SELECT event_id, make_timestamp(event_id * 1000000) AS epoch_ts FROM events
    """,
    doc="F2: unix-epoch-seconds -> timestamp (timestamp_seconds), emitted "
    "as NTZ (naive UTC under the pinned session) so the collected value "
    "is identical on any driver machine timezone — a bare LTZ would "
    "render in the client's local zone at collect time.",
)
def epoch_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.timestamp_seconds(F.col("event_id")).cast("timestamp_ntz").alias("epoch_ts"),
    )


@register(
    "json_extract",
    oracle="""
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events
    """,
    doc="F11: dotted-path JSON value extraction (get_json_object).",
)
def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id", F.get_json_object("props", "$.k").cast("bigint").alias("k")
    )


@register(
    "sanitize_names",
    oracle="""
    SELECT p_partkey, regexp_replace(p_name, '[^A-Za-z0-9_-]', '_', 'g') AS safe_name
    FROM part
    """,
    doc="F7: label -> filename/id sanitizer (regexp [^A-Za-z0-9_-] -> _).",
)
def sanitize_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    return p.select("p_partkey", sanitize_name(F.col("p_name")).alias("safe_name"))


@register(
    "connector_scan",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
    FROM events
    WHERE CAST(ts AS TIMESTAMP) >= TIMESTAMP '2024-01-08 00:00:00'
      AND CAST(ts AS TIMESTAMP) <  TIMESTAMP '2024-01-12 00:00:00'
    """,
    doc="S6/O1-O5 through the erddap_sim Python Data Source: time-slice "
    "partitions planned from parquet footer stats, the range predicate "
    "pushed via pushFilters pruning whole slices before any read.",
)
def connector_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources import erddap_source

    erddap_source.register(spark)
    df = (
        spark.read.format("erddap_sim")
        .option("path", f"{sf_dir}/events.parquet")
        .option("time_col", "ts")
        .option("chunk_size", "2000")
        .load()
    )
    flavor = df.schema["ts"].dataType.simpleString()
    return df.filter(
        (F.col("ts") >= F.lit("2024-01-08 00:00:00").cast(flavor))
        & (F.col("ts") < F.lit("2024-01-12 00:00:00").cast(flavor))
    ).select("event_id", "ts", "event_type", "value")


@register(
    "array_ops",
    oracle="""
    WITH t AS (SELECT p_partkey, string_split(p_name, ' ') AS w FROM part)
    SELECT p_partkey,
           len(w) AS n_words,
           array_to_string(list_sort(list_distinct(w)), ',') AS distinct_sorted,
           w[1] AS first_word,
           w[-1] AS last_word,
           array_to_string(list_reverse(w), ' ') AS reversed_name
    FROM t
    """,
    doc="F13/U5-class array algebra: split, distinct, sort, first/last "
    "element, reverse — the tag-hygiene primitive set, JVM-side.",
)
def array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part")
    w = F.split(F.col("p_name"), " ")
    return p.select(
        "p_partkey",
        F.size(w).alias("n_words"),
        F.concat_ws(",", F.array_sort(F.array_distinct(w))).alias("distinct_sorted"),
        F.element_at(w, 1).alias("first_word"),
        F.element_at(w, -1).alias("last_word"),
        F.concat_ws(" ", F.reverse(w)).alias("reversed_name"),
    )


@register(
    "local_supplier_volume",
    oracle="""
    SELECT n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
           count(*) AS n_lines
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n_name
    """,
    doc="TPC-H Q5 shape: six-way join (two fact tables, four dims) with "
    "the same-nation correlation predicate. The fact-fact join shuffles "
    "on the order key; every dim side broadcasts (plan-tested); the "
    "date filter pushes to the orders scan.",
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01")
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
