"""TPC-H-shape analytics over the driver tables (round 3).

The reference's enrichment joins and summary aggregates (SURVEY §2.4/§2.5)
generalize to the classic decision-support shapes; each query here is the
standard TPC-H pattern re-keyed to the columns the driver tables actually
carry, with the physical plan called out: which side broadcasts, where the
one shuffle lands, what the top-k compiles to. Revenue sums round to 2dp
on both engines so cross-engine float summation order can't flip a hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from . import register

_Q3_DATE = "1998-06-01"


@register(
    "q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING'
      AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '{_Q3_DATE} 00:00:00'
      AND l_shipdate > TIMESTAMP '{_Q3_DATE} 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 (shipping priority): segment-filtered customers join "
    "orders join lineitem with date pushdown on both fact scans, revenue "
    "aggregate, top-10. The segment filter prunes customers ~5x before "
    "the join (predicate reaches the scan); orderBy+limit compiles to "
    "TakeOrderedAndProject — per-partition top-k then a 10-row merge, "
    "never a global sort.",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cut = F.lit(_Q3_DATE).cast(
        load_table(spark, sf_dir, "orders").schema["o_orderdate"].dataType.simpleString()
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@register(
    "q4_late_shipments",
    oracle="""
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape (order-priority checking): orders with at least "
    "one lineitem shipped more than 60 days after the order date, "
    "counted per priority. The EXISTS compiles to a LEFT SEMI join on "
    "the order key — each order emits at most once no matter how many "
    "late lines it has — and the year predicate is pushed into the "
    "orders scan before the join.",
)
def q4_late_shipments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    ts_type = orders.schema["o_orderdate"].dataType.simpleString()
    orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast(ts_type))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast(ts_type))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            ),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
    WITH lim AS (
      SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_lim
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN lim ON lim.l_partkey = lineitem.l_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < qty_lim
    """,
    doc="TPC-H Q17 (small-quantity-order revenue): lineitems below 20% "
    "of their part's average quantity, for one brand. The correlated "
    "subquery is decorrelated into a per-part aggregate (one row per "
    "part, map-side combinable) that joins back on the part key — AQE "
    "broadcasts it when it fits, else both sides are already hashed on "
    "the same key so the shuffle is reused; the brand filter prunes "
    "parts before the join.",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    lim = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_lim")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            lim.withColumnRenamed("l_partkey", "lim_partkey"),
            F.col("lim_partkey") == F.col("l_partkey"),
        )
        .filter(F.col("l_quantity") < F.col("qty_lim"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@register(
    "q8_market_share",
    oracle="""
    WITH rev AS (
      SELECT CAST(year(o_orderdate) AS INT) AS yr,
             round(sum(CASE WHEN n_name = 'NATION_3'
                            THEN l_extendedprice * (1 - l_discount)
                            ELSE 0 END), 2) AS nation_rev,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_rev
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      GROUP BY 1
    )
    SELECT yr, nation_rev, total_rev,
           round(nation_rev / total_rev, 6) AS share
    FROM rev
    """,
    doc="TPC-H Q8 shape (national market share): one nation's share of "
    "revenue per order year. Supplier and nation broadcast (they are "
    "dims); lineitem-orders is the only real shuffle; the share divides "
    "the two ALREADY-ROUNDED sums so the ratio is deterministic "
    "cross-engine.",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("yr"))
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_3", rev).otherwise(0.0)),
                2,
            ).alias("nation_rev"),
            F.round(F.sum(rev), 2).alias("total_rev"),
        )
    )
    return agg.select(
        "yr",
        "nation_rev",
        "total_rev",
        F.round(F.col("nation_rev") / F.col("total_rev"), 6).alias("share"),
    )


@register(
    "balance_histogram",
    oracle="""
    SELECT n_name,
           CAST(floor(c_acctbal / 500) AS INT) AS bal_bucket,
           count(*) AS n_customers,
           round(sum(c_acctbal), 2) AS bucket_balance
    FROM customer JOIN nation ON n_nationkey = c_nationkey
    GROUP BY n_name, bal_bucket
    """,
    doc="Fixed-width balance histogram per nation — the scale-safe "
    "alternative to ntile bucketing: bucket = floor(value/width) is a "
    "narrow map (no global sort, no single-partition window), then one "
    "hash aggregate; nation broadcasts.",
)
def balance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy(
            "n_name",
            F.floor(F.col("c_acctbal") / 500).cast("int").alias("bal_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("bucket_balance"),
        )
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.05
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 (forecasting revenue change): THE pushdown probe — "
    "three range predicates and a two-column projection against the "
    "widest fact, one partial-aggregated sum, no join, no shuffle "
    "beyond the single-row gather. Every predicate reaches the parquet "
    "scan (row-group min/max prune before any page decodes) and the "
    "ReadSchema carries exactly four columns.",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    ts_type = li.schema["l_shipdate"].dataType.simpleString()
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast(ts_type))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast(ts_type))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.05)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c_custkey, c_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 (returned-item reporting): one quarter of orders, "
    "lineitems returned, revenue lost per customer, top 20. The date "
    "range prunes orders AT THE SCAN and the returnflag prunes "
    "lineitem; nation broadcasts; the top-20 compiles to "
    "TakeOrderedAndProject so the full customer ranking is never "
    "materialized or globally sorted.",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    )
    orders = load_table(spark, sf_dir, "orders")
    ts_type = orders.schema["o_orderdate"].dataType.simpleString()
    orders = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast(ts_type))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast(ts_type))
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )
