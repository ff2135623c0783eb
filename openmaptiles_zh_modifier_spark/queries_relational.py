"""Relational surface: joins, aggregations, windows, sorts/top-k, set ops,
scalar functions (SURVEY.md §2.3-§2.8 — the capabilities the engine declares
beyond the reference's single-table dataflow).

Scale notes per query are in docstrings: what broadcasts, what shuffles,
and why the plan holds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.registry import load, register


# -------------------------------------------------------------------------
# Joins + aggregation
# -------------------------------------------------------------------------

@register(
    "q3_shipping_priority",
    oracle="""
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer
JOIN orders    ON c_custkey = o_custkey
JOIN lineitem  ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape. customer is tiny → broadcast into orders; the
    orders⋈lineitem join shuffles on orderkey (both sides huge at scale —
    sort-merge, AQE-skew-handled). Top-k compiles to TakeOrderedAndProject:
    no global sort materialization."""
    cust = load(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-06-01 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. region/nation/supplier/customer are dims
    → broadcast; only orders⋈lineitem shuffles. Catalyst folds the
    region→nation filter into a broadcast-side reduction."""
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi join (EXISTS): Spark's left_semi — no row multiplication, no
    dedup pass, and the probe side only carries the join key + filter cols."""
    orders = load(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q_customers_without_orders",
    oracle="""
SELECT n_name, COUNT(*) AS n_customers
FROM customer
JOIN nation ON c_nationkey = n_nationkey
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY n_name
ORDER BY n_name
""",
)
def q_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join (NOT EXISTS): left_anti against orders projected to its
    key column only — at 100 TB the build side is the distinct key set."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").select("o_custkey")
    nation = load(spark, sf_dir, "nation")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_name")
    )


# -------------------------------------------------------------------------
# Windows
# -------------------------------------------------------------------------

@register(
    "q_top3_parts_per_brand",
    oracle="""
SELECT p_brand, p_partkey, p_name, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) WHERE rn <= 3
ORDER BY p_brand, rn
""",
)
def q_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking window. Deterministic tiebreaker (p_partkey) is mandatory —
    row_number over ties is otherwise partition-order-dependent."""
    part = load(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("p_brand", "p_partkey", "p_name", "p_retailprice", "rn")
        .orderBy("p_brand", "rn")
    )


@register(
    "q_customer_order_running",
    oracle="""
SELECT o_custkey,
       o_orderkey,
       ROUND(SUM(o_totalprice) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey
                                     ROWS UNBOUNDED PRECEDING), 2) AS running_spend,
       ROUND(COALESCE(LAG(o_totalprice) OVER (PARTITION BY o_custkey
                                              ORDER BY o_orderdate, o_orderkey), 0), 2) AS prev_price,
       RANK() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS price_rank
FROM orders
ORDER BY o_custkey, o_orderkey
""",
)
def q_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic windows: running sum, lag, rank — one shuffle on o_custkey
    shared by all three window specs over the same partitioning."""
    orders = load(spark, sf_dir, "orders")
    w_seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w_seq.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_rank = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum("o_totalprice").over(w_run), 2).alias("running_spend"),
            F.round(
                F.coalesce(F.lag("o_totalprice").over(w_seq), F.lit(0.0)), 2
            ).alias("prev_price"),
            F.rank().over(w_rank).alias("price_rank"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# -------------------------------------------------------------------------
# Grouping sets / rollup / cube / distinct aggregates
# -------------------------------------------------------------------------

@register(
    "q_rollup_returns",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP: partial-aggregate-friendly (one shuffle, grouping-set
    expansion happens map-side)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


@register(
    "q_cube_orders",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       COUNT(*) AS n,
       ROUND(SUM(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "orders")
    return (
        li.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


@register(
    "q_distinct_agg",
    oracle="""
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(*) AS n_customers,
       ROUND(AVG(c_acctbal), 4) AS avg_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Catalyst plans expand+two-phase agg; stays a
    single logical groupBy here."""
    cust = load(spark, sf_dir, "customer")
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
        .orderBy("c_mktsegment")
    )


# -------------------------------------------------------------------------
# Set operations
# -------------------------------------------------------------------------

@register(
    "q_setops_nations",
    oracle="""
WITH cust_nations AS (SELECT DISTINCT c_nationkey AS nk FROM customer),
     supp_nations AS (SELECT DISTINCT s_nationkey AS nk FROM supplier)
SELECT 'both' AS tag, nk FROM (SELECT nk FROM cust_nations INTERSECT SELECT nk FROM supp_nations)
UNION ALL
SELECT 'cust_only' AS tag, nk FROM (SELECT nk FROM cust_nations EXCEPT SELECT nk FROM supp_nations)
UNION ALL
SELECT 'supp_only' AS tag, nk FROM (SELECT nk FROM supp_nations EXCEPT SELECT nk FROM cust_nations)
ORDER BY tag, nk
""",
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL / INTERSECT / EXCEPT over distinct key sets."""
    cust = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nk")
    ).distinct()
    supp = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("nk")
    ).distinct()
    both = cust.intersect(supp).select(F.lit("both").alias("tag"), "nk")
    c_only = cust.exceptAll(supp).select(F.lit("cust_only").alias("tag"), "nk")
    s_only = supp.exceptAll(cust).select(F.lit("supp_only").alias("tag"), "nk")
    return both.unionAll(c_only).unionAll(s_only).orderBy("tag", "nk")


# -------------------------------------------------------------------------
# Scalar function surface (string / date / math / conditional)
# -------------------------------------------------------------------------

@register(
    "q_scalar_functions",
    oracle="""
SELECT p_partkey,
       UPPER(p_name) AS name_upper,
       LENGTH(p_name) AS name_len,
       SUBSTRING(p_type, 1, 5) AS type_prefix,
       CONCAT(p_brand, ':', p_type) AS brand_type,
       ROUND(p_retailprice * p_size, 2) AS price_volume,
       ABS(p_size - 25) AS size_dev,
       CASE WHEN p_size >= 25 THEN 'large' ELSE 'small' END AS size_class,
       REPLACE(p_name, ' ', '_') AS name_snake
FROM part
ORDER BY p_partkey
""",
)
def q_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load(spark, sf_dir, "part")
    return (
        part.select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.length("p_name").alias("name_len"),
            F.substring("p_type", 1, 5).alias("type_prefix"),
            F.concat_ws("", F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
            F.round(F.col("p_retailprice") * F.col("p_size"), 2).alias("price_volume"),
            F.abs(F.col("p_size") - 25).alias("size_dev"),
            F.when(F.col("p_size") >= 25, "large").otherwise("small").alias("size_class"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
        )
        .orderBy("p_partkey")
    )


@register(
    "q_date_functions",
    oracle="""
SELECT EXTRACT(year FROM o_orderdate)::INT AS order_year,
       EXTRACT(month FROM o_orderdate)::INT AS order_month,
       COUNT(*) AS n_orders,
       ROUND(SUM(o_totalprice), 2) AS month_total,
       MIN(CAST(o_orderdate AS DATE)) AS first_day
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("month_total"),
            F.min(F.col("o_orderdate").cast("date")).alias("first_day"),
        )
        .orderBy("order_year", "order_month")
    )


@register(
    "q_nullsafe_join",
    oracle="""
WITH e AS (
  SELECT NULLIF(json_extract_string(props, '$.k')::INT % 10, 0) AS kbin, value
  FROM events
),
a AS (
  SELECT kbin, COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
  FROM e GROUP BY kbin
),
b AS (
  SELECT kbin, ROUND(AVG(value), 4) AS avg_value FROM e GROUP BY kbin
)
SELECT a.kbin, a.n, a.sum_value, b.avg_value
FROM a JOIN b ON a.kbin IS NOT DISTINCT FROM b.kbin
ORDER BY a.kbin NULLS FIRST
""",
)
def q_nullsafe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (`eqNullSafe` == SQL IS NOT DISTINCT FROM): the
    NULL key group survives the join and matches exactly once — a plain
    equi-join would silently drop it. The nullable key is derived with
    NULLIF so the NULL group is guaranteed non-empty. Null-safe equality
    stays a hash-joinable key (Catalyst plans BroadcastHashJoin /
    SortMergeJoin on it, not a nested loop), so the shape scales like any
    equi-join."""
    from pyspark.sql.types import IntegerType, StructField, StructType

    ev = load(spark, sf_dir, "events")
    props_schema = StructType([StructField("k", IntegerType())])
    e = ev.select(
        F.nullif(
            F.from_json("props", props_schema)["k"] % 10, F.lit(0)
        ).alias("kbin"),
        "value",
    )
    a = e.groupBy("kbin").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )
    b = e.groupBy("kbin").agg(F.round(F.avg("value"), 4).alias("avg_value"))
    return (
        a.join(b, a["kbin"].eqNullSafe(b["kbin"]))
        .select(a["kbin"], "n", "sum_value", "avg_value")
        .orderBy(F.asc_nulls_first("kbin"))
    )


@register(
    "q_unpivot_measures",
    oracle="""
WITH agg AS (
  SELECT o_orderpriority,
         ROUND(SUM(o_totalprice), 2) AS sum_price,
         ROUND(AVG(o_totalprice), 4) AS avg_price,
         ROUND(MAX(o_totalprice), 2) AS max_price
  FROM orders GROUP BY o_orderpriority
)
SELECT o_orderpriority, measure, value FROM (
  SELECT o_orderpriority, 'sum_price' AS measure, sum_price AS value FROM agg
  UNION ALL
  SELECT o_orderpriority, 'avg_price', avg_price FROM agg
  UNION ALL
  SELECT o_orderpriority, 'max_price', max_price FROM agg
)
ORDER BY o_orderpriority, measure
""",
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) — the inverse of q_pivot_user_activity: wide
    per-priority measures become (priority, measure, value) rows via
    Spark's native unpivot operator (Catalyst Expand node: one pass,
    3x row multiplication, no shuffle beyond the source aggregate).
    The oracle spells the same relation as a UNION ALL."""
    orders = load(spark, sf_dir, "orders")
    agg = orders.groupBy("o_orderpriority").agg(
        F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )
    return agg.unpivot(
        ids=["o_orderpriority"],
        values=["sum_price", "avg_price", "max_price"],
        variableColumnName="measure",
        valueColumnName="value",
    ).orderBy("o_orderpriority", "measure")


# Shared by the Spark query and the DuckDB oracle verbatim: the recursion
# is ANSI WITH RECURSIVE (Spark 4.1+), and the explicit TIMESTAMP casts
# pin the month key type (DuckDB's date_trunc on DATE yields DATE, Spark's
# yields TIMESTAMP).
_RECURSIVE_CALENDAR_SQL = """
WITH RECURSIVE bounds AS (
  SELECT CAST(date_trunc('month', MIN(o_orderdate)) AS TIMESTAMP) AS lo,
         CAST(date_trunc('month', MAX(o_orderdate)) AS TIMESTAMP) AS hi
  FROM orders
),
months(m) AS (
  SELECT lo FROM bounds
  UNION ALL
  SELECT m + INTERVAL 1 MONTH FROM months, bounds WHERE m < hi
),
per_month AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS m,
         COUNT(*) AS n_orders,
         ROUND(SUM(o_totalprice), 2) AS revenue
  FROM orders GROUP BY 1
)
SELECT months.m AS month_start,
       COALESCE(n_orders, 0) AS n_orders,
       COALESCE(revenue, 0.0) AS revenue
FROM months LEFT JOIN per_month ON months.m = per_month.m
ORDER BY month_start
"""


@register("q_recursive_calendar", oracle=_RECURSIVE_CALENDAR_SQL)
def q_recursive_calendar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-spine gap filling via ANSI recursive CTE (Spark 4.1
    WITH RECURSIVE): generate every month between the data's min and max
    order date, then left-join per-month aggregates so empty months
    surface as explicit zero rows. The ORACLE is the declarative
    recursive form; the Spark plan generates the spine with sequence()
    + explode instead — Spark executes each WITH RECURSIVE step as its
    own tiny job (~80 jobs, measured 9s at sf0.1) where the sequence
    expression is one codegen operator (~0.3s). Spark's WITH RECURSIVE
    support itself is proven equivalent in
    tests/test_pipeline_ops.py::test_recursive_cte_matches_sequence.
    The heavy side stays a single scan + hash aggregate."""
    orders = load(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).alias("hi"),
    )
    months = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))
        ).alias("month_start")
    )
    per_month = orders.groupBy(
        F.date_trunc("month", "o_orderdate").alias("month_start")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
    )
    return (
        months.join(per_month, "month_start", "left")
        .select(
            "month_start",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
        .orderBy("month_start")
    )


@register(
    "q_integrity_audit",
    oracle="""
SELECT 'lineitem_orphans' AS check_name,
       (SELECT COUNT(*) FROM lineitem l
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
           AS n_bad
UNION ALL
SELECT 'orders_orphans',
       (SELECT COUNT(*) FROM orders o
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey))
UNION ALL
SELECT 'orders_null_priority',
       (SELECT COUNT(*) FROM orders WHERE o_orderpriority IS NULL)
UNION ALL
SELECT 'lineitem_negative_qty',
       (SELECT COUNT(*) FROM lineitem WHERE l_quantity < 0)
ORDER BY check_name
""",
)
def q_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality audit: referential-integrity orphan counts via
    LEFT ANTI joins (the distributed NOT EXISTS) plus null/range
    invariant checks, unioned into one (check_name, n_bad) report — the
    pre-ingestion gate of a training-data pipeline. Each anti join
    shuffles only its key column; the violation counts are tiny and the
    union is driver-cheap. All checks read each table once."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")

    def one(name: str, df: DataFrame) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_bad")).select(
            F.lit(name).alias("check_name"), "n_bad"
        )

    checks = [
        one(
            "lineitem_orphans",
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "left_anti"),
        ),
        one(
            "orders_orphans",
            orders.join(
                customer, orders["o_custkey"] == customer["c_custkey"], "left_anti"
            ),
        ),
        one("orders_null_priority", orders.where(F.col("o_orderpriority").isNull())),
        one("lineitem_negative_qty", li.where(F.col("l_quantity") < 0)),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")


# -------------------------------------------------------------------------
# Top-k per group WITHOUT a window (bounded-state aggregation)
# -------------------------------------------------------------------------

@register(
    "q_topk_per_group_agg",
    oracle="""
SELECT p_brand, p_partkey, p_name, p_retailprice, rn
FROM (
  SELECT p_brand, p_partkey, p_name, p_retailprice,
         ROW_NUMBER() OVER (PARTITION BY p_brand
                            ORDER BY p_retailprice DESC, p_partkey) AS rn
  FROM part
) WHERE rn <= 3
ORDER BY p_brand, rn
""",
)
def q_topk_per_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 per brand via AGGREGATION instead of a ranking window — the
    oracle is the window formulation, so the hash match proves the two
    plans equivalent. Shape: collect each group's (price, key, name)
    structs, sort_array descending once per GROUP (not a per-partition
    sort of the whole table), slice 3, posexplode for ranks.

    Why it matters at 100 TB: a ranking window sorts every row of every
    partition; the aggregate only needs per-group state, and Spark's
    partial aggregation starts collapsing map-side. The honest caveat:
    collect_list's partial state is unbounded per group, so this wins
    when groups are small/medium (the common case); for huge groups the
    production form is a bounded re-aggregating top-k UDAF or the window.
    Both forms stay registered — same answer, different physics."""
    part = load(spark, sf_dir, "part")
    # struct orders by first field: negate nothing — sort desc then slice
    packed = part.groupBy("p_brand").agg(
        F.slice(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        F.col("p_retailprice"),
                        (-F.col("p_partkey")).alias("negkey"),
                        F.col("p_name"),
                    )
                ),
                asc=False,
            ),
            1,
            3,
        ).alias("top")
    )
    return (
        packed.select(
            "p_brand", F.posexplode("top").alias("pos", "s")
        )
        .select(
            "p_brand",
            (-F.col("s.negkey")).alias("p_partkey"),
            F.col("s.p_name").alias("p_name"),
            F.col("s.p_retailprice").alias("p_retailprice"),
            (F.col("pos") + 1).alias("rn"),
        )
        .orderBy("p_brand", "rn")
    )
