"""Third batch of TPC-H-shaped coverage, adapted to the fixture schemas
(the driver testdata has no partsupp table, so Q2/Q9/Q11/Q20 use lineitem
as the part-supplier fact): Q2 correlated-min supplier selection, Q9
profit rollup, Q11 HAVING-vs-global-scalar, Q12 late-shipment priority
classes, Q15 top-supplier-by-max-subquery, Q20 nested-semi-join supplier
filter.

Scale notes are inline per query; the common rules: dimension tables
(part/supplier/nation/region at ~1e-4 of fact size) are always broadcast,
the single fact shuffle is the groupBy on the derived key, and scalar
subqueries become one-row broadcasts rather than repeated scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.registry import load, local_frame, register


@register(
    "q2_min_cost_supplier",
    oracle="""
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         ROUND(MIN(l_extendedprice / l_quantity), 4) AS unit_cost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
regional AS (
  SELECT o.l_partkey, o.l_suppkey, o.unit_cost, s_name, n_name
  FROM offers o
  JOIN supplier ON s_suppkey = o.l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  JOIN region   ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA'
)
SELECT p_partkey, p_name, s_name, n_name, unit_cost
FROM regional
JOIN part ON p_partkey = regional.l_partkey
WHERE p_size = 3 AND p_type = 'LARGE'
  AND unit_cost = (SELECT MIN(r2.unit_cost) FROM regional r2
                   WHERE r2.l_partkey = regional.l_partkey)
ORDER BY p_partkey, s_name
""",
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: correlated MIN subquery — for each qualifying part,
    the ASIA supplier(s) offering the minimum observed unit price.

    The correlated subquery decorrelates to a per-partkey window MIN over
    the regional offers (one pass, no re-scan); Catalyst would produce the
    same plan from a self-join-on-aggregate formulation but the window
    form never materializes the aggregate twice. unit_cost is rounded
    BEFORE the min/equality so the comparison is on exact decimals on
    both engines."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    part = load(spark, sf_dir, "part").where(
        (F.col("p_size") == 3) & (F.col("p_type") == "LARGE")
    )
    # Semi-join pushdown: only ~1/250 of parts qualify, so prune lineitem
    # BEFORE the (l_partkey, l_suppkey) aggregation — the per-part MIN is
    # unchanged (the correlation key is the part), but the agg shuffles a
    # fraction of the rows. At 100 TB this is the difference between
    # aggregating the whole fact table and aggregating the slice you need.
    offers = (
        li.join(
            F.broadcast(part.select("p_partkey")),
            li.l_partkey == F.col("p_partkey"),
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(
                F.min(F.col("l_extendedprice") / F.col("l_quantity")), 4
            ).alias("unit_cost")
        )
    )
    regional = (
        offers.join(F.broadcast(supp), offers.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    wmin = Window.partitionBy("l_partkey")
    return (
        regional.withColumn("min_cost", F.min("unit_cost").over(wmin))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .select("p_partkey", "p_name", "s_name", "n_name", "unit_cost")
        .orderBy("p_partkey", "s_name")
    )


@register(
    "q9_product_profit",
    oracle="""
SELECT n_name AS nation, EXTRACT(year FROM o_orderdate)::INT AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)
                 - 0.6 * p_retailprice * l_quantity), 2) AS sum_profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
ORDER BY nation, o_year DESC
""",
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus a retail-price-derived cost,
    standing in for ps_supplycost) per nation per year over a 5-way join.
    The LIKE filter lands on the broadcast part side pre-join, so the fact
    rows are cut by the join itself; only orders⋈lineitem shuffles."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders")
    nation = load(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.6 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


@register(
    "q11_important_parts",
    oracle="""
WITH vals AS (
  SELECT l_partkey, ROUND(SUM(l_extendedprice * l_quantity), 2) AS part_value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey
)
SELECT l_partkey AS partkey, part_value
FROM vals
WHERE part_value > (SELECT SUM(part_value) * 0.002 FROM vals)
ORDER BY part_value DESC, partkey
""",
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value with HAVING against a scalar
    aggregate over the SAME derived relation. The vals frame is computed
    once and reused for both the threshold and the filter (Spark reuses
    the exchange; no second scan); the threshold joins in as a one-row
    broadcast (BroadcastNestedLoopJoin), never a per-row subquery.
    part_value is rounded before both uses so the comparison operands are
    identical on both engines."""
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    vals = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias(
                "part_value"
            )
        )
    )
    threshold = vals.agg((F.sum("part_value") * 0.002).alias("threshold"))
    return (
        vals.join(F.broadcast(threshold))
        .where(F.col("part_value") > F.col("threshold"))
        .select(F.col("l_partkey").alias("partkey"), "part_value")
        .orderBy(F.desc("part_value"), "partkey")
    )


@register(
    "q12_late_shipments",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late shipments (shipped ≥90 days after order) by
    line status, counted into priority classes via SUM(CASE). The shipdate
    range filter is a pushed parquet predicate; the theta condition
    (shipdate vs orderdate+90d) is a post-join residual on the one
    orders⋈lineitem shuffle."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    orders = load(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
""",
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) achieving the maximum quarterly revenue.
    The revenue view is aggregated once; its MAX comes back as a one-row
    broadcast joined with an equality residual (total_revenue rounded
    before comparison ⇒ exact equality is well-defined). AQE reuses the
    revenue exchange for both consumers."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01 00:00:00").cast("timestamp"))
    )
    supp = load(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "total_revenue"
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(F.broadcast(max_rev))
        .where(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "q20_part_suppliers",
    oracle="""
SELECT s_name, ROUND(s_acctbal, 2) AS acctbal
FROM supplier
WHERE s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_suppkey
    HAVING SUM(l_quantity) > 100
  )
  AND s_nationkey IN (
    SELECT n_nationkey FROM nation WHERE n_name IN ('NATION_2', 'NATION_4')
  )
ORDER BY s_name
""",
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries — suppliers who moved >100
    units of 'small%' parts in 1997, restricted to two nations. Each IN
    becomes a left-semi join; the part-name key set broadcasts into the
    fact scan, the HAVING runs on the post-semi aggregate, and the final
    supplier filter is two stacked broadcast semi joins (no shuffle on
    supplier)."""
    li = load(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    part_keys = (
        load(spark, sf_dir, "part")
        .where(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    nations = (
        load(spark, sf_dir, "nation")
        .where(F.col("n_name").isin("NATION_2", "NATION_4"))
        .select("n_nationkey")
    )
    supp = load(spark, sf_dir, "supplier")
    heavy_suppliers = (
        li.join(F.broadcast(part_keys), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .where(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        supp.join(
            F.broadcast(heavy_suppliers),
            supp.s_suppkey == F.col("l_suppkey"),
            "left_semi",
        )
        .join(
            F.broadcast(nations), supp.s_nationkey == F.col("n_nationkey"), "left_semi"
        )
        .select("s_name", F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy("s_name")
    )


# ------------------------------------------------------------------- RFM

@register(
    "q_rfm_segmentation",
    oracle="""
WITH mx AS (SELECT MAX(o_orderdate) AS maxd FROM orders),
base AS (
  SELECT o_custkey AS custkey,
         date_diff('day', MAX(o_orderdate), mx.maxd) AS recency_days,
         COUNT(*) AS frequency,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS monetary_cents
  FROM orders CROSS JOIN mx
  GROUP BY o_custkey, mx.maxd
)
SELECT custkey, CAST(recency_days AS BIGINT) AS recency_days,
       frequency, monetary_cents,
       NTILE(4) OVER (ORDER BY recency_days ASC, custkey) AS r_score,
       NTILE(4) OVER (ORDER BY frequency DESC, custkey) AS f_score,
       NTILE(4) OVER (ORDER BY monetary_cents DESC, custkey) AS m_score
FROM base
ORDER BY custkey
""",
)
def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic lifecycle-marketing
    primitive: per customer, Recency (days since last order, vs the
    corpus max date), Frequency (order count), Monetary (lifetime spend
    in exact integer cents), each quartiled with NTILE(4). Quartile 1 is
    the best on every axis (most recent / most frequent / highest
    spend); downstream segments (champions = 111, at-risk = 4xx, ...)
    are string concatenation away.

    Determinism: recency/frequency/monetary are exact integers; NTILE
    assigns by row position, so each window's ORDER BY carries custkey
    as the tie-break — identical quartile boundaries cross-engine even
    when many customers share a metric value.

    Scale shape: one map-side-combinable aggregate per customer, then
    three global NTILE windows. Global NTILE is a single-reducer sort
    at the extreme; at 100 TB you'd replace it with percentile
    boundaries from the quantile sketch (q_quantile_sketch) and a
    broadcast range join — same output contract, no global sort."""
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    mx = orders.agg(F.max("o_orderdate").alias("maxd"))
    base = (
        orders.crossJoin(F.broadcast(mx))
        .groupBy(F.col("o_custkey").alias("custkey"), "maxd")
        .agg(
            F.datediff(F.col("maxd"), F.max("o_orderdate"))
            .cast("bigint")
            .alias("recency_days"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint")
            .alias("monetary_cents"),
        )
    )
    return base.select(
        "custkey", "recency_days", "frequency", "monetary_cents",
        F.ntile(4)
        .over(Window.orderBy(F.asc("recency_days"), F.asc("custkey")))
        .alias("r_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("frequency"), F.asc("custkey")))
        .alias("f_score"),
        F.ntile(4)
        .over(Window.orderBy(F.desc("monetary_cents"), F.asc("custkey")))
        .alias("m_score"),
    ).orderBy("custkey")


# ----------------------------------------------------------------- Benford

import math as _math

_BENFORD = {d: repr(_math.log10(1 + 1 / d)) for d in range(1, 10)}


@register(
    "q_benford_audit",
    oracle=f"""
WITH cents AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c FROM orders
),
digits AS (
  SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit
  FROM cents
),
counts AS (
  SELECT digit, COUNT(*) AS n_obs,
         (SELECT COUNT(*) FROM digits) AS n
  FROM digits GROUP BY digit
),
expected(digit, p_benford) AS (
  VALUES {', '.join(f'({d}, {p})' for d, p in _BENFORD.items())}
)
SELECT e.digit, COALESCE(c.n_obs, 0) AS n_obs,
       (SELECT COUNT(*) FROM digits) AS n,
       ROUND(CAST(e.p_benford AS DOUBLE), 6) AS p_benford,
       ROUND(COALESCE(c.n_obs, 0) * 1.0
             / (SELECT COUNT(*) FROM digits) - CAST(e.p_benford AS DOUBLE), 6) AS deviation
FROM expected e LEFT JOIN counts c USING (digit)
ORDER BY e.digit
""",
)
def q_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the forensic
    data-quality screen (fabricated or systematically clipped monetary
    data drifts off the log-uniform first-digit curve). Reports every
    digit 1-9 with its observed count, the Benford expectation
    P(d) = log10(1 + 1/d), and the share deviation. (The TPC-H-ish
    uniform price fixture deliberately does NOT follow Benford — the
    operator's job is to measure the deviation, not to assert zero.)

    Determinism: the first digit comes from string truncation of exact
    integer cents (no float log); each expected share is injected as
    the SAME Python repr literal into both plans (the PR_INIT pattern —
    a hand-typed decimal would be a DIFFERENT double); the one division
    is exact and ROUNDed identically.

    Scale shape: one scan -> 9-group count; the expected table is a
    9-row literal joined driver-side. As cheap as an audit gets."""
    orders = load(spark, sf_dir, "orders")
    cents = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
    )
    digits = cents.select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit")
    )
    counts = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    n_total = digits.agg(F.count(F.lit(1)).alias("n"))
    expected = local_frame(
        spark,
        [(d, float(p)) for d, p in _BENFORD.items()],
        "digit int, p_benford double",
    )
    return (
        expected.join(counts, "digit", "left")
        .crossJoin(F.broadcast(n_total))
        .select(
            "digit",
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
            "n",
            F.round("p_benford", 6).alias("p_benford"),
            F.round(
                F.coalesce("n_obs", F.lit(0)) * F.lit(1.0) / F.col("n")
                - F.col("p_benford"),
                6,
            ).alias("deviation"),
        )
        .orderBy("digit")
    )


# ---------------------------------------------------------------------------
# Distribution window functions: percent_rank / cume_dist / ntile / nth_value
# ---------------------------------------------------------------------------


@register(
    "q_window_ranks",
    oracle="""
WITH c AS (
  SELECT c_nationkey, c_custkey,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS bal_cents
  FROM customer WHERE c_nationkey < 5
)
SELECT c_nationkey, c_custkey, bal_cents,
       ROUND(percent_rank() OVER w, 6) AS pct_rank,
       ROUND(cume_dist() OVER w, 6) AS cume,
       CAST(NTILE(4) OVER w AS INT) AS quartile,
       nth_value(c_custkey, 2) OVER (
         PARTITION BY c_nationkey ORDER BY bal_cents DESC, c_custkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
       ) AS runner_up_cust
FROM c
WINDOW w AS (PARTITION BY c_nationkey ORDER BY bal_cents DESC, c_custkey)
ORDER BY c_nationkey, pct_rank, c_custkey
""",
)
def q_window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-flavored window functions over customer balances per
    nation: percent_rank, cume_dist, NTILE(4) quartiles, and
    nth_value(2) (the runner-up customer via an explicit
    whole-partition frame) — completing the window surface next to the
    frame-spec (q_window_frames) and ranking (q_topk_per_group_agg)
    gates, since these four are the ones analysts reach for in
    leaderboard and decile reports.

    Determinism: the window orders by (bal_cents, custkey) — a total
    order, so peer-dependent definitions (cume_dist counts peers,
    percent_rank uses rank) have no ambiguity; balances are integer
    cents; ratios round at 6 dp.

    Scale shape: one hash-partition shuffle on the partition key, one
    in-partition sort serving all four functions (Catalyst computes
    them in a single Window operator — verified in the plan); the
    nation filter prunes at the parquet scan."""
    c = (
        load(spark, sf_dir, "customer")
        .where(F.col("c_nationkey") < 5)
        .select(
            "c_nationkey",
            "c_custkey",
            F.round(F.col("c_acctbal") * 100).cast("long").alias("bal_cents"),
        )
    )
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("bal_cents"), F.asc("c_custkey")
    )
    wfull = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "bal_cents",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.ntile(4).over(w).cast("int").alias("quartile"),
            F.nth_value(F.col("c_custkey"), 2).over(wfull).alias(
                "runner_up_cust"
            ),
        )
        .orderBy("c_nationkey", "pct_rank", "c_custkey")
    )


# ---------------------------------------------------------------------------
# Shared-text SQL interface: ONE string, both engines
# ---------------------------------------------------------------------------

# The exact same SQL text runs on Spark (spark.sql over temp views) AND on
# DuckDB as its own oracle — the dialect-portability proof that the engine
# accepts the ANSI surface directly, not only the DataFrame API. Constraint
# on the text: the COMMON dialect subset (joins, FILTER aggregates, CASE,
# window functions, CAST/ROUND) — no engine-specific functions.
_SHARED_SQL_TEXT = """
SELECT n.n_name AS nation,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(COUNT(*) FILTER (WHERE o.o_orderpriority = '1-URGENT')
            AS BIGINT) AS n_urgent,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents,
       CAST(ROW_NUMBER() OVER (
         ORDER BY SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) DESC,
                  n.n_name) AS INT) AS rk
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
ORDER BY rk
"""


@register("q_sql_shared_text", oracle=_SHARED_SQL_TEXT)
def q_sql_shared_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-surface parity, stated as executable fact: the ORACLE STRING
    ITSELF runs through ``spark.sql`` over temp views of the same
    parquet — zero translation, so any user-facing ANSI query in the
    common dialect subset (joins, FILTER aggregates, windows,
    CAST/ROUND) is accepted verbatim by this engine. The reference's
    users write SQL (PostgreSQL is its actual query engine,
    OMTZHModifier.java:134-138); this gate pins that they can keep
    doing so here.

    Determinism: integer cents, FILTER counts, and a total-order
    window — nothing engine-specific anywhere in the text.

    Scale shape: Catalyst plans the text identically to the DataFrame
    build — broadcast dims onto the orders fact, partial aggregation
    before the exchange, TakeOrdered for the ranked output (verified
    via explain; the SQL front end costs nothing at any scale)."""
    for t in ("orders", "customer", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_SHARED_SQL_TEXT)
