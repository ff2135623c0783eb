"""MERGE INTO scenario over customer/orders: the lakehouse 3-clause merge
(update / delete / insert) exercised end-to-end through
``operators.merge.merge_into`` and oracle-checked against the equivalent
FULL JOIN SQL.

Scenario (deterministic, derived only from testdata):
- source = per-customer order rollup; keys with ``o_custkey % 10 = 0``
  are NEGATED (``-o_custkey - 1``) so they can never collide with a real
  customer key at ANY scale factor → INSERT branch. (A fixed positive
  shift would silently start matching real customers once c_custkey
  exceeds the shift, at SF >= ~7.)
- matched & cnt > 15 → DELETE (heavy bought-out accounts).
- matched otherwise → UPDATE ``c_acctbal += spent/1000``.
- unmatched base rows pass through unchanged.

Float discipline: ``spent`` is rounded to 2 dp at aggregation on BOTH
sides, so every downstream arithmetic step is a deterministic scalar op
(no reduction-order sensitivity). Derived amounts use FLOOR, not ROUND:
``spent/10`` of a 2-dp value lands systematically on .xx5 half-way
points, where Spark (BigDecimal HALF_UP on the exact binary expansion)
and DuckDB disagree; FLOOR of identical doubles is tie-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.operators.merge import merge_into
from openmaptiles_zh_modifier_spark.registry import load, register

DELETE_CNT = 15  # matched customers with more orders than this are dropped


@register(
    "q_merge_upsert",
    oracle=f"""
WITH src AS (
  SELECT CASE WHEN o_custkey % 10 = 0 THEN -o_custkey - 1
              ELSE o_custkey END AS key,
         ROUND(SUM(o_totalprice), 2) AS spent,
         COUNT(*) AS cnt
  FROM orders
  GROUP BY 1
)
SELECT COALESCE(c.c_custkey, s.key) AS c_custkey,
       CASE WHEN c.c_custkey IS NULL THEN 'NEW-' || s.key
            ELSE c.c_name END AS c_name,
       CASE WHEN c.c_custkey IS NULL THEN NULL
            ELSE c.c_nationkey END AS c_nationkey,
       ROUND(CASE WHEN c.c_custkey IS NULL THEN FLOOR(s.spent / 10)
                  WHEN s.key IS NULL THEN c.c_acctbal
                  ELSE ROUND(c.c_acctbal + FLOOR(s.spent / 1000), 2)
             END, 2) AS c_acctbal,
       CASE WHEN c.c_custkey IS NULL THEN 'MERGED'
            ELSE c.c_mktsegment END AS c_mktsegment
FROM customer c FULL JOIN src s ON c.c_custkey = s.key
WHERE NOT (c.c_custkey IS NOT NULL AND s.key IS NOT NULL AND s.cnt > {DELETE_CNT})
ORDER BY c_custkey
""",
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    key = F.when(
        F.col("o_custkey") % 10 == 0, -F.col("o_custkey") - 1
    ).otherwise(F.col("o_custkey"))
    src = orders.groupBy(key.alias("key")).agg(
        F.round(F.sum("o_totalprice"), 2).alias("spent"),
        F.count(F.lit(1)).alias("cnt"),
    )
    merged = merge_into(
        customer,
        src,
        on={"c_custkey": "key"},
        matched_update={
            "c_acctbal": F.round(
                F.col("t.c_acctbal") + F.floor(F.col("s.spent") / 1000), 2
            )
        },
        matched_delete=F.col("s.cnt") > DELETE_CNT,
        not_matched_insert={
            "c_custkey": F.col("s.key"),
            "c_name": F.concat(F.lit("NEW-"), F.col("s.key").cast("string")),
            "c_acctbal": F.floor(F.col("s.spent") / 10).cast("double"),
            "c_mktsegment": F.lit("MERGED"),
        },
    )
    return merged.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        "c_mktsegment",
    ).orderBy("c_custkey")
