"""Skew-mitigation query surface: deterministic salted join + two-phase
salted aggregation (operators/salted.py), oracle-checked against the
plain-SQL equivalent — salting must be invisible in the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.operators.salted import salted_agg, salted_join
from openmaptiles_zh_modifier_spark.registry import load, register


@register(
    "q_salted_skew_join",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n,
       SUM(l_quantity) AS sum_l_quantity
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe join + aggregation: lineitem->orders through an 8-way
    salted equi-join (dim replicated per salt, fact salted on the
    line number so a hot orderkey spreads over 8 reducers), then a
    two-phase salted aggregation on order priority. The summed measure
    (l_quantity) is integral-valued, so the two-phase re-association is
    bit-exact vs the oracle's single-phase sum. Result must be identical
    to the unsalted plan — skew handling is pure physical rewiring."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(li, orders, on="l_orderkey", tiebreak="l_linenumber")
    return (
        salted_agg(
            joined,
            keys=["o_orderpriority"],
            sums=["l_quantity"],
            tiebreak="l_orderkey",
        )
        .orderBy("o_orderpriority")
    )
