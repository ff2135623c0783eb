"""Approximate/sketch aggregates — the mergeable-summary surface a 100 TB
engine actually runs (exact forms exist beside them for small data).

No DuckDB oracle: HLL/t-digest implementations differ across engines by
design, so these register as rows-only checks; the accuracy contract
(within rated error of exact) is enforced by tests/test_sketches.py
instead."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.registry import load, register


@register("q_approx_sketches")  # rows-only: engine-specific sketch values
def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag HLL distinct counts and t-digest percentiles over
    lineitem. Both sketches are mergeable: partial states combine
    associatively across partitions, so the shuffle carries fixed-size
    summaries regardless of input scale — the entire point vs their exact
    counterparts (q_distinct_agg, q_percentiles)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
            F.percentile_approx("l_extendedprice", 0.5, 10000).alias("p50_approx"),
            F.percentile_approx(
                "l_extendedprice", [0.25, 0.75], 10000
            ).alias("iqr_approx"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )
