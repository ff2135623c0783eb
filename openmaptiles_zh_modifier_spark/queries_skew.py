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


@register(
    "q_histogram_price",
    oracle="""
WITH binned AS (
  SELECT CAST(FLOOR(l_extendedprice / 5000) AS BIGINT) AS price_bin,
         l_extendedprice
  FROM lineitem
),
agg AS (
  SELECT price_bin, COUNT(*) AS n, ROUND(AVG(l_extendedprice), 2) AS avg_price
  FROM binned GROUP BY price_bin
)
SELECT price_bin, n, avg_price,
       ROUND(n * 1.0 / SUM(n) OVER (), 6) AS share
FROM agg
ORDER BY price_bin
""",
)
def q_histogram_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of a value column (the score/length binning
    step of corpus analysis): floor-division bucketing, per-bin count and
    mean, and each bin's share via a window over the aggregate. The
    window's global SUM runs over the ~30-row aggregate, not the base
    table — at 100 TB the single-partition window is fine because its
    input is bin-cardinality, not row-cardinality."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem")
    agg = (
        li.select(
            F.floor(F.col("l_extendedprice") / 5000).cast("long").alias("price_bin"),
            "l_extendedprice",
        )
        .groupBy("price_bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        )
    )
    total = F.sum("n").over(Window.partitionBy())
    return agg.withColumn(
        "share", F.round(F.col("n") * 1.0 / total, 6)
    ).orderBy("price_bin")


@register(
    "q_stat_aggregates",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       ROUND(STDDEV_SAMP(l_extendedprice), 2) AS sd_price,
       ROUND(STDDEV_POP(l_extendedprice), 2) AS sdp_price,
       ROUND(CORR(l_extendedprice, l_quantity), 6) AS corr_price_qty,
       ROUND(COVAR_SAMP(l_extendedprice, l_quantity), 2) AS covar_price_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample/population stddev, correlation, and
    covariance per group. Both engines use numerically stable single-pass
    moment updates with mergeable partial states — the same
    partial/final split as sum/avg, so these scale identically (one
    shuffle of O(groups) moment tuples, never the raw rows)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
            F.round(F.stddev_pop("l_extendedprice"), 2).alias("sdp_price"),
            F.round(F.corr("l_extendedprice", "l_quantity"), 6).alias(
                "corr_price_qty"
            ),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias(
                "covar_price_qty"
            ),
        )
        .orderBy("l_returnflag")
    )


# -------------------------------------------------------------------------
# Equi-depth histogram (quantile binning via ntile)
# -------------------------------------------------------------------------

EQUI_DEPTH_BINS = 8


@register(
    "q_histogram_equidepth",
    oracle=f"""
WITH b AS (
  SELECT o_totalprice,
         NTILE({EQUI_DEPTH_BINS}) OVER (ORDER BY o_totalprice, o_orderkey)
           AS bin
  FROM orders
)
SELECT bin, COUNT(*) AS n, MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
       ROUND(SUM(o_totalprice), 2) AS mass
FROM b GROUP BY bin ORDER BY bin
""",
)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) histogram: ntile assigns equal-population
    bins, then per-bin count/min/max/mass — the boundary table an
    optimizer's statistics or a range-partitioner needs (equi-WIDTH bins,
    q_histogram_price, are useless under skew; equi-depth bins adapt).

    The global ntile is a single-partition sort here — correct but not
    the 100 TB physical plan; at scale the same boundaries come from
    approx_percentile partials or repartitionByRange's sampled
    boundaries, then this per-bin aggregate is map-side combinable. The
    tie-break on o_orderkey makes bin assignment total-order
    deterministic, so both engines bin identically."""
    from pyspark.sql import Window

    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        load(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .withColumn("bin", F.ntile(EQUI_DEPTH_BINS).over(w))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            F.round(F.sum("o_totalprice"), 2).alias("mass"),
        )
        .orderBy("bin")
    )


# -------------------------------------------------------------------------
# Robust outlier detection (IQR fences per group)
# -------------------------------------------------------------------------

@register(
    "q_outliers_iqr",
    oracle="""
WITH q AS (
  SELECT o_orderpriority,
         quantile_cont(o_totalprice, 0.25) AS q1,
         quantile_cont(o_totalprice, 0.75) AS q3,
         COUNT(*) AS n
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       q.n,
       ROUND(q.q1, 2) AS q1,
       ROUND(q.q3, 2) AS q3,
       COUNT(*) FILTER (
         WHERE o.o_totalprice > q.q3 + 1.5 * (q.q3 - q.q1)
            OR o.o_totalprice < q.q1 - 1.5 * (q.q3 - q.q1)) AS n_outliers,
       MAX(o.o_totalprice) AS worst
FROM orders o JOIN q USING (o_orderpriority)
GROUP BY 1, 2, 3, 4
ORDER BY 1
""",
)
def q_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier report per order priority: exact Q1/Q3
    (Spark ``percentile`` == DuckDB ``quantile_cont``, both linear
    interpolation on the sorted group), 1.5*IQR fences, and per-group
    outlier counts — the robust data-quality screen (z-scores break on
    the very outliers they hunt; quartiles don't).

    Two-pass shape: quantile aggregate per group (5 groups -> broadcast),
    then a fence-count re-aggregate over the fact — at 100 TB pass 2 is
    a narrow scan against broadcast fences, and pass 1's exact quantiles
    would switch to approx_percentile partials (mergeable t-digest-like
    state) to avoid the per-group sort."""
    orders = load(spark, sf_dir, "orders")
    q = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.25)).alias("q1"),
        F.percentile("o_totalprice", F.lit(0.75)).alias("q3"),
        F.count(F.lit(1)).alias("n"),
    )
    iqr = F.col("q3") - F.col("q1")
    is_out = (F.col("o_totalprice") > F.col("q3") + 1.5 * iqr) | (
        F.col("o_totalprice") < F.col("q1") - 1.5 * iqr
    )
    return (
        orders.join(F.broadcast(q), "o_orderpriority")
        .groupBy(
            "o_orderpriority",
            "n",
            F.round("q1", 2).alias("q1"),
            F.round("q3", 2).alias("q3"),
        )
        .agg(
            F.count_if(is_out).alias("n_outliers"),
            F.max("o_totalprice").alias("worst"),
        )
        .orderBy("o_orderpriority")
    )


# -------------------------------------------------------------------------
# Median absolute deviation (robust dispersion, two-pass percentile)
# -------------------------------------------------------------------------

@register(
    "q_mad_dispersion",
    oracle="""
WITH med AS (
  SELECT o_orderpriority, quantile_cont(o_totalprice, 0.5) AS m
  FROM orders GROUP BY o_orderpriority
)
SELECT o.o_orderpriority,
       ROUND(med.m, 2) AS median_price,
       ROUND(quantile_cont(ABS(o.o_totalprice - med.m), 0.5), 2) AS mad,
       ROUND(quantile_cont(ABS(o.o_totalprice - med.m), 0.5) * 1.4826, 2)
         AS sigma_hat
FROM orders o JOIN med USING (o_orderpriority)
GROUP BY o.o_orderpriority, med.m
ORDER BY o.o_orderpriority
""",
)
def q_mad_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median absolute deviation per group, plus the 1.4826-scaled
    normal-consistent sigma estimate — the robust dispersion measure
    (stddev is quadratically sensitive to the outliers q_outliers_iqr
    hunts; MAD has a 50% breakdown point). Two passes: per-group median
    (5 rows, broadcast back), then the median of absolute deviations.
    Exact ``percentile`` == DuckDB ``quantile_cont`` (both linear
    interpolation), |x - m| is one exact subtraction of bit-identical
    operands, and 1.4826 parses to the same double literal on both
    engines — ROUND(2) absorbs nothing but presentation.

    At 100 TB both percentile passes switch to approx_percentile
    partials; everything else is unchanged."""
    orders = load(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", F.lit(0.5)).alias("m")
    )
    dev = F.abs(F.col("o_totalprice") - F.col("m"))
    return (
        orders.join(F.broadcast(med), "o_orderpriority")
        .groupBy("o_orderpriority", F.round("m", 2).alias("median_price"))
        .agg(
            F.round(F.percentile(dev, F.lit(0.5)), 2).alias("mad"),
            F.round(F.percentile(dev, F.lit(0.5)) * 1.4826, 2).alias(
                "sigma_hat"
            ),
        )
        .orderBy("o_orderpriority")
    )
