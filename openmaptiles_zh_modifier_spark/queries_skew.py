"""Skew-mitigation query surface: deterministic salted join + two-phase
salted aggregation (operators/salted.py), oracle-checked against the
plain-SQL equivalent — salting must be invisible in the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.operators.salted import (
    maybe_salt_join,
    salted_agg,
)
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
    """Hot-key-safe join + aggregation, now through the round-8
    measure→decide→join guard (operators/salted.py maybe_salt_join):
    the fact side's key distribution is audited first (one combinable
    count-per-key + a one-row reduce — the operational q_skew_audit),
    and the 8-way salted join (dim replicated per salt, fact salted on
    the line number) is planned ONLY when one key would overload a
    balanced reducer. On the uniform TPC-H gate data that picks the
    plain join (salting unskewed input replicates the dim for nothing);
    on the 3x hot-key bench anchor it salts. Either branch produces the
    identical result (property-tested both ways), so the oracle is
    branch-blind. Then a two-phase salted aggregation on order priority;
    the summed measure (l_quantity) is integral-valued, so the two-phase
    re-association is bit-exact vs the oracle's single-phase sum."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    orders = load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined, _salted = maybe_salt_join(
        li, orders, on="l_orderkey", tiebreak="l_linenumber"
    )
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
    # Round 14 (attribution, guide §1): the exact-percentile buffer
    # build dominates this query (~0.55-0.95 s of its ~0.6-1.0 s total
    # depending on window; repartitioning by the 5-value group key does
    # NOT help — the cost is per-row ObjectHashAggregate work, not the
    # merge, and c8≈c32 because parallelism is bounded by 5 groups).
    # Two separate percentile functions each built their own value
    # buffer over the same 150k rows; the array form computes both
    # quantiles from ONE buffer (identical results, proven by collect
    # comparison). The 100 TB posture stays as documented: switch to
    # approx_percentile partials.
    q = orders.groupBy("o_orderpriority").agg(
        F.percentile(
            "o_totalprice", F.array(F.lit(0.25), F.lit(0.75))
        ).alias("qq"),
        F.count(F.lit(1)).alias("n"),
    ).select(
        "o_orderpriority",
        F.col("qq")[0].alias("q1"),
        F.col("qq")[1].alias("q3"),
        "n",
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


# ------------------------------------------------------------- chi-square

@register(
    "q_chisq_independence",
    oracle="""
WITH cells AS (
  SELECT event_type, user_id % 3 AS tier, COUNT(*) AS o
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, tier, o,
         SUM(o) OVER (PARTITION BY event_type) AS r,
         SUM(o) OVER (PARTITION BY tier) AS c,
         SUM(o) OVER () AS n
  FROM cells
),
scored AS (
  SELECT event_type, tier, o,
         ROUND(1.0 * r * c / n, 6) AS e,
         ROUND((o - 1.0 * r * c / n) * (o - 1.0 * r * c / n)
               / (1.0 * r * c / n), 6) AS contrib
  FROM tot
),
chi AS (
  SELECT list_reduce(
           list_prepend(0.0::DOUBLE,
                        list(contrib ORDER BY event_type, tier)),
           (acc, x) -> acc + x) AS chi2,
         (COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT tier) - 1) AS dof
  FROM scored
)
SELECT s.event_type, CAST(s.tier AS BIGINT) AS tier,
       CAST(s.o AS BIGINT) AS o, s.e, s.contrib,
       ROUND(chi.chi2, 6) AS chi2, CAST(chi.dof AS BIGINT) AS dof
FROM scored s CROSS JOIN chi
ORDER BY s.event_type, s.tier
""",
)
def q_chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test on the (event_type x user-tier)
    contingency table — the categorical-drift / A-B sanity primitive
    (are event types distributed independently of the user segment?).
    Emits every cell with its observed count, expected count under
    independence (E = row x col / N), per-cell contribution, and the
    global chi2 + degrees of freedom repeated per row.

    Determinism: observed counts and margins are exact integers, E is a
    single exact-double expression, per-cell contributions are ROUNDed
    at 6 dp, and the chi2 total is a sorted fold over the (few) cells in
    (event_type, tier) order — never an unordered double SUM.

    Scale shape: one map-side-combinable count on the cell key; margins
    come from windows over the CELL table (cardinality = types x tiers,
    tiny regardless of fact size), so the fact table is scanned once and
    everything after is metadata-sized. The chi2 fold collapses the cell
    table to one row broadcast-joined back."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", (F.col("user_id") % 3).alias("tier")
    ).agg(F.count(F.lit(1)).alias("o"))
    from pyspark.sql import Window

    r = F.sum("o").over(Window.partitionBy("event_type"))
    c = F.sum("o").over(Window.partitionBy("tier"))
    n = F.sum("o").over(Window.partitionBy())
    e_expr = F.lit(1.0) * r * c / n
    scored = cells.select(
        "event_type", "tier", "o",
        F.round(e_expr, 6).alias("e"),
        F.round((F.col("o") - e_expr) * (F.col("o") - e_expr) / e_expr, 6).alias(
            "contrib"
        ),
    )
    chi = scored.agg(
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("event_type", "tier", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("chi2_raw"),
        (
            (F.count_distinct("event_type") - 1)
            * (F.count_distinct("tier") - 1)
        ).alias("dof"),
    ).select(F.round("chi2_raw", 6).alias("chi2"), F.col("dof").cast("bigint"))
    return (
        scored.crossJoin(F.broadcast(chi))
        .select(
            "event_type",
            F.col("tier").cast("bigint").alias("tier"),
            F.col("o").cast("bigint").alias("o"),
            "e", "contrib", "chi2", "dof",
        )
        .orderBy("event_type", "tier")
    )


# ------------------------------------------------------------- OLS trend

@register(
    "q_ols_trend",
    oracle="""
WITH base AS (
  SELECT user_id, event_id, value AS y,
         epoch_us(ts) // 1000000
           - MIN(epoch_us(ts) // 1000000) OVER (PARTITION BY user_id) AS xs
  FROM events
),
agg AS (
  SELECT user_id,
         COUNT(*) AS n,
         SUM(xs) AS sx,
         SUM(xs * xs) AS sxx,
         list_reduce(list_prepend(0.0::DOUBLE,
             list(y ORDER BY xs, event_id)), (acc, v) -> acc + v) AS sy,
         list_reduce(list_prepend(0.0::DOUBLE,
             list(xs * y ORDER BY xs, event_id)), (acc, v) -> acc + v) AS sxy
  FROM base GROUP BY user_id
)
SELECT user_id, CAST(n AS BIGINT) AS n,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
       END AS slope_per_s,
       CASE WHEN n * sxx - sx * sx = 0 THEN NULL
            ELSE ROUND((sy - ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9)
                         * sx) / n, 6)
       END AS intercept
FROM agg
ORDER BY user_id
""",
)
def q_ols_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend of ``value`` over time (slope per
    second + intercept at the user's first event) — the closed-form OLS
    over moment sums that metric-drift detectors and per-entity
    forecasting features are built from. No iterative solver: slope =
    (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) from five mergeable sums.

    Determinism by construction: x is integer SECONDS relative to the
    user's first event (bounded span => Sx and Sxx stay exact int64 —
    this is why x is re-based and in seconds, not epoch micros, whose
    squares overflow), so the denominator is exact integer arithmetic on
    both engines. The two double sums (Sy, Sxy) are sorted folds in
    (x, event_id) order; slope is ROUNDed before feeding the intercept
    so the second division sees identical inputs. Degenerate users
    (single distinct timestamp) yield NULL, not a division crash.

    Scale shape: one shuffle on user_id (the window min and the
    aggregate share it); everything per-user is one pass. With the
    bit-exactness requirement relaxed, Sy/Sxy become plain SUMs and the
    whole thing is a classic map-side-combinable moment aggregate."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    xs = sec - F.min(sec).over(Window.partitionBy("user_id"))
    base = ev.select(
        "user_id", "event_id", F.col("value").alias("y"), xs.alias("xs")
    )
    agg = base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xs").alias("sx"),
        F.sum(F.col("xs") * F.col("xs")).alias("sxx"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("xs", "event_id", "y"))),
            F.lit(0.0),
            lambda acc, s: acc + s["y"],
        ).alias("sy"),
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct("xs", "event_id", (F.col("xs") * F.col("y")).alias("xy"))
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["xy"],
        ).alias("sxy"),
    )
    denom = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = F.round(
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / denom, 9
    )
    return agg.select(
        "user_id",
        F.col("n").cast("bigint").alias("n"),
        F.when(denom == 0, F.lit(None)).otherwise(slope).alias("slope_per_s"),
        F.when(denom == 0, F.lit(None))
        .otherwise(F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6))
        .alias("intercept"),
    ).orderBy("user_id")


# ------------------------------------------------------------- KS drift

@register(
    "q_ks_drift",
    oracle="""
WITH a AS (SELECT value FROM events WHERE event_type = 'click'),
b AS (SELECT value FROM events WHERE event_type = 'purchase'),
pooled AS (
  SELECT value, COUNT(*) FILTER (tag = 'a') AS ca,
         COUNT(*) FILTER (tag = 'b') AS cb
  FROM (
    SELECT value, 'a' AS tag FROM a
    UNION ALL
    SELECT value, 'b' AS tag FROM b
  ) GROUP BY value
),
cum AS (
  SELECT value,
         SUM(ca) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cuma,
         SUM(cb) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cumb,
         (SELECT SUM(ca) FROM pooled) AS na,
         (SELECT SUM(cb) FROM pooled) AS nb
  FROM pooled
),
scored AS (
  SELECT value,
         ROUND(ABS(1.0 * cuma / na - 1.0 * cumb / nb), 6) AS d,
         na, nb
  FROM cum
)
SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
       MAX(d) AS ks_stat,
       MIN(value) FILTER (d = (SELECT MAX(d) FROM scored)) AS at_value
FROM scored GROUP BY na, nb
""",
)
def q_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between the click and
    purchase value distributions — the numeric-distribution drift test
    (the continuous sibling of q_source_kl's token-distribution drift):
    KS = max over observed values of |ECDF_a - ECDF_b|, with the
    smallest value attaining the max reported as the drift location.

    Determinism: per-value counts and cumulative sums are exact
    integers; the ECDF difference is one exact-double expression ROUNDed
    at 6 dp BEFORE the max/argmin, so ties and the argmin location are
    decided on identical values cross-engine.

    Scale shape: one shuffle to the per-value count table (map-side
    combinable; cardinality = distinct values, not rows), one window
    over that table for both cumulative sums, one max-aggregate. The
    single ORDER BY window is over the DISTINCT-value table — if that
    itself were huge, production would bucket values first (the
    equi-depth histogram operator) and bound KS by bucket width."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    pooled = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy("value")
        .agg(
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            ).alias("ca"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("cb"),
        )
    )
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    tot = pooled.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    scored = (
        pooled.withColumn("cuma", F.sum("ca").over(w))
        .withColumn("cumb", F.sum("cb").over(w))
        .crossJoin(F.broadcast(tot))
        .select(
            "value", "na", "nb",
            F.round(
                F.abs(
                    F.lit(1.0) * F.col("cuma") / F.col("na")
                    - F.lit(1.0) * F.col("cumb") / F.col("nb")
                ),
                6,
            ).alias("d"),
        )
    )
    return scored.groupBy("na", "nb").agg(
        F.max("d").alias("ks_stat"),
        F.min_by("value", F.struct(F.negate(F.col("d")), F.col("value"))).alias(
            "at_value"
        ),
    ).select(
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        "ks_stat",
        "at_value",
    )
