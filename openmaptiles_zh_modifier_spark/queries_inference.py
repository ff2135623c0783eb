"""Statistical-inference operators for experiment analysis at scale:
tie-corrected Mann-Whitney U (the nonparametric A/B test) and the
Poisson bootstrap (the only bootstrap that distributes — per-row
independent Poisson(1) weights replace sampling-with-replacement, so
resampling becomes a map + one combinable aggregate; Chamandy et al.,
"Estimating Uncertainty for Massive Data Streams", Google 2012).

Extension surface beyond the reference (which has no aggregates beyond
max(id), OMTZHModifier.java:107-112) — these are the A/B-guardrail
statistics an ML-data platform runs next to PSI/Welch (queries_events.py).

Determinism discipline (house rules, registry.py docstring): all
sufficient statistics are exact integers (cents, counts, rank*2 units);
doubles appear only in the final scalar expression, written identically
on both engines; any cross-row double fold runs in explicit key order.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.functions.text import h32_sql
from openmaptiles_zh_modifier_spark.registry import load, register

# ---------------------------------------------------------------------------
# Mann-Whitney U between deterministic experiment arms
# ---------------------------------------------------------------------------


@register(
    "q_mannwhitney_u",
    oracle="""
WITH e AS (
  SELECT event_type,
         user_id % 2 AS arm,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
vc AS (
  SELECT event_type, cents,
         SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS cb,
         COUNT(*) AS t
  FROM e GROUP BY 1, 2
),
rk AS (
  SELECT event_type, cents, ca, cb, t,
         COALESCE(SUM(t) OVER (
           PARTITION BY event_type ORDER BY cents
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
  FROM vc
),
s AS (
  SELECT event_type,
         SUM(ca) AS na, SUM(cb) AS nb,
         SUM(ca * (2 * cum + t + 1)) AS ra_x2,
         SUM(t * t * t - t) AS tie_t
  FROM rk GROUP BY 1
)
SELECT event_type,
       CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       ROUND((ra_x2 - na * (na + 1)) / 2.0, 1) AS u_a,
       ROUND(((ra_x2 - na * (na + 1)) / 2.0 - na * nb / 2.0)
             / sqrt(na * nb / 12.0
                    * ((na + nb + 1)
                       - tie_t / (CAST(na + nb AS DOUBLE) * (na + nb - 1)))),
             4) AS z_score
FROM s
ORDER BY event_type
""",
)
def q_mannwhitney_u(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tie-corrected Mann-Whitney U (Wilcoxon rank-sum) between the two
    deterministic user-parity arms, per event type — the nonparametric
    companion to q_welch_ttest for metric distributions where a mean
    test misleads (heavy tails, outliers). Average ranks for ties via
    the distinct-value identity avg_rank(v) = (#below) + (t+1)/2, kept
    integer as rank*2; normal approximation with the standard tie
    correction sum(t^3 - t) in the variance.

    Determinism: every sufficient statistic (counts, ra_x2, tie term)
    is an exact BIGINT; the cumulative-count window orders by the
    distinct cents key (no peer ambiguity); doubles appear only in the
    final z expression, written token-identically on both engines.

    Scale shape: ranking a 100 TB metric column needs NO global sort —
    the (type, cents) aggregate is map-side combinable, the window runs
    over distinct values (bounded by value cardinality, not row count),
    and the final per-type reduce is 4 integer sums. This is the
    standard "rank statistics via value-histogram" trick."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    vc = e.groupBy("event_type", "cents").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("cb"),
        F.count(F.lit(1)).alias("t"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rk = vc.withColumn("cum", F.coalesce(F.sum("t").over(w), F.lit(0)))
    s = rk.groupBy("event_type").agg(
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
        F.sum(F.col("ca") * (2 * F.col("cum") + F.col("t") + 1)).alias(
            "ra_x2"
        ),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias(
            "tie_t"
        ),
    )
    na, nb = F.col("na"), F.col("nb")
    u_a = (F.col("ra_x2") - na * (na + 1)) / 2.0
    var = (
        na * nb / 12.0
        * (
            (na + nb + 1)
            - F.col("tie_t") / ((na + nb).cast("double") * (na + nb - 1))
        )
    )
    return s.select(
        "event_type",
        na.cast("long").alias("n_a"),
        nb.cast("long").alias("n_b"),
        F.round(u_a, 1).alias("u_a"),
        F.round((u_a - na * nb / 2.0) / F.sqrt(var), 4).alias("z_score"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Poisson bootstrap confidence interval
# ---------------------------------------------------------------------------

BOOT_REPS = 64

def _poisson_case(hcol: str) -> str:
    """CASE expression mapping a uint32 hash to a Poisson(1) draw via
    inverse CDF. Generated once from exact math and injected verbatim
    into BOTH engines' SQL, so the thresholds are identical tokens."""
    cum, terms, fact = 0.0, [], 1.0
    for k in range(8):
        if k:
            fact *= k
        cum += math.exp(-1.0) / fact
        terms.append(f"WHEN {hcol} < {int(cum * 2**32)} THEN {k}")
    return "CASE " + " ".join(terms) + " ELSE 8 END"


@register(
    "q_bootstrap_ci",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey, CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
w AS (
  SELECT r.r, o.cents,
         {_poisson_case(h32_sql("o.o_orderkey || ':' || r.r"))} AS wt
  FROM o CROSS JOIN (SELECT unnest(generate_series(0, {BOOT_REPS - 1})) AS r) r
),
reps AS (
  SELECT r, SUM(wt * cents) AS wsum, SUM(wt) AS n_eff
  FROM w GROUP BY r
),
means AS (
  SELECT list_sort(list(wsum / CAST(n_eff AS DOUBLE) / 100.0)) AS ms
  FROM reps
),
pt AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(cents) AS tot_cents
  FROM o
)
SELECT pt.n_orders,
       {BOOT_REPS} AS reps,
       ROUND(pt.tot_cents / CAST(pt.n_orders AS DOUBLE) / 100.0, 4)
         AS point_mean,
       ROUND(ms[2], 4) AS boot_lo,
       ROUND(ms[{BOOT_REPS - 1}], 4) AS boot_hi,
       ROUND(list_reduce(list_prepend(0.0::DOUBLE, ms),
                         (acc, x) -> acc + x) / {BOOT_REPS}, 4) AS boot_mean
FROM pt CROSS JOIN means
""",
)
def q_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean order value. The
    classical bootstrap (sample n rows with replacement, B times) cannot
    distribute — a resample needs global coordination. The Poisson
    bootstrap replaces it: each row independently receives a
    Poisson(1) weight per replicate, so every replicate is one weighted
    sum — a map-side explode plus a {BOOT_REPS}-group combinable
    aggregate. The interval is the (2nd smallest, 2nd largest) order
    statistic of the replicate means (a ~97% percentile interval
    without interpolation-rule ambiguity across engines).

    Determinism: the Poisson draw is an inverse-CDF CASE over the
    shared 32-bit md5 hash of (orderkey ':' replicate), thresholds
    generated once from exact math and injected verbatim into both
    plans; replicate means are exact-integer ratios; the mean-of-means
    folds over the SORTED 64-element list.

    Scale shape: at 100 TB this is the textbook uncertainty recipe —
    the 64x row amplification happens inside the scan stage (no
    materialization), partial aggregation collapses each partition to
    64 (wsum, n) pairs before the only shuffle, and the driver-side
    work is sorting 64 doubles."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    spark_h = (
        "CAST(conv(substring(md5(concat(o_orderkey, ':', r)), 1, 8),"
        " 16, 10) AS BIGINT)"
    )
    w = o.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(BOOT_REPS - 1))).alias("r"),
        F.col("o_orderkey"),
    ).select("r", "cents", F.expr(_poisson_case(spark_h)).alias("wt"))
    reps = w.groupBy("r").agg(
        F.sum(F.col("wt") * F.col("cents")).alias("wsum"),
        F.sum("wt").alias("n_eff"),
    )
    means = reps.agg(
        F.array_sort(
            F.collect_list(
                F.col("wsum") / F.col("n_eff").cast("double") / 100.0
            )
        ).alias("ms")
    )
    pt = o.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum("cents").alias("tot_cents"),
    )
    return pt.crossJoin(F.broadcast(means)).select(
        "n_orders",
        F.lit(BOOT_REPS).alias("reps"),
        F.round(
            F.col("tot_cents") / F.col("n_orders").cast("double") / 100.0, 4
        ).alias("point_mean"),
        F.round(F.element_at("ms", 2), 4).alias("boot_lo"),
        F.round(F.element_at("ms", BOOT_REPS - 1), 4).alias("boot_hi"),
        F.round(
            F.aggregate(
                "ms", F.lit(0.0), lambda acc, x: acc + x
            )
            / BOOT_REPS,
            4,
        ).alias("boot_mean"),
    )


# ---------------------------------------------------------------------------
# Time-series anomaly flags on the STL residuals
# ---------------------------------------------------------------------------

ANOM_PERIOD = 7  # weekly seasonality (matches q_seasonal_decompose)
ANOM_Z = 3.0  # robust-z threshold
ANOM_MAD_K = 1.4826  # MAD -> sigma consistency constant (normal)


@register(
    "q_anomaly_residual",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
tr AS (
  SELECT day, cents,
         (day - DATE '1970-01-01') % {ANOM_PERIOD} AS dow,
         CASE WHEN COUNT(*) OVER w = {ANOM_PERIOD}
              THEN SUM(cents) OVER w / {float(ANOM_PERIOD)} END AS trend
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
dt AS (
  SELECT *, CAST(ROUND((cents - trend) * 1000000) AS BIGINT) AS detr_q
  FROM tr
),
sea AS (
  SELECT *,
         SUM(detr_q) OVER (PARTITION BY dow)
           / (1000000.0 * COUNT(detr_q) OVER (PARTITION BY dow)) AS seasonal
  FROM dt
),
res AS (
  SELECT day, cents,
         CAST(ROUND(((detr_q / 1000000.0) - seasonal) * 1000000) AS BIGINT)
           AS resid_q
  FROM sea WHERE trend IS NOT NULL
),
stats AS (
  SELECT quantile_cont(resid_q, 0.5) AS med FROM res
),
dev AS (
  SELECT r.day, r.cents, r.resid_q, s.med,
         ABS(r.resid_q - s.med) AS adev
  FROM res r CROSS JOIN stats s
),
mad AS (SELECT quantile_cont(adev, 0.5) AS mad_q FROM dev)
SELECT d.day,
       d.cents AS observed_cents,
       ROUND(d.resid_q / 1000000.0, 4) AS residual_cents,
       ROUND((d.resid_q - d.med) / ({ANOM_MAD_K} * m.mad_q), 4) AS robust_z,
       CAST(ABS((d.resid_q - d.med) / ({ANOM_MAD_K} * m.mad_q))
            > {ANOM_Z} AS INT) AS is_anomaly
FROM dev d CROSS JOIN mad m
ORDER BY d.day
""",
)
def q_anomaly_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection on the STL residuals: the
    q_seasonal_decompose pipeline (7-day centered-MA trend, weekday
    seasonal means on micro-quantized detrended values) feeds a
    median/MAD robust z-score — |z| > {ANOM_Z} flags a day whose
    revenue the trend+seasonal model cannot explain. Median+MAD instead
    of mean+stddev so the anomalies being hunted cannot mask themselves
    by inflating the threshold (the standard robust-monitoring choice).

    Determinism: residuals are micro-quantized BIGINTs before the
    median; Spark ``percentile`` and DuckDB ``quantile_cont`` both
    linearly interpolate on the sorted integers, giving identical
    doubles; the z expression is written token-identically both sides.

    Scale shape: daily rollup = one map-side-combinable aggregate;
    trend/seasonal = windows over the (tiny) day domain; the
    median/MAD pass aggregates the same day-domain frame twice — at
    100 TB the day domain is still thousands of rows, so the exact
    medians are free (the corpus-sized work is only the first
    rollup). Driver-sized reductions broadcast back, no collect."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    wma = (
        Window.orderBy("day").rowsBetween(-3, 3)
    )
    tr = daily.select(
        "day",
        "cents",
        F.pmod(F.datediff("day", F.lit("1970-01-01")), F.lit(ANOM_PERIOD)).alias(
            "dow"
        ),
        F.when(
            F.count(F.lit(1)).over(wma) == ANOM_PERIOD,
            F.sum("cents").over(wma) / float(ANOM_PERIOD),
        ).alias("trend"),
    )
    dt = tr.withColumn(
        "detr_q",
        F.round((F.col("cents") - F.col("trend")) * 1_000_000).cast("long"),
    )
    wdow = Window.partitionBy("dow")
    sea = dt.withColumn(
        "seasonal",
        F.sum("detr_q").over(wdow)
        / (1_000_000.0 * F.count("detr_q").over(wdow)),
    )
    res = sea.where(F.col("trend").isNotNull()).select(
        "day",
        "cents",
        F.round(
            ((F.col("detr_q") / 1_000_000.0) - F.col("seasonal")) * 1_000_000
        )
        .cast("long")
        .alias("resid_q"),
    )
    stats = res.agg(F.expr("percentile(resid_q, 0.5)").alias("med"))
    dev = res.crossJoin(F.broadcast(stats)).select(
        "day",
        "cents",
        "resid_q",
        "med",
        F.abs(F.col("resid_q") - F.col("med")).alias("adev"),
    )
    mad = dev.agg(F.expr("percentile(adev, 0.5)").alias("mad_q"))
    z = (F.col("resid_q") - F.col("med")) / (ANOM_MAD_K * F.col("mad_q"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            "day",
            F.col("cents").alias("observed_cents"),
            F.round(F.col("resid_q") / 1_000_000.0, 4).alias("residual_cents"),
            F.round(z, 4).alias("robust_z"),
            (F.abs(z) > ANOM_Z).cast("int").alias("is_anomaly"),
        )
        .orderBy("day")
    )
