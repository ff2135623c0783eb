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
         (user_id % 2 + 2) % 2 AS arm,
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
    final z expression, written token-identically on both engines. The
    arm split uses F.pmod on Spark and ``(user_id % 2 + 2) % 2`` in
    the oracle so both sides yield {0,1} even for negative user_ids
    (DuckDB's plain % returns negative remainders).

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


# ---------------------------------------------------------------------------
# CUSUM change-point monitor on the daily revenue series
# ---------------------------------------------------------------------------

CUSUM_K_SIGMA = 0.5  # slack, in sigma units
CUSUM_H_SIGMA = 4.0  # alarm threshold, in sigma units


@register(
    "q_cusum_changepoint",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
  FROM events GROUP BY 1
),
ord AS (
  SELECT day, cents,
         CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i
  FROM daily
),
st AS (
  SELECT COUNT(*) AS n, SUM(cents) AS s, SUM(cents * cents) AS q
  FROM daily
),
params AS (
  SELECT (s / CAST(n AS DOUBLE)) AS mu,
         sqrt((q - (s / CAST(n AS DOUBLE)) * s) / (n - 1)) AS sigma
  FROM st
),
rec AS (
  SELECT o.i, o.day, o.cents,
         GREATEST(0.0, (o.cents - p.mu) - {CUSUM_K_SIGMA} * p.sigma) AS sp,
         GREATEST(0.0, (p.mu - o.cents) - {CUSUM_K_SIGMA} * p.sigma) AS sn
  FROM ord o CROSS JOIN params p WHERE o.i = 1
  UNION ALL
  SELECT o.i, o.day, o.cents,
         GREATEST(0.0, r.sp + (o.cents - p.mu) - {CUSUM_K_SIGMA} * p.sigma),
         GREATEST(0.0, r.sn + (p.mu - o.cents) - {CUSUM_K_SIGMA} * p.sigma)
  FROM rec r
  JOIN ord o ON o.i = r.i + 1
  CROSS JOIN params p
)
SELECT r.day, CAST(r.cents AS BIGINT) AS observed_cents,
       ROUND(r.sp / p.sigma, 4) AS cusum_hi_sigma,
       ROUND(r.sn / p.sigma, 4) AS cusum_lo_sigma,
       CAST(r.sp > {CUSUM_H_SIGMA} * p.sigma
            OR r.sn > {CUSUM_H_SIGMA} * p.sigma AS INT) AS alarm
FROM rec r CROSS JOIN params p
ORDER BY r.day
""",
)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM change-point monitor (Page 1954) over the daily
    revenue series: S+ accumulates positive deviations beyond a
    {CUSUM_K_SIGMA}-sigma slack, S- the negative side; either crossing
    {CUSUM_H_SIGMA} sigma raises the alarm — the sequential detector
    that catches small persistent level shifts a per-day z-score
    misses (the standard data-quality tripwire for ingest volume and
    metric drift).

    Determinism: mu/sigma come from exact integer sums; the clamp
    recurrence is inherently sequential, so Spark folds it with
    F.aggregate over the day-sorted series while the oracle expresses
    the IDENTICAL IEEE sequence as a recursive CTE (the q_holt_linear
    pattern — DuckDB's list_reduce struct-state evaluation hazard is
    documented there, so struct-state folds never appear oracle-side).

    Scale shape: the corpus-sized work is one combinable daily rollup;
    the recurrence runs over the day domain (thousands of rows at any
    corpus size) inside ONE array fold — the canonical
    small-state/sequential-tail split. The fold state is an appended
    array so every day's running statistic is emitted, not just the
    last."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents")
    )
    st = daily.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("q"),
    )
    params = st.select(
        (F.col("s") / F.col("n").cast("double")).alias("mu"),
        F.sqrt(
            (F.col("q") - (F.col("s") / F.col("n").cast("double")) * F.col("s"))
            / (F.col("n") - 1)
        ).alias("sigma"),
    )
    series = daily.agg(
        F.array_sort(F.collect_list(F.struct("day", "cents"))).alias("xs")
    )
    acc_t = "array<struct<day:date,cents:bigint,sp:double,sn:double>>"

    def step(acc, x):
        last_sp = F.coalesce(F.try_element_at(acc, F.lit(-1))["sp"], F.lit(0.0))
        last_sn = F.coalesce(F.try_element_at(acc, F.lit(-1))["sn"], F.lit(0.0))
        dev = x["cents"] - F.col("mu")
        sp = F.greatest(
            F.lit(0.0), last_sp + dev - CUSUM_K_SIGMA * F.col("sigma")
        )
        sn = F.greatest(
            F.lit(0.0), last_sn + (-dev) - CUSUM_K_SIGMA * F.col("sigma")
        )
        return F.concat(
            acc,
            F.array(
                F.struct(
                    x["day"].alias("day"),
                    x["cents"].alias("cents"),
                    sp.alias("sp"),
                    sn.alias("sn"),
                )
            ),
        )

    folded = series.crossJoin(F.broadcast(params)).select(
        "sigma",
        F.aggregate(
            "xs", F.expr(f"CAST(array() AS {acc_t})"), step
        ).alias("tr"),
    )
    row = folded.select("sigma", F.explode("tr").alias("r"))
    return row.select(
        F.col("r.day").alias("day"),
        F.col("r.cents").alias("observed_cents"),
        F.round(F.col("r.sp") / F.col("sigma"), 4).alias("cusum_hi_sigma"),
        F.round(F.col("r.sn") / F.col("sigma"), 4).alias("cusum_lo_sigma"),
        (
            (F.col("r.sp") > CUSUM_H_SIGMA * F.col("sigma"))
            | (F.col("r.sn") > CUSUM_H_SIGMA * F.col("sigma"))
        )
        .cast("int")
        .alias("alarm"),
    ).orderBy("day")


# ---------------------------------------------------------------------------
# Winsorized / trimmed robust statistics
# ---------------------------------------------------------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95


@register(
    "q_winsorized_stats",
    oracle=f"""
WITH o AS (
  SELECT o_orderpriority,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
),
fences AS (
  SELECT o_orderpriority,
         quantile_cont(cents, {WINSOR_LO}) AS lo,
         quantile_cont(cents, {WINSOR_HI}) AS hi
  FROM o GROUP BY 1
),
w AS (
  SELECT o.o_orderpriority,
         CAST(ROUND(LEAST(GREATEST(o.cents, f.lo), f.hi) * 100) AS BIGINT)
           AS wq,
         CASE WHEN o.cents >= f.lo AND o.cents <= f.hi
              THEN o.cents END AS kept
  FROM o JOIN fences f USING (o_orderpriority)
)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(SUM(wq) / (COUNT(*) * 10000.0), 4) AS winsorized_mean,
       ROUND(SUM(kept) / (COUNT(kept) * 100.0), 4) AS trimmed_mean,
       CAST(COUNT(*) - COUNT(kept) AS BIGINT) AS n_clamped
FROM w
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized and trimmed means of order value per priority class —
    the robust location estimates every metrics platform serves next
    to the raw mean, because a single fat-finger order should move a
    KPI by at most the fence width (winsorize clamps to the
    [{WINSOR_LO}, {WINSOR_HI}] quantile fences; trim drops outside
    them).

    Determinism: fences are exact interpolated quantiles over integer
    cents (Spark ``percentile`` == DuckDB ``quantile_cont``); clamped
    values re-quantize to BIGINT hundredths-of-a-cent BEFORE summing
    so the aggregate is order-independent; the final ratios are exact
    integer/double expressions written identically both sides.

    Scale shape: pass 1 computes 5 fence pairs (tiny broadcast), pass
    2 is one combinable aggregate over the clamped scan — the
    standard two-pass robust-stats plan; exact quantiles come off the
    per-group sort at this cardinality and would swap to
    approx_percentile partials at extreme group counts."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    fences = o.groupBy("o_orderpriority").agg(
        F.expr(f"percentile(cents, {WINSOR_LO})").alias("lo"),
        F.expr(f"percentile(cents, {WINSOR_HI})").alias("hi"),
    )
    w = o.join(F.broadcast(fences), "o_orderpriority").select(
        "o_orderpriority",
        F.round(
            F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
            * 100
        )
        .cast("long")
        .alias("wq"),
        F.when(
            (F.col("cents") >= F.col("lo")) & (F.col("cents") <= F.col("hi")),
            F.col("cents"),
        ).alias("kept"),
    )
    return (
        w.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.round(
                F.sum("wq") / (F.count(F.lit(1)) * 10000.0), 4
            ).alias("winsorized_mean"),
            F.round(
                F.sum("kept") / (F.count("kept") * 100.0), 4
            ).alias("trimmed_mean"),
            (F.count(F.lit(1)) - F.count("kept"))
            .cast("long")
            .alias("n_clamped"),
        )
        .orderBy("o_orderpriority")
    )


# ---------------------------------------------------------------------------
# Kaplan-Meier survival over user activity spans
# ---------------------------------------------------------------------------

KM_CENSOR_DAYS = 2  # active within this many days of stream end => censored


@register(
    "q_km_survival",
    oracle=f"""
WITH RECURSIVE spans AS (
  SELECT user_id,
         CAST(date_trunc('day', MIN(ts)) AS DATE) AS d0,
         CAST(date_trunc('day', MAX(ts)) AS DATE) AS d1
  FROM events GROUP BY 1
),
horizon AS (SELECT MAX(d1) AS dmax FROM spans),
obs AS (
  SELECT s.user_id,
         CAST(s.d1 - s.d0 AS BIGINT) AS t,
         CASE WHEN s.d1 >= h.dmax - {KM_CENSOR_DAYS} THEN 0 ELSE 1 END
           AS observed
  FROM spans s CROSS JOIN horizon h
),
bytime AS (
  SELECT t,
         CAST(SUM(observed) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM obs GROUP BY t
),
risk AS (
  SELECT t, d, c,
         CAST(SUM(c) OVER (ORDER BY t DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n,
         CAST(ROW_NUMBER() OVER (ORDER BY t) AS BIGINT) AS i
  FROM bytime
),
rec AS (
  SELECT i, t, n, d,
         (1.0 - d / CAST(n AS DOUBLE)) AS s
  FROM risk WHERE i = 1
  UNION ALL
  SELECT k.i, k.t, k.n, k.d,
         r.s * (1.0 - k.d / CAST(k.n AS DOUBLE))
  FROM rec r JOIN risk k ON k.i = r.i + 1
)
SELECT t AS duration_days, n AS n_at_risk, d AS n_churned,
       ROUND(s, 6) AS survival
FROM rec
ORDER BY duration_days
""",
)
def q_km_survival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival estimate of user activity span (days from
    first to last event): users still active within {KM_CENSOR_DAYS}
    days of the stream horizon are right-CENSORED (they haven't
    churned — treating them as events is the classic retention-curve
    mistake KM exists to fix); everyone else's span is an observed
    churn. S(t) = prod over event times <= t of (1 - d_i / n_i) with
    n_i the at-risk count (span >= t_i, censored included).

    Determinism: d/n are exact BIGINTs (at-risk from one descending
    cumulative window); each factor is the same exact double both
    engines; the inherently sequential product folds in duration
    order — Spark as an appending F.aggregate over the sorted series,
    the oracle as the equivalent recursive CTE (the q_holt_linear
    pattern).

    Scale shape: the corpus-sized work is one (user) span aggregate;
    everything after lives on the duration domain (hundreds of rows
    at any corpus size) — window + one array fold. The textbook
    split: distributed sufficient statistics, sequential tail on the
    tiny domain."""
    ev = load(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("day", F.min("ts"))).alias("d0"),
        F.to_date(F.date_trunc("day", F.max("ts"))).alias("d1"),
    )
    horizon = spans.agg(F.max("d1").alias("dmax"))
    obs = spans.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        F.datediff("d1", "d0").cast("long").alias("t"),
        F.when(
            F.col("d1") >= F.date_sub(F.col("dmax"), KM_CENSOR_DAYS), 0
        )
        .otherwise(1)
        .alias("observed"),
    )
    bytime = obs.groupBy("t").agg(
        F.sum("observed").cast("long").alias("d"),
        F.count(F.lit(1)).cast("long").alias("c"),
    )
    wrisk = (
        Window.orderBy(F.desc("t"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    risk = bytime.withColumn("n", F.sum("c").over(wrisk).cast("long"))
    series = risk.agg(
        F.array_sort(F.collect_list(F.struct("t", "n", "d"))).alias("xs")
    )
    acc_t = "array<struct<t:bigint,n:bigint,d:bigint,s:double>>"

    def step(acc, x):
        s_prev = F.coalesce(F.try_element_at(acc, F.lit(-1))["s"], F.lit(1.0))
        f = F.lit(1.0) - x["d"] / x["n"].cast("double")
        return F.concat(
            acc,
            F.array(
                F.struct(
                    x["t"].alias("t"),
                    x["n"].alias("n"),
                    x["d"].alias("d"),
                    (s_prev * f).alias("s"),
                )
            ),
        )

    folded = series.select(
        F.explode(
            F.aggregate("xs", F.expr(f"CAST(array() AS {acc_t})"), step)
        ).alias("r")
    )
    return folded.select(
        F.col("r.t").alias("duration_days"),
        F.col("r.n").alias("n_at_risk"),
        F.col("r.d").alias("n_churned"),
        F.round(F.col("r.s"), 6).alias("survival"),
    ).orderBy("duration_days")


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (Efraimidis-Spirakis A-Res)
# ---------------------------------------------------------------------------

WS_TOPK = 20


@register(
    "q_weighted_sample",
    oracle=f"""
WITH o AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents,
         ({h32_sql("o_orderkey || ':ws'")} + 1) / 4294967296.0 AS u
  FROM orders
),
keyed AS (
  SELECT o_orderkey, cents,
         ROUND(ln(u), 6) / cents AS k
  FROM o
),
ranked AS (
  SELECT o_orderkey, cents, ROUND(k * 1e9, 4) AS key_nano,
         ROW_NUMBER() OVER (ORDER BY k DESC, o_orderkey) AS rk
  FROM keyed
)
SELECT rk, o_orderkey, cents, key_nano
FROM ranked WHERE rk <= {WS_TOPK}
ORDER BY rk
""",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via Efraimidis-Spirakis
    A-Res: each row gets key u^(1/w) (equivalently ln(u)/w, monotone)
    with u a seedless hash-uniform in (0, 1] and w the row's weight
    (order value in cents); the top-k keys ARE a weighted sample
    without replacement — the only known one-pass distributed
    formulation, and the standard way to draw training-mixture samples
    proportional to quality/importance weights (pairs with
    q_mixture_weights / q_dsir_selection, which produce exactly such
    per-row weights).

    Determinism: u derives from the shared md5 hash (+1 so u > 0);
    ln(u) is rounded at 6 dp BEFORE the exact division by the integer
    weight, absorbing any last-ulp libm difference between engines;
    top-k tie-breaks on the key id.

    Scale shape: one narrow scan computing the key, then TakeOrdered
    top-k — no shuffle of the corpus, ever; at 100 TB each partition
    contributes its local top-k and the driver merges k rows. This is
    the A-Res property that makes it THE distributed weighted
    sampler."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
        (
            (
                F.expr(
                    "CAST(conv(substring(md5(concat(o_orderkey, ':ws')),"
                    " 1, 8), 16, 10) AS BIGINT)"
                )
                + 1
            )
            / F.lit(4294967296.0)
        ).alias("u"),
    )
    k = F.round(F.log("u"), 6) / F.col("cents")
    ranked = (
        o.select(
            "o_orderkey",
            "cents",
            F.round(k * 1e9, 4).alias("key_nano"),
            k.alias("k"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.desc("k"), F.asc("o_orderkey"))
            ),
        )
        .where(F.col("rk") <= WS_TOPK)
    )
    return ranked.select("rk", "o_orderkey", "cents", "key_nano").orderBy(
        "rk"
    )


# ---------------------------------------------------------------------------
# Prefix-cache hit analytics (round 8): LLM-serving-side accounting
# ---------------------------------------------------------------------------

PC_FULL = 8  # full-prefix tier: first 8 tokens
PC_PART = 4  # partial tier: first 4 tokens
PC_CACHE_K = 16  # cached entries per tier (top-k by request frequency)


@register(
    "q_prefix_cache_hits",
    oracle=f"""
WITH reqs AS (
  SELECT doc_id, source,
         string_split(text, ' ') AS toks,
         len(string_split(text, ' ')) AS n_toks
  FROM documents
),
keyed AS (
  SELECT doc_id, source, n_toks,
         array_to_string(toks[1:{PC_FULL}], ' ') AS p_full,
         array_to_string(toks[1:{PC_PART}], ' ') AS p_part
  FROM reqs WHERE n_toks >= {PC_FULL}
),
cache_full AS (
  SELECT p FROM (
    SELECT p_full p, COUNT(*) c,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, p_full) r
    FROM keyed GROUP BY 1) WHERE r <= {PC_CACHE_K}),
cache_part AS (
  SELECT p FROM (
    SELECT p_part p, COUNT(*) c,
           ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, p_part) r
    FROM keyed GROUP BY 1) WHERE r <= {PC_CACHE_K}),
hits AS (
  SELECT k.source, k.n_toks,
         CASE WHEN cf.p IS NOT NULL THEN 'full'
              WHEN cp.p IS NOT NULL THEN 'partial'
              ELSE 'miss' END AS tier,
         CASE WHEN cf.p IS NOT NULL THEN {PC_FULL}
              WHEN cp.p IS NOT NULL THEN {PC_PART}
              ELSE 0 END AS cached_toks
  FROM keyed k
  LEFT JOIN cache_full cf ON cf.p = k.p_full
  LEFT JOIN cache_part cp ON cp.p = k.p_part
)
SELECT source, tier,
       CAST(COUNT(*) AS BIGINT) AS n_requests,
       CAST(SUM(cached_toks) AS BIGINT) AS tokens_served_from_cache,
       ROUND(CAST(SUM(cached_toks) AS DOUBLE) / SUM(n_toks), 6)
         AS cache_token_frac
FROM hits
GROUP BY source, tier
ORDER BY source, tier
""",
)
def q_prefix_cache_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-cache accounting — the serving-side analytics of LLM
    inference (vLLM-style automatic prefix caching): requests sharing a
    cached prompt prefix skip its prefill. The cache holds the
    top-{PC_CACHE_K} most frequent {PC_FULL}-token prefixes (full tier)
    and {PC_PART}-token prefixes (partial tier); each request is
    classified full / partial / miss and the report prices tokens served
    from cache per source — the number that decides whether prefix
    caching pays for a workload BEFORE deploying it.

    Scale shape: prefix keys are in-row slices; both cache builds are
    combinable counts + a k-row rank; classification is two broadcast
    semijoins against k-row caches; the report is one combinable
    aggregate. At 100 TB of request logs this is scan-bound — the same
    shape the q_dedup_prefix family uses, pointed at serving."""
    from openmaptiles_zh_modifier_spark.functions.text import tokens

    reqs = load(spark, sf_dir, "documents").select(
        "source",
        tokens(F.col("text")).alias("toks"),
        F.size(tokens(F.col("text"))).alias("n_toks"),
    )
    keyed = reqs.where(F.col("n_toks") >= PC_FULL).select(
        "source",
        "n_toks",
        F.array_join(F.slice("toks", 1, PC_FULL), " ").alias("p_full"),
        F.array_join(F.slice("toks", 1, PC_PART), " ").alias("p_part"),
    )

    def cache(col):
        wk = Window.orderBy(F.desc("c"), F.asc("p"))
        return (
            keyed.groupBy(F.col(col).alias("p"))
            .agg(F.count(F.lit(1)).alias("c"))
            .withColumn("r", F.row_number().over(wk))
            .where(F.col("r") <= PC_CACHE_K)
            .select("p")
        )

    cf = cache("p_full").select(F.col("p").alias("pf"))
    cp = cache("p_part").select(F.col("p").alias("pp"))
    hits = (
        keyed.join(F.broadcast(cf), F.col("p_full") == F.col("pf"), "left")
        .join(F.broadcast(cp), F.col("p_part") == F.col("pp"), "left")
        .select(
            "source",
            "n_toks",
            F.when(F.col("pf").isNotNull(), "full")
            .when(F.col("pp").isNotNull(), "partial")
            .otherwise("miss")
            .alias("tier"),
            F.when(F.col("pf").isNotNull(), PC_FULL)
            .when(F.col("pp").isNotNull(), PC_PART)
            .otherwise(0)
            .alias("cached_toks"),
        )
    )
    return (
        hits.groupBy("source", "tier")
        .agg(
            F.count(F.lit(1)).alias("n_requests"),
            F.sum("cached_toks").alias("tokens_served_from_cache"),
            F.round(
                F.sum("cached_toks").cast("double") / F.sum("n_toks"), 6
            ).alias("cache_token_frac"),
        )
        .orderBy("source", "tier")
    )
