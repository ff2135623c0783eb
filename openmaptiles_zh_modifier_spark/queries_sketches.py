"""Approximate/sketch aggregates — the mergeable-summary surface a 100 TB
engine actually runs (exact forms exist beside them for small data).

Engine-internal sketches (approx_count_distinct, percentile_approx) can't
hash-match another engine's values, so q_approx_sketches asserts its
rated-error CONTRACT instead: exact columns are hash-checked against
DuckDB, and each approximate value is reduced to a 0/1 within-bound flag
that the oracle asserts is 1. The portable sketches below (HLL/CMS/KMV)
use integer arithmetic and hash-match DuckDB bit for bit."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.functions.text import h32
from openmaptiles_zh_modifier_spark.registry import load, register


@register(
    "q_approx_sketches",
    oracle="""
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS exact_parts,
       COUNT(*) AS n,
       CAST(1 AS BIGINT) AS approx_parts_ok,
       CAST(1 AS BIGINT) AS p25_ok,
       CAST(1 AS BIGINT) AS p50_ok,
       CAST(1 AS BIGINT) AS p75_ok,
       CAST(1 AS BIGINT) AS iqr_monotone_ok
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag HLL distinct counts and KLL/GK percentile sketches
    over lineitem. Both are mergeable: partial states combine
    associatively across partitions, so the shuffle carries fixed-size
    summaries regardless of input scale — the entire point vs their exact
    counterparts (q_distinct_agg, q_percentiles).

    Oracle contract: the sketch VALUES are engine-internal, so each is
    reduced to a scalar 0/1 within-rated-bound flag —
    approx_count_distinct(rsd=0.02) within 8% (4 sigma) of the exact
    count; percentile_approx(accuracy=10000, rank error <= n/10000)
    between the EXACT 24th/26th (49th/51st, 74th/76th) percentiles — and
    the DuckDB oracle hash-checks the exact columns while asserting every
    flag is 1. The exact percentile() here is the assertion harness, not
    the operator; at 100 TB only the sketch side runs."""
    li = load(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.percentile_approx(
            "l_extendedprice", [0.25, 0.5, 0.75], 10000
        ).alias("pa"),
        F.expr(
            "percentile(l_extendedprice,"
            " array(0.24D, 0.26D, 0.49D, 0.51D, 0.74D, 0.76D))"
        ).alias("xb"),
        F.count(F.lit(1)).alias("n"),
    )

    def within(value, lo, hi):
        return ((value >= lo) & (value <= hi)).cast("long")

    pa, xb = F.col("pa"), F.col("xb")
    rel_err = F.abs(F.col("approx_parts") - F.col("exact_parts")) / F.col(
        "exact_parts"
    )
    return g.select(
        "l_returnflag",
        "exact_parts",
        "n",
        (rel_err <= 0.08).cast("long").alias("approx_parts_ok"),
        within(pa[0], xb[0], xb[1]).alias("p25_ok"),
        within(pa[1], xb[2], xb[3]).alias("p50_ok"),
        within(pa[2], xb[4], xb[5]).alias("p75_ok"),
        ((pa[0] <= pa[1]) & (pa[1] <= pa[2])).cast("long").alias(
            "iqr_monotone_ok"
        ),
    ).orderBy("l_returnflag")


# -------------------------------------------------------------------------
# Portable HyperLogLog (bit-exact cross-engine approximate distinct)
# -------------------------------------------------------------------------

HLL_M = 64  # registers (2^6); index = low 6 bits of h32, body = high 26
HLL_ALPHA = 0.709  # standard alpha for m=64


@register(
    "q_hll_distinct",
    oracle=f"""
WITH h AS (
  SELECT o_orderpriority,
         ('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))::BIGINT AS hv
  FROM orders
),
r AS (
  SELECT o_orderpriority,
         hv % {HLL_M} AS reg,
         CASE WHEN hv // {HLL_M} = 0 THEN 27
              ELSE 27 - length(bin(hv // {HLL_M})) END AS rank
  FROM h
),
m AS (
  SELECT o_orderpriority, reg, MAX(rank) AS mr
  FROM r GROUP BY 1, 2
),
spine AS (
  SELECT DISTINCT o_orderpriority, s.reg
  FROM m CROSS JOIN (SELECT unnest(range(0, {HLL_M})) AS reg) s
),
z AS (
  SELECT spine.o_orderpriority,
         SUM(1.0 / (1 << COALESCE(m.mr, 0))) AS zsum
  FROM spine LEFT JOIN m
    ON m.o_orderpriority = spine.o_orderpriority AND m.reg = spine.reg
  GROUP BY 1
),
exact AS (
  SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_exact FROM orders
  GROUP BY 1
)
SELECT z.o_orderpriority,
       exact.n_exact,
       ROUND({HLL_ALPHA} * {HLL_M} * {HLL_M} / z.zsum, 2) AS hll_estimate,
       ROUND(ABS({HLL_ALPHA} * {HLL_M} * {HLL_M} / z.zsum - exact.n_exact)
             / exact.n_exact, 4) AS rel_error
FROM z JOIN exact USING (o_orderpriority)
ORDER BY o_orderpriority
""",
)
def q_hll_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog built from scratch with PORTABLE integer arithmetic —
    unlike ``approx_count_distinct`` (whose sketch is engine-internal,
    hence q_approx_sketches is rows-only), this estimate hash-matches
    DuckDB bit for bit: register index and rank come from integer ops on
    h32 (rank via length(bin(x)), identical both engines), and the
    harmonic sum adds 64 EXACT dyadic rationals (2^-M, M<=27 — every
    partial sum fits a double's 53-bit mantissa, so the sum is exact in
    ANY order; no fold discipline needed). Raw HLL estimate, no
    small-range correction (both sides identical); m=64 gives ~13%
    typical error, reported against the exact count.

    Scale shape: per-(group, register) MAX is map-side combinable and the
    sketch is 64 rows per group — THE mergeable-state pattern; shippable
    across partitions/days exactly like q_incremental_agg states."""
    orders = load(spark, sf_dir, "orders")
    hv = h32(F.col("o_custkey").cast("string"))
    body = F.floor(hv / HLL_M).cast("long")
    rank = F.when(body == 0, F.lit(27)).otherwise(
        27 - F.length(F.bin(body))
    )
    m = (
        orders.select(
            "o_orderpriority", (hv % HLL_M).alias("reg"), rank.alias("rank")
        )
        .groupBy("o_orderpriority", "reg")
        .agg(F.max("rank").alias("mr"))
    )
    spine = (
        m.select("o_orderpriority")
        .distinct()
        .crossJoin(
            F.broadcast(
                orders.sparkSession.range(HLL_M).select(
                    F.col("id").cast("long").alias("reg")
                )
            )
        )
    )
    z = (
        spine.join(m, ["o_orderpriority", "reg"], "left")
        .groupBy("o_orderpriority")
        .agg(
            F.sum(
                1.0
                / F.expr("shiftleft(1, cast(coalesce(mr, 0) as int))")
            ).alias("zsum")
        )
    )
    exact = orders.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_exact")
    )
    est = HLL_ALPHA * HLL_M * HLL_M / F.col("zsum")
    return (
        z.join(exact, "o_orderpriority")
        .select(
            "o_orderpriority",
            "n_exact",
            F.round(est, 2).alias("hll_estimate"),
            F.round(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 4).alias(
                "rel_error"
            ),
        )
        .orderBy("o_orderpriority")
    )


# -------------------------------------------------------------------------
# Portable Count-Min Sketch (heavy-hitter frequency estimation)
# -------------------------------------------------------------------------

CMS_W = 64  # counters per row
CMS_D = 3   # independent hash rows
CMS_TOP = 10


def _cms_pos_sql(tok: str, i: int) -> str:
    salted = tok + " || '#" + str(i) + "'"
    return f"(('0x' || substr(md5({salted}), 1, 8))::BIGINT % {CMS_W})"


@register(
    "q_cms_heavy_hitters",
    oracle=f"""
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS t FROM documents
),
exact AS (
  SELECT t, COUNT(*) AS n FROM tok GROUP BY t
),
cms AS (
  {' UNION ALL '.join(f"SELECT {i} AS row_id, {_cms_pos_sql('t', i)} AS pos, COUNT(*) AS c FROM tok GROUP BY 1, 2" for i in range(CMS_D))}
),
top AS (
  SELECT t, n, ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rk
  FROM exact QUALIFY rk <= {CMS_TOP}
),
est AS (
  SELECT top.t, top.n, top.rk,
         MIN(cms.c) AS cms_estimate
  FROM top JOIN cms
    ON {' OR '.join(f"(cms.row_id = {i} AND cms.pos = {_cms_pos_sql('top.t', i)})" for i in range(CMS_D))}
  GROUP BY 1, 2, 3
)
SELECT t AS token, n AS exact_count, cms_estimate,
       cms_estimate - n AS overcount, rk
FROM est
ORDER BY rk
""",
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch from scratch with portable integer arithmetic:
    {CMS_D} hash rows x {CMS_W} counters (salted h32 positions), point
    estimate = MIN over the rows' counters — never under-counts, over-
    counts by colliding tokens (reported per heavy hitter against the
    exact count). Like q_hll_distinct, every value is an integer, so the
    sketch AND the estimates hash-match DuckDB exactly.

    Scale shape: the sketch build is one map-side-combinable groupBy to
    {CMS_D}x{CMS_W} cells — constant size regardless of corpus, mergeable
    across partitions/shards by cell-wise addition (the streaming /
    incremental form adds per-batch sketches). The probe side touches
    only the top-k exact rows (tiny, broadcast)."""
    tok = load(spark, sf_dir, "documents").select(
        F.explode(F.split(F.col("text"), " ")).alias("t")
    )
    exact = tok.groupBy("t").agg(F.count(F.lit(1)).alias("n"))

    def pos(col: F.Column, i: int) -> F.Column:
        return h32(F.concat(col, F.lit(f"#{i}"))) % CMS_W

    cms = None
    for i in range(CMS_D):
        row = tok.groupBy(pos(F.col("t"), i).alias("pos")).agg(
            F.count(F.lit(1)).alias("c")
        ).select(F.lit(i).alias("row_id"), "pos", "c")
        cms = row if cms is None else cms.unionByName(row)

    from pyspark.sql import Window

    top = (
        exact.withColumn(
            "rk", F.row_number().over(Window.orderBy(F.desc("n"), F.asc("t")))
        )
        .where(F.col("rk") <= CMS_TOP)
    )
    probe_cond = None
    for i in range(CMS_D):
        c = (F.col("row_id") == i) & (F.col("pos") == pos(F.col("t"), i))
        probe_cond = c if probe_cond is None else (probe_cond | c)
    return (
        F.broadcast(top)
        .join(cms, probe_cond)
        .groupBy("t", "n", "rk")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            F.col("t").alias("token"),
            F.col("n").alias("exact_count"),
            "cms_estimate",
            (F.col("cms_estimate") - F.col("n")).alias("overcount"),
            "rk",
        )
        .orderBy("rk")
    )


# -------------------------------------------------------------------------
# Portable KMV sketch (distinct-set overlap estimation via set algebra)
# -------------------------------------------------------------------------

KMV_K = 128
_KMV_A = "'1-URGENT'"
_KMV_B = "'5-LOW'"
_U32_SPAN = 4294967296.0  # 2^32: h32 range, for the (k-1)/kth_min estimator


@register(
    "q_kmv_set_overlap",
    oracle=f"""
WITH keys AS (
  SELECT DISTINCT o_orderpriority AS grp, o_custkey,
         ('0x' || substr(md5(o_custkey::VARCHAR), 1, 8))::BIGINT AS hv
  FROM orders WHERE o_orderpriority IN ({_KMV_A}, {_KMV_B})
),
ka AS (
  SELECT hv FROM keys WHERE grp = {_KMV_A} ORDER BY hv LIMIT {KMV_K}
),
kb AS (
  SELECT hv FROM keys WHERE grp = {_KMV_B} ORDER BY hv LIMIT {KMV_K}
),
ku AS (
  SELECT hv FROM (SELECT hv FROM ka UNION SELECT hv FROM kb)
  ORDER BY hv LIMIT {KMV_K}
),
stats AS (
  SELECT (SELECT MAX(hv) FROM ku) AS kth_u,
         (SELECT COUNT(*) FROM ku
          WHERE hv IN (SELECT hv FROM ka) AND hv IN (SELECT hv FROM kb))
           AS n_both
),
exact AS (
  SELECT COUNT(*) AS n_inter FROM (
    SELECT o_custkey FROM orders WHERE o_orderpriority = {_KMV_A}
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = {_KMV_B}
  )
)
SELECT exact.n_inter AS exact_overlap,
       stats.n_both AS sketch_agreement,
       ROUND(({KMV_K} - 1) * {_U32_SPAN} / stats.kth_u, 2) AS union_estimate,
       ROUND(stats.n_both * 1.0 / {KMV_K}
             * (({KMV_K} - 1) * {_U32_SPAN} / stats.kth_u), 2)
         AS overlap_estimate
FROM stats CROSS JOIN exact
""",
)
def q_kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketches with SET ALGEBRA — the capability
    HLL lacks: each side keeps its {KMV_K} smallest distinct-key hashes;
    the union sketch is the k smallest of the merged sketches, the union
    cardinality estimate is (k-1)*2^32/kth_min, and the overlap estimate
    scales that by the fraction of union-sketch values present in BOTH
    sides (Beyer et al., SIGMOD'07). Integer hashes + two divisions —
    bit-portable like the HLL/CMS siblings.

    Scale shape: per-side sketch = orderBy+limit on distinct hashes
    (TakeOrderedAndProject: per-partition heaps of k, no full sort);
    sketches are k values — shippable, mergeable, and intersectable
    without ever joining the underlying key sets (estimating overlap of
    two 100 TB corpora from two 1 KB sketches)."""
    orders = load(spark, sf_dir, "orders")
    keys = (
        orders.where(
            F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
        )
        .select("o_orderpriority", "o_custkey")
        .distinct()
        .select(
            F.col("o_orderpriority").alias("grp"),
            h32(F.col("o_custkey").cast("string")).alias("hv"),
        )
    )
    ka = keys.where(F.col("grp") == "1-URGENT").select("hv").orderBy("hv").limit(KMV_K)
    kb = keys.where(F.col("grp") == "5-LOW").select("hv").orderBy("hv").limit(KMV_K)
    ku = ka.union(kb).distinct().orderBy("hv").limit(KMV_K)
    both = (
        ku.join(ka.withColumnRenamed("hv", "ha"), ku.hv == F.col("ha"), "left_semi")
        .join(kb.withColumnRenamed("hv", "hb"), F.col("hv") == F.col("hb"), "left_semi")
    )
    kth_u = ku.agg(F.max("hv").alias("kth_u"))
    n_both = both.agg(F.count(F.lit(1)).alias("n_both"))
    a_keys = orders.where(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    b_keys = orders.where(F.col("o_orderpriority") == "5-LOW").select("o_custkey")
    exact = (
        a_keys.intersect(b_keys)
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    union_est = (KMV_K - 1) * _U32_SPAN / F.col("kth_u")
    return (
        exact.crossJoin(F.broadcast(n_both))
        .crossJoin(F.broadcast(kth_u))
        .select(
            "exact_overlap",
            F.col("n_both").alias("sketch_agreement"),
            F.round(union_est, 2).alias("union_estimate"),
            F.round(F.col("n_both") * 1.0 / KMV_K * union_est, 2).alias(
                "overlap_estimate"
            ),
        )
    )


# ----------------------------------------------------- quantile sketch

QSK_BINW = 131072           # bin width in integer cents (2^17 ~ $1310)
QSK_PCTS = [25, 50, 75, 90, 99]


@register(
    "q_quantile_sketch",
    oracle=f"""
WITH cents AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c FROM lineitem
),
bins AS (
  SELECT c // {QSK_BINW} AS bin, COUNT(*) AS cnt FROM cents GROUP BY 1
),
cum AS (
  SELECT bin, cnt,
         SUM(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum,
         (SELECT COUNT(*) FROM cents) AS n
  FROM bins
),
pcts(p) AS (VALUES {', '.join(f'({p})' for p in QSK_PCTS)}),
targets AS (
  SELECT p, (p * n + 99) // 100 AS tgt, n
  FROM pcts CROSS JOIN (SELECT COUNT(*) AS n FROM cents) t
),
est AS (
  SELECT t.p, t.n, c.bin,
         ROUND(c.bin * {QSK_BINW}
               + {QSK_BINW} * 1.0 * (t.tgt - (c.cum - c.cnt)) / c.cnt,
               4) AS est_cents
  FROM targets t JOIN cum c
    ON c.cum >= t.tgt AND c.cum - c.cnt < t.tgt
),
exact AS (
  SELECT unnest([{', '.join(str(p) for p in QSK_PCTS)}]) AS p,
         unnest(qs) AS ex
  FROM (
    SELECT quantile_cont(
             c, [{', '.join(str(p / 100.0) for p in QSK_PCTS)}]) AS qs
    FROM cents
  )
)
SELECT e.p, CAST(e.n AS BIGINT) AS n, CAST(e.bin AS BIGINT) AS bin,
       e.est_cents,
       CASE WHEN ABS(e.est_cents - x.ex) <= {QSK_BINW} THEN 1 ELSE 0
       END AS within_bound
FROM est e JOIN exact x USING (p)
ORDER BY e.p
""",
)
def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable fixed-bin quantile sketch (the HLL/CMS/KMV sibling for
    percentiles): one map-side-combinable pass counts integer-cent
    prices into equi-width bins of {QSK_BINW} cents; any quantile is
    then answered from the (tiny, mergeable) bin table by cumulative
    walk + in-bin linear interpolation, with rated error = one bin
    width. Like the other portable sketches, the ESTIMATES themselves
    hash-match DuckDB (every input to the interpolation is an exact
    integer — bin id, target rank, cumulative counts — and the single
    division is ROUNDed), while each engine checks the rated-error
    contract against its own exact quantile and exports only the 0/1
    verdict (exact interpolated percentiles are definition-sensitive;
    the +-{QSK_BINW} slack is orders wider than any definitional gap).

    Scale shape: the sketch build is a hash aggregate on the bin id —
    O(bins) state per partition, single shuffle of bin partials; the
    quantile extraction runs on the bin table (metadata-sized) no
    matter how big the fact is. Equi-width-on-cents is the honest
    trade: rated absolute error, no data-dependent bin boundaries to
    re-sample (production alternatives — t-digest/KLL — buy relative
    error with mergeable data-dependent centroids; the engine's
    percentile_approx path in q_approx_sketches covers that family)."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select(
        F.round(F.col("l_extendedprice") * 100).cast("bigint").alias("c")
    )
    bins = li.groupBy(F.expr(f"c div {QSK_BINW}").alias("bin")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.withColumn("cum", F.sum("cnt").over(w))
    n_exact = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile(
            "c", F.array(*[F.lit(p / 100.0) for p in QSK_PCTS])
        ).alias("ex"),
    )
    pcts = spark.range(1).select(
        F.explode(F.array(*[F.lit(p) for p in QSK_PCTS])).alias("p")
    )
    targets = pcts.crossJoin(F.broadcast(n_exact)).select(
        "p",
        "n",
        F.expr("(p * n + 99) div 100").alias("tgt"),
        F.element_at(
            F.col("ex"),
            F.array_position(
                F.array(*[F.lit(p) for p in QSK_PCTS]), F.col("p")
            ).cast("int"),
        ).alias("ex_p"),
    )
    est = targets.join(
        F.broadcast(cum),
        (F.col("cum") >= F.col("tgt")) & (F.col("cum") - F.col("cnt") < F.col("tgt")),
    ).select(
        "p",
        F.col("n").cast("bigint").alias("n"),
        F.col("bin").cast("bigint").alias("bin"),
        F.round(
            F.col("bin") * QSK_BINW
            + QSK_BINW * 1.0 * (F.col("tgt") - (F.col("cum") - F.col("cnt")))
            / F.col("cnt"),
            4,
        ).alias("est_cents"),
        "ex_p",
    )
    return est.select(
        "p", "n", "bin", "est_cents",
        F.when(
            F.abs(F.col("est_cents") - F.col("ex_p")) <= QSK_BINW, F.lit(1)
        ).otherwise(F.lit(0)).alias("within_bound"),
    ).orderBy("p")


# ------------------------------------------------- native DataSketches

@register(
    "q_native_sketches",
    oracle="""
WITH freq AS (
  SELECT l_returnflag, l_suppkey, COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2
),
mx AS (SELECT l_returnflag, MAX(c) AS maxfreq FROM freq GROUP BY 1)
SELECT l.l_returnflag,
       COUNT(*) AS n,
       COUNT(DISTINCT l.l_partkey) AS nd,
       CAST(m.maxfreq AS BIGINT) AS maxfreq,
       1 AS hll_ok, 1 AS theta_ok, 1 AS topk_ok
FROM lineitem l JOIN mx m USING (l_returnflag)
GROUP BY l.l_returnflag, m.maxfreq
ORDER BY l.l_returnflag
""",
)
def q_native_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's NATIVE Apache DataSketches surface (the industrial twin
    of the from-scratch portable sketches above): per return flag, an
    HLL sketch (lgK=12) and a Theta sketch estimate the distinct part
    count, and approx_top_k (tracking far more items than exist, so its
    counts are exact by the sketch's own contract) recovers the hottest
    supplier's frequency. The exact columns (n, distinct, max
    frequency) hash-check; each sketch estimate is asserted within its
    RATED bound as an integer-only 0/1 flag — HLL relative error
    1.04/sqrt(2^12), Theta 1/sqrt(4096 nominal entries), both at 3
    sigma, checked as abs(est-nd)*1000 <= bound*nd so no float enters
    the gate. The oracle states the exact values and flags=1: any
    out-of-contract estimate hash-mismatches the gate.

    Scale shape: sketches are mergeable aggregate states (that is their
    point) — partial sketches per partition, one shuffle of
    kilobyte-sized states per group; the binary sketch columns also
    union/intersect across datasets (theta_union etc.) without
    re-scanning — the HLL/KMV algebra the portable queries build by
    hand, JVM-native here."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_partkey", "l_suppkey"
    )
    freq = li.groupBy("l_returnflag", "l_suppkey").agg(
        F.count(F.lit(1)).alias("c")
    )
    mx = freq.groupBy("l_returnflag").agg(F.max("c").alias("maxfreq"))
    agg = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("l_partkey").alias("nd"),
        F.expr("hll_sketch_estimate(hll_sketch_agg(l_partkey, 12))").alias(
            "hll_est"
        ),
        F.expr("theta_sketch_estimate(theta_sketch_agg(l_partkey))").alias(
            "theta_est"
        ),
        F.expr("approx_top_k(l_suppkey, 1, 100000)")[0]["count"].alias(
            "top1_count"
        ),
    )
    return (
        agg.join(F.broadcast(mx), "l_returnflag")
        .select(
            "l_returnflag",
            "n",
            "nd",
            F.col("maxfreq").cast("bigint").alias("maxfreq"),
            # 3-sigma rated bounds, integer arithmetic only:
            # HLL lgK=12: 3*1.04/64 = 4.875% -> 49/1000
            F.when(
                F.abs(F.col("hll_est") - F.col("nd")) * 1000
                <= 49 * F.col("nd"),
                F.lit(1),
            ).otherwise(F.lit(0)).alias("hll_ok"),
            # Theta nominal 4096: 3/64 = 4.7% -> 47/1000
            F.when(
                F.abs(F.col("theta_est") - F.col("nd")) * 1000
                <= 47 * F.col("nd"),
                F.lit(1),
            ).otherwise(F.lit(0)).alias("theta_ok"),
            F.when(F.col("top1_count") == F.col("maxfreq"), F.lit(1))
            .otherwise(F.lit(0)).alias("topk_ok"),
        )
        .orderBy("l_returnflag")
    )


# ------------------------------------------- sliding distinct via HLL merge

@register(
    "q_sliding_distinct_hll",
    oracle="""
WITH du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
  FROM events
),
days AS (SELECT DISTINCT day FROM du),
contrib AS (
  SELECT du.day + CAST(k.k AS INTEGER) AS target_day, du.user_id
  FROM du CROSS JOIN (SELECT unnest(generate_series(0, 6)) AS k) k
),
exact AS (
  SELECT d.day, COUNT(DISTINCT c.user_id) AS exact_users
  FROM days d JOIN contrib c ON c.target_day = d.day
  GROUP BY d.day
)
SELECT day, exact_users, 1 AS hll_ok
FROM exact ORDER BY day
""",
)
def q_sliding_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day DISTINCT USERS per day — the classic "you cannot
    pre-aggregate a distinct" problem, solved the way streaming
    analytics platforms do: ONE daily HLL sketch per day (a mergeable
    kilobyte state), any window answered by UNIONING the daily sketches
    — here a RANGE window over day number, so the fact table is scanned
    once regardless of how many window shapes are asked. The exact
    column is computed the expensive way (each day-user pair exploded
    into the 7 windows it serves — a 7x blowup the sketch path avoids)
    and hash-checked; the sketch estimate is asserted within the
    lgK=14 rated bound (3 * 1.04/sqrt(2^14) < 2.5%) as an
    integer-arithmetic 0/1 flag.

    Scale: daily sketch build is a map-side-combinable aggregate
    (kilobytes per day-partition); window merges touch only the
    day-grain sketch table. This is the continuous-aggregate pattern
    for distinct counts: store sketches at the finest grain, merge to
    any coarser window without rescanning facts."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    du = ev.select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    ).distinct()
    daily = du.groupBy("day").agg(
        F.expr("hll_sketch_agg(user_id, 14)").alias("hs")
    ).withColumn("dnum", F.datediff("day", F.lit("1970-01-01")))
    w = Window.orderBy("dnum").rangeBetween(-6, 0)
    est = daily.select(
        "day", F.expr("hll_union_agg(hs)").over(w).alias("ms")
    ).select("day", F.expr("hll_sketch_estimate(ms)").alias("est"))
    contrib = du.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("k"), "day", "user_id"
    ).select(F.date_add("day", F.col("k")).alias("day"), "user_id")
    exact = (
        daily.select("day")
        .join(contrib, "day")
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("exact_users"))
    )
    return (
        exact.join(est, "day")
        .select(
            "day",
            "exact_users",
            F.when(
                F.abs(F.col("est") - F.col("exact_users")) * 1000
                <= 25 * F.col("exact_users"),
                F.lit(1),
            ).otherwise(F.lit(0)).alias("hll_ok"),
        )
        .orderBy("day")
    )


# ------------------------------------------------ theta sketch set algebra

THETA_SPLIT = "1995-06-01"  # early/late shipment halves


@register(
    "q_theta_set_algebra",
    oracle=f"""
WITH a AS (
  SELECT DISTINCT l_partkey FROM lineitem
  WHERE l_shipdate < TIMESTAMP '{THETA_SPLIT}'
),
b AS (
  SELECT DISTINCT l_partkey FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{THETA_SPLIT}'
)
SELECT (SELECT COUNT(*) FROM a) AS n_a,
       (SELECT COUNT(*) FROM b) AS n_b,
       (SELECT COUNT(*) FROM a WHERE l_partkey IN (SELECT l_partkey FROM b))
         AS n_inter,
       (SELECT COUNT(*) FROM a WHERE l_partkey NOT IN (SELECT l_partkey FROM b))
         AS n_only_a,
       1 AS union_ok, 1 AS inter_ok, 1 AS diff_ok
""",
)
def q_theta_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-dataset set algebra WITHOUT co-shuffling the datasets: Theta
    sketches (unlike HLL) support union AND intersection AND difference
    on their compact states, so "how many part keys do the early and
    late halves share" is answered from two kilobyte sketches built in
    independent scans — the dedup-planning / audience-overlap primitive
    (the portable KMV query builds the same algebra by hand; this is
    the JVM DataSketches-native form). Exact set sizes (computed the
    expensive way: distinct + semi/anti joins) hash-check; the union /
    intersection / A-minus-B estimates are asserted within 10% OF THE
    UNION SIZE — set-operation sketch error is rated against the input
    cardinalities (~1/sqrt(4096) of the union at 1 sigma), never the
    result size, which can be arbitrarily small or zero — verified to
    hold at both sf0.01 (exact mode: sketches below nominal entries are
    EXACT) and sf0.1 (estimation mode).

    Scale: each side is one scan + one sketch aggregate; the algebra is
    a driver-sized cross of two 1-row frames. Adding a third dataset is
    another scan, not another join."""
    li = load(spark, sf_dir, "lineitem").select("l_partkey", "l_shipdate")
    split = F.lit(THETA_SPLIT).cast("timestamp")
    a = li.where(F.col("l_shipdate") < split)
    b = li.where(F.col("l_shipdate") >= split)
    sa = a.agg(F.expr("theta_sketch_agg(l_partkey)").alias("ta"))
    sb = b.agg(F.expr("theta_sketch_agg(l_partkey)").alias("tb"))
    est = sa.crossJoin(sb).select(
        F.expr("theta_sketch_estimate(theta_union(ta, tb))").alias("e_union"),
        F.expr("theta_sketch_estimate(theta_intersection(ta, tb))").alias(
            "e_inter"
        ),
        F.expr("theta_sketch_estimate(theta_difference(ta, tb))").alias(
            "e_diff"
        ),
    )
    da = a.select("l_partkey").distinct()
    db = b.select("l_partkey").distinct()
    exact = (
        da.agg(F.count(F.lit(1)).alias("n_a"))
        .crossJoin(db.agg(F.count(F.lit(1)).alias("n_b")))
        .crossJoin(
            da.join(db, "l_partkey", "left_semi").agg(
                F.count(F.lit(1)).alias("n_inter")
            )
        )
        .crossJoin(
            da.join(db, "l_partkey", "left_anti").agg(
                F.count(F.lit(1)).alias("n_only_a")
            )
        )
    )

    # The rated error of an intersection/difference estimate scales with
    # the INPUT set sizes, not the (possibly tiny or zero) result size —
    # a result-relative bound would demand an exactly-zero estimate of an
    # empty difference, a latent data-dependent gate failure. All three
    # flags are therefore bounded at 10% of the UNION cardinality
    # (integer arithmetic only; generous vs the ~4.7% 3-sigma rate).
    union_exact = F.col("n_a") + F.col("n_b") - F.col("n_inter")

    def ok(est_col: str, exact_col) -> Column:
        return (
            F.when(
                F.abs(F.col(est_col) - exact_col) * 100 <= 10 * union_exact,
                F.lit(1),
            )
            .otherwise(F.lit(0))
        )

    return exact.crossJoin(est).select(
        "n_a", "n_b", "n_inter", "n_only_a",
        ok("e_union", union_exact).alias("union_ok"),
        ok("e_inter", F.col("n_inter")).alias("inter_ok"),
        ok("e_diff", F.col("n_only_a")).alias("diff_ok"),
    )
