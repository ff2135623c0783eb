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
        # the source is a groupBy on the merge key — unique by
        # construction, so skip the eager multiple-matches probe and
        # keep query construction action-free (lazy-plan contract)
        validate_source_unique=False,
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


# ---------------------------------------------------------- delta-join IVM

IVM_SPLIT_DATE = "1996-01-01"  # orders on/after this date are the "delta"
IVM_NEW_CUST_MOD = 50          # customers with key % 50 == 0 are the "delta"


@register(
    "q_delta_join_ivm",
    oracle=f"""
SELECT c.c_mktsegment,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS total_cents,
       CAST(SUM(CASE WHEN o.o_orderdate <  TIMESTAMP '{IVM_SPLIT_DATE}'
                 AND c.c_custkey % {IVM_NEW_CUST_MOD} <> 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_old_old,
       CAST(SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{IVM_SPLIT_DATE}'
                 AND c.c_custkey % {IVM_NEW_CUST_MOD} <> 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_dr_s,
       CAST(SUM(CASE WHEN o.o_orderdate <  TIMESTAMP '{IVM_SPLIT_DATE}'
                 AND c.c_custkey % {IVM_NEW_CUST_MOD} = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_r_ds,
       CAST(SUM(CASE WHEN o.o_orderdate >= TIMESTAMP '{IVM_SPLIT_DATE}'
                 AND c.c_custkey % {IVM_NEW_CUST_MOD} = 0
                THEN 1 ELSE 0 END) AS BIGINT) AS n_dr_ds
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
ORDER BY c.c_mktsegment
""",
)
def q_delta_join_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance for a JOIN view — the CDC-pipeline
    algebra: with R split into (R_old, dR) and S into (S_old, dS), the
    refreshed view (R_old+dR) |><| (S_old+dS) is maintained as
    R_old|><|S_old  UNION ALL  dR|><|S_old  UNION ALL  R_old|><|dS
    UNION ALL  dR|><|dS — three DELTA-sized joins instead of one full
    recompute (the companion to q_incremental_agg, which maintains
    aggregation states the same way). The Spark plan genuinely executes
    the four-branch union (orders split by date, customers split by a
    key mod); the oracle is the monolithic full join — the gate proves
    the incremental algebra loses and fabricates nothing, including the
    per-branch counts that certify the four branches are disjoint and
    exhaustive.

    Determinism: money folds as exact integer cents (the q_decimal_exact
    discipline) so no float-order slack; everything else is counts.

    Scale shape: in production R_old|><|S_old is the stored view (not
    recomputed); the three maintenance joins are delta x full — the dR
    side is a day's partition (partition-pruned scan), and dS is
    CDC-sized, broadcast when small. Here all four branches run to
    prove equality; the branches share the two scans (Spark reuses the
    exchange under AQE)."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
    )
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    split = F.lit(IVM_SPLIT_DATE).cast("timestamp")
    r_old = orders.where(F.col("o_orderdate") < split)
    d_r = orders.where(F.col("o_orderdate") >= split)
    s_old = cust.where(F.col("c_custkey") % IVM_NEW_CUST_MOD != 0)
    d_s = cust.where(F.col("c_custkey") % IVM_NEW_CUST_MOD == 0)

    def branch(o: DataFrame, c: DataFrame, tag: str) -> DataFrame:
        return o.join(c, o.o_custkey == c.c_custkey).select(
            "c_mktsegment", "cents", F.lit(tag).alias("branch")
        )

    unioned = (
        branch(r_old, s_old, "old_old")
        .unionByName(branch(d_r, s_old, "dr_s"))
        .unionByName(branch(r_old, d_s, "r_ds"))
        .unionByName(branch(d_r, d_s, "dr_ds"))
    )
    return (
        unioned.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("bigint").alias("total_cents"),
            F.sum(F.when(F.col("branch") == "old_old", 1).otherwise(0)).alias(
                "n_old_old"
            ),
            F.sum(F.when(F.col("branch") == "dr_s", 1).otherwise(0)).alias(
                "n_dr_s"
            ),
            F.sum(F.when(F.col("branch") == "r_ds", 1).otherwise(0)).alias(
                "n_r_ds"
            ),
            F.sum(F.when(F.col("branch") == "dr_ds", 1).otherwise(0)).alias(
                "n_dr_ds"
            ),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Snapshot diff audit (round 8): added / removed / changed / unchanged
# between two corpus versions, by content hash
# ---------------------------------------------------------------------------


@register(
    "q_snapshot_diff",
    oracle="""
WITH a AS (
  SELECT doc_id, source, md5(text) AS h FROM documents
),
b AS (
  -- the simulated next crawl: %10=3 dropped, %10=7 re-crawled with new
  -- content, %5=0 re-ingested under a NEW id (id churn shows up as
  -- add+remove — exactly what a content-hash-aware diff must expose)
  SELECT CASE WHEN doc_id % 5 = 0 THEN doc_id + 1000000
              ELSE doc_id END AS doc_id,
         source,
         CASE WHEN doc_id % 10 = 7 THEN md5(text || ' updated')
              ELSE md5(text) END AS h
  FROM documents WHERE doc_id % 10 <> 3
),
d AS (
  SELECT COALESCE(a.source, b.source) AS source,
         CASE WHEN a.doc_id IS NULL THEN 'added'
              WHEN b.doc_id IS NULL THEN 'removed'
              WHEN a.h <> b.h THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM a FULL OUTER JOIN b ON a.doc_id = b.doc_id
)
SELECT source, status, CAST(COUNT(*) AS BIGINT) AS n
FROM d GROUP BY source, status
ORDER BY source, status
""",
)
def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff between two corpus versions — the audit a data
    release runs against its predecessor: rows are classified
    added / removed / changed / unchanged by joining on the stable id
    and comparing CONTENT HASHES (md5 of text), so a re-crawl that
    changed bytes is 'changed' even though the id survived, and id
    churn (same content re-ingested under a new id) honestly shows as
    an add+remove pair rather than being silently absorbed. The second
    snapshot is a deterministic simulation over the fixture (drops,
    content updates, id churn — the three real crawl-to-crawl events).

    Scale shape: one full outer join on the id (hash-uniform) with
    per-side md5 computed in-row, one combinable aggregate. Pairs with
    the COW time-travel surface: cow_changes diffs FILE manifests;
    this diffs LOGICAL content."""
    docs = load(spark, sf_dir, "documents")
    a = docs.select("doc_id", "source", F.md5("text").alias("h"))
    b = (
        docs.where(F.col("doc_id") % 10 != 3)
        .select(
            F.when(
                F.col("doc_id") % 5 == 0, F.col("doc_id") + 1000000
            )
            .otherwise(F.col("doc_id"))
            .alias("doc_id"),
            "source",
            F.when(
                F.col("doc_id") % 10 == 7,
                F.md5(F.concat(F.col("text"), F.lit(" updated"))),
            )
            .otherwise(F.md5("text"))
            .alias("h"),
        )
    )
    d = a.alias("a").join(
        b.alias("b"), F.col("a.doc_id") == F.col("b.doc_id"), "full_outer"
    )
    status = (
        F.when(F.col("a.doc_id").isNull(), "added")
        .when(F.col("b.doc_id").isNull(), "removed")
        .when(F.col("a.h") != F.col("b.h"), "changed")
        .otherwise("unchanged")
    )
    return (
        d.select(
            F.coalesce(F.col("a.source"), F.col("b.source")).alias("source"),
            status.alias("status"),
        )
        .groupBy("source", "status")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("source", "status")
    )
