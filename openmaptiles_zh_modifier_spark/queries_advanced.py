"""Advanced operator queries: as-of join (custom operator) and pivot.

The as-of oracle uses DuckDB's native ASOF JOIN, so the gate proves our
union+window construction implements the standard backward-inclusive
semantics exactly."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.operators.asof_join import asof_join
from openmaptiles_zh_modifier_spark.registry import load, register


@register(
    "q_asof_click_purchase",
    oracle="""
WITH clicks AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
),
purchases AS (
  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
),
-- deterministic pick among same-(user, ts) purchases: largest event_id
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM purchases
),
dedup AS (SELECT user_id, ts, event_id, value FROM ranked WHERE rn = 1)
SELECT c.user_id, c.ts, c.event_id,
       p.event_id AS asof_event_id,
       ROUND(p.value, 4) AS asof_value
FROM clicks c
ASOF LEFT JOIN dedup p ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.user_id, c.ts, c.event_id
""",
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's most recent purchase at-or-before it.
    One shuffle on user_id; compare with DuckDB's native ASOF JOIN."""
    ev = load(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    out = asof_join(
        clicks,
        purchases,
        on="user_id",
        ts="ts",
        payload_cols=["event_id", "value"],
        tiebreak="event_id",
    )
    return out.select(
        "user_id",
        "ts",
        "event_id",
        "asof_event_id",
        F.round("asof_value", 4).alias("asof_value"),
    ).orderBy("user_id", "ts", "event_id")


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@register(
    "q_pivot_user_activity",
    oracle=f"""
SELECT user_id,
       {", ".join(
           f"COUNT(*) FILTER (event_type = '{t}') AS n_{t}, "
           f"ROUND(COALESCE(SUM(value) FILTER (event_type = '{t}'), 0), 2) AS sum_{t}"
           for t in _EVENT_TYPES)}
FROM events
GROUP BY user_id
ORDER BY user_id
""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event types into per-user columns. Explicit value list (no
    extra distinct-scan job) keeps it one shuffle; Catalyst plans pivot as
    a single aggregate with one expression pair per pivot value."""
    ev = load(spark, sf_dir, "events")
    pivoted = (
        ev.groupBy("user_id")
        .pivot("event_type", _EVENT_TYPES)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.coalesce(F.sum("value"), F.lit(0.0)), 2).alias("sum"),
        )
    )
    # pivot names columns "<value>_<alias>"; normalize + fill count nulls
    cols = [F.col("user_id")]
    for t in _EVENT_TYPES:
        cols.append(F.coalesce(F.col(f"{t}_n"), F.lit(0)).alias(f"n_{t}"))
        cols.append(F.coalesce(F.col(f"{t}_sum"), F.lit(0.0)).alias(f"sum_{t}"))
    return pivoted.select(*cols).orderBy("user_id")


@register(
    "q_pit_feature_join",
    oracle="""
WITH purchases AS (
  SELECT user_id, ts, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
cum AS (
  SELECT user_id, ts, event_id,
         COUNT(*) OVER w AS cum_n,
         SUM(cents) OVER w AS cum_cents
  FROM purchases
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING)
),
-- one feature-state row per (user, ts): the LAST update at that instant
state AS (
  SELECT user_id, ts, cum_n, cum_cents FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, ts
                                 ORDER BY event_id DESC) AS rn
    FROM cum
  ) WHERE rn = 1
),
clicks AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
)
SELECT c.user_id, c.event_id,
       CAST(COALESCE(s.cum_n, 0) AS BIGINT) AS n_prior_purchases,
       CAST(COALESCE(s.cum_cents, 0) AS BIGINT) AS prior_spend_cents
FROM clicks c
ASOF LEFT JOIN state s ON c.user_id = s.user_id AND c.ts >= s.ts
ORDER BY c.user_id, c.event_id
""",
)
def q_pit_feature_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct feature join — the feature-store primitive
    that keeps training data leakage-free: every click is enriched with
    the user's purchase-derived features (lifetime purchase count and
    spend) EXACTLY as they stood at the click's timestamp, never a
    byte from the future. Mechanically: the purchase stream becomes a
    feature CHANGE LOG (running aggregates per update, collapsed to one
    state row per (user, instant)), and the as-of machinery
    (operators/asof_join.py — union + tag + running-last, one shuffle
    on the key) picks each click's latest state at-or-before it. The
    oracle is DuckDB's native ASOF JOIN over the same state log, so the
    gate proves backward-inclusive PIT semantics exactly.

    Determinism: features fold as exact integer cents in a ROWS frame
    (running accumulation, not an unordered SUM) and ties at one
    instant collapse by event_id before the join.

    Scale shape: the change log is a window over purchases (one shuffle
    on user_id) and the PIT join is the same single-shuffle as-of sort
    — this is precisely the plan a feature platform runs nightly at
    fact-table scale; clicks with no history stay NULL-side and
    COALESCE to zero-state instead of being dropped (left semantics)."""
    from pyspark.sql import Window

    from openmaptiles_zh_modifier_spark.operators.asof_join import asof_join

    ev = load(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = purchases.select(
        "user_id", "ts", "event_id",
        F.count(F.lit(1)).over(w).alias("cum_n"),
        F.sum("cents").over(w).alias("cum_cents"),
    )
    w_last = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    state = (
        cum.withColumn("rn", F.row_number().over(w_last))
        .where(F.col("rn") == 1)
        .select("user_id", "ts", "cum_n", "cum_cents")
    )
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join(
        clicks,
        state,
        on="user_id",
        ts="ts",
        payload_cols=["cum_n", "cum_cents"],
        tiebreak="cum_n",
    )
    return joined.select(
        "user_id",
        "event_id",
        F.coalesce("asof_cum_n", F.lit(0)).cast("bigint").alias(
            "n_prior_purchases"
        ),
        F.coalesce("asof_cum_cents", F.lit(0)).cast("bigint").alias(
            "prior_spend_cents"
        ),
    ).orderBy("user_id", "event_id")
