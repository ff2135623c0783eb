"""Event-stream analytics in batch form (SURVEY.md §2.8 from_json, §2.9).

These are the BATCH versions of the streaming operators — identical column
expressions are reused by openmaptiles_zh_modifier_spark.streaming (the
Structured-Streaming layer), which is the point: batch-first delivery, one
expression set, two execution modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StructField, StructType

from openmaptiles_zh_modifier_spark.registry import load, register

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


@register(
    "q_events_from_json",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(json_extract_string(props, '$.k')::INT) AS BIGINT) AS sum_k,
       ROUND(AVG(value), 4) AS avg_value
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def q_from_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON prop extraction. ``from_json`` with an explicit schema (not
    schema_of_json — that would scan twice); stays in codegen."""
    ev = load(spark, sf_dir, "events")
    props_schema = StructType([StructField("k", IntegerType())])
    return (
        ev.withColumn("props_s", F.from_json("props", props_schema))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("props_s.k")).alias("sum_k"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("event_type")
    )


@register(
    "q_events_tumbling",
    oracle="""
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregation (batch form). The streaming form
    is `window(ts, '1 hour')` + watermark; same grouping expression."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", "ts").alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "q_events_sessionize",
    oracle=f"""
WITH seq AS (
  SELECT user_id, ts, event_id, value,
         epoch_us(ts) - LAG(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
marked AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN gap_us IS NULL OR gap_us > {SESSION_GAP_US} THEN 1 ELSE 0 END AS new_session
  FROM seq
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked
)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       COUNT(*) AS n_events,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       ROUND(SUM(value), 2) AS session_value
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap), batch form: lag-gap →
    cumulative-sum session ids. One shuffle on user_id shared by both
    windows. Streaming equivalent: session_window(ts, '30 minutes') —
    see streaming module. Gap arithmetic on integer microseconds
    (unix_micros) so Spark and the oracle agree exactly."""
    ev = load(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w_seq)
    return (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn(
            "new_session",
            F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(w_cum))
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


@register(
    "q_events_sliding",
    oracle="""
WITH w AS (
  SELECT make_timestamp((epoch_us(ts) // 1800000000 - k.k) * 1800000000)
             AS window_start,
         event_type, value
  FROM events, (VALUES (0), (1)) AS k(k)
)
SELECT window_start, event_type,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM w
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 1-hour window, 30-minute slide (batch form of the streaming
    hopping window). Spark's window() duplicates each row into the
    size/slide = 2 overlapping windows before the hash aggregate — the
    oracle does the same with an explicit 2-row cross join on epoch-aligned
    30-minute buckets. Streaming twin: identical expression + watermark."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "q_time_rollup",
    oracle="""
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       date_trunc('hour', ts) AS hour,
       GROUPING(date_trunc('hour', ts)) AS is_day_total,
       COUNT(*) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM events
GROUP BY ROLLUP(CAST(date_trunc('day', ts) AS TIMESTAMP), date_trunc('hour', ts))
HAVING GROUPING(CAST(date_trunc('day', ts) AS TIMESTAMP)) = 0
ORDER BY day, is_day_total, hour
""",
)
def q_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical time rollup: hour-grain aggregates
    plus day-level superaggregates in one pass via ROLLUP(day, hour) —
    the batch form of a continuous-aggregate maintenance job. One Expand
    + one hash aggregate; the HAVING drops only the single grand-total
    row. At 100 TB the same plan emits every rollup grain in one shuffle
    instead of one job per grain."""
    ev = load(spark, sf_dir, "events")
    pre = ev.select(
        F.date_trunc("day", "ts").alias("day"),
        F.date_trunc("hour", "ts").alias("hour"),
        "value",
    )
    return (
        pre.rollup("day", "hour")
        .agg(
            F.grouping("hour").cast("long").alias("is_day_total"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .where(F.grouping("day") == 0)
        .select("day", "hour", "is_day_total", "n", "sum_value")
        .orderBy("day", "is_day_total", "hour")
    )


@register(
    "q_locf_gapfill",
    oracle="""
WITH sparse AS (
  SELECT user_id, event_id, ts,
         CASE WHEN event_id % 5 = 0 THEN value END AS reading
  FROM events
)
SELECT user_id, event_id,
       ROUND(COALESCE(
         last_value(reading IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING),
         -1.0), 2) AS filled
FROM sparse
ORDER BY user_id, ts, event_id
""",
)
def q_locf_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: a sparse sensor reading (80% of
    rows NULL by construction) is forward-filled per user with
    last(..., ignorenulls) over a running row frame — the time-series
    gap-fill primitive. One shuffle on user_id; the running frame is
    incremental (no per-row rescan)."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sparse = ev.select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_id") % 5 == 0, F.col("value")).alias("reading"),
    )
    return (
        sparse.select(
            "user_id",
            "event_id",
            "ts",
            F.round(
                F.coalesce(
                    F.last("reading", ignorenulls=True).over(w), F.lit(-1.0)
                ),
                2,
            ).alias("filled"),
        )
        .orderBy("user_id", "ts", "event_id")
        .drop("ts")
    )


@register(
    "q_scd2_intervals",
    oracle="""
SELECT user_id, event_id,
       ts AS valid_from,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
       CASE WHEN lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                 IS NULL THEN 1 ELSE 0 END AS is_current,
       ROUND(value, 2) AS state_value
FROM events
ORDER BY user_id, valid_from, event_id
""",
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build: each change event opens a
    validity interval closed by the next change (lead over the per-key
    timeline; NULL valid_to marks the current row) — the CDC-to-dimension
    materialization every warehouse needs. One shuffle on the dimension
    key; both window functions share the single sort."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return (
        ev.select(
            "user_id",
            "event_id",
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            nxt.isNull().cast("long").alias("is_current"),
            F.round("value", 2).alias("state_value"),
        )
        .orderBy("user_id", "valid_from", "event_id")
    )


@register(
    "q_funnel_analysis",
    oracle="""
WITH s1 AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_view
  FROM events GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND s1.t_view IS NOT NULL AND e.ts > s1.t_view
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts > s2.t_click
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM s1 WHERE t_view IS NOT NULL) AS n_view,
       (SELECT COUNT(*) FROM s2) AS n_click_after_view,
       (SELECT COUNT(*) FROM s3) AS n_purchase_after_click
""",
)
def q_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-order funnel (view -> click -> purchase): each stage is a
    conditional MIN over events occurring after the user's previous-stage
    timestamp, so out-of-order events don't count — the event-analytics
    sequence-match operator. Three aggregate+join rounds, all keyed on
    user_id: with the events table bucketed (or AQE co-location) the
    per-stage joins reuse one partitioning and never reshuffle the big
    side."""
    ev = load(spark, sf_dir, "events")
    s1 = (
        ev.groupBy("user_id")
        .agg(F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"))
        .where(F.col("t_view").isNotNull())
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    r1 = s1.agg(F.count(F.lit(1)).alias("n_view"))
    r2 = s2.agg(F.count(F.lit(1)).alias("n_click_after_view"))
    r3 = s3.agg(F.count(F.lit(1)).alias("n_purchase_after_click"))
    return r1.crossJoin(r2).crossJoin(r3)


@register(
    "q_cohort_retention",
    oracle="""
WITH cohort AS (
  SELECT user_id,
         MIN(epoch_us(ts) // 86400000000) AS cohort_day
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
activity AS (
  SELECT DISTINCT e.user_id,
         c.cohort_day,
         epoch_us(e.ts) // 86400000000 - c.cohort_day AS day_offset
  FROM events e JOIN cohort c ON e.user_id = c.user_id
  WHERE epoch_us(e.ts) // 86400000000 >= c.cohort_day
)
SELECT cohort_day, day_offset, COUNT(*) AS n_active_users
FROM activity
GROUP BY cohort_day, day_offset
ORDER BY cohort_day, day_offset
""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by signup day, activity counted
    per day-offset from the cohort day — the retention-curve input table.
    Day arithmetic is integer epoch-day division on both engines (no
    timezone/date-type drift). Two shuffles on user_id (cohort min +
    join, which AQE co-locates), then the small (cohort, offset)
    aggregate."""
    ev = load(spark, sf_dir, "events")
    epoch_day = (F.unix_micros(F.col("ts")) / F.lit(86400000000)).cast("long")
    cohort = (
        ev.where(F.col("event_type") == "signup")
        .select("user_id", epoch_day.alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("cohort_day"))
    )
    activity = (
        ev.select("user_id", epoch_day.alias("d"))
        .join(cohort, "user_id")
        .where(F.col("d") >= F.col("cohort_day"))
        .select(
            "user_id",
            "cohort_day",
            (F.col("d") - F.col("cohort_day")).alias("day_offset"),
        )
        .distinct()
    )
    return (
        activity.groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active_users"))
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "q_latest_per_key",
    oracle="""
SELECT user_id, event_id AS latest_event, event_type AS latest_type,
       ROUND(value, 2) AS latest_value
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rk
  FROM events
)
WHERE rk = 1
ORDER BY user_id
""",
)
def q_latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins compaction (CDC upsert materialization): keep each
    key's most recent record by (ts, event_id) — the read-side collapse
    of an append-only changelog into current state. One shuffle on the
    key; at 100 TB this is the standing pattern for compacting upsert
    feeds without a transactional table format."""
    ev = load(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("latest_event"),
            F.col("event_type").alias("latest_type"),
            F.round("value", 2).alias("latest_value"),
        )
        .orderBy("user_id")
    )


# -------------------------------------------------------------------------
# Trailing time-range window features (RANGE frame on event time)
# -------------------------------------------------------------------------

TRAIL_US = 3_600_000_000  # 1 hour in microseconds


@register(
    "q_trailing_window",
    oracle=f"""
SELECT event_id, user_id,
       COUNT(*) OVER w AS n_1h,
       ROUND(SUM(value) OVER w, 2) AS sum_1h
FROM events
WINDOW w AS (
  PARTITION BY user_id ORDER BY epoch_us(ts)
  RANGE BETWEEN {TRAIL_US - 1} PRECEDING AND CURRENT ROW
)
ORDER BY event_id
""",
)
def q_trailing_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-1h activity features (count + spend sum over a
    RANGE frame on event time, per user) — the rolling-feature shape for
    fraud/abuse scoring and feature-store backfills.

    The frame key is integer epoch-microseconds (identical on both
    engines); events in the same hour but different micros never merge
    frames ambiguously. sum_1h rounds at 2 dp: window SUM may evaluate
    in segment-tree order in one engine and running order in the other,
    but value is 2-dp money whose sums sit ON the cent grid — 1e-12
    reduction noise cannot cross a .005 boundary.

    Scale shape: one shuffle on user_id, per-user sort by time — the
    partitioning every per-entity feature shares; frames are bounded by
    the time span so state never exceeds one user-hour of events. The
    streaming twin of this frame is a sliding window aggregate
    (q_stream_sliding) with watermark-bounded state."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-(TRAIL_US - 1), 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(w).alias("n_1h"),
            F.round(F.sum("value").over(w), 2).alias("sum_1h"),
        )
        .orderBy("event_id")
    )


# -------------------------------------------------------------------------
# Event-path transition matrix (first-order Markov over per-user sequences)
# -------------------------------------------------------------------------

@register(
    "q_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS to_type
  FROM events
),
cnt AS (
  SELECT from_type, to_type, COUNT(*) AS n
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT from_type, SUM(n) AS t FROM cnt GROUP BY 1)
SELECT c.from_type, c.to_type, c.n,
       FLOOR(1000000 * c.n / t.t) / 1000000 AS prob
FROM cnt c JOIN tot t USING (from_type)
ORDER BY from_type, to_type
""",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event paths:
    lead() pairs each event with its successor, transitions are counted,
    and row-stochastic probabilities derived per source state — the
    path-analysis primitive behind next-action prediction and UX-flow
    mining (funnel analysis is the special case of one fixed path).

    prob uses FLOOR-of-ppm, not ROUND: n/t is an exact rational that
    lands on round-half boundaries systematically (1/8000 = 0.000125),
    where the engines' half-up implementations diverge; floor of
    bit-identical doubles is tie-free.

    Scale shape: one shuffle on user_id + per-user time sort for lead()
    (shared with every other per-entity sequence feature), then a
    map-side-combinable count over at most |types|^2 keys — the
    transition matrix is tiny regardless of corpus size."""
    seq = load(spark, sf_dir, "events").select(
        "user_id",
        F.col("event_type").alias("from_type"),
        F.lead("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("to_type"),
    )
    cnt = (
        seq.where(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = cnt.groupBy("from_type").agg(F.sum("n").alias("t"))
    return (
        cnt.join(tot, "from_type")
        .select(
            "from_type",
            "to_type",
            "n",
            (F.floor(1000000 * F.col("n") / F.col("t")) / 1000000).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


# -------------------------------------------------------------------------
# Late-data audit (watermark simulation over arrival order)
# -------------------------------------------------------------------------

WATERMARK_US = 30 * 60 * 1_000_000  # 30 min, matches the streaming configs


@register(
    "q_late_data_audit",
    oracle=f"""
WITH arr AS (
  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
         MAX(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS high_water
  FROM events
)
SELECT user_id,
       COUNT(*) AS n_events,
       COUNT(*) FILTER (WHERE ts_us < high_water - {WATERMARK_US}) AS n_late,
       COALESCE(MAX(CASE WHEN ts_us < high_water - {WATERMARK_US}
                         THEN high_water - ts_us END), 0) AS worst_lateness_us
FROM arr
GROUP BY user_id
ORDER BY user_id
""",
)
def q_late_data_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark lateness audit: replaying events in arrival order
    (event_id), each row is compared against the running PER-KEY
    event-time high-water mark; rows older than high_water - 30min are
    flagged late. (A real stream's watermark is GLOBAL across keys — at
    least this key's high-water mark, usually higher — so an idealized
    row-by-row global watermark drops a SUPERSET of these rows; actual
    micro-batch watermarks advance only at batch boundaries and drop
    fewer. Treat the audit as a per-key lateness profile, not an exact
    drop count.) The per-user report (drop count + worst
    lateness) is how you SIZE a watermark before deploying the stream —
    run this batch audit over history, pick the delay that bounds
    drops.

    Integer microsecond arithmetic end-to-end. One shuffle on user_id +
    per-user sort by arrival — the same physical shape as every sequence
    feature, so at 100 TB it piggybacks on the shared partitioning."""
    hw = (
        F.max(F.unix_micros(F.col("ts")))
        .over(
            Window.partitionBy("user_id")
            .orderBy("event_id")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        .alias("high_water")
    )
    arr = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("ts_us"), hw
    )
    late = F.col("ts_us") < F.col("high_water") - WATERMARK_US
    return (
        arr.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_if(late).alias("n_late"),
            F.coalesce(
                F.max(F.when(late, F.col("high_water") - F.col("ts_us"))),
                F.lit(0),
            ).alias("worst_lateness_us"),
        )
        .orderBy("user_id")
    )


# -------------------------------------------------------------------------
# Map higher-order functions (transform_keys/values, map_filter, zip_with)
# -------------------------------------------------------------------------

@register(
    "q_map_hofs",
    oracle="""
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       COUNT(*) AS n_keys,
       COALESCE(array_to_string(
         list_sort(list(event_type || '=' || n) FILTER (WHERE n >= 20)),
         ','), '') AS busy_entries,
       array_to_string(list_sort(list(upper(event_type) || '=' || 3 * n)),
                       ',') AS tripled_entries
FROM c
GROUP BY user_id
ORDER BY user_id
""",
)
def q_map_hofs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed higher-order functions end-to-end: per-user event-type
    count MAPS are built with map_from_entries, then map_filter keeps
    busy types (>= 20), transform_values doubles, map_zip_with merges the
    original with the doubled map (tripling), and transform_keys
    uppercases — results normalized to sorted, comma-joined "k=v" entry
    STRINGS (scalar columns: the driver's canonicalizer pandas-sorts rows
    and cannot hash array cells) so the DuckDB oracle (whose map surface
    differs) states the same values relationally. Completes HOF coverage: arrays (q_array_functions),
    maps (here), folds (dot products), UDTF lateral.

    One map-side-combinable count + one groupBy per user — maps live
    entirely inside codegen expressions, never Python."""
    c = (
        load(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    m = F.map_from_entries(F.collect_list(F.struct("event_type", "n")))
    per_user = c.groupBy("user_id").agg(m.alias("m"))
    busy = F.map_filter(F.col("m"), lambda k, v: v >= 20)
    doubled = F.transform_values(F.col("m"), lambda k, v: v * 2)
    tripled = F.transform_keys(
        F.map_zip_with(
            F.col("m"),
            doubled,
            lambda k, v1, v2: F.coalesce(v1, F.lit(0)) + F.coalesce(v2, F.lit(0)),
        ),
        lambda k, v: F.upper(k),
    )

    def entries(mcol):
        return F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(mcol),
                    lambda e: F.concat(
                        e["key"], F.lit("="), e["value"].cast("string")
                    ),
                )
            ),
            ",",
        )

    return per_user.select(
        "user_id",
        F.size(F.map_keys("m")).cast("long").alias("n_keys"),
        entries(busy).alias("busy_entries"),
        entries(tripled).alias("tripled_entries"),
    ).orderBy("user_id")


# -------------------------------------------------------------------------
# Time-weighted average (trapezoidal, per user) — hypertable analytics
# -------------------------------------------------------------------------

@register(
    "q_time_weighted_avg",
    oracle="""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS t, value,
         LAG(epoch_us(ts)) OVER w AS pt,
         LAG(value)       OVER w AS pv
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
),
c AS (
  SELECT user_id, t,
         (value + pv) / 2.0 * (t - pt) AS contrib
  FROM e WHERE pt IS NOT NULL
),
agg AS (
  SELECT user_id,
         COUNT(*) + 1 AS n_events,
         list_reduce(list_prepend(0.0::DOUBLE,
                                  list(contrib ORDER BY t, contrib)),
                     (acc, x) -> acc + x) AS w_sum
  FROM c GROUP BY user_id
),
span AS (
  SELECT user_id, MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span
  FROM events GROUP BY user_id
)
SELECT a.user_id, a.n_events,
       ROUND(a.w_sum / s.span, 4) AS twa
FROM agg a JOIN span s ON a.user_id = s.user_id
WHERE s.span > 0
ORDER BY a.user_id
""",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trapezoidal time-weighted average of ``value`` per user — the
    hypertable analytic (TimescaleDB ``time_weight('Linear', ...)``)
    that plain AVG gets wrong on irregularly-sampled series: each
    interval contributes its midpoint value weighted by its duration,
    normalized by the user's observed span.

    Determinism: interval contributions are pure double arithmetic on
    integer epoch-micros deltas, identical per row on both engines; the
    per-user sum folds in time order (sorted-fold idiom, see
    q_pagerank_nations) so addition order cannot diverge; ties at the
    same timestamp order by event_id in the LAG window. ROUND 4 dp after
    the final division; single-event users (span 0) are excluded on
    BOTH sides.

    Scale shape: one shuffle on user_id shared by the LAG window and the
    aggregation — the per-entity partitioning every time-series feature
    uses; per-user state is bounded by that user's event count, and at
    100 TB the fold is an in-group sort, not a global one."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("user_id").orderBy(t, F.col("event_id"))
    e = ev.select(
        "user_id",
        t.alias("t"),
        "value",
        F.lag(t).over(w).alias("pt"),
        F.lag("value").over(w).alias("pv"),
    )
    c = e.where(F.col("pt").isNotNull()).select(
        "user_id",
        "t",
        ((F.col("value") + F.col("pv")) / 2.0 * (F.col("t") - F.col("pt"))).alias(
            "contrib"
        ),
    )
    agg = c.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).alias("n_events"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("t", "contrib"))),
            F.lit(0.0),
            lambda acc, x: acc + x["contrib"],
        ).alias("w_sum"),
    )
    span = ev.groupBy("user_id").agg(
        (F.max(t) - F.min(t)).alias("span")
    )
    return (
        agg.join(span, "user_id")
        .where(F.col("span") > 0)
        .select(
            "user_id",
            "n_events",
            F.round(F.col("w_sum") / F.col("span"), 4).alias("twa"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------- rolling med

ROLL_MED_N = 10  # trailing window width (rows)


@register(
    "q_rolling_median",
    oracle=f"""
WITH w AS (
  SELECT event_id, user_id,
         list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {ROLL_MED_N - 1} PRECEDING AND CURRENT ROW
         ) AS vs
  FROM events
)
SELECT event_id, user_id,
       CAST(len(vs) AS INTEGER) AS n_in_window,
       list_sort(vs)[(len(vs) + 1) // 2] AS rolling_median
FROM w
ORDER BY event_id
""",
)
def q_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact trailing-{ROLL_MED_N}-row median of ``value`` per user — the
    robust-smoothing window (sensor despiking, metric baselining) that
    mean-based rolling frames can't provide because one outlier drags the
    whole window. Median here is the LOWER median (sorted[(n+1)//2],
    1-indexed) so the result is always an ACTUAL observed value and no
    midpoint averaging enters (midpoints would be exact too, but the
    lower-median convention keeps the value attributable to a row).

    Neither engine has a native rolling median, and both get the same
    treatment: collect the frame into an array, sort, index — Spark
    ``sort_array(collect_list() over w)``, DuckDB ``list_sort(list()
    over w)``. Doubles are only MOVED (collected/sorted/picked), never
    summed, so there is no float-order hazard and no rounding is needed.

    Scale shape: one shuffle on user_id, one in-partition sort (the
    window's ORDER BY), then per-row O(N log N) on the FIXED window width
    — memory per row bounded by N, not by partition size. At 100 TB with
    wide windows, swap the per-row re-sort for a two-heap / indexable
    skiplist in an applyInPandas per key; the frame semantics (and this
    oracle) stay the test."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ROLL_MED_N - 1), 0)
    )
    vs = F.sort_array(F.collect_list("value").over(w))
    return (
        ev.select(
            "event_id",
            "user_id",
            F.size(vs).alias("n_in_window"),
            F.element_at(
                vs, ((F.size(vs) + 1) / 2).cast("int")
            ).alias("rolling_median"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------- debounce

DEBOUNCE_GAP_S = 600  # bursts = same (user, type) events < 10 min apart


@register(
    "q_event_debounce",
    oracle=f"""
WITH g AS (
  SELECT event_id, user_id, event_type, ts, value,
         CASE WHEN date_diff('second',
                 LAG(ts) OVER (PARTITION BY user_id, event_type
                               ORDER BY ts, event_id), ts)
                 < {DEBOUNCE_GAP_S}
              THEN 0 ELSE 1 END AS is_burst_start
  FROM events
),
b AS (
  SELECT *, SUM(is_burst_start) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
           ROWS UNBOUNDED PRECEDING) AS burst_id
  FROM g
),
k AS (
  SELECT user_id, event_type, burst_id,
         MAX(event_id) FILTER (WHERE is_burst_start = 1) AS kept_event_id,
         COUNT(*) AS burst_size,
         MIN(ts) AS burst_start
  FROM b GROUP BY 1, 2, 3
)
SELECT user_id, event_type, CAST(burst_id AS BIGINT) AS burst_id,
       kept_event_id, CAST(burst_size AS BIGINT) AS burst_size, burst_start
FROM k
ORDER BY user_id, event_type, burst_id
""",
)
def q_event_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Debounce / burst-collapse: same-(user, event_type) events closer
    than {DEBOUNCE_GAP_S}s chain into one burst; only the burst's first
    event is kept — the double-click / retry-storm / sensor-chatter
    suppressor every telemetry pipeline needs before counting anything.
    Formally: burst boundaries where the gap to the previous event >=
    {DEBOUNCE_GAP_S}s, burst id = running count of boundaries (the same
    lag+cumsum idiom as batch sessionization, applied to suppression).

    Determinism: gaps are integer seconds, ids are integers; nothing
    floating-point enters. The burst leader needs no argmin at all:
    exactly one row per burst carries is_burst_start=1 (its first, by
    the window's (ts, event_id) order), so a filtered MAX picks it.

    Scale shape: one shuffle on (user_id, event_type), two in-partition
    window passes over the same sort order (Catalyst runs both in a
    single Window stage), then a map-side-combinable burst aggregate on
    keys that share the window's partitioning — no second shuffle."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gap_s = (
        F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    )
    g = ev.withColumn(
        "is_burst_start",
        F.when(gap_s < DEBOUNCE_GAP_S, F.lit(0)).otherwise(F.lit(1)),
    )
    b = g.withColumn(
        "burst_id",
        F.sum("is_burst_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return (
        b.groupBy("user_id", "event_type", "burst_id")
        .agg(
            F.max(
                F.when(F.col("is_burst_start") == 1, F.col("event_id"))
            ).alias("kept_event_id"),
            F.count(F.lit(1)).cast("bigint").alias("burst_size"),
            F.min("ts").alias("burst_start"),
        )
        .select(
            "user_id", "event_type",
            F.col("burst_id").cast("bigint").alias("burst_id"),
            "kept_event_id", "burst_size", "burst_start",
        )
        .orderBy("user_id", "event_type", "burst_id")
    )


# ---------------------------------------------------------------- attribution

ATTR_LOOKBACK_H = 72  # clicks within 3 days before the purchase get credit


@register(
    "q_attribution",
    oracle=f"""
WITH p AS (
  SELECT user_id, event_id AS purchase_id, ts AS pts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
c AS (
  SELECT user_id, event_id AS click_id, ts AS cts
  FROM events WHERE event_type = 'click'
),
touch AS (
  SELECT p.purchase_id, p.user_id, p.cents, c.click_id, c.cts,
         ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                            ORDER BY c.cts ASC, c.click_id ASC) AS rn_first,
         ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                            ORDER BY c.cts DESC, c.click_id DESC) AS rn_last
  FROM p JOIN c
    ON c.user_id = p.user_id
   AND c.cts <= p.pts
   AND c.cts > p.pts - INTERVAL {ATTR_LOOKBACK_H} HOUR
)
SELECT purchase_id, user_id, cents,
       COUNT(*) AS n_touchpoints,
       MAX(CASE WHEN rn_first = 1 THEN click_id END) AS first_click_id,
       MAX(CASE WHEN rn_last = 1 THEN click_id END) AS last_click_id
FROM touch
GROUP BY purchase_id, user_id, cents
ORDER BY purchase_id
""",
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion attribution over a 72-hour lookback (ATTR_LOOKBACK_H):
    every purchase joined to the user's clicks in the window, reporting
    the touchpoint count plus the FIRST- and LAST-touch click — the
    marketing-analytics primitive (first/last/multi-touch models all
    read off this touch table; linear credit = cents/n_touchpoints is a
    projection away). Purchases with no preceding click are intentionally
    absent (unattributable — the standard convention).

    Determinism: the first/last election reuses the debounce trick —
    exactly one row per purchase carries rn=1 under each (ts, id) window
    order, so a filtered MAX picks it; no argmin/struct-compare needed
    cross-engine. Money is integer cents.

    Scale shape: the touch join is the watermarked stream-stream
    interval join's batch twin (q_stream_stream_join) — one shuffle on
    user_id with the time bound as a residual; both window passes and
    the final aggregate share the purchase_id partitioning (one more
    shuffle). Lookback bounds the per-user join fan-out exactly like
    the streaming state horizon."""
    ev = load(spark, sf_dir, "events")
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    touch = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") > F.col("pts") - F.expr(f"INTERVAL {ATTR_LOOKBACK_H} HOUR")),
    )
    w_first = Window.partitionBy("purchase_id").orderBy(
        F.asc("cts"), F.asc("click_id")
    )
    w_last = Window.partitionBy("purchase_id").orderBy(
        F.desc("cts"), F.desc("click_id")
    )
    return (
        touch.withColumn("rn_first", F.row_number().over(w_first))
        .withColumn("rn_last", F.row_number().over(w_last))
        .groupBy("purchase_id", "user_id", "cents")
        .agg(
            F.count(F.lit(1)).alias("n_touchpoints"),
            F.max(
                F.when(F.col("rn_first") == 1, F.col("click_id"))
            ).alias("first_click_id"),
            F.max(
                F.when(F.col("rn_last") == 1, F.col("click_id"))
            ).alias("last_click_id"),
        )
        .orderBy("purchase_id")
    )


# ---------------------------------------------------------------- SES

SES_ALPHA = repr(0.3)  # same double literal injected into both engines


@register(
    "q_ses_forecast",
    oracle=f"""
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
folded AS (
  SELECT user_id, COUNT(*) AS n_days,
         list_reduce(
           list(x ORDER BY day),
           (s, x) -> {SES_ALPHA} * x + (1.0 - {SES_ALPHA}) * s
         ) AS level
  FROM daily GROUP BY user_id
)
SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
       ROUND(level, 4) AS level_cents,
       ROUND(level, 4) AS forecast_next_cents
FROM folded ORDER BY user_id
""",
)
def q_ses_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple exponential smoothing per user over daily spend — the
    baseline time-series forecaster (level_t = a*x_t + (1-a)*level_(t-1),
    seeded with the first observation; the 1-step-ahead forecast IS the
    final level). The iterative recurrence is exactly a sequential fold
    over the day-ordered series, which both engines express natively
    (F.aggregate == list_reduce) — no UDF, no driver loop.

    Determinism: daily inputs are exact integer cents cast to double;
    the smoothing constant is the SAME repr literal in both plans (the
    PR_INIT pattern); the fold performs identical IEEE multiply-adds in
    identical order on both engines, so values match bit-for-bit before
    the presentation ROUND.

    Scale shape: one map-side-combinable daily aggregate, one shuffle
    on user_id, per-user fold bounded by the day count. SES (unlike a
    plain mean) cannot be computed by a commutative aggregate — the
    fold-over-sorted-frame idiom is THE way to run recurrences
    (EMA, Kalman-lite, drawdown) distributed-per-key."""
    alpha = float(SES_ALPHA)
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("double")
        .alias("x")
    )
    folded = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            F.lit(None).cast("double"),
            lambda s, r: F.when(s.isNull(), r["x"]).otherwise(
                F.lit(alpha) * r["x"] + (F.lit(1.0) - F.lit(alpha)) * s
            ),
        ).alias("level"),
    )
    return folded.select(
        "user_id", "n_days",
        F.round("level", 4).alias("level_cents"),
        F.round("level", 4).alias("forecast_next_cents"),
    ).orderBy("user_id")


# ---------------------------------------------------------------- windowed funnel

FUNNEL_STEP_US = 6 * 3600 * 1_000_000  # each step within 6h of the previous


@register(
    "q_funnel_windowed",
    oracle=f"""
WITH per_user AS (
  SELECT user_id,
         list(epoch_us(ts) ORDER BY ts, event_id)
           FILTER (event_type = 'view') AS views,
         list(epoch_us(ts) ORDER BY ts, event_id)
           FILTER (event_type = 'click') AS clicks,
         list(epoch_us(ts) ORDER BY ts, event_id)
           FILTER (event_type = 'purchase') AS purchases
  FROM events GROUP BY user_id
),
staged AS (
  SELECT user_id,
         views[1] AS v,
         list_min(list_filter(clicks,
           t -> t >= views[1] AND t <= views[1] + {FUNNEL_STEP_US})) AS c
  FROM per_user
),
staged2 AS (
  SELECT s.user_id, s.v, s.c,
         list_min(list_filter(p.purchases,
           t -> t >= s.c AND t <= s.c + {FUNNEL_STEP_US})) AS p
  FROM staged s JOIN per_user p USING (user_id)
)
SELECT COUNT(*) AS n_users,
       COUNT(v) AS n_viewed,
       COUNT(c) AS n_clicked_in_window,
       COUNT(p) AS n_purchased_in_window
FROM staged2
""",
)
def q_funnel_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel: first view -> first click within 6h of THAT
    view -> first purchase within 6h of THAT click — the conversion
    funnel as products actually define it (q_funnel_analysis is the
    order-only variant; real funnels expire). The sequential dependency
    (each stage anchors on the previous stage's chosen event) is
    resolved per user with array HOFs over the collected per-type
    timestamp lists: list_filter to the allowed window, list_min to
    elect — no per-stage self-joins, one shuffle on user_id total.

    Determinism: timestamps fold as integer epoch-micros; list order is
    pinned by (ts, event_id); empty windows yield NULL and COUNT(col)
    skips them identically on both engines.

    Scale shape: one groupBy(user) collecting three bounded per-user
    lists (event counts per user, not corpus-sized), then pure in-row
    array logic — the funnel depth adds projections, never joins. At
    pathological per-user event counts, cap the lists (slice) the same
    way production funnel engines bound lookback."""
    ev = load(spark, sf_dir, "events")

    def ts_list(tp: str):
        return F.array_sort(
            F.collect_list(
                F.when(
                    F.col("event_type") == tp,
                    F.struct(F.unix_micros("ts").alias("t"), "event_id"),
                )
            )
        )

    per_user = ev.groupBy("user_id").agg(
        F.transform(ts_list("view"), lambda s: s["t"]).alias("views"),
        F.transform(ts_list("click"), lambda s: s["t"]).alias("clicks"),
        F.transform(ts_list("purchase"), lambda s: s["t"]).alias("purchases"),
    )
    v = F.element_at("views", 1)
    staged = per_user.select(
        "user_id", "purchases",
        v.alias("v"),
        F.array_min(
            F.filter(
                "clicks",
                lambda t: (t >= v) & (t <= v + F.lit(FUNNEL_STEP_US)),
            )
        ).alias("c"),
    )
    c = F.col("c")
    staged2 = staged.select(
        "user_id", "v", "c",
        F.array_min(
            F.filter(
                "purchases",
                lambda t: (t >= c) & (t <= c + F.lit(FUNNEL_STEP_US)),
            )
        ).alias("p"),
    )
    return staged2.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("v").alias("n_viewed"),
        F.count("c").alias("n_clicked_in_window"),
        F.count("p").alias("n_purchased_in_window"),
    )


# ---------------------------------------------------------------- bounce

@register(
    "q_session_bounce",
    oracle=f"""
WITH seq AS (
  SELECT user_id, ts, event_id,
         epoch_us(ts) - LAG(epoch_us(ts))
             OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
  FROM events
),
sessions AS (
  SELECT user_id,
         SUM(CASE WHEN gap_us IS NULL OR gap_us > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
  FROM seq
),
per_session AS (
  SELECT user_id, session_id, COUNT(*) AS n_events
  FROM sessions GROUP BY 1, 2
)
SELECT user_id,
       COUNT(*) AS n_sessions,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounces,
       CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1000000
            // COUNT(*) AS BIGINT) AS bounce_ppm
FROM per_session
GROUP BY user_id
ORDER BY user_id
""",
)
def q_session_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounce rate per user: the share of 30-min-gap sessions containing
    exactly ONE event — the engagement-quality metric every web/product
    dashboard leads with. Reuses the lag+cumsum sessionization idiom
    (q_events_sessionize) and reports the rate as floor parts-per-million
    so the division stays exact integer arithmetic (the q_event_transitions
    discipline — no float share to round).

    Scale shape: one shuffle on user_id feeding both window passes, the
    per-session count, and the per-user rollup — the grouping keys are
    prefixes of the window partitioning, so Catalyst chains them without
    a second exchange."""
    ev = load(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_cum = w_seq.rowsBetween(Window.unboundedPreceding, 0)
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(
        w_seq
    )
    sessions = ev.select("user_id", "ts", "event_id").withColumn(
        "session_id",
        F.sum(
            F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0)
        ).over(w_cum),
    )
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    bounces = F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            bounces.alias("n_bounces"),
            F.expr(
                "CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)"
                " * 1000000 div count(1) AS BIGINT)"
            ).alias("bounce_ppm"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Population stability index between experiment arms
# ---------------------------------------------------------------------------

PSI_BINS = 10
PSI_BIN_W = 50  # value-units per bin (events.value spans ~0-490)


@register(
    "q_psi_arms",
    oracle=f"""
WITH e AS (
  SELECT event_type,
         user_id % 2 AS arm,
         LEAST(CAST(FLOOR(value / {PSI_BIN_W}) AS BIGINT), {PSI_BINS - 1})
           AS bin
  FROM events
),
bc AS (
  SELECT event_type, bin,
         SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS ca,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS cb
  FROM e GROUP BY 1, 2
),
tot AS (
  SELECT event_type, SUM(ca) AS na, SUM(cb) AS nb
  FROM bc GROUP BY 1
),
contrib AS (
  SELECT bc.event_type, bc.bin, tot.na, tot.nb,
         (((bc.ca + 1.0) / (tot.na + {PSI_BINS}))
            - ((bc.cb + 1.0) / (tot.nb + {PSI_BINS})))
           * ROUND(ln(((bc.ca + 1.0) / (tot.na + {PSI_BINS}))
                      / ((bc.cb + 1.0) / (tot.nb + {PSI_BINS}))), 6) AS c
  FROM bc JOIN tot ON tot.event_type = bc.event_type
)
SELECT event_type,
       CAST(na AS BIGINT) AS n_arm_a,
       CAST(nb AS BIGINT) AS n_arm_b,
       ROUND(list_reduce(list_prepend(0.0::DOUBLE, list(c ORDER BY bin)),
                         (acc, x) -> acc + x), 6) AS psi
FROM contrib GROUP BY event_type, na, nb
ORDER BY event_type
""",
)
def q_psi_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index between experiment arms — the standard
    ML-monitoring drift statistic (PSI = sum (p_a - p_b) ln(p_a/p_b)
    over value bins; rule of thumb: <0.1 stable, >0.25 shifted), here
    comparing the metric distribution across a deterministic
    user-parity assignment per event type — the A/B guardrail that
    catches assignment bias or metric-pipeline divergence between arms.
    Laplace-smoothed so empty bins are defined.

    Determinism (the q_source_kl pattern): bin counts are exact
    integers so every p is an exact double ratio; the single
    transcendental per bin is ROUNDed at 6 dp BEFORE the product; the
    per-type sum folds in bin order (F.aggregate == list_reduce).

    Scale shape: one scan into a (type, bin) map-side-combinable count
    with conditional-sum arm pivoting (no second pass per arm), a tiny
    per-type totals join, and a fold over <= {PSI_BINS} rows per type.
    The only corpus-sized shuffle is the (type, bin) count."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
        F.least(
            F.floor(F.col("value") / PSI_BIN_W).cast("long"),
            F.lit(PSI_BINS - 1),
        ).alias("bin"),
    )
    bc = e.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("cb"),
    )
    tot = bc.groupBy("event_type").agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    pa = (F.col("ca") + F.lit(1.0)) / (F.col("na") + F.lit(PSI_BINS))
    pb = (F.col("cb") + F.lit(1.0)) / (F.col("nb") + F.lit(PSI_BINS))
    contrib = bc.join(F.broadcast(tot), "event_type").select(
        "event_type", "bin", "na", "nb",
        ((pa - pb) * F.round(F.log(pa / pb), 6)).alias("c"),
    )
    return (
        contrib.groupBy("event_type", "na", "nb")
        .agg(
            F.round(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("bin", "c"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ),
                6,
            ).alias("psi")
        )
        .select(
            "event_type",
            F.col("na").cast("long").alias("n_arm_a"),
            F.col("nb").cast("long").alias("n_arm_b"),
            "psi",
        )
        .orderBy("event_type")
    )


@register(
    "q_welch_ttest",
    oracle="""
WITH e AS (
  SELECT event_type,
         user_id % 2 AS arm,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events
),
s AS (
  SELECT event_type,
         SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS na,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS nb,
         SUM(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS sa,
         SUM(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS sb,
         SUM(CASE WHEN arm = 0 THEN cents * cents ELSE 0 END) AS qa,
         SUM(CASE WHEN arm = 1 THEN cents * cents ELSE 0 END) AS qb
  FROM e GROUP BY 1
),
v AS (
  SELECT event_type, na, nb,
         (sa / CAST(na AS DOUBLE)) AS ma,
         (sb / CAST(nb AS DOUBLE)) AS mb,
         ((qa - (sa / CAST(na AS DOUBLE)) * sa) / (na - 1)) / na AS va_n,
         ((qb - (sb / CAST(nb AS DOUBLE)) * sb) / (nb - 1)) / nb AS vb_n
  FROM s
)
SELECT event_type,
       CAST(na AS BIGINT) AS n_a,
       CAST(nb AS BIGINT) AS n_b,
       ROUND((ma - mb) / 100, 4) AS mean_diff,
       ROUND((ma - mb) / sqrt(va_n + vb_n), 4) AS t_stat,
       ROUND((va_n + vb_n) * (va_n + vb_n)
             / (va_n * va_n / (na - 1) + vb_n * vb_n / (nb - 1)), 2)
         AS welch_df
FROM v
ORDER BY event_type
""",
)
def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test between experiment arms per event
    type — the companion to q_psi_arms (PSI says the DISTRIBUTION moved;
    the t-test says whether the MEAN difference clears sampling noise),
    with the Welch-Satterthwaite effective degrees of freedom.

    Determinism: values quantized to exact integer cents; per-arm n,
    sum, and sum-of-squares are integer aggregates (order-independent,
    < 2^53 so exact as doubles); mean/variance/t/df are then one fixed
    expression tree over exact inputs, mirrored token-for-token in the
    oracle — bit-identical before the presentation ROUND. Variance uses
    (q - m*s)/(n-1) (the one-pass sufficient-statistics form), never a
    second centered pass.

    Scale shape: ONE scan, one map-side-combinable conditional-sum
    aggregate per event type (6 longs of state per type); everything
    after operates on a handful of rows."""
    e = load(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(F.col("user_id"), F.lit(2)).alias("arm"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    s = e.groupBy("event_type").agg(
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0)).alias("nb"),
        F.sum(F.when(F.col("arm") == 0, F.col("cents")).otherwise(0)).alias("sa"),
        F.sum(F.when(F.col("arm") == 1, F.col("cents")).otherwise(0)).alias("sb"),
        F.sum(
            F.when(F.col("arm") == 0, F.col("cents") * F.col("cents")).otherwise(0)
        ).alias("qa"),
        F.sum(
            F.when(F.col("arm") == 1, F.col("cents") * F.col("cents")).otherwise(0)
        ).alias("qb"),
    )
    ma = F.col("sa") / F.col("na").cast("double")
    mb = F.col("sb") / F.col("nb").cast("double")
    va_n = ((F.col("qa") - ma * F.col("sa")) / (F.col("na") - 1)) / F.col("na")
    vb_n = ((F.col("qb") - mb * F.col("sb")) / (F.col("nb") - 1)) / F.col("nb")
    v = s.select(
        "event_type", "na", "nb",
        ma.alias("ma"), mb.alias("mb"),
        va_n.alias("va_n"), vb_n.alias("vb_n"),
    )
    return v.select(
        "event_type",
        F.col("na").cast("long").alias("n_a"),
        F.col("nb").cast("long").alias("n_b"),
        F.round((F.col("ma") - F.col("mb")) / 100, 4).alias("mean_diff"),
        F.round(
            (F.col("ma") - F.col("mb"))
            / F.sqrt(F.col("va_n") + F.col("vb_n")),
            4,
        ).alias("t_stat"),
        F.round(
            (F.col("va_n") + F.col("vb_n"))
            * (F.col("va_n") + F.col("vb_n"))
            / (
                F.col("va_n") * F.col("va_n") / (F.col("na") - 1)
                + F.col("vb_n") * F.col("vb_n") / (F.col("nb") - 1)
            ),
            2,
        ).alias("welch_df"),
    ).orderBy("event_type")


# ---------------------------------------------------------------- Holt linear

HOLT_ALPHA = repr(0.4)   # level smoothing — same double literal both engines
HOLT_BETA = repr(0.2)    # trend smoothing
_HOLT_OMA = repr(1.0 - 0.4)
_HOLT_OMB = repr(1.0 - 0.2)


@register(
    "q_holt_linear",
    oracle=f"""
WITH RECURSIVE daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2
),
d2 AS (
  SELECT user_id, x,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day) AS rn,
         COUNT(*) OVER (PARTITION BY user_id) AS n_days
  FROM daily
),
rec AS (
  -- DuckDB 1.0 list_reduce with a STRUCT accumulator evaluates struct
  -- fields against a partially-updated state (verified: later fields
  -- see earlier fields' NEW values at some steps), so the recurrence
  -- is expressed as a recursive CTE instead — one row per (user, day),
  -- each level joining the next day's observation.
  SELECT user_id, rn, n_days, x AS lv, CAST(0 AS DOUBLE) AS tr
  FROM d2 WHERE rn = 1
  UNION ALL
  SELECT d.user_id, d.rn, d.n_days,
         {HOLT_ALPHA} * d.x + {_HOLT_OMA} * (r.lv + r.tr) AS lv,
         {HOLT_BETA} * (({HOLT_ALPHA} * d.x + {_HOLT_OMA} * (r.lv + r.tr))
                        - r.lv) + {_HOLT_OMB} * r.tr AS tr
  FROM rec r JOIN d2 d ON d.user_id = r.user_id AND d.rn = r.rn + 1
)
SELECT user_id, CAST(n_days AS BIGINT) AS n_days,
       ROUND(lv, 4) AS level_cents,
       ROUND(tr, 4) AS trend_cents,
       ROUND(lv + tr, 4) AS forecast_h1,
       ROUND(lv + 3.0 * tr, 4) AS forecast_h3
FROM rec WHERE rn = n_days ORDER BY user_id
""",
)
def q_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing per user over daily spend —
    q_ses_forecast's level recursion plus a trend component, the
    workhorse short-horizon forecaster for trending series (SES lags
    any trend by design). State is (level, trend); seed lv=x1, tr=0;
    then lv' = a*x + (1-a)*(lv+tr), tr' = b*(lv'-lv) + (1-b)*tr; the
    h-step forecast is lv + h*tr.

    Determinism: the recurrence is a sequential fold over the
    day-ordered series with a STRUCT accumulator on the Spark side
    (F.aggregate over array_sort(collect_list(struct)); the null-seed
    branch performs zero arithmetic). The oracle expresses the SAME
    IEEE multiply-add sequence as a recursive CTE, because DuckDB
    1.0's list_reduce with a struct accumulator evaluates later struct
    fields against partially-updated state (measured: {'a': s.a+e.a,
    'b': s.b*2+s.a} over [10,20,40] yields b=94, not the sequential
    54) — struct-state folds are NOT portable to it. Smoothing
    constants are shared repr'd double literals.

    Scale shape: identical to SES — one map-side-combinable daily
    aggregate, one shuffle on user_id, a per-user fold bounded by the
    day count. The struct-state fold is THE distributed idiom for any
    2nd-order recurrence (Holt, damped-trend, Kalman-lite)."""
    a, oma = float(HOLT_ALPHA), float(_HOLT_OMA)
    b, omb = float(HOLT_BETA), float(_HOLT_OMB)
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("double")
        .alias("x")
    )

    def step(s, r):
        lv_new = F.lit(a) * r["x"] + F.lit(oma) * (s["lv"] + s["tr"])
        return F.when(
            s.isNull(),
            F.struct(r["x"].alias("lv"), F.lit(0.0).alias("tr")),
        ).otherwise(
            F.struct(
                lv_new.alias("lv"),
                (
                    F.lit(b) * (lv_new - s["lv"]) + F.lit(omb) * s["tr"]
                ).alias("tr"),
            )
        )

    folded = daily.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("day", "x"))),
            F.lit(None).cast("struct<lv:double,tr:double>"),
            step,
        ).alias("st"),
    )
    return folded.select(
        "user_id",
        "n_days",
        F.round(F.col("st.lv"), 4).alias("level_cents"),
        F.round(F.col("st.tr"), 4).alias("trend_cents"),
        F.round(F.col("st.lv") + F.col("st.tr"), 4).alias("forecast_h1"),
        F.round(F.col("st.lv") + 3.0 * F.col("st.tr"), 4).alias(
            "forecast_h3"
        ),
    ).orderBy("user_id")


# ------------------------------------------------------- seasonal decompose

SEAS_PERIOD = 7  # weekly seasonality over the daily series


@register(
    "q_seasonal_decompose",
    oracle=f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1
),
tr AS (
  SELECT day, cents,
         (day - DATE '1970-01-01') % {SEAS_PERIOD} AS dow,
         CASE WHEN COUNT(*) OVER w = {SEAS_PERIOD}
              THEN SUM(cents) OVER w / {float(SEAS_PERIOD)} END AS trend
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
)
SELECT day, cents AS observed_cents,
       ROUND(trend, 4) AS trend_cents,
       ROUND(seasonal, 4) AS seasonal_cents,
       ROUND(CASE WHEN trend IS NOT NULL
             THEN (detr_q / 1000000.0) - seasonal END, 4) AS residual_cents
FROM sea
ORDER BY day
""",
)
def q_seasonal_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive seasonal decomposition (STL-lite) of the
    global daily revenue series: trend = centered {SEAS_PERIOD}-day
    moving average (NULL at the edges where the window is partial),
    seasonal = per-day-of-week mean of the detrended series, residual =
    the rest. The standard pre-modeling diagnostic next to the SES/Holt
    forecasters.

    Determinism: daily totals are exact integer cents; the trend is one
    SUM-of-7-ints division; the detrended value quantizes to BIGINT
    micro-units BEFORE the per-weekday mean, so that group sum is
    order-independent, and the mean/residual are single double ops.
    Day-of-week is epoch-day mod {SEAS_PERIOD} — identical arithmetic
    both engines, no locale/week-start conventions.

    Scale shape: one map-side-combinable daily aggregate (the only
    corpus-sized stage), then windows over the |days|-sized series —
    partitioned by nothing because the series IS global and
    days-bounded; per-key decomposition would partition the same
    windows by the key."""
    from pyspark.sql import Window

    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.to_date(F.date_trunc("day", "ts")).alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents")
    )
    w = Window.orderBy("day").rowsBetween(-3, 3)
    tr = daily.select(
        "day",
        "cents",
        (F.datediff("day", F.lit("1970-01-01")) % SEAS_PERIOD).alias("dow"),
        F.when(
            F.count(F.lit(1)).over(w) == SEAS_PERIOD,
            F.sum("cents").over(w) / float(SEAS_PERIOD),
        ).alias("trend"),
    )
    dt = tr.withColumn(
        "detr_q",
        F.round((F.col("cents") - F.col("trend")) * 1000000).cast("long"),
    )
    wd = Window.partitionBy("dow")
    sea = dt.withColumn(
        "seasonal",
        F.sum("detr_q").over(wd)
        / (1000000.0 * F.count("detr_q").over(wd)),
    )
    return sea.select(
        "day",
        F.col("cents").alias("observed_cents"),
        F.round("trend", 4).alias("trend_cents"),
        F.round("seasonal", 4).alias("seasonal_cents"),
        F.round(
            F.when(
                F.col("trend").isNotNull(),
                F.col("detr_q") / 1000000.0 - F.col("seasonal"),
            ),
            4,
        ).alias("residual_cents"),
    ).orderBy("day")


# ------------------------------------------------------------- band join

BAND_WINDOW_S = 1800  # pair window: purchase within 30 min after a click


@register(
    "q_band_join",
    oracle=f"""
WITH c AS (
  SELECT user_id, event_id AS click_id, ts AS cts
  FROM events WHERE event_type = 'click'
),
p AS (
  SELECT user_id, event_id AS purchase_id, ts AS pts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
),
pairs AS (
  SELECT c.user_id, c.click_id, p.purchase_id, p.cents
  FROM c JOIN p
    ON p.user_id = c.user_id
   AND p.pts >= c.cts
   AND p.pts <= c.cts + INTERVAL {BAND_WINDOW_S} SECOND
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(COUNT(DISTINCT click_id) AS BIGINT) AS n_clicks,
       CAST(COUNT(DISTINCT purchase_id) AS BIGINT) AS n_purchases,
       CAST(SUM(cents) AS BIGINT) AS paired_cents
FROM pairs
GROUP BY user_id
ORDER BY user_id
""",
)
def q_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed band (range) join — ALL (click, purchase) pairs within a
    {BAND_WINDOW_S}-second band, per user. The ORACLE states the naive
    non-equi join; the ENGINE plans the scalable form: both sides get a
    time-bucket key (bucket width = the band width), clicks explode
    into their bucket and the next one, and the join becomes an
    EQUI-join on (user, bucket) with the exact band as a residual
    filter — each qualifying pair matches in exactly one exploded copy
    (the purchase's bucket is unique), so no dedup pass is needed.
    This is the batch twin of the round-4 stream-stream state-key fix
    (BASELINE.md: 43.7 s -> 3.7 s under the hot key) made available to
    batch pipelines as a first-class operator.

    Why it matters at 100 TB: a naive range join on user alone makes
    every hot user an O(clicks x purchases) state scan per key; the
    bucket key bounds each probe to two band-widths of history
    regardless of user fan-in. Output identity with the naive plan is
    exactly what the oracle hash checks."""
    ev = load(spark, sf_dir, "events")
    bucket_us = BAND_WINDOW_S * 1_000_000
    c = ev.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("cus"),
    )
    c2 = c.select(
        "c_user",
        "click_id",
        "cus",
        F.explode(
            F.array(
                (F.col("cus") / bucket_us).cast("long"),
                (F.col("cus") / bucket_us).cast("long") + 1,
            )
        ).alias("bk"),
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_micros("ts").alias("pus"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.unix_micros("ts") / bucket_us).cast("long").alias("bk"),
    )
    pairs = (
        c2.join(
            p,
            (F.col("c_user") == F.col("user_id")) & (c2["bk"] == p["bk"]),
        )
        .where(
            (F.col("pus") >= F.col("cus"))
            & (F.col("pus") <= F.col("cus") + bucket_us)
        )
        .select("user_id", "click_id", "purchase_id", "cents")
    )
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_distinct("click_id").alias("n_clicks"),
            F.count_distinct("purchase_id").alias("n_purchases"),
            F.sum("cents").alias("paired_cents"),
        )
        .orderBy("user_id")
    )


@register(
    "q_resample_interpolate",
    oracle="""
WITH src AS (
  SELECT user_id,
         CAST(FLOOR(epoch(ts)) AS BIGINT) // 3600 AS h,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM events WHERE user_id % 20 = 0
),
obs AS (
  SELECT user_id, h, SUM(cents) AS obs_cents
  FROM src GROUP BY 1, 2
),
bounds AS (
  SELECT user_id, MIN(h) AS h0, MAX(h) AS h1 FROM obs GROUP BY 1
),
grid AS (
  SELECT user_id, UNNEST(generate_series(h0, h1)) AS h FROM bounds
),
joined AS (
  SELECT g.user_id, g.h, o.obs_cents
  FROM grid g LEFT JOIN obs o ON o.user_id = g.user_id AND o.h = g.h
),
walls AS (
  SELECT user_id, h, obs_cents,
         LAST_VALUE(obs_cents IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         LAST_VALUE(CASE WHEN obs_cents IS NOT NULL THEN h END
                    IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
         FIRST_VALUE(obs_cents IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         FIRST_VALUE(CASE WHEN obs_cents IS NOT NULL THEN h END
                     IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM joined
),
filled AS (
  SELECT user_id, h, obs_cents,
         CASE WHEN obs_cents IS NOT NULL THEN obs_cents
              ELSE (pv * (nh - h) + nv * (h - ph)) // (nh - ph)
         END AS interp_cents
  FROM walls
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(SUM(CASE WHEN obs_cents IS NOT NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_observed,
       CAST(SUM(interp_cents) AS BIGINT) AS sum_interp_cents,
       CAST(SUM(interp_cents * (h % 97)) AS BIGINT) AS order_checksum
FROM filled
GROUP BY user_id
ORDER BY user_id
""",
)
def q_resample_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series regularization (round 12): per-user hourly resample
    with LINEAR INTERPOLATION across gaps — the feature-engineering step
    between raw event streams and fixed-step models (forecasting windows,
    seasonal decomposition, learned embeddings over regular grids all
    assume it). Per user: hourly observed totals, a dense hour grid
    between the first and last observation (sequence + explode), and
    gap hours filled by the exact-integer weighted mean
    (pv*(nh-h) + nv*(h-ph)) div (nh-ph) — integer cents with truncating
    division, which BOTH engines implement identically (verified: -7
    div 2 = -3 on Spark and DuckDB), so the interpolation is
    bit-deterministic with no float order sensitivity. Prev/next walls
    come from ignore-nulls running windows; grid endpoints are always
    observed so the fill is total. (Oracle pitfall pinned here:
    DuckDB's CAST(epoch(ts) AS BIGINT) ROUNDS sub-second fractions
    while Spark's unix_timestamp truncates — one event 0.3 s before an
    hour boundary lands in different hours; FLOOR(epoch(ts)) restores
    the shared truncation semantics.) The order_checksum (hour-weighted
    sum) pins the PLACEMENT of every interpolated value, not just the
    total.

    Scale shape: one combinable per-(user, hour) aggregate, a bounds
    aggregate, a sequence-explode whose output is the GRID (bounded by
    time span, not event count), one hash left join grid<-obs on
    (user, hour), and two linear window passes per user — all shuffles
    on the user key, no UDF, no iteration. A user with a years-long gap
    costs grid rows, not state (the explode is lazy per row)."""
    src = (
        load(spark, sf_dir, "events")
        .where(F.col("user_id") % 20 == 0)
        .selectExpr(
            "user_id",
            "unix_timestamp(ts) div 3600 AS h",
            "CAST(ROUND(value * 100) AS BIGINT) AS cents",
        )
    )
    obs = src.groupBy("user_id", "h").agg(F.sum("cents").alias("obs_cents"))
    grid = (
        obs.groupBy("user_id")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "user_id", F.explode(F.sequence("h0", "h1")).alias("h")
        )
    )
    joined = grid.join(obs, ["user_id", "h"], "left")
    back = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("user_id")
        .orderBy("h")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    obs_h = F.when(F.col("obs_cents").isNotNull(), F.col("h"))
    walls = (
        joined.withColumn("pv", F.last("obs_cents", True).over(back))
        .withColumn("ph", F.last(obs_h, True).over(back))
        .withColumn("nv", F.first("obs_cents", True).over(fwd))
        .withColumn("nh", F.first(obs_h, True).over(fwd))
    )
    filled = walls.withColumn(
        "interp_cents",
        F.when(F.col("obs_cents").isNotNull(), F.col("obs_cents")).otherwise(
            F.expr("(pv * (nh - h) + nv * (h - ph)) div (nh - ph)")
        ),
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_hours"),
            F.sum(F.col("obs_cents").isNotNull().cast("int"))
            .cast("long")
            .alias("n_observed"),
            F.sum("interp_cents").alias("sum_interp_cents"),
            F.sum(F.col("interp_cents") * (F.col("h") % 97)).alias(
                "order_checksum"
            ),
        )
        .orderBy("user_id")
    )
