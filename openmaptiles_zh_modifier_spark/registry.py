"""Query registry: every operator from SURVEY.md §2 as a (Spark callable,
DuckDB oracle SQL) pair.

Contract (driver-defined, see __spark_entry__.py): each ``QUERIES[name]``
takes ``(spark, sf_dir)`` and returns a DataFrame; ``ORACLE_SQL[name]`` is
ANSI SQL DuckDB runs over the same parquet registered as views. The driver
compares row-count + schema + order-insensitive value hash, sorting columns
by NAME — so every computed column is aliased identically on both sides.

Float discipline: double aggregates are rounded (2-6 dp) on BOTH sides —
double addition is not associative, and Spark's partial-agg order differs
from DuckDB's; unrounded sums of 60k doubles WILL hash-mismatch.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.functions.zh import (
    HAN_REGEX_RE2,
    is_han,
    nullif_empty,
    to_simplified,
    to_simplified_sql,
    to_traditional,
    to_traditional_sql,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        # Fail LOUDLY on duplicate names: a re-registration silently
        # shadows the earlier query (its driver rows then "verify" a
        # different plan) — this bit twice in round 8 (a grouping-sets
        # twin and a z-order twin both collided with existing entries
        # and shadowed them until sweep counts exposed it).
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} already exists "
                f"({QUERIES[name].__module__}); pick a new name"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


_LOAD_CACHE: dict[tuple[int, str, str], DataFrame] = {}
_FRAME_CACHE: dict[tuple[int, str], DataFrame] = {}


def memo_frame(spark: SparkSession, key: str, builder) -> DataFrame:
    """Memoized cached frame per (session, key): repeat query invocations
    in one session reuse a single persisted intermediate instead of
    accumulating a new pinned .cache() per call. Eagerly materialized
    (concurrent consumers of an unpopulated cache each recompute it)."""
    # id(spark) cannot be recycled while entries exist: every cached
    # DataFrame holds a reference to its SparkSession, so the session
    # object stays alive (and its id taken) until the cache is cleared.
    k = (id(spark), key)
    hit = _FRAME_CACHE.get(k)
    if hit is not None:
        return hit
    df = builder().cache()
    df.count()
    _FRAME_CACHE[k] = df
    return df


def memo_frame_lazy(spark: SparkSession, key: str, builder) -> DataFrame:
    """Like memo_frame but WITHOUT eager materialization: the frame is
    .cache()d and registered, populated by whichever action runs first.
    Use inside registered queries whose contract is a LAZY plan but whose
    construction references an intermediate more than once per round
    (e.g. BFS's relax step reads the previous distance table twice):
    the cache substitution collapses what would otherwise be an
    exponentially duplicated plan subtree, without breaking laziness."""
    k = (id(spark), key)
    hit = _FRAME_CACHE.get(k)
    if hit is not None:
        return hit
    df = builder().cache()
    _FRAME_CACHE[k] = df
    return df


def local_frame(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Arrow-backed local-frame construction (round 14, guide §6
    "Arrow for driver transfers"): ``createDataFrame(list-of-tuples)``
    goes through the pickled-parallelize path and costs ~0.4-0.5 s per
    action even for a 25-row frame (measured warm, sf0.1 session);
    routing the same rows through a pandas DataFrame takes the Arrow
    path (~0.12-0.16 s). Rows bind to the schema POSITIONALLY, exactly
    like the list path; values must be plain scalars (int/float/str).
    Empty input falls back to the list path (nothing to convert)."""
    rows = list(rows)
    if not rows:
        return spark.createDataFrame(rows, schema)
    import pandas as pd

    names = [c.strip().split()[0] for c in schema.split(",")]
    pdf = pd.DataFrame([tuple(r) for r in rows], columns=names)
    return spark.createDataFrame(pdf, schema)


def clear_frame_cache() -> None:
    """Drop memoized base tables and intermediate frames (use after
    rewriting parquet under a cached path — the cached file listing would
    otherwise serve stale/deleted file names)."""
    for df in _FRAME_CACHE.values():
        df.unpersist()
    _FRAME_CACHE.clear()
    _LOAD_CACHE.clear()


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Memoized base-table reader: DataFrames are immutable plans, so one
    analyzed scan per (session, dir, table) serves every query — repeat
    file listing + footer/schema resolution measured ~0.05 s per query
    across a 100+-query session (~5 s of pure metadata overhead).

    Caveat: the cached plan pins its file listing; after REWRITING the
    parquet under a cached path in the same session, call
    clear_frame_cache() or the stale listing raises FileNotFoundException.
    Testdata inputs here are immutable, so the default is cache-on."""
    key = (id(spark), sf_dir, table)
    hit = _LOAD_CACHE.get(key)
    if hit is not None:
        return hit
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        # The events fixture stores TIMESTAMP(NANOS). Spark >= 4.x reads it
        # natively as timestamp_ntz (truncating nanos->micros, which already
        # matches DuckDB); older Sparks only read it under
        # spark.sql.legacy.parquet.nanosAsLong=true, yielding BIGINT nanos.
        # Branch on the ACTUAL dtype so both environments converge on the
        # same micros-precision timestamp — integer `div` truncation is
        # bit-exact with DuckDB's nanos handling.
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
        elif ts_type == "timestamp_ntz":
            # Session TZ is pinned UTC (SEMANTIC_CONFS), so ntz->ltz is a
            # value-identical relabel; downstream code (unix_micros, window,
            # watermarks) requires the TZ-aware TIMESTAMP type.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _LOAD_CACHE[key] = df
    return df


# =========================================================================
# zh back-fill (the reference's native query, SURVEY.md §2.1-§2.10)
#
# The driver testdata has no map-typed tags table, so the oracle-checked
# form derives a deterministic zh fixture from `documents` (doc_id-indexed
# Chinese literals) and runs the scalar-column stage of the pipeline:
# han-gate (P4) → ''-normalization (P5) → coalesce cascade (F5) →
# changed-rows (F6). The map-typed stages (element_at projection,
# map_concat write-back) are pytest-verified in tests/test_zh_backfill.py.
# =========================================================================

_ZH_NAMES = ["臺灣鐵路", "Berlin", "頭髮廣場", "Beijing 北京", "", None, "國語學校"]
_ZH_TAGVALS = [None, "臺北車站", "廣州東門", None, "馬場公園", None, None]
_ZH_HANS = [None, "", None, "北京", None, None, None]
_ZH_HANT = [None, None, "廣州東門", None, "", None, "國語學校"]


def _pick_spark(vals: list[str | None], idx) -> F.Column:
    expr = F.lit(vals[-1])
    for i in range(len(vals) - 2, -1, -1):
        expr = F.when(idx % len(vals) == i, F.lit(vals[i])).otherwise(expr)
    return expr


def _pick_sql(vals: list[str | None], idx: str) -> str:
    n = len(vals)
    whens = " ".join(
        f"WHEN {idx} % {n} = {i} THEN "
        + ("NULL" if v is None else f"'{v}'")
        for i, v in enumerate(vals[:-1])
    )
    last = "NULL" if vals[-1] is None else f"'{vals[-1]}'"
    return f"CASE {whens} ELSE {last} END"


ZH_BACKFILL_ORACLE = f"""
WITH src AS (
  SELECT doc_id,
         {_pick_sql(_ZH_NAMES, "doc_id")} AS name,
         {_pick_sql(_ZH_TAGVALS, "doc_id")} AS zh_tag,
         {_pick_sql(_ZH_HANS, "doc_id")} AS hans_tag,
         {_pick_sql(_ZH_HANT, "doc_id")} AS hant_tag
  FROM documents
),
qualified AS (
  -- P2 server-side WHERE: raw IS NULL (quirk B7)
  SELECT * FROM src
  WHERE (name IS NOT NULL OR zh_tag IS NOT NULL)
    AND (hant_tag IS NULL OR hans_tag IS NULL)
),
derived AS (
  SELECT doc_id,
         COALESCE(zh_tag,
                  CASE WHEN name IS NOT NULL AND name <> ''
                            AND regexp_matches(name, '{HAN_REGEX_RE2}')
                       THEN name END) AS zh,
         NULLIF(hans_tag, '') AS hans_old,
         NULLIF(hant_tag, '') AS hant_old
  FROM qualified
)
SELECT doc_id,
       COALESCE(hans_old, {to_simplified_sql('zh')}) AS hans,
       COALESCE(hant_old, {to_traditional_sql('zh')}) AS hant
FROM derived
WHERE zh IS NOT NULL AND (hans_old IS NULL OR hant_old IS NULL)
ORDER BY doc_id
"""


def zh_fixture_src(docs: DataFrame) -> DataFrame:
    """Deterministic zh fixture columns over any doc_id-bearing frame
    (batch or streaming — pure column expressions either way)."""
    idx = F.col("doc_id")
    return docs.select(
        idx,
        _pick_spark(_ZH_NAMES, idx).alias("name"),
        _pick_spark(_ZH_TAGVALS, idx).alias("zh_tag"),
        _pick_spark(_ZH_HANS, idx).alias("hans_tag"),
        _pick_spark(_ZH_HANT, idx).alias("hant_tag"),
    )


def zh_backfill_transform(src: DataFrame) -> DataFrame:
    """The reference's derivation chain (P2 -> P4 -> P5 -> F5 -> F6) as
    stateless column expressions: works identically under batch and
    Structured Streaming (no aggregation, no state — append mode)."""
    name, zh_tag = F.col("name"), F.col("zh_tag")
    hans_tag, hant_tag = F.col("hans_tag"), F.col("hant_tag")
    qualified = src.where(
        (name.isNotNull() | zh_tag.isNotNull())
        & (hant_tag.isNull() | hans_tag.isNull())
    )
    name_usable = name.isNotNull() & (name != F.lit("")) & is_han(name)
    zh = F.coalesce(zh_tag, F.when(name_usable, name))
    hans_old = nullif_empty(hans_tag)
    hant_old = nullif_empty(hant_tag)
    return (
        qualified.select(
            "doc_id",
            zh.alias("zh"),
            hans_old.alias("hans_old"),
            hant_old.alias("hant_old"),
        )
        .where(F.col("zh").isNotNull()
               & (F.col("hans_old").isNull() | F.col("hant_old").isNull()))
        .select(
            "doc_id",
            F.coalesce("hans_old", to_simplified("zh")).alias("hans"),
            F.coalesce("hant_old", to_traditional("zh")).alias("hant"),
        )
    )


@register("zh_backfill", oracle=ZH_BACKFILL_ORACLE)
def q_zh_backfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return zh_backfill_transform(zh_fixture_src(docs)).orderBy("doc_id")


# --- B1 typo-compat mode, oracle-gated (VERDICT r6 #8) --------------------
#
# ``compat_names_typo=True`` reproduces OMTZHModifier.java:135-136: the
# SELECT reads the existing Hant from the misspelled key ``names:zh-Hant``
# (which never exists) while WHERE/UPDATE use the correct key — so a stored
# Hant value is never seen and is regenerated whenever the row qualifies.
# The fixture's Hant column deliberately DIVERGES from what regeneration
# produces (rows doc_id%7 in {2,6}: stored 舊城門樓/國語書院 vs regenerated
# 廣州東門/國語學校), so the overwrite behavior is visible in the hash —
# with the original fixture both values coincided and the quirk was
# unobservable.

_ZH_HANT_DIVERGENT = [None, None, "舊城門樓", None, "", None, "國語書院"]

ZH_BACKFILL_TYPO_ORACLE = f"""
WITH src AS (
  SELECT doc_id,
         {_pick_sql(_ZH_NAMES, "doc_id")} AS name,
         {_pick_sql(_ZH_TAGVALS, "doc_id")} AS zh_tag,
         {_pick_sql(_ZH_HANS, "doc_id")} AS hans_tag,
         {_pick_sql(_ZH_HANT_DIVERGENT, "doc_id")} AS hant_tag
  FROM documents
),
qualified AS (
  -- the WHERE is spelled correctly even in typo mode (only the SELECT
  -- reads the wrong key), so the row set is unchanged
  SELECT * FROM src
  WHERE (name IS NOT NULL OR zh_tag IS NOT NULL)
    AND (hant_tag IS NULL OR hans_tag IS NULL)
),
derived AS (
  SELECT doc_id,
         COALESCE(zh_tag,
                  CASE WHEN name IS NOT NULL AND name <> ''
                            AND regexp_matches(name, '{HAN_REGEX_RE2}')
                       THEN name END) AS zh,
         NULLIF(hans_tag, '') AS hans_old
  FROM qualified
)
-- hant_old is read from the misspelled key => always NULL: hant is always
-- regenerated and needs_update is always true for qualifying rows
SELECT doc_id,
       COALESCE(hans_old, {to_simplified_sql('zh')}) AS hans,
       {to_traditional_sql('zh')} AS hant
FROM derived
WHERE zh IS NOT NULL
ORDER BY doc_id
"""


@register("zh_backfill_typo_compat", oracle=ZH_BACKFILL_TYPO_ORACLE)
def q_zh_backfill_typo_compat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B1 typo-compat back-fill through the REAL map-typed operator: the
    scalar fixture is assembled into the production ``(name, tags map)``
    shape (null-valued entries dropped, empty strings kept — quirk B7's
    raw-IS-NULL WHERE must see them), then ``derive_zh_columns`` runs
    with ``compat_names_typo=True`` so the Hant read misses and every
    qualifying row regenerates Hant. Pure column expressions end to end:
    map_from_arrays/map_filter build, element_at reads, no UDF."""
    from openmaptiles_zh_modifier_spark.operators.zh_backfill import (
        KEY_HANS,
        KEY_HANT,
        KEY_ZH,
        derive_zh_columns,
    )

    docs = load(spark, sf_dir, "documents")
    idx = F.col("doc_id")
    src = docs.select(
        idx,
        _pick_spark(_ZH_NAMES, idx).alias("name"),
        _pick_spark(_ZH_TAGVALS, idx).alias("zh_tag"),
        _pick_spark(_ZH_HANS, idx).alias("hans_tag"),
        _pick_spark(_ZH_HANT_DIVERGENT, idx).alias("hant_tag"),
    )
    tagged = src.select(
        "doc_id",
        "name",
        F.map_filter(
            F.map_from_arrays(
                F.array(F.lit(KEY_ZH), F.lit(KEY_HANS), F.lit(KEY_HANT)),
                F.array("zh_tag", "hans_tag", "hant_tag"),
            ),
            lambda k, v: v.isNotNull(),
        ).alias("tags"),
    )
    # tables=CURATED pins the gate to the curated dictionaries even on a
    # box where a deployment exported SPARK_GRAFT_OPENCC_DIR — the
    # static DuckDB oracle compiles the curated literals, so the Spark
    # side must too (review finding: env var would hash-mismatch the
    # gate for correct code)
    from openmaptiles_zh_modifier_spark.functions.zh import CURATED

    out = derive_zh_columns(
        tagged, "doc_id", compat_names_typo=True, tables=CURATED
    )
    return (
        out.where("needs_update")
        .select("doc_id", "hans", "hant")
        .orderBy("doc_id")
    )


# =========================================================================
# TPC-H-style relational surface (SURVEY.md §2.3-§2.7 engine declarations)
# =========================================================================


@register(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag,
       l_linestatus,
       ROUND(SUM(l_quantity), 2)                                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
       ROUND(AVG(l_discount), 4)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# Register the rest of the surface (import side effects populate QUERIES).
def _register_all() -> None:
    import openmaptiles_zh_modifier_spark.queries_events  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_relational  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_advanced  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_dedup  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_embeddings  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_multimodal  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_sketches  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_text  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_tpch_extra  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_advanced2  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_tpch_extra2  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_tpch_extra3  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_udaf  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_skew  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_merge  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_graph  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_scale  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_retrieval  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_inference  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_quality  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_graph2  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_embeddings2  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_trainprep  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_governance  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_zh  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_geo  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_stats2  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_stats3  # noqa: F401
    import openmaptiles_zh_modifier_spark.queries_tsa  # noqa: F401
    import openmaptiles_zh_modifier_spark.streaming.events  # noqa: F401


# _register_all() is invoked by the package __init__ (see note there:
# calling it here re-entrantly breaks direct submodule imports).
