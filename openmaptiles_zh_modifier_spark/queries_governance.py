"""Data-governance and export-stage operators: k-anonymity audit with
a generalization step (the privacy sibling of q_gdpr_cascade), balanced
shard assignment for training-data export, and the one-row corpus
datasheet (Gebru et al. "Datasheets for Datasets" — the summary panel a
data release ships with).

Determinism: exact counts throughout; the sharding rule is a pure
rank/modulo function of integer token counts; datasheet ratios are
exact-integer divisions rounded at 4 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.functions.text import tokens
from openmaptiles_zh_modifier_spark.registry import load, register

# ---------------------------------------------------------------------------
# k-anonymity audit with one generalization step
# ---------------------------------------------------------------------------

KANON_K = 5


@register(
    "q_kanonymity",
    oracle=f"""
WITH q0 AS (
  SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_size
  FROM customer GROUP BY 1, 2
),
lvl0 AS (
  SELECT 0 AS level,
         CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(SUM(CASE WHEN class_size < {KANON_K} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_violating_classes,
         CAST(SUM(CASE WHEN class_size < {KANON_K} THEN class_size
                       ELSE 0 END) AS BIGINT) AS n_exposed_rows,
         CAST(MIN(class_size) AS BIGINT) AS min_class
  FROM q0
),
q1 AS (
  SELECT n.n_regionkey, c.c_mktsegment, COUNT(*) AS class_size
  FROM customer c JOIN nation n ON n.n_nationkey = c.c_nationkey
  GROUP BY 1, 2
),
lvl1 AS (
  SELECT 1 AS level,
         CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(SUM(CASE WHEN class_size < {KANON_K} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_violating_classes,
         CAST(SUM(CASE WHEN class_size < {KANON_K} THEN class_size
                       ELSE 0 END) AS BIGINT) AS n_exposed_rows,
         CAST(MIN(class_size) AS BIGINT) AS min_class
  FROM q1
)
SELECT * FROM lvl0 UNION ALL SELECT * FROM lvl1
ORDER BY level
""",
)
def q_kanonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (nation, market-segment)
    quasi-identifier: a release is k-anonymous when every
    equivalence class has >= k rows — classes below {KANON_K} are the
    re-identification surface a privacy review flags. The second row
    re-audits after ONE generalization step (nation -> region, the
    standard anonymization move), showing how much exposure the
    coarser quasi-identifier removes — the exact decision loop of a
    privacy-preserving release (complements q_gdpr_cascade's deletion
    side).

    Determinism: pure integer class-size arithmetic.

    Scale shape: each level is one map-side-combinable count on the
    quasi-identifier key plus a tiny summary aggregate; the
    generalization join is against the broadcast 25-row nation dim.
    At 100 TB the audit cost is one scan per level — and levels
    share it in production by grouping on both keys at once."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")

    def level(df: DataFrame, lvl: int) -> DataFrame:
        sizes = df.groupBy("qid1", "qid2").agg(
            F.count(F.lit(1)).alias("class_size")
        )
        viol = F.col("class_size") < KANON_K
        return sizes.agg(
            F.lit(lvl).alias("level"),
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(viol.cast("int")).cast("long").alias("n_violating_classes"),
            F.sum(F.when(viol, F.col("class_size")).otherwise(0))
            .cast("long")
            .alias("n_exposed_rows"),
            F.min("class_size").cast("long").alias("min_class"),
        )

    lvl0 = level(
        c.select(
            F.col("c_nationkey").alias("qid1"),
            F.col("c_mktsegment").alias("qid2"),
        ),
        0,
    )
    lvl1 = level(
        c.join(
            F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]
        ).select(
            F.col("n_regionkey").alias("qid1"),
            F.col("c_mktsegment").alias("qid2"),
        ),
        1,
    )
    return lvl0.unionByName(lvl1).orderBy("level")


# ---------------------------------------------------------------------------
# Balanced shard assignment for export
# ---------------------------------------------------------------------------

N_SHARDS = 8


@register(
    "q_balanced_shards",
    oracle=f"""
WITH d AS (
  SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
),
ranked AS (
  SELECT doc_id, n_tokens,
         ROW_NUMBER() OVER (ORDER BY n_tokens DESC, doc_id) AS r
  FROM d
),
assigned AS (
  SELECT doc_id, n_tokens,
         CAST(CASE WHEN ((r - 1) // {N_SHARDS}) % 2 = 0
                   THEN (r - 1) % {N_SHARDS}
                   ELSE {N_SHARDS - 1} - ((r - 1) % {N_SHARDS})
              END AS INT) AS shard
  FROM ranked
),
per AS (
  SELECT shard,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS shard_tokens
  FROM assigned GROUP BY shard
),
tot AS (SELECT MAX(shard_tokens) AS mx, MIN(shard_tokens) AS mn FROM per)
SELECT p.shard, p.n_docs, p.shard_tokens,
       ROUND(t.mx * 1.0 / t.mn, 4) AS imbalance_ratio
FROM per p CROSS JOIN tot t
ORDER BY p.shard
""",
)
def q_balanced_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-balanced shard assignment for training-data export:
    documents ranked by token count descending are dealt
    boustrophedon (serpentine) across {N_SHARDS} shards — the
    deterministic one-pass approximation of greedy
    longest-processing-time bin packing that keeps every shard's
    token total within a few percent (the imbalance_ratio column is
    the audit). Balanced shards are what make data-parallel training
    steps finish together; the ratio is the straggler bound.

    Determinism: rank over (tokens desc, doc_id); the serpentine
    shard function is pure integer arithmetic on the rank.

    Scale shape: one tokenize scan, one global rank. The rank is the
    only total-order operation; at extreme corpus scale it swaps to
    range-partitioned bucketing on approx token-count quantiles (the
    q_histogram_equidepth machinery), trading a provable bound for
    no global sort — documented trade, same interface."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens(F.col("text"))).alias("n_tokens")
    )
    r = F.row_number().over(Window.orderBy(F.desc("n_tokens"), "doc_id"))
    fwd = (F.col("r") - 1) % N_SHARDS
    shard = F.when(
        F.floor((F.col("r") - 1) / N_SHARDS) % 2 == 0, fwd
    ).otherwise(F.lit(N_SHARDS - 1) - fwd)
    assigned = d.withColumn("r", r).select(
        "doc_id", "n_tokens", shard.cast("int").alias("shard")
    )
    per = assigned.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("shard_tokens"),
    )
    tot = per.agg(
        F.max("shard_tokens").alias("mx"), F.min("shard_tokens").alias("mn")
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "n_docs",
            "shard_tokens",
            F.round(F.col("mx") * F.lit(1.0) / F.col("mn"), 4).alias(
                "imbalance_ratio"
            ),
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# Corpus datasheet (one-row release summary)
# ---------------------------------------------------------------------------


@register(
    "q_corpus_datasheet",
    oracle="""
WITH d AS (
  SELECT doc_id, source, lang, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         md5(text) AS h
  FROM documents
),
langs AS (SELECT lang, COUNT(*) AS c FROM d GROUP BY 1),
lt AS (SELECT SUM(c) AS n FROM langs),
lang_ent AS (
  SELECT ROUND(SUM(CAST(ROUND(-(c * 1.0 / lt.n)
               * ROUND(ln(c * 1.0 / lt.n), 6) * 1000000) AS BIGINT))
               / 1000000.0, 4) AS h
  FROM langs CROSS JOIN lt
),
dups AS (
  SELECT CAST(COUNT(*) - COUNT(DISTINCT h) AS BIGINT) AS n_dup_texts
  FROM d
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(MIN(n_tokens) AS BIGINT) AS min_tokens,
       CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
       ROUND(SUM(n_tokens) * 1.0 / COUNT(*), 4) AS mean_tokens,
       (SELECT h FROM lang_ent) AS lang_entropy_nats,
       (SELECT n_dup_texts FROM dups) AS n_dup_texts
FROM d
""",
)
def q_corpus_datasheet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-row corpus datasheet (Gebru et al.): document/source/
    language census, token and character totals, length extremes,
    language-distribution entropy, and the exact duplicate count —
    the summary panel a dataset release ships with and the first
    thing a consumer reads. Composes the signals the dedicated
    operators compute in depth (q_text_stats, q_dedup_exact,
    q_source_mixture) into the release artifact.

    Determinism: counts and integer ratios; the entropy's per-lang ln
    is rounded at 6 dp before the (tiny, lang-count-sized) sum.

    Scale shape: ONE scan computing per-doc tokens + text hash feeds
    every statistic; the language entropy and dup count aggregate the
    same frame. All reductions are map-side combinable; the datasheet
    is a broadcast-sized single row."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.size(tokens(F.col("text"))).alias("n_tokens"),
        F.md5("text").alias("h"),
    )
    langs = d.groupBy("lang").agg(F.count(F.lit(1)).alias("c"))
    lt = langs.agg(F.sum("c").alias("n"))
    p = F.col("c") * F.lit(1.0) / F.col("n")
    lang_ent = (
        langs.crossJoin(F.broadcast(lt))
        .agg(
            F.round(
                F.sum(
                    F.round(-p * F.round(F.log(p), 6) * 1_000_000).cast(
                        "long"
                    )
                )
                / 1_000_000.0,
                4,
            ).alias("h")
        )
    )
    dups = d.agg(
        (F.count(F.lit(1)) - F.countDistinct("h"))
        .cast("long")
        .alias("n_dup_texts")
    )
    base = d.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("source").cast("long").alias("n_sources"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.min("n_tokens").cast("long").alias("min_tokens"),
        F.max("n_tokens").cast("long").alias("max_tokens"),
        F.round(
            F.sum("n_tokens") * F.lit(1.0) / F.count(F.lit(1)), 4
        ).alias("mean_tokens"),
    )
    return (
        base.crossJoin(F.broadcast(lang_ent.select(F.col("h").alias("lang_entropy_nats"))))
        .crossJoin(F.broadcast(dups))
    )


# ---------------------------------------------------------------------------
# Differentially-private release census (seeded Laplace mechanism)
# ---------------------------------------------------------------------------

DP_EPSILON = 1.0  # per-cell privacy budget for the count release


@register(
    "q_dp_census",
    oracle=f"""
WITH c AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2
),
noise AS (
  SELECT source, lang, n,
         (({{h}} + 0.5) / 4294967296.0) - 0.5 AS v
  FROM c
)
SELECT source, lang,
       CAST(GREATEST(0, CAST(ROUND(
         (n - (1.0 / {DP_EPSILON})
                * CASE WHEN v < 0 THEN -1.0 ELSE 1.0 END
                * ln(1.0 - 2.0 * abs(v)))
         * 10000) AS BIGINT)) AS BIGINT) AS noisy_n_x10k
FROM noise
ORDER BY source, lang
""".replace(
        "{h}",
        "CAST(('0x' || substr(md5(source || ':' || lang || ':dp'), 1, 8))"
        " AS BIGINT)",
    ),
)
def q_dp_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Differentially-private count release: per-(source, lang) document
    counts through the Laplace mechanism (sensitivity 1, epsilon
    {DP_EPSILON}) with non-negativity post-processing — the standard
    way a data owner publishes corpus composition without exposing
    exact membership counts. Noise is SEEDED (inverse-CDF of an
    md5-hash uniform per cell, the same h32 determinism rule as every
    sampler here) so releases are reproducible and both engines derive
    bit-identical noise; a production release swaps the seed source for
    a one-time secret draw — the mechanism, sensitivity accounting, and
    post-processing are exactly what ships. Output is quantized to
    1e-4 units (x10k BIGINT) so the hash compares integers, not
    float text.

    Scale shape: one map-side-combinable count aggregate (cell space =
    |sources| x |langs|), then per-cell scalar math. Scan-bound at any
    corpus size."""
    from openmaptiles_zh_modifier_spark.functions.text import h32

    c = (
        load(spark, sf_dir, "documents")
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    u = (
        h32(F.concat_ws(":", F.col("source"), F.col("lang"), F.lit("dp")))
        + 0.5
    ) / F.lit(4294967296.0)
    v = u - 0.5
    lap = (
        (1.0 / DP_EPSILON)
        * F.when(v < 0, -1.0).otherwise(1.0)
        * F.log(1.0 - 2.0 * F.abs(v))
    )
    return c.select(
        "source",
        "lang",
        F.greatest(
            F.lit(0), F.round((F.col("n") - lap) * 10000).cast("long")
        ).alias("noisy_n_x10k"),
    ).orderBy("source", "lang")


# ---------------------------------------------------------------------------
# PII scrubbing (round 8): regex redaction of emails / phones / IPv4
# ---------------------------------------------------------------------------

# Java-regex/RE2 common subset (no lookaround); identical pattern strings
# run on both engines
PII_EMAIL = "[A-Za-z0-9._]+@[A-Za-z0-9.-]+\\.[a-z]{2,}"
PII_PHONE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_IPV4 = "([0-9]{1,3}\\.){3}[0-9]{1,3}"


@register(
    "q_pii_scrub",
    oracle=f"""
WITH injected AS (
  SELECT doc_id, source,
         text ||
         CASE doc_id % 3
           WHEN 0 THEN ' contact user' || (doc_id % 20) || '@mail'
                       || (doc_id % 3) || '.example from 203.0.113.'
                       || (doc_id % 250)
           WHEN 1 THEN ' call ' || (100 + doc_id % 900) || '-555-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           ELSE ''
         END AS t
  FROM documents
),
scrubbed AS (
  SELECT source, t,
         len(regexp_extract_all(t, '{PII_EMAIL}')) AS n_email,
         len(regexp_extract_all(t, '{PII_PHONE}')) AS n_phone,
         regexp_replace(
           regexp_replace(
             regexp_replace(t, '{PII_EMAIL}', '[EMAIL]', 'g'),
             '{PII_PHONE}', '[PHONE]', 'g'),
           '{PII_IPV4}', '[IP]', 'g') AS clean
  FROM injected
),
counted AS (
  SELECT source, n_email, n_phone,
         len(regexp_extract_all(clean, '\\[IP\\]')) AS n_ip,
         len(t) - len(clean) AS chars_delta
  FROM scrubbed
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_email) AS BIGINT) AS n_emails,
       CAST(SUM(n_phone) AS BIGINT) AS n_phones,
       CAST(SUM(n_ip) AS BIGINT) AS n_ips,
       CAST(SUM(chars_delta) AS BIGINT) AS chars_removed
FROM counted
GROUP BY source
ORDER BY source
""",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction — the governance pass every published corpus runs:
    emails, NNN-NNN-NNNN phone numbers, and IPv4 literals are replaced
    by typed mask tokens via a fixed regexp_replace chain (patterns in
    the Java-regex/RE2 common subset so the oracle runs the identical
    strings). The fixture injects deterministic PII derived from doc_id
    into a third of documents each for email+IP and phone, leaving a
    third clean — the report counts redactions per kind and the net
    character delta per source. IP matches are counted AFTER the email
    scrub (an address inside a hostname must not double-count) by
    counting [IP] masks in the final text — order of the chain is load-
    bearing and pinned by the hash.

    Scale shape: pure in-row regexp work (codegen'd, no UDF) plus one
    combinable per-source aggregate — the cheapest possible shape; at
    100 TB this pass is scan-bound, exactly as it should be."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    m = F.col("doc_id") % 3
    inj = F.when(
        m == 0,
        F.concat(
            F.lit(" contact user"),
            (F.col("doc_id") % 20).cast("string"),
            F.lit("@mail"),
            (F.col("doc_id") % 3).cast("string"),
            F.lit(".example from 203.0.113."),
            (F.col("doc_id") % 250).cast("string"),
        ),
    ).when(
        m == 1,
        F.concat(
            F.lit(" call "),
            (100 + F.col("doc_id") % 900).cast("string"),
            F.lit("-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.lit(""))
    t = F.concat(F.col("text"), inj)
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "[EMAIL]"),
            PII_PHONE,
            "[PHONE]",
        ),
        PII_IPV4,
        "[IP]",
    )
    scrubbed = docs.select(
        "source",
        F.regexp_count(t, F.lit(PII_EMAIL)).alias("n_email"),
        F.regexp_count(t, F.lit(PII_PHONE)).alias("n_phone"),
        F.regexp_count(clean, F.lit("\\[IP\\]")).alias("n_ip"),
        (F.length(t) - F.length(clean)).alias("chars_delta"),
    )
    return (
        scrubbed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_email").alias("n_emails"),
            F.sum("n_phone").alias("n_phones"),
            F.sum("n_ip").alias("n_ips"),
            F.sum("chars_delta").alias("chars_removed"),
        )
        .orderBy("source")
    )


LDIV_L = 3  # minimum distinct sensitive values per equivalence class


@register(
    "q_ldiversity",
    oracle=f"""
WITH sens AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(c_acctbal * 100 AS BIGINT) % 10 AS sens
  FROM customer
),
q0 AS (
  SELECT c_nationkey, c_mktsegment,
         COUNT(*) AS class_size,
         COUNT(DISTINCT sens) AS n_sens
  FROM sens GROUP BY 1, 2
),
lvl0 AS (
  SELECT 0 AS level,
         CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(SUM(CASE WHEN n_sens < {LDIV_L} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_violating_classes,
         CAST(SUM(CASE WHEN n_sens < {LDIV_L} THEN class_size ELSE 0 END)
              AS BIGINT) AS n_exposed_rows,
         CAST(MIN(n_sens) AS BIGINT) AS min_diversity
  FROM q0
),
q1 AS (
  SELECT n.n_regionkey, s.c_mktsegment,
         COUNT(*) AS class_size,
         COUNT(DISTINCT s.sens) AS n_sens
  FROM sens s JOIN nation n ON n.n_nationkey = s.c_nationkey
  GROUP BY 1, 2
),
lvl1 AS (
  SELECT 1 AS level,
         CAST(COUNT(*) AS BIGINT) AS n_classes,
         CAST(SUM(CASE WHEN n_sens < {LDIV_L} THEN 1 ELSE 0 END)
              AS BIGINT) AS n_violating_classes,
         CAST(SUM(CASE WHEN n_sens < {LDIV_L} THEN class_size ELSE 0 END)
              AS BIGINT) AS n_exposed_rows,
         CAST(MIN(n_sens) AS BIGINT) AS min_diversity
  FROM q1
)
SELECT * FROM lvl0 UNION ALL SELECT * FROM lvl1
ORDER BY level
""",
)
def q_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (round 12) — k-anonymity's stronger sibling: a
    class of >= k rows still leaks when every row shares ONE sensitive
    value (the homogeneity attack), so each equivalence class must
    carry >= l DISTINCT sensitive values. Sensitive attribute here is
    the account-balance cents residue (deterministic integer bucket);
    quasi-identifiers and the one generalization step (nation -> region)
    mirror q_kanonymity, so the two audits read side by side as the
    release-review pair.

    Scale shape: per level one combinable count-distinct on the
    (qid, sens) key (exact distinct via the two-level groupBy Spark
    plans for COUNT DISTINCT), then a tiny summary; the generalization
    join is against the broadcast 25-row nation dim."""
    c = load(spark, sf_dir, "customer").select(
        "c_nationkey",
        "c_mktsegment",
        ((F.col("c_acctbal") * 100).cast("bigint") % 10).alias("sens"),
    )
    n = load(spark, sf_dir, "nation")

    def level(df: DataFrame, lvl: int) -> DataFrame:
        classes = df.groupBy("qid1", "qid2").agg(
            F.count(F.lit(1)).alias("class_size"),
            F.count_distinct("sens").alias("n_sens"),
        )
        viol = F.col("n_sens") < LDIV_L
        return classes.agg(
            F.lit(lvl).alias("level"),
            F.count(F.lit(1)).cast("long").alias("n_classes"),
            F.sum(viol.cast("int")).cast("long").alias("n_violating_classes"),
            F.sum(F.when(viol, F.col("class_size")).otherwise(0))
            .cast("long")
            .alias("n_exposed_rows"),
            F.min("n_sens").cast("long").alias("min_diversity"),
        )

    lvl0 = level(
        c.select(
            F.col("c_nationkey").alias("qid1"),
            F.col("c_mktsegment").alias("qid2"),
            "sens",
        ),
        0,
    )
    lvl1 = level(
        c.join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"]).select(
            F.col("n_regionkey").alias("qid1"),
            F.col("c_mktsegment").alias("qid2"),
            "sens",
        ),
        1,
    )
    return lvl0.unionByName(lvl1).orderBy("level")
