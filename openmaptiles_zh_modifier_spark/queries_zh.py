"""zh segmentation queries (round 8).

`q_zh_segment_fmm` registers the forward-maximum-match segmenter
(operators/zh_segment.py) against a deterministic simplified-Chinese
fixture over `documents`, with a DuckDB oracle that replays the exact
join-then-fold structure. The fixture deliberately includes the three
round-7 OOV cases (茶几上, 理了个发, 干了一天活) so the driver gate
itself records what segmentation-before-conversion does and does not
fix: 茶几上 converts correctly per word (the furniture word is in the
lexicon), while the separable-verb splits still fall to char defaults —
the measured justification for SEP_VERB_RULES_S2T in functions/zh.py.
Parity target: word-level conversion in OMTZHModifier.java:228,233.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from openmaptiles_zh_modifier_spark.functions.zh import S2T_FROM, S2T_TO
from openmaptiles_zh_modifier_spark.operators.zh_segment import (
    fmm_oracle_sql,
    fmm_segment_convert,
)
from openmaptiles_zh_modifier_spark.registry import (
    _pick_spark,
    _pick_sql,
    load,
    local_frame,
    register,
)

# simplified-text fixture, cycled by doc_id (covers: protected compound,
# separable verbs, longest-match preference, plain names, mixed script)
SEG_TEXTS = [
    "茶几上",
    "理了个发",
    "干了一天活",
    "头发和茶几",
    "台北车站",
    "广州东门市场",
    "国语学校门口",
    "马场公园",
    "北京面馆吃面",
    "几个人理发",
]

# (simplified word, traditional rendering) — incl. 4-char 国语学校 beside
# its 2-char constituents so the gate exercises maximum-match preference,
# and identity entries (茶几, 台北) showing in-lexicon keep-words
SEG_LEXICON = [
    ("茶几", "茶几"),
    ("头发", "頭髮"),
    ("理发", "理髮"),
    ("干活", "幹活"),
    ("车站", "車站"),
    ("台北", "台北"),
    ("广州", "廣州"),
    ("东门", "東門"),
    ("市场", "市場"),
    ("国语", "國語"),
    ("学校", "學校"),
    ("国语学校", "國語學校"),
    ("马场", "馬場"),
    ("公园", "公園"),
    ("北京", "北京"),
    ("面馆", "麵館"),
    ("吃面", "吃麵"),
    ("几个", "幾個"),
    ("门口", "門口"),
    ("一天", "一天"),
]

_LMAX = max(len(w) for w, _ in SEG_LEXICON)

_DOCS_CTE = (
    "SELECT doc_id, "
    + _pick_sql(SEG_TEXTS, "doc_id")
    + " AS text FROM documents"
)

_LEX_VALUES = ", ".join(f"('{w}', '{d}')" for w, d in SEG_LEXICON)


@register(
    "q_zh_segment_fmm",
    oracle=fmm_oracle_sql(_DOCS_CTE, _LEX_VALUES, S2T_FROM, S2T_TO, _LMAX),
)
def q_zh_segment_fmm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FMM segmentation + per-word conversion over the fixture corpus.

    Scale shape (see operators/zh_segment.py): candidate substrings are
    a bounded map-side explode, dictionary matching is ONE broadcast
    join, the greedy walk is a per-row O(len) fold over the precomputed
    jump array, and the only shuffles key on doc_id."""
    import pyspark.sql.functions as F

    docs = load(spark, sf_dir, "documents").select("doc_id")
    src = docs.select(
        "doc_id", _pick_spark(SEG_TEXTS, F.col("doc_id")).alias("text")
    )
    lex = local_frame(spark, SEG_LEXICON, "word string, dst string")
    out = fmm_segment_convert(src, lex, S2T_FROM, S2T_TO, lmax=_LMAX)
    return out.orderBy("doc_id")


# ---------------------------------------------------------------------------
# FMM vs production-fold conversion equivalence audit (round 9,
# VERDICT r8 #6)
# ---------------------------------------------------------------------------

from openmaptiles_zh_modifier_spark.functions.zh import (  # noqa: E402
    KEEP_WORDS_S2T,
    S2T_PHRASES,
    to_traditional,
    to_traditional_py,
    to_traditional_sql,
)

# the PRODUCTION-equivalent FMM lexicon: every phrase-fold source and
# keep-word, each mapped through the production conversion itself (the
# pure-Python twin, property-locked to the Column version), so the two
# mechanisms share one vocabulary by construction
_AUDIT_LEX = sorted(
    {w for w, _ in S2T_PHRASES} | {w for w, _ in KEEP_WORDS_S2T}
)
_AUDIT_PAIRS = [(w, to_traditional_py(w)) for w in _AUDIT_LEX]
_AUDIT_LMAX = max(len(w) for w in _AUDIT_LEX)
_AUDIT_LEX_VALUES = ", ".join(f"('{w}', '{d}')" for w, d in _AUDIT_PAIRS)

_AUDIT_FMM_SQL = fmm_oracle_sql(
    _DOCS_CTE, _AUDIT_LEX_VALUES, S2T_FROM, S2T_TO, _AUDIT_LMAX
)


@register(
    "q_zh_convert_audit",
    oracle=f"""
WITH f AS (SELECT * FROM ({_AUDIT_FMM_SQL}) t),
d AS ({_DOCS_CTE}),
cmp AS (
  SELECT d.doc_id, d.text, f.converted AS fmm_out,
         {to_traditional_sql('d.text')} AS fold_out
  FROM d JOIN f ON f.doc_id = d.doc_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN fmm_out = fold_out THEN 1 ELSE 0 END) AS BIGINT)
         AS n_agree,
       CAST(SUM(CASE WHEN fmm_out <> fold_out THEN 1 ELSE 0 END) AS BIGINT)
         AS n_diff,
       COALESCE(string_agg(DISTINCT text, '/' ORDER BY text)
                FILTER (WHERE fmm_out <> fold_out), '') AS diff_texts
FROM cmp
""",
)
def q_zh_convert_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row audit locking the two conversion mechanisms together
    (VERDICT r8 #6): the FMM segmenter run with the PRODUCTION phrase
    table as its lexicon vs the production translate+phrase fold, over
    the segmentation fixture corpus. n_agree counts docs where
    segmentation-then-convert reproduces the fold exactly; diff_texts
    PINS the divergence set — expected: exactly the separable-verb
    texts (理了个发, 干了一天活), where the fold's gap rules bridge the
    aspect-marker infix that no contiguous-lexicon segmenter can span
    (the mechanism justification measured in tests/test_zh_segment.py).
    Any future vocabulary sweep that drifts the mechanisms apart moves
    n_diff/diff_texts and fails the driver gate.

    Scale shape: the fold is in-row expression work; the FMM side is
    the q_zh_segment_fmm plan (bounded explode + one broadcast join +
    per-row fold); the compare is one doc_id equi-join and a single
    combinable aggregate."""
    import pyspark.sql.functions as F

    docs = load(spark, sf_dir, "documents").select("doc_id")
    src = docs.select(
        "doc_id", _pick_spark(SEG_TEXTS, F.col("doc_id")).alias("text")
    )
    lex = local_frame(spark, _AUDIT_PAIRS, "word string, dst string")
    fmm = fmm_segment_convert(
        src, lex, S2T_FROM, S2T_TO, lmax=_AUDIT_LMAX
    ).select("doc_id", F.col("converted").alias("fmm_out"))
    cmp = src.join(fmm, "doc_id").select(
        "text", "fmm_out", to_traditional("text").alias("fold_out")
    )
    ne = F.col("fmm_out") != F.col("fold_out")
    return cmp.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(~ne, 1).otherwise(0)).alias("n_agree"),
        F.sum(F.when(ne, 1).otherwise(0)).alias("n_diff"),
        F.array_join(
            F.array_sort(F.collect_set(F.when(ne, F.col("text")))), "/"
        ).alias("diff_texts"),
    )
