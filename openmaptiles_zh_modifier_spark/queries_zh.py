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
    lex = spark.createDataFrame(SEG_LEXICON, "word string, dst string")
    out = fmm_segment_convert(src, lex, S2T_FROM, S2T_TO, lmax=_LMAX)
    return out.orderBy("doc_id")
