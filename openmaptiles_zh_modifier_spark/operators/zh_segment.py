"""Forward-maximum-match (FMM) dictionary segmentation, Spark-first.

The reference converts zh names WORD-level via opencc4j
(OMTZHModifier.java:228,233), which internally segments against its
dictionary before converting. This operator is that segmentation step as
a first-class distributed primitive: segment each string greedily
longest-match-first against a lexicon DataFrame, then convert PER WORD —
dictionary words map through the lexicon's target column; unmatched
single chars fall back to the char-level translate alphabet.

Why this shape scales (the 100 TB story):
- Dictionary matching is a BROADCAST JOIN, not a per-row dict lookup in
  Python: every (position, candidate-length) substring of the corpus is
  a row, joined against the lexicon (real-world segmentation lexicons
  are a few MB — classic broadcast territory). The candidate explode is
  a bounded (LMAX-1)x linear blowup, generated and filtered map-side.
- The inherently sequential part of FMM (matches CONSUME positions, so
  segment choice at i depends on the choice at i-1) is reduced to a
  per-row O(len) fold over a precomputed jump array: jump[i] = longest
  lexicon match at i (default 1). FMM's greedy walk is exactly the
  orbit of i -> i + jump[i], so after the join computes all jumps in
  parallel, one aggregate() with O(1) work per step replays the walk.
  State is ONE delimited VARCHAR (next_pos, segments, converted,
  n_words) — multi-field fold state as one string keeps the identical
  fold expressible in DuckDB's list_reduce for the oracle.
- Only two shuffles, both on doc_id (the jump groupBy and nothing else
  if the source is already doc-partitioned).

Limit demonstrated by tests/test_zh_segment.py: FMM over a CONTIGUOUS
word lexicon cannot fix separable verbs (离合词) — 理了个发 segments as
理/了/个/发 because the infix 了个 splits the dictionary word 理发, and
per-word conversion of the singles still picks the 发->發 char default.
That is why functions/zh.py carries gap rules (SEP_VERB_RULES_S2T) in
ADDITION to word-level machinery; opencc4j shares the blind spot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEP = "\x02"


def fmm_segment_convert(
    src: DataFrame,
    lex: DataFrame,
    char_from: str,
    char_to: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lmax: int = 4,
) -> DataFrame:
    """Segment ``src[text_col]`` by FMM against ``lex(word, dst)`` and
    convert per word. Returns (id_col, segmented, converted, n_words)
    where ``segmented`` joins segments with '/' and ``converted`` maps
    dictionary words via ``dst`` and single chars via
    translate(char_from -> char_to).

    Contract: zero-length texts are dropped (no output row). Without the
    guard, ``F.sequence(1, length)`` on an empty string yields the
    DESCENDING sequence [1, 0] — a spurious i=0 position row feeding a
    misindexed element_at in the fold — while the DuckDB oracle's
    range(1, length+1) is simply empty; filtering makes both engines
    drop empties identically (ADVICE r8 #2)."""
    did, txt = F.col(id_col), F.col(text_col)
    src = src.where(F.length(txt) > 0)
    pos = src.select(
        did, txt, F.explode(F.sequence(F.lit(1), F.length(txt))).alias("i")
    )
    # candidate substrings of every lexicon-relevant length at every
    # position; length(cand)=L guards the string tail (a truncated
    # substring must not claim the longer jump)
    cand = (
        pos.select(
            did,
            F.col("i"),
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(L).alias("L"),
                            txt.substr(F.col("i"), F.lit(L)).alias("cand"),
                        )
                        for L in range(2, lmax + 1)
                    ]
                )
            ).alias("s"),
        )
        .select(did, "i", F.col("s.L").alias("L"), F.col("s.cand").alias("cand"))
        .where(F.length("cand") == F.col("L"))
    )
    matched = (
        cand.join(F.broadcast(lex), cand["cand"] == lex["word"])
        .groupBy(id_col, "i")
        .agg(F.max("L").alias("L"), F.max_by("dst", "L").alias("dst"))
    )
    jumps = pos.join(matched, [id_col, "i"], "left").select(
        did,
        txt,
        F.col("i"),
        F.coalesce("L", F.lit(1)).alias("L"),
        "dst",
    )
    per_doc = jumps.groupBy(id_col, text_col).agg(
        F.array_sort(F.collect_list(F.struct("i", "L", "dst"))).alias("a")
    )

    def step(acc, i):
        nxt = F.split_part(acc, F.lit(_SEP), F.lit(1)).cast("int")
        seg0 = F.split_part(acc, F.lit(_SEP), F.lit(2))
        conv0 = F.split_part(acc, F.lit(_SEP), F.lit(3))
        nw = F.split_part(acc, F.lit(_SEP), F.lit(4)).cast("int")
        entry = F.element_at(F.col("a"), i.cast("int"))
        ln = entry.getField("L")
        dst = entry.getField("dst")
        word = F.col(text_col).substr(i.cast("int"), ln)
        new_seg = F.when(seg0 == "", word).otherwise(
            F.concat(seg0, F.lit("/"), word)
        )
        new_conv = F.concat(
            conv0, F.coalesce(dst, F.translate(word, char_from, char_to))
        )
        new_state = F.concat_ws(
            _SEP,
            (i + ln).cast("string"),
            new_seg,
            new_conv,
            (nw + 1).cast("string"),
        )
        return F.when(i < nxt, acc).otherwise(new_state)

    init = F.concat_ws(_SEP, F.lit("1"), F.lit(""), F.lit(""), F.lit("0"))
    state = F.aggregate(
        F.sequence(F.lit(1), F.length(text_col)), init, step
    )
    return per_doc.select(
        did,
        F.split_part(state, F.lit(_SEP), F.lit(2)).alias("segmented"),
        F.split_part(state, F.lit(_SEP), F.lit(3)).alias("converted"),
        F.split_part(state, F.lit(_SEP), F.lit(4)).cast("long").alias("n_words"),
    )


def fmm_oracle_sql(
    docs_cte: str,
    lex_values: str,
    char_from: str,
    char_to: str,
    lmax: int = 4,
) -> str:
    """DuckDB twin of :func:`fmm_segment_convert` — identical join-then-
    fold structure; the fold is list_reduce with the same one-VARCHAR
    state (struct accumulators mutate in DuckDB 1.0 lambdas — see the
    round-7 finding — so the state stays a delimited string)."""
    lengths = ", ".join(str(L) for L in range(2, lmax + 1))
    return f"""
WITH docs AS ({docs_cte}),
lex(word, dst) AS (VALUES {lex_values}),
pos AS (
  SELECT doc_id, text, unnest(range(1, length(text) + 1)) AS i FROM docs
),
cand AS (
  SELECT doc_id, i, L, substr(text, CAST(i AS INT), L) AS cand
  FROM pos, (SELECT unnest([{lengths}]) AS L)
),
matched AS (
  SELECT doc_id, i, MAX(c.L) AS L, arg_max(lex.dst, c.L) AS dst
  FROM cand c JOIN lex ON c.cand = lex.word AND length(c.cand) = c.L
  GROUP BY doc_id, i
),
per_doc AS (
  SELECT p.doc_id, p.text,
         list(COALESCE(m.L, 1) ORDER BY p.i) AS Ls,
         list(m.dst ORDER BY p.i) AS Ds
  FROM pos p LEFT JOIN matched m ON m.doc_id = p.doc_id AND m.i = p.i
  GROUP BY p.doc_id, p.text
),
folded AS (
  SELECT doc_id,
    list_reduce(
      list_prepend(
        '1' || chr(2) || chr(2) || chr(2) || '0',
        list_transform(range(1, length(text) + 1),
                       x -> CAST(x AS VARCHAR))
      ),
      (acc, xi) -> CASE
        WHEN CAST(xi AS INT) < CAST(split_part(acc, chr(2), 1) AS INT)
        THEN acc
        ELSE CAST(CAST(xi AS INT) + Ls[CAST(xi AS INT)] AS VARCHAR)
          || chr(2)
          || CASE WHEN split_part(acc, chr(2), 2) = ''
                  THEN substr(text, CAST(xi AS INT), Ls[CAST(xi AS INT)])
                  ELSE split_part(acc, chr(2), 2) || '/'
                       || substr(text, CAST(xi AS INT), Ls[CAST(xi AS INT)])
             END
          || chr(2)
          || split_part(acc, chr(2), 3)
          || COALESCE(Ds[CAST(xi AS INT)],
                      translate(substr(text, CAST(xi AS INT),
                                       Ls[CAST(xi AS INT)]),
                                '{char_from}', '{char_to}'))
          || chr(2)
          || CAST(CAST(split_part(acc, chr(2), 4) AS INT) + 1 AS VARCHAR)
      END
    ) AS state
  FROM per_doc
)
SELECT doc_id,
       split_part(state, chr(2), 2) AS segmented,
       split_part(state, chr(2), 3) AS converted,
       CAST(split_part(state, chr(2), 4) AS BIGINT) AS n_words
FROM folded
ORDER BY doc_id
"""
