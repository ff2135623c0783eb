"""Custom aggregate (UDAF) surface via Arrow-batched ``applyInPandas`` —
the engine's path for aggregates Catalyst lacks (SURVEY.md §2.9).

The demo aggregate is integer mode (most frequent value, smallest wins
ties): deterministic integer math, so the DuckDB oracle reproduces it
exactly and the gate covers the whole grouped-map path, not just plumbing.

Scale shape: applyInPandas shuffles once on the group key and streams each
group through pandas as Arrow batches. Groups must fit in executor memory —
the documented constraint vs built-in aggregates (which spill); for
high-cardinality keys that's exactly right, for few huge groups pre-
aggregate first (as any UDAF design at 100 TB must)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.registry import load, register


def _mode_agg(pdf: pd.DataFrame) -> pd.DataFrame:
    qty = pdf["l_quantity"].astype("int64")
    counts = qty.value_counts()
    top = counts.max()
    mode_val = min(counts[counts == top].index)
    return pd.DataFrame(
        {
            "l_returnflag": [pdf["l_returnflag"].iloc[0]],
            "mode_qty": [mode_val],
            "mode_count": [int(top)],
            "n": [len(pdf)],
        }
    )


@register(
    "q_udaf_mode",
    oracle="""
WITH counted AS (
  SELECT l_returnflag, l_quantity::BIGINT AS q, COUNT(*) AS c
  FROM lineitem GROUP BY 1, 2
),
best AS (
  SELECT l_returnflag, MAX(c) AS top FROM counted GROUP BY 1
)
SELECT c.l_returnflag,
       MIN(c.q) AS mode_qty,
       MIN(b.top) AS mode_count,
       (SELECT COUNT(*) FROM lineitem l WHERE l.l_returnflag = c.l_returnflag) AS n
FROM counted c JOIN best b ON b.l_returnflag = c.l_returnflag AND c.c = b.top
GROUP BY c.l_returnflag
ORDER BY c.l_returnflag
""",
)
def q_udaf_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag mode of l_quantity via applyInPandas (grouped-map
    UDAF). One shuffle on the group key; the Python stage sees each group
    once as Arrow batches."""
    li = load(spark, sf_dir, "lineitem").select("l_returnflag", "l_quantity")
    out = li.groupBy("l_returnflag").applyInPandas(
        _mode_agg,
        schema="l_returnflag string, mode_qty long, mode_count long, n long",
    )
    return out.orderBy("l_returnflag")


# -------------------------------------------------------------------------
# Python UDTF: 1->N table function via LATERAL (SURVEY.md §2.9 UDTF surface)
# -------------------------------------------------------------------------


@register(
    "q_udtf_sentences",
    oracle="""
WITH s AS (
  SELECT source, trim(sent) AS sent
  FROM (SELECT source, unnest(string_split(text, '.')) AS sent FROM documents)
  WHERE trim(sent) <> ''
)
SELECT source,
       COUNT(*) AS n_sentences,
       ROUND(AVG(length(sent)), 4) AS avg_sent_len,
       MAX(length(sent)) AS max_sent_len
FROM s
GROUP BY source
ORDER BY source
""",
)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native Python UDTF (Spark 3.5+ `@udtf`) splitting documents into
    sentences, applied per-row via LATERAL, then aggregated per source.
    Unlike explode (which needs the array materialized as a column first),
    the UDTF streams variable-length output rows directly from Python —
    the right shape for generators whose output can't be precomputed as
    one array value. Arrow-batched like pandas UDFs; the aggregate stays
    JVM-side."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent string")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            for part in text.split("."):
                p = part.strip(" ")
                if p:
                    yield (p,)

    spark.udtf.register("split_sentences_udtf", SplitSentences)
    load(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf_src")
    return spark.sql(
        """
SELECT source,
       COUNT(*) AS n_sentences,
       ROUND(AVG(length(sent)), 4) AS avg_sent_len,
       MAX(length(sent)) AS max_sent_len
FROM docs_udtf_src, LATERAL split_sentences_udtf(text)
GROUP BY source
ORDER BY source
"""
    )
