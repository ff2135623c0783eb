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
