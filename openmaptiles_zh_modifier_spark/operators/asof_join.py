"""As-of join: for each left row, the most recent right row with
``right.ts <= left.ts`` within the same key — the canonical time-series
alignment operator (Spark has no built-in; SURVEY.md §2.3 extension).

Implemented as union + tag + running ``last(..., ignorenulls=True)`` window:

1. tag right rows 0, left rows 1;
2. union on (key, ts, tag, right-payload-or-null);
3. window per key ordered by (ts, tag, tiebreak): a running
   ``last(payload, ignoreNulls=True)`` carries the latest right payload
   forward; at equal ts the right row sorts first (tag 0 < 1), making the
   match inclusive — identical to DuckDB ASOF JOIN / pandas ``merge_asof``
   backward semantics;
4. keep the tagged left rows.

Scale shape: ONE shuffle on the key (the union is shuffle-free), one sort
within partitions — strictly cheaper than the naive range-join + row_number
(which shuffles both sides AND multiplies rows by the range match), and
skew-safe via AQE since the key is the only partition dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload_cols: list[str],
    tiebreak: str | None = None,
) -> DataFrame:
    """Backward-inclusive as-of join. Returns all ``left`` columns plus
    each right payload column as ``asof_<name>`` (null when no right row
    at-or-before the left timestamp exists for the key).

    ``tiebreak`` (optional, must be in ``payload_cols``): deterministic
    pick among right rows sharing (on, ts) — the largest value wins.
    """
    if tiebreak is not None and tiebreak not in payload_cols:
        raise ValueError("tiebreak must be one of payload_cols")
    lcols = left.columns

    l_tagged = left.withColumn(_TAG, F.lit(1))
    r_tagged = right.select(
        F.col(on),
        F.col(ts),
        F.lit(0).alias(_TAG),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    order = [F.col(ts).asc(), F.col(_TAG).asc()]
    if tiebreak is not None:
        order.append(F.col(f"__p_{tiebreak}").asc_nulls_first())
    w = (
        Window.partitionBy(on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        F.col(_TAG),
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in payload_cols
        ],
    )
    return carried.where(F.col(_TAG) == 1).drop(_TAG)
