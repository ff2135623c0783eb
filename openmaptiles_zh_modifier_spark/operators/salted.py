"""Skew mitigation operators: deterministic key salting for joins and
aggregations.

AQE's skew-join handling (enabled in session.py) splits oversized
sort-merge partitions at runtime, but two shapes still need explicit
salting at 100 TB:

- a shuffled join whose hot key exceeds a single task even after AQE
  splitting (AQE cannot split the *build* side of a hash relation), and
- a high-cardinality-but-skewed aggregation where one group's rows all
  land on one reducer before the partial aggregate can shrink them.

Both operators here are *deterministic* (salt = ``pmod(xxhash64(tiebreak
column), n)``, never ``rand()``): re-running a stage after executor loss
must produce identical task outputs or Spark's retry model silently
duplicates/loses rows on the recompute path.

The reference has no joins at all (SURVEY.md §2.3,
OMTZHModifier.java:134-159); this is engine-extension surface for the
100 TB target.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: str,
    tiebreak: str,
    n_salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed fact side with a (replicable) dim side.

    The skewed side gets a deterministic salt in [0, n_salt) derived from
    its ``tiebreak`` column (any column that varies within a hot key — a
    line number, event id, row id). The dim side is exploded n_salt times,
    so each (key, salt) pair joins exactly one dim replica: the hot key's
    rows spread over n_salt reducers instead of one. Cost: dim side is
    shuffled n_salt×, so this is for dim sides too big to broadcast but
    far smaller than the fact side — the classic mid-size-dimension gap.
    """
    salted_fact = skewed.withColumn(
        SALT_COL, F.pmod(F.xxhash64(F.col(tiebreak)), F.lit(n_salt)).cast("int")
    )
    replicated_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    )
    out = salted_fact.join(replicated_dim, on=[on, SALT_COL], how=how)
    return out.drop(SALT_COL)


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: list[str],
    tiebreak: str,
    n_salt: int = 8,
) -> DataFrame:
    """Two-phase skew-safe aggregation: count + per-column sums.

    Phase 1 aggregates on (keys + salt) — the hot group is split across
    n_salt reducers and collapses to n_salt rows. Phase 2 merges the
    partials on the true keys; its input is at most n_salt × |groups|
    rows, trivially balanced. Count merges as sum-of-counts; sums as
    sum-of-sums (min/max/avg extend the same way — avg as sum+count).

    Spark's own hash aggregate already does map-side partials, which
    handles *most* skew; explicit salting matters when the partial itself
    can't shrink the group (high-cardinality distinct-like payloads) or
    when spill pressure on the hot reducer dominates the stage.
    """
    partial = (
        df.withColumn(
            SALT_COL,
            F.pmod(F.xxhash64(F.col(tiebreak)), F.lit(n_salt)).cast("int"),
        )
        .groupBy(*keys, SALT_COL)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[F.sum(c).alias(f"__sum_{c}") for c in sums],
        )
    )
    return partial.groupBy(*keys).agg(
        F.sum("__n").alias("n"),
        *[F.sum(f"__sum_{c}").alias(f"sum_{c}") for c in sums],
    )
