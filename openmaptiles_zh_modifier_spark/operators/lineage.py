"""Lineage truncation for iterative loops — localCheckpoint WITHOUT
inheriting the parent plan's size estimate.

Round-13 scale defect, caught by the 10x volume anchor
(tools/gen_skew_bench.py --x10) and diagnosed from a driver thread dump:
``Dataset.localCheckpoint`` cuts the execution lineage, but
``LogicalRDD.rewriteStatsAndConstraints`` ATTACHES the parent plan's
Catalyst size estimate to the new leaf. ``SizeInBytesOnlyStatsPlanVisitor``
estimates a join as the PRODUCT of its children's sizeInBytes (an
unbounded BigInt), so in a loop whose round derives the next state from
the previous state used TWICE (pointer-jumping connected components:
label-of-label self-join), the attached estimate is SQUARED every round
— its digit count doubles per round, and after enough rounds the driver
sits in BigInteger.multiplyToomCook3 for minutes per stats visit while
32 cores idle (observed: 33 CPU-minutes inside one localCheckpoint call
at 10x volume; the 3x run stayed under the threshold, which is exactly
why the 10x protocol exists).

``eager_checkpoint`` materializes through the normal
``Dataset.localCheckpoint`` (keeping its row-copy semantics), then
rebuilds the DataFrame as a FRESH LogicalRDD over the already-
checkpointed rows via ``SparkSession.internalCreateDataFrame`` — the
new leaf reports the session default sizeInBytes instead of the
inherited product, so per-round stats stay O(1) digits. Execution is
unchanged: the scan reads the same checkpointed partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _fresh_logical_rdd(cp: DataFrame) -> DataFrame:
    """Rebuild ``cp`` as a fresh LogicalRDD leaf with session-default
    stats (dropping the inherited, possibly astronomically
    over-estimated size product)."""
    spark = cp.sparkSession
    jdf = cp._jdf  # noqa: SLF001 — JVM handle, stable across 3.x/4.x
    jrdd = jdf.queryExecution().toRdd()
    fresh = spark._jsparkSession.internalCreateDataFrame(  # noqa: SLF001
        jrdd, jdf.schema(), False
    )
    return DataFrame(fresh, spark)


def eager_checkpoint(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint that does NOT propagate the parent plan's
    (possibly astronomically over-estimated) size statistics."""
    cp = df.localCheckpoint(eager=True)
    try:
        return _fresh_logical_rdd(cp)
    except Exception:
        # internal API moved: fall back to the plain checkpoint. Loops
        # still terminate; they just repay the stats tax.
        return cp


def lazy_checkpoint(df: DataFrame) -> DataFrame:
    """LAZY localCheckpoint with the same fresh-stats leaf rebuild as
    :func:`eager_checkpoint` (round 14).

    Semantics: ``localCheckpoint(eager=False)`` marks the plan's RDD
    for MEMORY_AND_DISK persistence WITHOUT running a job — the first
    action materializes it, later references (including multiple
    references inside the SAME action, e.g. a loop state consumed by
    both the next round and a per-round census leg) read the persisted
    blocks. Compared to ``eager_checkpoint`` inside an iterative loop
    this keeps the registered-query contract LAZY (zero jobs at
    construction — the tools/type_audit.py gate) and collapses the
    per-round materialization jobs into stages of the one real action,
    while still truncating the retained logical lineage to a LogicalRDD
    leaf per round. Nothing survives the returned frame: the RDD is
    per-call, unpersisted by the ContextCleaner when the frame is
    dropped — a repeat timed run rebuilds from the parquet inputs."""
    cp = df.localCheckpoint(eager=False)
    try:
        return _fresh_logical_rdd(cp)
    except Exception:
        return cp
