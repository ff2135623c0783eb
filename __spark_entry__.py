"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``openmaptiles_zh_modifier_spark.registry``;
this module is the thin driver-facing adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from openmaptiles_zh_modifier_spark.registry import ORACLE_SQL, QUERIES  # noqa: E402
from openmaptiles_zh_modifier_spark.session import apply_semantic_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the zh back-fill pipeline) on sf0.001."""
    apply_semantic_confs(spark)
    return QUERIES["zh_backfill"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_semantic_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-checkable query."""
    return dict(ORACLE_SQL)
