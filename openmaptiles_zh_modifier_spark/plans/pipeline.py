"""The engine's end-to-end zh-backfill run — the reference's ``main``
(OMTZHModifier.java:19-32) re-expressed as: discover -> classify -> one lazy
plan per table -> write back.

The reference processes tables sequentially on one connection with manual
id-range batching; here each table is ONE DataFrame plan whose parallelism
comes from file splits, and tables can be submitted concurrently (they
share the session's scheduler pools). Metrics (S6) come from the engine,
not hand-counted batches.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

from openmaptiles_zh_modifier_spark.catalog import (
    classify_all,
    discover_parquet_tables,
)
from openmaptiles_zh_modifier_spark.operators.zh_backfill import (
    backfill_table,
    updates_frame,
)
from openmaptiles_zh_modifier_spark.sources.io import write_parquet


@dataclass
class TableResult:
    table: str
    id_field: str
    n_rows: int
    n_updated: int
    seconds: float


@dataclass
class RunReport:
    """S6 telemetry: per-table update counts + records/s (the reference's
    recPerSec log line, OMTZHModifier.java:172-176, as data)."""

    tables: list[TableResult] = field(default_factory=list)

    @property
    def total_updated(self) -> int:
        return sum(t.n_updated for t in self.tables)

    def records_per_sec(self) -> float:
        secs = sum(t.seconds for t in self.tables) or 1e-9
        return self.total_updated / secs


def run_backfill(
    spark: SparkSession,
    lake_root: str,
    out_root: str | None = None,
    compat_names_typo: bool = False,
) -> RunReport:
    """Discover every parquet table under ``lake_root``, classify by schema
    (id/osm_id precedence B4), back-fill qualifying tables, and (optionally)
    write the rewritten tables under ``out_root``. Non-qualifying tables are
    skipped exactly like the reference skips them."""
    tables = discover_parquet_tables(spark, lake_root)
    report = RunReport()
    for tc in classify_all(tables):
        df = tables[tc.table]
        t0 = time.perf_counter()
        n_updated = updates_frame(df, tc.id_field, compat_names_typo).count()
        result = backfill_table(df, tc.id_field, compat_names_typo)
        if out_root is not None:
            write_parquet(result, f"{out_root}/{tc.table}.parquet")
            n_rows = spark.read.parquet(f"{out_root}/{tc.table}.parquet").count()
        else:
            n_rows = result.count()
        report.tables.append(
            TableResult(
                tc.table,
                tc.id_field,
                n_rows,
                n_updated,
                round(time.perf_counter() - t0, 4),
            )
        )
    return report


def hstore_text_to_map(col):
    """Parse PostgreSQL hstore TEXT output (``"k"=>"v", "k2"=>"v2"``) into
    a MapType column — how the reference's ``tags`` column surfaces over
    plain JDBC without a custom dialect. Assumes no embedded quotes in
    keys/values (true for OSM name tags)."""
    from pyspark.sql import functions as F

    return F.str_to_map(F.regexp_replace(col, '"', ""), F.lit(", "), F.lit("=>"))


def run_backfill_jdbc(
    spark: SparkSession,
    url: str,
    driver: str,
    schema_pattern: str | None = None,
    compat_names_typo: bool = False,
    staging_suffix: str = "_updates",
) -> RunReport:
    """The reference's ENTIRE program over a live database: JDBC catalog
    discovery (S1/S2 via DatabaseMetaData), structural classification
    (B4 precedence), hstore-text -> map parsing, the derivation chain,
    and batched write-back of the changed-rows frame to a per-table
    staging table (S5 option c — the server-side ``UPDATE ... FROM
    staging`` is the one statement left to the DBA, since Spark's JDBC
    sink cannot express keyed UPDATE).

    Identifier case is normalized to lowercase: Derby/Oracle fold
    unquoted names UP, PostgreSQL folds DOWN, and the classifier matches
    the reference's lowercase PG names."""
    from openmaptiles_zh_modifier_spark.catalog import discover_jdbc_tables
    from openmaptiles_zh_modifier_spark.sources.io import write_jdbc

    raw = discover_jdbc_tables(spark, url, driver, schema_pattern)
    tables = {}
    for name, df in raw.items():
        short = name.split(".")[-1].lower()
        if short.endswith(staging_suffix):
            continue  # never re-process our own staging output
        tables[short] = df.toDF(*[c.lower() for c in df.columns])
    report = RunReport()
    for tc in classify_all(tables):
        df = tables[tc.table]
        t0 = time.perf_counter()
        mapped = df.withColumn("tags", hstore_text_to_map(df["tags"]))
        updates = updates_frame(mapped, tc.id_field, compat_names_typo)
        n_updated = updates.count()
        write_jdbc(
            updates,
            url,
            f"{tc.table}{staging_suffix}",
            mode="overwrite",
            driver=driver,
        )
        report.tables.append(
            TableResult(
                tc.table,
                tc.id_field,
                df.count(),
                n_updated,
                round(time.perf_counter() - t0, 4),
            )
        )
    return report
