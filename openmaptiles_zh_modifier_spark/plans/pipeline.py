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
    """Parse PostgreSQL hstore TEXT output (``"k"=>"v", "k2"=>NULL``) into
    a MapType column — how the reference's ``tags`` column surfaces over
    plain JDBC without a custom dialect. Regex-based, NOT a naive
    ``str_to_map`` split: values may contain ``, `` and ``=>``; unquoted
    ``NULL`` values become real SQL nulls; ``\"`` and ``\\`` escapes in
    keys/values are unescaped. Duplicate keys collapse LAST_WIN (matches
    hstore || and the session's mapKeyDedupPolicy)."""
    from pyspark.sql import functions as F

    # Mark unquoted NULL values with a sentinel that cannot appear in
    # hstore text (U+0000: PostgreSQL text types reject NUL), so
    # extraction sees uniformly-quoted values. The match is anchored to
    # the start of the text or the ", " pair separator, then a full
    # QUOTED KEY, then the arrow: a bare `=>NULL` (or even a
    # quoted-key-anchored one) would also fire on the literal text
    # '=>NULL' INSIDE a quoted value — e.g. "k"=>"=>NULL", where
    # `"=>"` spanning the key-close and value-open quotes parses as a
    # quoted string. Key positions are exactly (start | separator) in
    # well-formed hstore text, and quotes inside keys/values are always
    # escaped, so the anchored pattern cannot start mid-value. Leading
    # whitespace before the first key (or after any comma) is tolerated
    # the way lenient hstore producers emit it.
    marked = F.regexp_replace(
        col,
        r'(^\s*|,\s*)("(?:[^"\\]|\\.)*")\s*=>\s*NULL',
        '$1$2=>"\u0000"',
    )
    entry = r'"((?:[^"\\]|\\.)*)"\s*=>\s*"((?:[^"\\]|\\.)*)"'
    keys = F.regexp_extract_all(marked, F.lit(entry), F.lit(1))
    vals = F.regexp_extract_all(marked, F.lit(entry), F.lit(2))

    def unescape(c):
        return F.replace(
            F.replace(c, F.lit('\\"'), F.lit('"')),
            F.lit("\\\\"),
            F.lit("\\"),
        )

    return F.map_from_arrays(
        F.transform(keys, unescape),
        F.transform(
            vals,
            lambda v: F.when(v == "\u0000", F.lit(None)).otherwise(unescape(v)),
        ),
    )


def map_to_hstore_text(col):
    """Serialize a MapType column back to PostgreSQL hstore TEXT
    (``"k"=>"v", "k2"=>NULL``) — the exact inverse of hstore_text_to_map,
    with ``\\`` and ``\"`` escaping and unquoted NULL for null values.
    Pure codegen expressions (map_entries -> transform -> array_join)."""
    from pyspark.sql import functions as F

    def esc(c):
        return F.replace(
            F.replace(c, F.lit("\\"), F.lit("\\\\")),
            F.lit('"'),
            F.lit('\\"'),
        )

    entries = F.transform(
        F.map_entries(col),
        lambda e: F.concat(
            F.lit('"'),
            esc(e["key"]),
            F.lit('"=>'),
            F.when(e["value"].isNull(), F.lit("NULL")).otherwise(
                F.concat(F.lit('"'), esc(e["value"]), F.lit('"'))
            ),
        ),
    )
    return F.array_join(entries, ", ")


def _apply_update_sql(
    table: str, staging: str, id_field: str, url: str
) -> str:
    """The final server-side keyed apply — the statement the reference
    executes row-batched (``UPDATE ... SET tags = tags || hstore(...)
    WHERE id = ?``, OMTZHModifier.java:156-169), set-based.

    PostgreSQL gets the native hstore-concat form (``||`` right-wins on the
    two zh keys, exactly the reference's expression); every other engine
    gets the ANSI correlated-subquery form over the staged full
    ``new_tags`` text (Derby-compatible; hstore-as-TEXT transport).

    Column identifiers are QUOTED lowercase: the engine lowercases every
    discovered column, the staging table is written by Spark's JDBC sink
    (which quotes, preserving that lowercase), and the reference's own
    PostgreSQL schema is lowercase-folded — so quoted-lowercase resolves
    on both transports. PostgreSQL table names are quoted per dot-part
    (discovery lowercased them, which is what unquoted PG names fold to,
    so quoting is safe and also covers reserved words). The generic
    branch leaves table names unquoted so they fold to whatever the
    engine's catalog holds (Derby folds UP — quoted-lowercase would not
    resolve); it therefore assumes non-reserved table names, like the
    reference's own schema. The staging alias is deliberately obscure so
    it cannot collide with a user table's bare name in the correlation."""
    bare = table.split(".")[-1]
    q = f'"{id_field}"'
    a = "zh_stg_"  # staging correlation alias; bare table names won't match
    if url.startswith("jdbc:postgresql"):
        qtable = ".".join(f'"{p}"' for p in table.split("."))
        qstaging = ".".join(f'"{p}"' for p in staging.split("."))
        qbare = f'"{bare}"'
        return (
            f'UPDATE {qtable} SET "tags" = "tags" || '
            f"hstore(ARRAY['name:zh-Hans','name:zh-Hant'], "
            f'ARRAY[{a}."hans", {a}."hant"]) '
            f"FROM {qstaging} {a} WHERE {a}.{q} = {qbare}.{q}"
        )
    return (
        f'UPDATE {table} SET "tags" = '
        f'(SELECT {a}."new_tags" FROM {staging} {a} '
        f"WHERE {a}.{q} = {bare}.{q}) "
        f"WHERE EXISTS (SELECT 1 FROM {staging} {a} "
        f"WHERE {a}.{q} = {bare}.{q})"
    )


def run_backfill_jdbc(
    spark: SparkSession,
    url: str,
    driver: str,
    schema_pattern: str | None = None,
    compat_names_typo: bool = False,
    staging_suffix: str = "_zh_staging",
    properties: dict[str, str] | None = None,
    num_partitions: int = 16,
) -> RunReport:
    """The reference's ENTIRE program over a live database: JDBC catalog
    discovery (S1/S2 via DatabaseMetaData), structural classification
    (B4 precedence), hstore-text -> map parsing, the derivation chain
    over a PARTITIONED BETWEEN-range scan (S3/S4), batched write-back of
    the changed-rows frame to a schema-qualified staging table, and the
    final server-side ``UPDATE ... FROM staging`` executed through the
    same JVM java.sql path discovery uses (S5 — the statement the
    reference runs row-batched, OMTZHModifier.java:156-169, applied
    set-based; Spark's JDBC sink cannot express keyed UPDATE, so the
    apply runs as ONE statement on the server where it belongs).

    Telemetry counts the rows the server reports UPDATED (the statement's
    update count — the reference's executeBatch tally, :169-176), not a
    separate pre-write scan. Tables whose name already ends with
    ``staging_suffix`` are skipped (the distinctive default makes a
    user-table collision unlikely; pass another suffix if needed).
    Column/table case is normalized to lowercase for classification
    (Derby folds up, PostgreSQL folds down; the reference compares
    lowercase PG names); staging tables are created unquoted next to
    their source schema."""
    from pyspark.sql import functions as F

    from openmaptiles_zh_modifier_spark.catalog import discover_jdbc_tables
    from openmaptiles_zh_modifier_spark.operators.zh_backfill import (
        updates_frame_with_tags,
    )
    from openmaptiles_zh_modifier_spark.sources.io import (
        execute_jdbc_update,
        read_jdbc_partitioned,
        write_jdbc,
    )

    raw = discover_jdbc_tables(spark, url, driver, schema_pattern, properties)
    tables: dict[str, DataFrame] = {}
    for name, df in raw.items():
        if name.split(".")[-1].lower().endswith(staging_suffix):
            continue  # never re-process staging output
        tables[name.lower()] = df.toDF(*[c.lower() for c in df.columns])
    report = RunReport()
    opts = dict(properties or {})
    for tc in classify_all(tables):
        t0 = time.perf_counter()
        # S3/S4: re-read the qualifying table as a partitioned range scan
        # (the discovery frame is a single-connection unpartitioned read)
        scan = read_jdbc_partitioned(
            spark,
            url,
            tc.table,
            tc.id_field,
            num_partitions=num_partitions,
            driver=driver,
            **opts,
        ).toDF(*[c.lower() for c in tables[tc.table].columns])
        mapped = scan.withColumn("tags", hstore_text_to_map(scan["tags"]))
        # the generic-dialect apply sets the FULL new tags text; derive
        # (id, hans, hant, new_tags) in ONE projection over ONE scan — a
        # join of the updates frame back onto the source would be a second
        # scan, and over a live database two scans are two snapshots.
        staged_df = updates_frame_with_tags(
            mapped, tc.id_field, compat_names_typo
        ).select(
            tc.id_field,
            "hans",
            "hant",
            map_to_hstore_text(F.col("new_tags_map")).alias("new_tags"),
        )
        staging = f"{tc.table}{staging_suffix}"
        write_jdbc(
            staged_df, url, staging, mode="overwrite", driver=driver, **opts
        )
        # S5 final apply: ONE set-based server-side statement; its update
        # count is the telemetry the reference logs per executeBatch.
        n_updated = execute_jdbc_update(
            spark,
            url,
            driver,
            _apply_update_sql(tc.table, staging, tc.id_field, url),
            properties=opts or None,
        )
        report.tables.append(
            TableResult(
                tc.table,
                tc.id_field,
                scan.count(),
                n_updated,
                round(time.perf_counter() - t0, 4),
            )
        )
    return report


def stream_backfill_to_jdbc(
    stream_df: DataFrame,
    url: str,
    table: str,
    id_field: str,
    driver: str,
    compat_names_typo: bool = False,
    staging_suffix: str = "_zh_staging",
    properties: dict[str, str] | None = None,
) -> int:
    """The CDC-shaped deployment of the back-fill (SURVEY §2.1 S5 as a
    stream): source rows arrive as a STREAMING frame (in production a
    change feed of inserted/updated rows; the reference's batch program
    re-scans instead, OMTZHModifier.java:120-140), and every micro-batch
    runs the IDENTICAL staging-write + server-side ``UPDATE … FROM
    staging`` path the batch program uses — ``foreachBatch`` hands each
    micro-batch over as a batch DataFrame, so ``updates_frame_with_tags``
    / ``map_to_hstore_text`` / ``_apply_update_sql`` are shared, not
    reimplemented. The staging table is OVERWRITTEN per batch (it is a
    transport buffer, not a log) and the keyed UPDATE is idempotent on
    replay — re-deriving the same hans/hant writes the same tags — which
    is exactly the at-least-once-to-effectively-once story foreachBatch
    requires.

    Returns the total server-reported update count across batches (the
    reference's executeBatch tally, OMTZHModifier.java:169-176)."""
    from pyspark.sql import functions as F

    from openmaptiles_zh_modifier_spark.operators.zh_backfill import (
        updates_frame_with_tags,
    )
    from openmaptiles_zh_modifier_spark.sources.io import (
        execute_jdbc_update,
        write_jdbc,
    )

    opts = dict(properties or {})
    staging = f"{table}{staging_suffix}"
    counts: list[int] = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        mapped = batch_df.withColumn(
            "tags", hstore_text_to_map(batch_df["tags"])
        )
        staged = updates_frame_with_tags(
            mapped, id_field, compat_names_typo
        ).select(
            id_field,
            "hans",
            "hant",
            map_to_hstore_text(F.col("new_tags_map")).alias("new_tags"),
        )
        write_jdbc(staged, url, staging, mode="overwrite", driver=driver, **opts)
        counts.append(
            execute_jdbc_update(
                batch_df.sparkSession,
                url,
                driver,
                _apply_update_sql(table, staging, id_field, url),
                properties=opts or None,
            )
        )

    import tempfile

    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="omt-jdbc-ckpt-"))
        .start()
    )
    q.awaitTermination()
    return sum(counts)


def run_backfill_cow(
    spark: SparkSession,
    root: str,
    compat_names_typo: bool = False,
) -> tuple[int, int]:
    """Back-fill a COW table IN PLACE — the reference's batched keyed
    ``UPDATE ... WHERE id = ?`` (OMTZHModifier.java:156-169) expressed as
    a transactional lake MERGE: read the current committed version,
    derive the changed rows in one projection over one snapshot
    (``updates_frame_with_tags`` — no torn two-scan read), and publish
    version N+1 atomically via the manifest commit protocol (a
    concurrent writer loses with CowConflictError, mirroring Delta's
    optimistic concurrency; the reference's per-batch commit had no such
    guard). The schema classifier picks ``id``/``osm_id`` with B4
    precedence, exactly like the parquet and JDBC paths.

    Returns ``(committed_version, n_updated)``; when nothing qualifies
    the table is untouched and the CURRENT version is returned (an empty
    merge must not burn a version number — readers use version deltas as
    a change signal, e.g. the cowtable streaming source).
    """
    from pyspark.sql import functions as F

    from openmaptiles_zh_modifier_spark.catalog import classify_schema
    from openmaptiles_zh_modifier_spark.operators.cow_table import (
        _latest_version,
        _read_manifest,
        cow_merge,
        cow_read,
    )
    from openmaptiles_zh_modifier_spark.operators.zh_backfill import (
        updates_frame_with_tags,
    )

    # Pin the snapshot ONCE: read version V, derive from V, merge with
    # base_version=V. If anyone commits V+1 while we derive, the manifest
    # publish of V+1 below raises CowConflictError instead of silently
    # clobbering their write with tags derived from V (read-derive-merge
    # TOCTOU). Caller retries from the new version, like Delta.
    base = _latest_version(root)
    part_col = _read_manifest(root, base)["partition_by"]
    df = cow_read(spark, root, version=base)
    tc = classify_schema(df.schema, root)
    if tc is None:
        raise ValueError(
            f"cow table at {root} does not qualify for zh back-fill "
            "(needs name + tags and an id/osm_id column)"
        )
    updates = updates_frame_with_tags(df, tc.id_field, compat_names_typo)
    # partitioned tables: cow_merge routes the rewrite by the source's
    # partition values, so the source must carry the partition column.
    # The join-back is against the SAME pinned (immutable) snapshot, so
    # it cannot tear, unlike the live-JDBC case updates_frame_with_tags
    # exists to avoid.
    if part_col and part_col != tc.id_field:
        src = updates.join(
            df.select(tc.id_field, part_col), tc.id_field
        ).select(tc.id_field, "new_tags_map", part_col)
    else:
        src = updates.select(tc.id_field, "new_tags_map")
    # one materialization serves the count, the uniqueness validation
    # scan, and the merge write (three recomputes of the conversion
    # projection otherwise)
    src = src.persist()
    try:
        n_updated = src.count()
        if n_updated == 0:
            return base, 0
        version = cow_merge(
            spark,
            root,
            src,
            on=tc.id_field,
            matched_update={"tags": F.col("s.new_tags_map")},
            base_version=base,
        )
    finally:
        src.unpersist()
    return version, n_updated


def stream_upsert_to_cow(
    stream_df: DataFrame,
    root: str,
    on: str,
    order_by: str,
    update_cols: list[str],
    tiebreak: str | None = None,
    checkpoint_location: str | None = None,
) -> list[int]:
    """Streaming CDC apply: every micro-batch MERGEs into the cow table —
    the upsert twin of the cowtable streaming APPEND sink (which can only
    add rows). The batch is first collapsed latest-wins per key (max
    ``order_by``; equal-``order_by`` races inside one batch break on
    ``tiebreak`` when given, else on a content hash of the whole row —
    DETERMINISTIC either way, so task retries re-elect the same winner),
    then fed through the transactional ``cow_merge`` (matched -> update
    ``update_cols`` plus ``order_by``, unmatched -> insert). Each batch
    lands as one atomic version.

    Out-of-order safety: the matched-update is CONDITIONAL on
    ``s.order_by > t.order_by`` — a stale change arriving after a newer
    one (reordered batches, replays, late partitions) leaves the row
    untouched, so the table converges to the per-key MAXIMUM order_by
    regardless of arrival order. ``order_by`` is force-included in the
    updated columns for exactly this reason: if the stored row's
    order_by never advanced, a stale change could pass the version
    check and clobber newer data. That also makes replay idempotent
    twice over: re-applying a batch either rewrites identical values or
    loses the version check. A concurrent non-stream writer can steal a
    version; cow_merge then raises CowConflictError and the batch is
    retried by the caller/engine rather than applied on a stale base.

    ``checkpoint_location`` defaults to ``<root>/_upsert_checkpoint``:
    re-invocations RESUME from the recorded source offsets instead of
    re-reading the whole source through the (idempotent but wasteful)
    order_by guard, and nothing leaks outside the table directory. Pass
    an explicit path to run several independent upsert streams against
    one table.

    Returns the committed version per micro-batch."""
    import os

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from openmaptiles_zh_modifier_spark.operators.cow_table import cow_merge

    versions: list[int] = []
    # the stored order_by must advance with every applied change, or the
    # s.order_by > t.order_by guard stops guarding (see docstring)
    effective_update_cols = list(dict.fromkeys([*update_cols, order_by]))

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        tb = (
            F.desc(tiebreak)
            if tiebreak is not None
            else F.desc(F.xxhash64(*batch_df.columns))
        )
        w = Window.partitionBy(on).orderBy(F.desc(order_by), tb)
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn")
        )
        if batch_df.isEmpty():
            return  # empty batch: no version burned
        spark = batch_df.sparkSession
        newer = F.col(f"s.{order_by}") > F.col(f"t.{order_by}")
        versions.append(
            cow_merge(
                spark,
                root,
                latest,
                on=on,
                matched_update={
                    c: F.when(newer, F.col(f"s.{c}")).otherwise(
                        F.col(f"t.{c}")
                    )
                    for c in effective_update_cols
                },
                not_matched_insert={
                    c: F.col(f"s.{c}") for c in latest.columns
                },
            )
        )

    if checkpoint_location is None:
        checkpoint_location = os.path.join(root, "_upsert_checkpoint")
    q = (
        stream_df.writeStream.foreachBatch(apply_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_location)
        .start()
    )
    q.awaitTermination()
    return versions
