"""Spark 4 Python DataSource for the COW table format — ``spark.read
.format("cowtable")`` / ``spark.readStream.format("cowtable")`` over the
manifest-per-version layout of ``operators/cow_table.py``.

Why a DataSource and not just ``cow_read()``: the DataSource V2 contract
is the *engine-native* integration point — the format shows up in
``.explain()`` as a proper scan with its own pushed filters, composes
with every DataFrameReader feature, and the streaming half turns the
transactional commit log into an incremental source. This is the
file-format role Delta/Iceberg connectors play, built on public PySpark
API only (``pyspark.sql.datasource``, Spark 4.0+).

Batch read (``CowBatchReader``):
- planning reads ONLY the manifest (no directory listing, no footer
  reads of dead files) and emits one ``InputPartition`` per live data
  file — splits are file-granular, executors read their file via
  pyarrow and hand Spark Arrow RecordBatches (zero row-materialization
  in Python).
- ``pushFilters`` prunes partitions: EqualTo/In/IsNotNull filters on
  the table's partition column are consumed at PLANNING time against
  the manifest's partition values — files from non-matching partitions
  never become tasks. The filters are also kept for Spark to re-apply
  (pruning is file-granular, rows inside a kept file still need the
  residual filter) by returning them from pushFilters.
- options: ``path`` (table root, required), ``version`` (time travel,
  default latest).

Streaming read (``CowStreamReader``):
- offset = committed version number: each micro-batch processes the
  data files ADDED between two manifest versions, i.e. the commit log
  replay (same contract as Delta's file-based streaming source on a
  copy-on-write table: a MERGE's rewritten files appear as appends of
  their full post-image; documented, not hidden).
- options: ``path``, ``startingVersion`` (default 0 = everything from
  the first commit).

Scale notes: planning cost is O(live files) manifest JSON, not O(files
on disk); reads are embarrassingly parallel per file; Arrow batches
cross the Python/JVM boundary columnar. At 100 TB the same layout works
with manifests listing object-store keys — nothing here assumes a local
filesystem except ``os.path.join``.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    EqualTo,
    Filter,
    In,
    InputPartition,
    IsNotNull,
)
from pyspark.sql.types import StructType

from openmaptiles_zh_modifier_spark.operators.cow_table import (
    _latest_version,
    _read_manifest,
)

FORMAT_NAME = "cowtable"


@dataclass
class CowFilePartition(InputPartition):
    """One live data file (absolute path kept picklable as str)."""

    path: str
    partition: str | None


def _schema_of(manifest: dict) -> StructType:
    return StructType.fromJson(json.loads(manifest["schema"]))


def _read_file_batches(path: str, schema: StructType) -> Iterator:
    """Yield Arrow RecordBatches for one parquet file, column-aligned to
    the table schema (parquet writers may reorder; Spark maps by
    position for Arrow results)."""
    import pyarrow.parquet as pq

    table = pq.read_table(path, columns=schema.fieldNames())
    for batch in table.to_batches():
        yield batch


class CowBatchReader(DataSourceReader):
    def __init__(self, root: str, version: int | None) -> None:
        self._root = root
        self._manifest = _read_manifest(root, version)
        self._part_col = self._manifest.get("partition_by")
        self._schema = _schema_of(self._manifest)
        self._wanted: set[str] | None = None  # None = no pruning

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Consume partition-column predicates for file pruning; every
        filter is also returned (file pruning keeps whole files, so the
        row-level residual must still run in Spark — returning a filter
        marks it unhandled, which is exactly right here)."""
        if self._part_col is not None:
            col = (self._part_col,)
            wanted: set[str] | None = None
            for f in filters:
                if isinstance(f, EqualTo) and f.attribute == col:
                    vals = {str(f.value)}
                elif isinstance(f, In) and f.attribute == col:
                    vals = {str(v) for v in f.value}
                elif isinstance(f, IsNotNull) and f.attribute == col:
                    continue  # partition values are never null-stored
                else:
                    continue
                wanted = vals if wanted is None else (wanted & vals)
            self._wanted = wanted
        # every filter still applies row-level
        return iter(filters)

    def partitions(self) -> Sequence[InputPartition]:
        files = self._manifest["files"]
        if self._wanted is not None:
            files = [e for e in files if e["partition"] in self._wanted]
        return [
            CowFilePartition(
                os.path.join(self._root, e["path"]), e["partition"]
            )
            for e in files
        ]

    def read(self, partition: CowFilePartition) -> Iterator:
        yield from _read_file_batches(partition.path, self._schema)


class CowStreamReader(DataSourceStreamReader):
    """Commit-log replay: one micro-batch per span of newly committed
    versions; the unit of progress is the manifest version number."""

    def __init__(self, root: str, starting_version: int) -> None:
        self._root = root
        self._start = starting_version
        self._schema = _schema_of(_read_manifest(root))

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        return {"version": _latest_version(self._root)}

    def partitions(
        self, start: dict, end: dict
    ) -> Sequence[InputPartition]:
        sv, ev = start["version"], end["version"]
        if ev <= sv:
            return []
        old: set[str] = set()
        if sv >= 1:
            old = {e["path"] for e in _read_manifest(self._root, sv)["files"]}
        new = _read_manifest(self._root, ev)["files"]
        return [
            CowFilePartition(os.path.join(self._root, e["path"]), e["partition"])
            for e in new
            if e["path"] not in old
        ]

    def read(self, partition: CowFilePartition) -> Iterator:
        yield from _read_file_batches(partition.path, self._schema)

    def commit(self, end: dict) -> None:
        pass  # manifests are immutable; nothing to acknowledge

    def stop(self) -> None:
        pass


class CowDataSource(DataSource):
    """``spark.dataSource.register(CowDataSource)`` then
    ``spark.read.format("cowtable").option("path", root).load()``."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("cowtable requires .option('path', <table root>)")
        return root

    def schema(self) -> StructType:
        version = self.options.get("version")
        m = _read_manifest(self._root(), int(version) if version else None)
        return _schema_of(m)

    def reader(self, schema: StructType) -> CowBatchReader:
        version = self.options.get("version")
        return CowBatchReader(
            self._root(), int(version) if version else None
        )

    def streamReader(self, schema: StructType) -> CowStreamReader:
        return CowStreamReader(
            self._root(), int(self.options.get("startingversion", 0))
        )


def register_cow_datasource(spark) -> None:
    # pushFilters is gated off by default; runtime conf, planning-time read
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(CowDataSource)
