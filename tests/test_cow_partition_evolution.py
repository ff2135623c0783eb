"""Partition-spec evolution (round 12, Iceberg semantics): a
metadata-only commit flips the partition column; old-spec entries are
stamped and conservatively scanned, new writes route by the new spec,
and MERGE/OPTIMIZE progressively migrate old files to the new spec."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.operators.cow_table import (
    _read_manifest,
    cow_append,
    cow_compact,
    cow_create,
    cow_merge,
    cow_read,
    cow_set_partition_spec,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"r{i % 3}", f"c{i % 2}") for i in range(12)],
        "id long, region string, cat string",
    ).coalesce(1)
    cow_create(spark, root, df, partition_by="region")
    return root


def _data_files(root):
    out = []
    for dirpath, _dirs, files in os.walk(root):
        if "_manifests" in dirpath:
            continue
        out += [f for f in files if f.endswith(".parquet")]
    return sorted(out)


def test_set_spec_is_metadata_only_and_stamps_entries(spark, table):
    before_files = _data_files(table)
    before_rows = _rows(cow_read(spark, table))
    v = cow_set_partition_spec(table, "cat")
    assert v == 2
    assert _data_files(table) == before_files
    m = _read_manifest(table)
    assert m["partition_by"] == "cat"
    assert all(e["pcol"] == "region" for e in m["files"])
    assert _rows(cow_read(spark, table)) == before_rows
    assert _rows(cow_read(spark, table, version=1)) == before_rows


def test_new_appends_route_by_new_spec(spark, table):
    cow_set_partition_spec(table, "cat")
    cow_append(
        spark,
        table,
        spark.createDataFrame(
            [(100, "r9", "c0"), (101, "r9", "c1")],
            "id long, region string, cat string",
        ),
    )
    m = _read_manifest(table)
    new = [e for e in m["files"] if "pcol" not in e]
    assert sorted(e["partition"] for e in new) == ["c0", "c1"]
    assert sorted(
        r.id for r in cow_read(spark, table).collect()
    ) == list(range(12)) + [100, 101]


def test_partition_values_pruning_is_conservative_but_lossless(spark, table):
    cow_set_partition_spec(table, "cat")
    cow_append(
        spark,
        table,
        spark.createDataFrame(
            [(100, "r9", "c0"), (101, "r9", "c1")],
            "id long, region string, cat string",
        ),
    )
    # pruning by the NEW column keeps ALL old-spec files (their values
    # belong to 'region') plus only the matching new-spec file
    got = cow_read(spark, table, partition_values=["c0"])
    ids = sorted(r.id for r in got.collect())
    assert 100 in ids and 101 not in ids  # new-spec pruning worked
    assert all(i in ids for i in range(12))  # old-spec files all scanned
    # the row-level filter on top is exact
    exact = sorted(
        r.id for r in got.where(F.col("cat") == "c0").collect()
    )
    assert exact == [i for i in range(12) if i % 2 == 0] + [100]


def test_merge_migrates_old_spec_entries(spark, table):
    cow_set_partition_spec(table, "cat")
    src = spark.createDataFrame(
        [(0, "r0", "c0")], "id long, region string, cat string"
    )
    cow_merge(
        spark, table, src, on="id",
        matched_update={"region": F.lit("UPDATED")},
    )
    m = _read_manifest(table)
    # every old-spec entry joined the rewrite -> table converged
    assert all("pcol" not in e for e in m["files"])
    assert all(e["partition"] in ("c0", "c1") for e in m["files"])
    got = {r.id: r.region for r in cow_read(spark, table).collect()}
    assert got[0] == "UPDATED" and got[1] == "r1"


def test_compact_migrates_old_spec_groups(spark, table):
    cow_set_partition_spec(table, "cat")
    cow_compact(spark, table, min_files_per_partition=1)
    m = _read_manifest(table)
    assert all("pcol" not in e for e in m["files"])
    assert sorted({e["partition"] for e in m["files"]}) == ["c0", "c1"]
    assert sorted(r.id for r in cow_read(spark, table).collect()) == list(
        range(12)
    )


def test_unpartition_and_repartition(spark, table):
    cow_set_partition_spec(table, None)
    cow_append(
        spark,
        table,
        spark.createDataFrame(
            [(200, "rx", "cx")], "id long, region string, cat string"
        ).coalesce(1),
    )
    m = _read_manifest(table)
    unstamped = [e for e in m["files"] if "pcol" not in e]
    assert len(unstamped) == 1 and unstamped[0]["partition"] is None
    cow_set_partition_spec(table, "cat")
    m = _read_manifest(table)
    # the unpartitioned-era entry is stamped pcol=None
    assert any(e.get("pcol", "x") is None for e in m["files"])
    assert sorted(r.id for r in cow_read(spark, table).collect()) == list(
        range(12)
    ) + [200]


def test_set_spec_rejects_noop_and_unknown_column(spark, table):
    with pytest.raises(ValueError, match="already partitioned"):
        cow_set_partition_spec(table, "region")
    with pytest.raises(ValueError, match="not a table column"):
        cow_set_partition_spec(table, "nope")


def test_dv_delete_composes_with_spec_evolution(spark, table):
    from openmaptiles_zh_modifier_spark.operators.cow_table import cow_delete

    cow_set_partition_spec(table, "cat")
    cow_delete(spark, table, "id IN (1, 2)")
    assert sorted(r.id for r in cow_read(spark, table).collect()) == [
        0, 3, 4, 5, 6, 7, 8, 9, 10, 11,
    ]
    m = _read_manifest(table)
    # dv entries still carry their spec stamp
    assert all(e["pcol"] == "region" for e in m["files"] if e.get("dv"))


def test_dsv2_writer_conflicts_on_mid_write_spec_change(spark, table):
    from openmaptiles_zh_modifier_spark.operators.cow_table import (
        CowConflictError,
    )
    from openmaptiles_zh_modifier_spark.sources.cow_datasource import (
        CowBatchWriter,
    )

    schema = cow_read(spark, table).schema
    w = CowBatchWriter(table, schema, overwrite=False, partition_by=None)
    cow_set_partition_spec(table, "cat")
    with pytest.raises(CowConflictError, match="partition spec"):
        w.commit([])


def test_dsv2_pruning_spec_aware(spark, table):
    from openmaptiles_zh_modifier_spark.sources.cow_datasource import (
        register_cow_datasource,
    )

    cow_set_partition_spec(table, "cat")
    cow_append(
        spark,
        table,
        spark.createDataFrame(
            [(100, "r9", "c0")], "id long, region string, cat string"
        ),
    )
    register_cow_datasource(spark)
    got = (
        spark.read.format("cowtable")
        .option("path", table)
        .load()
        .where(F.col("cat") == "c0")
    )
    assert sorted(r.id for r in got.collect()) == [
        i for i in range(12) if i % 2 == 0
    ] + [100]
