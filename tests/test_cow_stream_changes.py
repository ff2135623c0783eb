"""Streaming-vs-deletes contract for the cowtable source (round 13,
VERDICT r12 #6): the DV caveat becomes enforced behavior.

- ``ignore_deletes=false`` (Delta's default contract): planning RAISES
  when any version in the span deleted rows (DV repoint or file
  removal) instead of silently replaying appends only.
- ``read_changes=true``: a streaming CDF that emits the change rows —
  DV deletes surface as tagged 'delete' rows, appends as 'insert'.
- default replay behavior is unchanged (append-only tables unaffected).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.operators.cow_table import (
    cow_append,
    cow_create,
    cow_delete,
    cow_merge,
)
from openmaptiles_zh_modifier_spark.sources.cow_datasource import (
    register_cow_datasource,
)


@pytest.fixture()
def dv_table(spark, tmp_path):
    register_cow_datasource(spark)
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, val string"
    ).coalesce(1)
    cow_create(spark, root, df)                       # v1
    cow_delete(spark, root, "id % 3 = 0")             # v2: DV commit
    return root


def _drain(spark, tmp_path, root, name, **opts):
    reader = spark.readStream.format("cowtable").option("path", root)
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / f"ck_{name}"))
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_strict_mode_raises_on_dv_commit(spark, tmp_path, dv_table):
    reader = (
        spark.readStream.format("cowtable")
        .option("path", dv_table)
        .option("ignore_deletes", "false")
    )
    q = (
        reader.load()
        .writeStream.format("memory")
        .queryName("strictq")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ck_strict"))
        .start()
    )
    with pytest.raises(Exception, match="ignore_deletes"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise q.exception()


def test_default_mode_replays_appends_only(spark, tmp_path, dv_table):
    rows = _drain(spark, tmp_path, dv_table, "defq")
    # v1's file replays in full; the DV delete adds nothing
    assert sorted(r.id for r in rows) == list(range(10))


def test_read_changes_surfaces_dv_deletes(spark, tmp_path, dv_table):
    cow_append(
        spark,
        dv_table,
        spark.createDataFrame([(100, "new")], "id long, val string"),
    )  # v3
    rows = _drain(spark, tmp_path, dv_table, "cdfq", read_changes="true")
    by_tag = {}
    for r in rows:
        by_tag.setdefault(r._change_type, []).append(r.id)
    # v1 insert of all 10 rows, v2 DV-delete of multiples of 3, v3 insert
    assert sorted(by_tag["insert"]) == sorted(list(range(10)) + [100])
    assert sorted(by_tag["delete"]) == [0, 3, 6, 9]


def test_read_changes_exact_for_dv_merge(spark, tmp_path):
    """A DV-strategy MERGE streams as exactly its semantic deltas."""
    register_cow_datasource(spark)
    root = str(tmp_path / "m")
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "id long, val string"
    ).coalesce(1)
    cow_create(spark, root, df)
    src = spark.createDataFrame(
        [(2, "upd2"), (5, "upd5"), (50, "ins50")], "id long, val string"
    )
    cow_merge(
        spark, root, src, on="id", strategy="dv",
        matched_update={"val": F.col("s.val")},
        not_matched_insert={"id": F.col("s.id"), "val": F.col("s.val")},
    )
    rows = _drain(
        spark, tmp_path, root, "mcdfq",
        read_changes="true", startingVersion="1",
    )
    got = sorted((r._change_type, r.id, r.val) for r in rows)
    assert got == [
        ("delete", 2, "v2"),
        ("delete", 5, "v5"),
        ("insert", 2, "upd2"),
        ("insert", 5, "upd5"),
        ("insert", 50, "ins50"),
    ]


def test_strict_mode_fine_on_append_only(spark, tmp_path):
    register_cow_datasource(spark)
    root = str(tmp_path / "a")
    df = spark.createDataFrame([(1, "x")], "id long, val string")
    cow_create(spark, root, df)
    cow_append(spark, root, spark.createDataFrame([(2, "y")], df.schema))
    rows = _drain(
        spark, tmp_path, root, "appq", ignore_deletes="false"
    )
    assert sorted(r.id for r in rows) == [1, 2]
