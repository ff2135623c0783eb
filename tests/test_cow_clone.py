"""Shallow clone: zero-copy pin, DV carry-over, divergence isolation,
vacuum safety."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.operators.cow_table import (
    cow_append,
    cow_clone,
    cow_create,
    cow_delete,
    cow_read,
    cow_vacuum,
)


def _parquet_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        out += [os.path.join(dirpath, f) for f in files if f.endswith(".parquet")]
    return out


def test_clone_zero_copy_and_dv_carryover(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") * 3).alias("v"))
    cow_create(spark, src, df)
    cow_delete(spark, src, "k % 4 = 0")  # DV sidecar, no rewrite
    cow_clone(src, dst)
    # zero copy: the clone dir holds NO parquet (manifest only)
    assert _parquet_files(dst) == []
    want = df.where("NOT k % 4 = 0").agg(F.sum("v")).collect()[0][0]
    assert cow_read(spark, dst).agg(F.sum("v")).collect()[0][0] == want
    assert cow_read(spark, dst).count() == 75


def test_clone_divergence_is_isolated(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    df = spark.range(50).select(F.col("id").alias("k"), F.col("id").alias("v"))
    cow_create(spark, src, df)
    cow_clone(src, dst)
    cow_delete(spark, src, "k < 10")           # source diverges
    cow_append(spark, dst, spark.range(100, 105).select(
        F.col("id").alias("k"), F.col("id").alias("v")))
    assert cow_read(spark, src).count() == 40   # clone append invisible
    assert cow_read(spark, dst).count() == 55   # source delete invisible
    assert cow_read(spark, dst, version=1).count() == 50


def test_clone_vacuum_never_touches_source(spark, tmp_path):
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    cow_create(spark, src, spark.range(20).select(
        F.col("id").alias("k"), F.col("id").alias("v")))
    cow_clone(src, dst)
    cow_append(spark, dst, spark.range(20, 30).select(
        F.col("id").alias("k"), F.col("id").alias("v")))
    cow_delete(spark, dst, "k >= 20", rewrite=True)  # dst v3 rewrites ITS files
    n_src_before = len(_parquet_files(src))
    removed = cow_vacuum(dst, keep_versions=1, orphan_grace_seconds=0)
    assert removed > 0  # the clone's own dead append files went away
    assert len(_parquet_files(src)) == n_src_before  # source untouched
    assert cow_read(spark, dst).count() == 20
