"""Checkpoint-resume: an availableNow file-source stream processes only
NEW files on restart (exactly-once incremental ingestion) — the property
that lets a 100 TB backfill run as repeated cheap catch-up jobs instead
of full rescans."""

from __future__ import annotations

import pathlib


def _write_batch(spark, path: str, ids):
    spark.createDataFrame([(i, f"v{i}") for i in ids], "id long, v string").coalesce(
        1
    ).write.mode("append").parquet(path)


def _run_stream(spark, src: str, out: str, ckpt: str) -> None:
    q = (
        spark.readStream.schema("id long, v string")
        .parquet(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_available_now_resume_processes_only_new_files(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, src, [1, 2, 3])
    _run_stream(spark, src, out, ckpt)
    first = {r.id for r in spark.read.parquet(out).collect()}
    assert first == {1, 2, 3}
    n_files_first = len(list(pathlib.Path(out).glob("*.parquet")))

    _write_batch(spark, src, [4, 5])
    _run_stream(spark, src, out, ckpt)
    rows = spark.read.parquet(out).collect()
    assert {r.id for r in rows} == {1, 2, 3, 4, 5}
    assert len(rows) == 5  # exactly-once: no reprocessing duplicates
    # resume appended new output rather than rewriting batch 1's files
    assert len(list(pathlib.Path(out).glob("*.parquet"))) > n_files_first

    # a THIRD run with no new input is a no-op
    _run_stream(spark, src, out, ckpt)
    assert len(spark.read.parquet(out).collect()) == 5
