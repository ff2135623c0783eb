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


def test_transform_with_state_v2_running_totals(spark, sf_dir):
    """State API v2 (transformWithStateInPandas, Spark 4.x): running
    per-user totals with a StatefulProcessor + RocksDB provider, equal to
    the batch aggregate. The v2 python runner needs google.protobuf,
    which this container lacks — skip there; the v1 path
    (applyInPandasWithState) is covered unconditionally in
    test_pipeline_ops."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    import pandas as pd
    from pyspark.sql.streaming import StatefulProcessor
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from openmaptiles_zh_modifier_spark.streaming.events import (
        read_events_stream,
        run_to_memory,
    )

    schema = StructType(
        [StructField("n", LongType()), StructField("total", DoubleType())]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle):
            self.state = handle.getValueState("agg", schema)

        def handleInputRows(self, key, rows, timerValues):
            n, total = (self.state.get() if self.state.exists() else (0, 0.0))
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self.state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self):
            pass

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        out = read_events_stream(spark, sf_dir).groupBy("user_id")
        out = out.transformWithStateInPandas(
            RunningTotals(),
            outputStructType="user_id long, n_events long, total_value double",
            outputMode="Update",
            timeMode="None",
        )
        got = {
            r.user_id: (r.n_events, round(r.total_value, 2))
            for r in run_to_memory(out, output_mode="update").collect()
        }
        from pyspark.sql import functions as F

        batch = spark.read.parquet(f"{sf_dir}/events.parquet").groupBy(
            "user_id"
        ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("t"))
        want = {r.user_id: (r.n, r.t) for r in batch.collect()}
        assert got == want
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
