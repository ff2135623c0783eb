"""State TTL for trajectory_leg_stream (VERDICT r9 #4): with a TTL,
per-user state evicts via ProcessingTimeTimeout and eviction is
OBSERVABLE as the documented session-gap semantics — a user silent
past the TTL restarts their trajectory. Without one (the gate/drain
default), state chains across silent batches and the availableNow
drain terminates promptly (a registered processing-time timeout holds
an availableNow drain open until it fires — measured, which is why the
TTL is opt-in for continuous deployments rather than a default).
Also pins the ADVICE r9 dropped-row metric: replayed/late rows count
into ``n_dropped`` on emitted legs instead of disappearing silently."""

from __future__ import annotations

import os
import tempfile
import time
import uuid

from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.streaming.events import (
    trajectory_leg_stream,
)

_SCHEMA = "user_id long, event_id long, ts timestamp"


def _write_file(spark, rows, dest, mtime):
    tmp = dest + ".tmp"
    spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(tmp)
    (f,) = [p for p in os.listdir(tmp) if p.endswith(".parquet")]
    os.replace(f"{tmp}/{f}", dest)
    os.utime(dest, (mtime, mtime))


def _ts(minute):
    import datetime

    return datetime.datetime(2024, 1, 1, 12, minute)


def _legs_per_user(df):
    return {
        r.user_id: (r.n_legs, r.max_dropped)
        for r in df.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_legs"),
            F.max("n_dropped").alias("max_dropped"),
        )
        .collect()
    }


def _drain(spark, src, schema, ttl_ms, expect_legs=None):
    """Run the leg stream over the file-split source. With a TTL the
    availableNow drain idles until pending processing-time timeouts
    fire (see the operator docstring), so instead of awaitTermination
    we poll the sink for the expected final leg count and stop."""
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    legs = trajectory_leg_stream(stream, state_ttl_ms=ttl_ms)
    name = "ttl" + uuid.uuid4().hex[:10]
    q = (
        legs.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", tempfile.mkdtemp(prefix="omt-ttl-"))
        .start()
    )
    if ttl_ms is None:
        q.awaitTermination()
    else:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table(name).count() >= expect_legs and not any(
                p["numInputRows"] > 0
                for p in (q.recentProgress or [])[-1:]
            ):
                break
            time.sleep(1.0)
        q.stop()
        q.awaitTermination()
    return spark.table(name)


def _make_source(spark, tmp_path, extra_file=None):
    # batch 1: both users ping twice; batch 2: only user 2; batch 3:
    # user 1 returns (after being silent for one whole batch) + user 2
    src = str(tmp_path / "pings")
    os.makedirs(src, exist_ok=True)
    b1 = [(1, 10, _ts(0)), (1, 11, _ts(1)), (2, 20, _ts(0)), (2, 21, _ts(1))]
    b2 = [(2, 22, _ts(2))]
    b3 = [(1, 12, _ts(3)), (1, 13, _ts(4)), (2, 23, _ts(3))]
    for i, rows in enumerate([b1, b2, b3] + ([extra_file] if extra_file else [])):
        _write_file(
            spark, rows, f"{src}/part-{i:02d}.parquet", 1_700_000_000 + i
        )
    return src


def test_default_no_ttl_chains_across_silent_batches(spark, tmp_path):
    # default (None -> NoTimeout, the gate/drain mode): state never
    # evicts, every cross-batch leg chains, and the drain terminates
    # promptly — the fixture-equality guarantee.
    src = _make_source(spark, tmp_path)
    schema = spark.createDataFrame([], _SCHEMA).schema
    out = _legs_per_user(_drain(spark, src, schema, ttl_ms=None))
    # user 1: 10->11, 11->12 (across the silent batch), 12->13 = 3 legs
    # user 2: 20->21, 21->22, 22->23 = 3 legs
    assert out == {1: (3, 0), 2: (3, 0)}


def test_tiny_ttl_evicts_silent_user_and_restarts_trajectory(spark, tmp_path):
    # ttl=1ms: user 1 is silent in batch 2, whose processing happens
    # well past the 1ms deadline -> state evicted (hasTimedOut path)
    # -> the 11->12 gap-spanning leg is NOT emitted; user 2 has data in
    # every batch, so data-beats-timeout keeps their chain intact.
    src = _make_source(spark, tmp_path)
    schema = spark.createDataFrame([], _SCHEMA).schema
    out = _legs_per_user(
        _drain(spark, src, schema, ttl_ms=1, expect_legs=5)
    )
    assert out[2] == (3, 0), out
    assert out[1] == (2, 0), out  # lost exactly the gap-spanning leg


def test_replayed_file_is_dropped_and_counted(spark, tmp_path):
    # at-least-once redelivery: batch 3's rows delivered AGAIN as a 4th
    # file. The dedup contract drops them (answer unchanged) and the
    # n_dropped metric on emitted legs exposes the divergence source.
    replay = [(1, 12, _ts(3)), (1, 13, _ts(4)), (2, 23, _ts(3)),
              (1, 14, _ts(5))]  # one genuinely new ping rides along
    src = _make_source(spark, tmp_path, extra_file=replay)
    schema = spark.createDataFrame([], _SCHEMA).schema
    legs = _drain(spark, src, schema, ttl_ms=None)
    out = _legs_per_user(legs)
    # user 1 gains the 13->14 leg; the replayed (12, 13) rows are drops
    assert out[1] == (4, 2), out
    # user 2's replayed row is dropped but emits no new leg, so the
    # count lives in state; their emitted legs still report 0 drops
    # from before the replay
    assert out[2][0] == 3, out
