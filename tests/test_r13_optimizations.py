"""Focused tests for the round-13 optimization changes: the driver-side
fixpoints must be BIT-IDENTICAL to the Spark formulations they replaced,
and the streaming conf toggle must be scoped to the drain."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pyspark.sql.functions as F
import pytest


def _rhu(x: float) -> int:
    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


class TestDecimalRoundParity:
    """The PCA / HITS driver loops replicate Spark's ROUND-on-double
    (BigDecimal HALF_UP) with decimal.Decimal on the exact binary double
    — including the values where float-arithmetic rounding (x+0.5 then
    floor) would differ."""

    TRICKY = [
        0.5, 1.5, 2.5, -0.5, -1.5, -2.5,
        0.49999999999999994,   # x+0.5 rounds UP to 1.0 in float; ROUND says 0
        -0.49999999999999994,
        2.4999999999999996, 1e6 - 0.5, 123456.5, -123456.5,
        0.0, -0.0, 1.0, 7.499999999999999, 7.500000000000001,
    ]

    def test_matches_spark_round(self, spark):
        df = spark.createDataFrame(
            [(x,) for x in self.TRICKY], "x double"
        ).select(F.round("x").cast("long").alias("r"))
        got = [r.r for r in df.collect()]
        want = [_rhu(x) for x in self.TRICKY]
        assert got == want

    def test_floatpath_would_differ(self):
        # documents WHY Decimal is used: the naive float path disagrees
        # on the epsilon-below-half value
        import math

        x = 0.49999999999999994
        naive = math.floor(x + 0.5)
        assert naive == 1 and _rhu(x) == 0


class TestDriverFixpointsMatchSparkFold:
    """The textrank/pagerank driver loops fold contributions in
    ascending-source order with plain double ops — assert the Python
    fold equals Spark's array_sort(collect_list)+aggregate fold on a
    small random graph, bit-for-bit."""

    def test_fold_parity(self, spark):
        import random

        rng = random.Random(13)
        edges = [
            (d, s, float(rng.randint(1, 9)), float(rng.randint(10, 99)))
            for d in range(6)
            for s in rng.sample(range(20), 5)
        ]
        ranks = {s: rng.random() for _, s, _, _ in edges}
        # python fold (the q_textrank_keywords / q_pagerank_nations loop)
        py = {}
        for d, s, w, ow in sorted(edges):
            py[d] = py.get(d, 0.0) + ranks[s] * w / ow
        # spark fold (the formulation the loop replaced)
        e = spark.createDataFrame(
            edges, "dst int, src int, w8 double, ow double"
        )
        r = spark.createDataFrame(
            sorted(ranks.items()), "src int, r double"
        )
        got = {
            row.dst: row.s
            for row in e.join(r, "src")
            .select("dst", "src", (F.col("r") * F.col("w8") / F.col("ow")).alias("c"))
            .groupBy("dst")
            .agg(
                F.aggregate(
                    F.array_sort(F.collect_list(F.struct("src", "c"))),
                    F.lit(0.0),
                    lambda acc, x: acc + x["c"],
                ).alias("s")
            )
            .collect()
        }
        assert got == py  # exact equality — identical IEEE op order


class TestHaarDriverButterfly:
    """The q_haar_wavelet driver butterfly is lossless integer math —
    assert perfect reconstruction (the inverse transform restores the
    series) and the level-9 approximation equals the series total."""

    def test_roundtrip_and_total(self):
        import random

        rng = random.Random(7)
        series = [rng.randint(0, 1000) for _ in range(512)]
        a = list(series)
        levels = []  # det coefficients per level
        while len(a) > 1:
            nxt = [a[2 * p] + a[2 * p + 1] for p in range(len(a) // 2)]
            det = [a[2 * p] - a[2 * p + 1] for p in range(len(a) // 2)]
            levels.append(det)
            a = nxt
        assert a[0] == sum(series)
        # inverse: left = (s+d)/2, right = (s-d)/2 — exact integers
        rec = a
        for det in reversed(levels):
            nxt = []
            for s, d in zip(rec, det):
                left = (s + d) // 2
                right = (s - d) // 2
                assert left + right == s and left - right == d
                nxt.extend((left, right))
            rec = nxt
        assert rec == series


class TestRunToMemoryConfScope:
    """run_to_memory's no-data-batch skip must not leak into the caller's
    session state, and append drains must keep the default."""

    def test_conf_restored(self, spark, sf_dir):
        from openmaptiles_zh_modifier_spark.registry import QUERIES

        key = "spark.sql.streaming.noDataMicroBatches.enabled"
        spark.conf.set(key, "true")
        QUERIES["q_stream_tumbling"](spark, sf_dir).count()
        assert spark.conf.get(key) == "true"

    def test_append_drain_default_keeps_nodata_batch(self, spark, sf_dir):
        """A windowed APPEND aggregation emits a window only when the
        watermark passes its end — over an availableNow drain of one
        finite backlog, EVERY emission happens in the trailing no-data
        micro-batch. If run_to_memory ever skipped that batch for a
        default append drain, this output would be empty (ADVICE r13:
        the old test used q_stream_dedup, which opts INTO the skip and
        emits first-seen rows in data batches — it could not detect the
        loss)."""
        from pyspark.sql import functions as F

        from openmaptiles_zh_modifier_spark.streaming.events import (
            read_events_stream,
            run_to_memory,
            windowed_bin_counts,
        )

        out = run_to_memory(
            windowed_bin_counts(read_events_stream(spark, sf_dir)),
            output_mode="append",
        )
        got = {
            (r["wstart"], r["bin"]): r["c"]
            for r in out.collect()
        }
        assert got, "append drain emitted nothing — no-data batch lost"
        # and the finalized windows match the batch twin over CLOSED
        # windows (end <= max_ts - 2h watermark)
        from openmaptiles_zh_modifier_spark.registry import load
        from openmaptiles_zh_modifier_spark.streaming.events import (
            PSI_STREAM_BINS,
            PSI_STREAM_BIN_W,
        )

        ev = load(spark, sf_dir, "events")
        max_ts = ev.agg(F.max("ts")).collect()[0][0]
        b = F.least(
            F.floor(F.col("value") / PSI_STREAM_BIN_W).cast("long"),
            F.lit(PSI_STREAM_BINS - 1),
        )
        expected = {
            (r["wstart"], r["bin"]): r["c"]
            for r in (
                ev.withColumn("bin", b)
                .groupBy(F.window("ts", "1 hour"), "bin")
                .agg(F.count(F.lit(1)).alias("c"))
                .where(
                    F.col("window.end")
                    <= F.lit(max_ts) - F.expr("INTERVAL 2 HOURS")
                )
                .select(F.col("window.start").alias("wstart"), "bin", "c")
                .collect()
            )
        }
        assert got == expected
