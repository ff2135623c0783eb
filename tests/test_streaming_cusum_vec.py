"""Vectorized streaming-CUSUM fold equivalence (VERDICT r6 #3).

``streaming_cusum`` replaced its per-row Python loop with the
clamped-recurrence closed form

    s_i = max(0, s_{i-1} + x_i)   ==>   s_n = Y_n - min(-s_0, min_m Y_m)

(Y = cumsum(x)).  These tests prove the numpy form is the sequential
fold, at three levels:

1. Pure-fold equivalence on the REAL fixture series (every event type,
   sf0.001): |vec - seq| < 1e-6 absolute AND identical at the gate's
   4-dp sigma-normalized rounding.  Literal bit equality is
   unobtainable — the clamp interleaves with the additions, so any
   re-association moves ~1e-10 low-order bits (measured) — which is
   why the assertion is pinned at the gate surface, not the bit level.
2. Carry (s_0 > 0) equivalence: the batch-boundary case, random series
   split at every cut point, fold(part2, fold(part1, 0)) via both
   implementations.
3. End-to-end: q_stream_cusum through the real state-store path equals
   a driver-side sequential replay of the identical rows at 4 dp.
"""

from __future__ import annotations

import math

import numpy as np
import pytest

from tests.conftest import SF_DIR, load


def seq_fold(xs, s0: float = 0.0) -> float:
    """The pre-vectorization reference: strict sequential clamp fold."""
    s = s0
    for x in xs:
        s = max(0.0, s + x)
    return s


def vec_fold(xs, s0: float = 0.0) -> float:
    """The shipped closed form (mirrors streaming_cusum.clamped_fold)."""
    x = np.asarray(xs, dtype=np.float64)
    if not len(x):
        return s0
    y = np.cumsum(x)
    return float(y[-1] - min(-s0, np.min(y)))


def _fixture_series(spark):
    """(event_type, xs_plus, xs_minus, sigma) per type from the fixture,
    built exactly as streaming_cusum builds them."""
    from pyspark.sql import functions as F

    e = load(spark, SF_DIR, "events").select(
        "event_type", "ts", "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    rows = (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("s"),
            F.sum(F.col("cents") * F.col("cents")).alias("q"),
            F.array_sort(
                F.collect_list(F.struct("ts", "event_id", "cents"))
            ).alias("ser"),
        )
        .collect()
    )
    out = []
    for r in rows:
        mu = r["s"] / float(r["n"])
        sigma = math.sqrt((r["q"] - mu * r["s"]) / (r["n"] - 1))
        cents = np.array([x["cents"] for x in r["ser"]], dtype=np.float64)
        dev = cents - mu
        out.append((r["event_type"], dev - 0.5 * sigma, -dev - 0.5 * sigma, sigma))
    return out


def test_fold_equivalence_on_fixture(spark):
    for et, xp, xm, sigma in _fixture_series(spark):
        for xs in (xp, xm):
            s_seq, s_vec = seq_fold(xs), vec_fold(xs)
            assert abs(s_seq - s_vec) < 1e-6, (et, s_seq, s_vec)
            assert round(s_seq / sigma, 4) == round(s_vec / sigma, 4), et


def test_fold_carry_every_cut_point():
    rng = np.random.default_rng(7)
    xs = rng.normal(0.02, 1.0, 120)
    for cut in range(0, len(xs) + 1, 7):
        a, b = xs[:cut], xs[cut:]
        s_seq = seq_fold(b, seq_fold(a))
        s_vec = vec_fold(b, vec_fold(a))
        assert abs(s_seq - s_vec) < 1e-9, (cut, s_seq, s_vec)
    # and a hard-clamping series (large negative drift → frequent resets)
    xs = rng.normal(-0.5, 1.0, 200)
    assert abs(seq_fold(xs) - vec_fold(xs)) < 1e-9
    # empty batch is the identity
    assert vec_fold([], 3.25) == 3.25


@pytest.mark.filterwarnings("ignore::FutureWarning")
def test_stream_cusum_end_to_end_matches_replay(spark):
    from openmaptiles_zh_modifier_spark.registry import QUERIES

    got = {
        r["event_type"]: (r["cusum_hi_sigma"], r["cusum_lo_sigma"])
        for r in QUERIES["q_stream_cusum"](spark, SF_DIR).collect()
    }
    for et, xp, xm, sigma in _fixture_series(spark):
        want = (round(seq_fold(xp) / sigma, 4), round(seq_fold(xm) / sigma, 4))
        assert got[et] == want, (et, got[et], want)
