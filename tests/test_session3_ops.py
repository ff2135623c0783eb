"""Invariant tests for the session-3 operators (all oracle-paired in the
gate; these assert the structural contracts the value hash can't see)."""

from __future__ import annotations

from openmaptiles_zh_modifier_spark.queries_events import (
    ROLL_MED_N,
    q_event_debounce,
    q_rolling_median,
)
from openmaptiles_zh_modifier_spark.queries_merge import q_delta_join_ivm
from openmaptiles_zh_modifier_spark.queries_scale import q_assign_ids
from openmaptiles_zh_modifier_spark.queries_sketches import (
    QSK_BINW,
    q_quantile_sketch,
)
from openmaptiles_zh_modifier_spark.queries_text import q_source_kl


def test_assign_ids_are_contiguous_and_unique(spark, sf_dir):
    rows = q_assign_ids(spark, sf_dir).collect()
    ids = sorted(r.row_id for r in rows)
    assert ids == list(range(1, len(rows) + 1))


def test_ivm_branches_are_disjoint_and_exhaustive(spark, sf_dir):
    for r in q_delta_join_ivm(spark, sf_dir).collect():
        assert r.n_old_old + r.n_dr_s + r.n_r_ds + r.n_dr_ds == r.n_orders


def test_quantile_sketch_rated_error_and_monotone(spark, sf_dir):
    rows = q_quantile_sketch(spark, sf_dir).orderBy("p").collect()
    assert [r.p for r in rows] == [25, 50, 75, 90, 99]
    assert all(r.within_bound == 1 for r in rows)
    ests = [r.est_cents for r in rows]
    assert ests == sorted(ests)  # quantile estimates monotone in p
    assert all(r.est_cents >= 0 and r.est_cents <= r.bin * QSK_BINW + QSK_BINW
               for r in rows)


def test_source_kl_nonnegative(spark, sf_dir):
    rows = q_source_kl(spark, sf_dir).collect()
    assert rows
    # KL >= 0 up to the 6-dp per-term rounding slack
    assert all(r.kl_nats >= -1e-4 for r in rows)


def test_rolling_median_window_contract(spark, sf_dir):
    rows = q_rolling_median(spark, sf_dir).collect()
    assert rows and all(1 <= r.n_in_window <= ROLL_MED_N for r in rows)


def test_debounce_bursts_cover_all_events(spark, sf_dir):
    from openmaptiles_zh_modifier_spark.registry import load

    bursts = q_event_debounce(spark, sf_dir).collect()
    n_events = load(spark, sf_dir, "events").count()
    assert sum(r.burst_size for r in bursts) == n_events
    assert all(r.kept_event_id is not None for r in bursts)


def test_assign_ids_property_random_frames(spark):
    """Property: for seeded random key sets (with gaps, negatives, and
    string-sortable collision patterns), assign_contiguous_ids is a
    bijection onto 1..N whose order matches the declared
    (h32%B, h32, key) total order computed independently in Python."""
    import hashlib
    import random

    from openmaptiles_zh_modifier_spark.operators.ids import (
        assign_contiguous_ids,
    )

    def h32_py(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

    rng = random.Random(20260814)
    cases = [
        [],                       # empty frame
        [7],                      # singleton
        list(range(100)),         # dense
        rng.sample(range(10**9), 257),  # sparse, crosses buckets
        [-5, -1, 0, 3, -(10**12), 10**12],  # negatives + extremes
    ]
    for n_buckets in (1, 8):
        for keys in cases:
            df = spark.createDataFrame(
                [(k,) for k in keys], "k long"
            )
            got = {
                r.k: r.row_id
                for r in assign_contiguous_ids(
                    df, "k", n_buckets=n_buckets
                ).collect()
            }
            expect_order = sorted(
                keys,
                key=lambda k: (
                    h32_py(str(k)) % n_buckets, h32_py(str(k)), k
                ),
            )
            assert got == {k: i + 1 for i, k in enumerate(expect_order)}


def test_ses_fold_matches_python_reference(spark, sf_dir):
    """The SES recurrence computed by the Spark fold must equal a plain
    Python loop over the same day-ordered integer-cent series (identical
    seed-with-first semantics, same alpha literal)."""
    from openmaptiles_zh_modifier_spark.queries_events import (
        SES_ALPHA,
        q_ses_forecast,
    )
    from openmaptiles_zh_modifier_spark.registry import load
    from pyspark.sql import functions as F

    alpha = float(SES_ALPHA)
    ev = load(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "user_id", F.to_date(F.date_trunc("day", "ts")).alias("day")
        )
        .agg(
            F.sum(F.round(F.col("value") * 100).cast("bigint"))
            .cast("double")
            .alias("x")
        )
        .collect()
    )
    series: dict = {}
    for r in daily:
        series.setdefault(r.user_id, []).append((r.day, r.x))
    expect = {}
    for u, pts in series.items():
        level = None
        for _, x in sorted(pts):
            level = x if level is None else alpha * x + (1.0 - alpha) * level
        expect[u] = round(level, 4)
    got = {r.user_id: r.level_cents for r in q_ses_forecast(spark, sf_dir).collect()}
    assert got == expect


def test_debounce_matches_python_reference(spark, tmp_path):
    """Burst segmentation on a crafted series with exact-threshold gaps,
    chains, and multi-user interleaving, checked against a Python fold."""
    import datetime as dt

    from openmaptiles_zh_modifier_spark.queries_events import (
        DEBOUNCE_GAP_S,
        q_event_debounce,
    )

    base = dt.datetime(2024, 1, 1)
    g = DEBOUNCE_GAP_S
    # user 1: chain where each gap < g but total span > g (one burst);
    # user 2: gap EXACTLY g (boundary -> new burst); user 3: singleton
    rows = [
        (1, 1, "click", base, 0.0, None),
        (2, 1, "click", base + dt.timedelta(seconds=g - 1), 0.0, None),
        (3, 1, "click", base + dt.timedelta(seconds=2 * (g - 1)), 0.0, None),
        (4, 2, "click", base, 0.0, None),
        (5, 2, "click", base + dt.timedelta(seconds=g), 0.0, None),
        (6, 3, "view", base, 0.0, None),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, event_type string, ts timestamp,"
        " value double, props string",
    )
    out = str(tmp_path / "ev")
    df.write.parquet(f"{out}/events.parquet")
    bursts = {
        (r.user_id, r.burst_id): (r.kept_event_id, r.burst_size)
        for r in q_event_debounce(spark, out).collect()
    }
    assert bursts == {
        (1, 1): (1, 3),  # sub-threshold chain collapses into ONE burst
        (2, 1): (4, 1),  # gap == threshold starts a new burst...
        (2, 2): (5, 1),
        (3, 1): (6, 1),
    }
