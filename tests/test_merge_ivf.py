"""Unit tests for the MERGE INTO operator and the IVF k-means trainer."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.operators.ivf import assign_cells, kmeans_fit
from openmaptiles_zh_modifier_spark.operators.merge import merge_into


def _base(spark):
    return spark.createDataFrame(
        [Row(k=1, v="a", bal=10.0), Row(k=2, v="b", bal=20.0), Row(k=3, v="c", bal=30.0)]
    )


def _src(spark):
    # k=2 -> update, k=3 -> delete, k=9 -> insert, k=1 untouched (no row)
    return spark.createDataFrame(
        [Row(key=2, amt=5.0, drop=False), Row(key=3, amt=0.0, drop=True),
         Row(key=9, amt=99.0, drop=False)]
    )


def test_merge_three_clauses(spark):
    out = merge_into(
        _base(spark),
        _src(spark),
        on={"k": "key"},
        matched_update={"bal": F.col("t.bal") + F.col("s.amt")},
        matched_delete=F.col("s.drop"),
        not_matched_insert={"k": F.col("s.key"), "v": F.lit("new"),
                            "bal": F.col("s.amt")},
    )
    rows = {r.k: r for r in out.collect()}
    assert set(rows) == {1, 2, 9}          # 3 deleted
    assert rows[1].bal == 10.0 and rows[1].v == "a"   # untouched passthrough
    assert rows[2].bal == 25.0             # updated
    assert rows[9].v == "new" and rows[9].bal == 99.0  # inserted
    assert out.columns == _base(spark).columns  # schema preserved


def test_merge_update_only_downgrades_to_left_join(spark):
    out = merge_into(
        _base(spark), _src(spark), on={"k": "key"},
        matched_update={"bal": F.col("t.bal") + F.col("s.amt")},
        not_matched_insert=None,
    )
    rows = {r.k: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}          # no insert branch, no delete
    assert rows[3].bal == 30.0
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "FullOuter" not in plan
    assert "BroadcastHashJoin" in plan     # small source broadcasts


def test_merge_delete_null_condition_keeps_row(spark):
    # NULL delete-condition must be treated as false, not drop the row.
    src = spark.createDataFrame(
        [(2, 1.0, None)], "key int, amt double, drop boolean"
    )
    out = merge_into(
        _base(spark), src, on={"k": "key"},
        matched_delete=F.col("s.drop"),
        not_matched_insert={"k": F.col("s.key")},
    )
    assert sorted(r.k for r in out.collect()) == [1, 2, 3]


# ---------------------------------------------------------------- ivf kmeans

def _vecs(spark):
    # Two tight clusters around (0,0) and (10,10).
    pts = [(i, [0.0 + i * 0.1, 0.0]) for i in range(5)]
    pts += [(10 + i, [10.0 + i * 0.1, 10.0]) for i in range(5)]
    return spark.createDataFrame(pts, "id int, e array<double>")


def test_kmeans_converges_and_inertia_monotone(spark):
    cents, hist = kmeans_fit(_vecs(spark), "e", k=2, id_col="id", max_iter=8)
    assert len(cents) == 2 and all(len(c) == 2 for c in cents)
    assert all(a >= b - 1e-9 for a, b in zip(hist, hist[1:]))  # non-increasing
    # Final centroids near the true cluster means (0.2,0) and (10.2,10).
    got = sorted((round(c[0], 1), round(c[1], 1)) for c in cents)
    assert got == [(0.2, 0.0), (10.2, 10.0)]


def test_assign_cells_picks_nearest(spark):
    cents = [[0.0, 0.0], [10.0, 10.0]]
    out = assign_cells(_vecs(spark), "e", cents).select("id", "cell").collect()
    for r in out:
        assert r.cell == (0 if r.id < 10 else 1)


def test_kmeans_deterministic(spark):
    a, _ = kmeans_fit(_vecs(spark), "e", k=2, id_col="id", max_iter=5)
    b, _ = kmeans_fit(_vecs(spark), "e", k=2, id_col="id", max_iter=5)
    assert a == b


def test_merge_rejects_duplicate_source_keys(spark):
    import pytest

    dup_src = spark.createDataFrame(
        [(2, 1.0, False), (2, 3.0, False)], "key int, amt double, drop boolean"
    )
    with pytest.raises(ValueError, match="multiple rows for merge key"):
        merge_into(
            _base(spark), dup_src, on={"k": "key"},
            matched_update={"bal": F.col("s.amt")},
            not_matched_insert={"k": F.col("s.key")},
        )
    # opt-out path still works for by-construction-unique sources
    out = merge_into(
        _base(spark),
        dup_src.groupBy("key").agg(F.sum("amt").alias("amt")),
        on={"k": "key"},
        matched_update={"bal": F.col("s.amt")},
        not_matched_insert=None,
        validate_source_unique=False,
    )
    assert {r.k: r.bal for r in out.collect()}[2] == 4.0


def test_kmeans_rejects_k_larger_than_corpus(spark):
    import pytest

    with pytest.raises(ValueError, match="corpus has only"):
        kmeans_fit(_vecs(spark), "e", k=99, id_col="id")
