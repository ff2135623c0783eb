"""Sketch accuracy contracts + bucketed-join exchange elimination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.registry import QUERIES
from openmaptiles_zh_modifier_spark.sources.io import write_bucketed_table


def test_approx_sketches_within_rated_error(spark, sf_dir):
    # The query now self-asserts the rated-error contract as 0/1 flag
    # columns (scalar outputs — the driver canonicalizer rejects arrays);
    # every flag must be 1 and the exact columns must be positive.
    rows = QUERIES["q_approx_sketches"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.exact_parts > 0 and r.n > 0
        assert r.approx_parts_ok == 1
        assert r.p25_ok == 1 and r.p50_ok == 1 and r.p75_ok == 1
        assert r.iqr_monotone_ok == 1


def test_bucketed_join_eliminates_exchange(spark, tmp_path):
    # warehouse.dir is static config; managed test tables land in the
    # default ./spark-warehouse (gitignored) and are dropped on exit
    left = spark.range(0, 1000).withColumn("v", F.col("id") % 13)
    right = spark.range(0, 1000, 2).withColumn("w", F.col("id") % 7)
    write_bucketed_table(left, "bk_left", ["id"], n_buckets=8, sort_cols=["id"])
    write_bucketed_table(right, "bk_right", ["id"], n_buckets=8, sort_cols=["id"])
    try:
        joined = spark.table("bk_left").join(spark.table("bk_right"), "id")
        # disable broadcast so the co-located sort-merge path is chosen
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
        # both sides bucketed on the join key: no shuffle exchange at all
        assert "Exchange hashpartitioning" not in plan
        assert joined.count() == 500
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


# ------------------------------------------------- portable sketch bounds

def test_portable_sketches_respect_their_contracts(spark, sf_dir):
    from openmaptiles_zh_modifier_spark.queries_sketches import (
        q_cms_heavy_hitters,
        q_hll_distinct,
        q_kmv_set_overlap,
    )

    # CMS: min-over-rows can only OVER-count
    for r in q_cms_heavy_hitters(spark, sf_dir).collect():
        assert r.overcount >= 0
        assert r.cms_estimate >= r.exact_count

    # HLL m=64: raw estimate within ~5 sigma of exact (sigma ~ 1.04/8)
    for r in q_hll_distinct(spark, sf_dir).collect():
        assert r.rel_error < 5 * 1.04 / 8, (r.o_orderpriority, r.rel_error)

    # KMV: union estimate >= each side's true overlap; agreement <= k
    row = q_kmv_set_overlap(spark, sf_dir).collect()[0]
    assert 0 <= row.sketch_agreement <= 128
    assert row.overlap_estimate >= 0
    # overlap cannot exceed the union estimate
    assert row.overlap_estimate <= row.union_estimate + 1e-9
