"""Physical-plan regression tests (the 100 TB guarantees: pushdown,
pruning, broadcast) + as-of join unit semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.operators.asof_join import asof_join
from openmaptiles_zh_modifier_spark.registry import QUERIES


def plan_text(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


# ------------------------------------------------------------- plan shapes

def test_q6_filters_reach_parquet_scan(spark, sf_dir):
    plan = plan_text(QUERIES["q6_forecast_revenue"](spark, sf_dir))
    assert "PushedFilters" in plan
    # at least the range predicates must be pushed to the reader
    assert "l_shipdate" in plan.split("PushedFilters")[1][:400]


def test_q6_column_pruning(spark, sf_dir):
    plan = plan_text(QUERIES["q6_forecast_revenue"](spark, sf_dir))
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_extendedprice" in read_schema
    # pruned: columns the query never touches must not be scanned
    assert "l_returnflag" not in read_schema
    assert "l_tax" not in read_schema


def test_q3_broadcasts_customer(spark, sf_dir):
    plan = plan_text(QUERIES["q3_shipping_priority"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q4_semi_join_planned(spark, sf_dir):
    plan = plan_text(QUERIES["q4_order_priority"](spark, sf_dir))
    assert "LeftSemi" in plan


def test_q1_partial_aggregation(spark, sf_dir):
    plan = plan_text(QUERIES["q1_pricing_summary"](spark, sf_dir))
    # map-side combine before the exchange — the agg shuffles group states,
    # not raw rows (the property that matters at 100 TB)
    assert "partial_sum" in plan
    assert plan.count("HashAggregate") >= 2


# ------------------------------------------------------------ as-of join

TS = "2024-01-01 00:00:{:02d}"


def ts(spark, s):
    return F.lit(s).cast("timestamp")


@pytest.fixture()
def asof_frames(spark):
    left = spark.createDataFrame(
        [
            (1, TS.format(10), "a"),
            (1, TS.format(20), "b"),
            (1, TS.format(5), "early"),
            (2, TS.format(30), "c"),
            (3, TS.format(30), "nomatch"),
        ],
        "k long, t string, lbl string",
    ).select("k", F.col("t").cast("timestamp").alias("t"), "lbl")
    right = spark.createDataFrame(
        [
            (1, TS.format(10), 100, 1.0),   # equal-ts: inclusive
            (1, TS.format(15), 150, 2.0),
            (1, TS.format(15), 151, 3.0),   # tiebreak: larger id wins
            (2, TS.format(1), 201, 4.0),
        ],
        "k long, t string, rid long, v double",
    ).select("k", F.col("t").cast("timestamp").alias("t"), "rid", "v")
    return left, right


def test_asof_backward_inclusive_and_tiebreak(spark, asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, on="k", ts="t", payload_cols=["rid", "v"], tiebreak="rid")
    got = {r.lbl: (r.asof_rid, r.asof_v) for r in out.collect()}
    assert got["a"] == (100, 1.0)      # equal ts matches (inclusive)
    assert got["b"] == (151, 3.0)      # latest ts, larger rid on tie
    assert got["early"] == (None, None)  # nothing at-or-before
    assert got["c"] == (201, 4.0)
    assert got["nomatch"] == (None, None)  # key absent on right


def test_asof_preserves_left_rowcount(spark, asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, on="k", ts="t", payload_cols=["rid"])
    assert out.count() == left.count()


def test_asof_single_shuffle(spark, asof_frames):
    left, right = asof_frames
    out = asof_join(left, right, on="k", ts="t", payload_cols=["rid"])
    plan = plan_text(out)
    # one exchange for the window partitioning; no join exchange at all
    assert plan.count("Exchange") <= 2  # hashpartitioning (+AQE read)
    assert "Join" not in plan


# -------------------------------------------- new-operator plan shapes

def test_bloom_probe_is_broadcast_only(spark, sf_dir):
    plan = plan_text(QUERIES["q_bloom_join_prune"](spark, sf_dir))
    # every bloom word-lookup and the truth join must broadcast; a
    # sort-merge join would mean the "filter before shuffle" claim is false
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_priority_sample_takeordered_no_exchange(spark, sf_dir):
    plan = plan_text(QUERIES["q_priority_sample"](spark, sf_dir))
    assert "TakeOrderedAndProject" in plan
    # the only exchanges allowed are broadcast (tau) — no hash/range
    # repartition of the data
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan


def test_merge_full_outer_single_key_shuffle(spark, sf_dir):
    plan = plan_text(QUERIES["q_merge_upsert"](spark, sf_dir))
    # 3-clause merge cannot broadcast (FULL outer); it must be exactly one
    # sort-merge join on the merge key (formatted mode prints each node
    # twice — once in the tree, once in the details — so count tree lines)
    assert plan.count("SortMergeJoin FullOuter") == 1


def test_embed_queries_broadcast_the_query_side(spark, sf_dir):
    for name in ("q_embed_topk_cosine", "q_embed_int8_rerank", "q_embed_maxsim"):
        plan = plan_text(QUERIES[name](spark, sf_dir))
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, name
        assert "SortMergeJoin" not in plan, name


def test_incremental_agg_partial_aggregation(spark, sf_dir):
    plan = plan_text(QUERIES["q_incremental_agg"](spark, sf_dir))
    assert "partial_sum" in plan  # states merge map-side before the exchange


def test_chunking_has_no_shuffle_before_sort(spark, sf_dir):
    plan = plan_text(QUERIES["q_doc_chunking"](spark, sf_dir))
    # explode+project only: the single exchange is the presentation sort
    assert "Exchange hashpartitioning" not in plan
