"""Plan-quality regression gates: the properties PLANS.md documents,
asserted so they can't silently rot. Each assertion is a measured
scale behavior from SCALE.md — a failing test means a plan regressed
into a shape that's wrong at 100 TB, even if results stay correct."""

from __future__ import annotations

import contextlib
import io

from openmaptiles_zh_modifier_spark.registry import QUERIES


def _plan(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def test_filter_pushdown_reaches_parquet_scan(spark, sf_dir):
    """q6's shipdate/discount/quantity predicates must land in the scan
    (PushedFilters), not in a post-scan Filter only."""
    plan = _plan(QUERIES["q6_forecast_revenue"](spark, sf_dir))
    assert "PushedFilters:" in plan
    pushed = [
        ln for ln in plan.splitlines() if "PushedFilters:" in ln
    ]
    assert any("l_shipdate" in ln for ln in pushed), pushed


def test_column_pruning_reaches_parquet_scan(spark, sf_dir):
    """q6 projects 4 of lineitem's 16 columns; the ReadSchema must not
    carry the full row."""
    plan = _plan(QUERIES["q6_forecast_revenue"](spark, sf_dir))
    read = [ln for ln in plan.splitlines() if "ReadSchema:" in ln]
    assert read
    # a full-width read would include l_comment / l_shipmode etc.
    assert all("l_comment" not in ln for ln in read), read


def test_small_dims_broadcast(spark, sf_dir):
    """q3's customer-side join must be a broadcast hash join, never a
    shuffle of the fact table against a tiny dim."""
    plan = _plan(QUERIES["q3_shipping_priority"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_mixture_weights_scans_corpus_once(spark, sf_dir):
    """q_mixture_weights' four downstream branches must read the cached
    20-row per-source aggregate, not re-scan documents (the regression
    the round-4 memo fixed: 4 scans -> 1)."""
    plan = _plan(QUERIES["q_mixture_weights"](spark, sf_dir))
    assert plan.count("documents.parquet") <= 1, plan.count(
        "documents.parquet"
    )


def test_gdpr_cascade_single_lazy_plan(spark, sf_dir):
    """q_gdpr_cascade must be ONE plan whose semi-join cascade appears
    inside it (not literals computed at construction — the eager class
    type_audit kills), with the victim set broadcast."""
    df = QUERIES["q_gdpr_cascade"](spark, sf_dir)
    plan = _plan(df)
    assert "LeftSemi" in plan
    assert "lineitem" in plan and "orders" in plan and "customer" in plan


def test_stream_join_state_key_carries_time_bucket(spark, sf_dir):
    """The stream-stream joins' hot-key guard: the join's equality keys
    must include the hour-bucket columns, so state probes scan one
    user-hour, not all of a user's history. Asserted on the ANALYZED
    plan of the shared join builder both registered queries use — the
    Join node's condition must reference both bucket columns — so any
    refactor that drops the bucketing fails this test regardless of how
    the condition is spelled in source."""
    from openmaptiles_zh_modifier_spark.streaming.events import (
        bucketed_click_purchase_join,
    )

    for how in ("inner", "left_outer"):
        joined = bucketed_click_purchase_join(spark, sf_dir, how)
        plan = joined._jdf.queryExecution().analyzed().toString()
        join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
        assert join_lines, f"no Join node in analyzed plan ({how})"
        cond = join_lines[0]
        assert "c_bucket#" in cond and "p_bucket#" in cond, (
            f"{how} join condition lost the hour-bucket state key: {cond}"
        )


def test_span_clean_memoizes_window_explode(spark, sf_dir):
    """q_substring_span_clean derives the span DF AND the coverage join
    from one memoized span frame — the K-per-token window explode must
    not be recomputed per consumer, and the coverage join must be an
    equi-join (never a cartesian)."""
    plan = _plan(QUERIES["q_substring_span_clean"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "InMemoryTableScan" in plan  # the memoized span frame
    # only the token posexplode re-reads documents; the span explode
    # branches come from cache (2 scans would mean the memo regressed)
    assert plan.count("documents.parquet") <= 2


def test_boilerplate_cleaned_no_cartesian_and_partial_agg(spark, sf_dir):
    """The cleaned-text reassembly joins segments on their key and
    aggregates per doc with a partial (map-side) aggregate."""
    plan = _plan(QUERIES["q_boilerplate_cleaned"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan or "HashAggregate" in plan


def test_cross_source_overlap_no_shingle_self_join(spark, sf_dir):
    """The contamination matrix's pair expansion must be IN-ROW (explode
    of each shingle's collected source set), not a self-join on the
    shingle hash: the only Join nodes allowed in the plan are the two
    tiny per-source-count enrichment joins on src_a/src_b, so a hot
    shingle can never become a skewed join key."""
    from openmaptiles_zh_modifier_spark.registry import QUERIES

    df = QUERIES["q_cross_source_overlap"](spark, sf_dir)
    plan = df._jdf.queryExecution().analyzed().toString()
    join_lines = [ln for ln in plan.splitlines() if " Join " in ln or ln.lstrip().startswith("Join ")]
    assert len(join_lines) == 2, join_lines
    assert all("src_a#" in ln or "src_b#" in ln for ln in join_lines), join_lines
    assert not any("gh#" in ln for ln in join_lines), (
        f"shingle-hash self-join reappeared: {join_lines}"
    )


def test_covariance_single_corpus_scan_and_arrow_stage(spark, sf_dir):
    """The covariance plan must touch the embeddings parquet exactly once
    (inside the one mapInPandas codec/Gram stage) — partial sums, not
    vectors, are what shuffles."""
    from openmaptiles_zh_modifier_spark.registry import QUERIES, clear_frame_cache

    clear_frame_cache()
    try:
        df = QUERIES["q_embed_covariance"](spark, sf_dir)
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        # all four consumers (prod, m_i, m_j, n) print the SAME cached
        # partials lineage, so the FileScan appears once per consumer in
        # the tree — what must hold is (a) every scan is pruned to the
        # embedding column, (b) a MapInPandas Gram stage sits above it,
        # and (c) every printed lineage is the SAME physical plan (one
        # Exchange plan_id), i.e. the corpus is scanned once and every
        # consumer reads the shared cache.
        import re

        scans = [
            ln for ln in plan.splitlines()
            if "embeddings.parquet" in ln and "FileScan" in ln
        ]
        assert scans, plan
        assert all("struct<embedding:array<float>>" in ln for ln in scans), scans
        assert "MapInPandas" in plan, plan
        ids = set(re.findall(r"Exchange hashpartitioning\(i#\d+, j#\d+, \d+\),\s*\w+,\s*\[plan_id=(\d+)\]", plan))
        assert len(ids) == 1, (ids, plan)
    finally:
        clear_frame_cache()


def test_nb_classifier_broadcasts_model(spark, sf_dir):
    """The NB scoring join must broadcast the |vocab| x |classes| model
    (and the vocab prune), never shuffle the token explode against it."""
    plan = _plan(QUERIES["q_nb_source_classifier"](spark, sf_dir))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_bootstrap_single_corpus_scan_per_branch(spark, sf_dir):
    """The Poisson bootstrap reads orders for the replicate explode and
    once more for the point estimate — two scans total, no more (the
    64x amplification must live inside the scan stage, not as 64
    branches)."""
    plan = _plan(QUERIES["q_bootstrap_ci"](spark, sf_dir))
    assert plan.count("orders.parquet") <= 2, plan.count("orders.parquet")


def test_gopher_rules_no_shuffle_before_sort(spark, sf_dir):
    """Gopher flags are per-row column expressions: exactly one exchange
    (the presentation sort), no aggregation exchanges, no explode."""
    plan = _plan(QUERIES["q_gopher_rules"](spark, sf_dir), mode="simple")
    assert "Generate" not in plan  # no explode — arrays stay in-row
    assert plan.count("Exchange") <= 1, plan


def test_window_ranks_single_window_operator(spark, sf_dir):
    """All four distribution functions over the same (partition, order)
    must collapse into a shared sort, not one sort per function."""
    plan = _plan(QUERIES["q_window_ranks"](spark, sf_dir), mode="simple")
    # one partition-key exchange for the window + one for the final
    # presentation sort
    assert plan.count("Exchange") <= 2, plan
    assert plan.count("Window") == 1, plan


def test_kcore_linear_plan_depth(spark, sf_dir):
    """The peel must stay an edge-filter chain: no joins at all in the
    iteration body (two window counts per round), so no sort-merge or
    broadcast joins beyond the trajectory's count branches."""
    plan = _plan(QUERIES["q_kcore"](spark, sf_dir))
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_record_linkage_collapsed_shuffles(spark, sf_dir):
    """Round-9 settlement (VERDICT r8 #2): the blocked self-join must
    not pay a key shuffle under the broadcast build side, an Expand, or
    a dedupe+regroup shuffle pair — one round-robin probe spread, one
    aggregate exchange, one presentation sort."""
    plan = _plan(QUERIES["q_record_linkage"](spark, sf_dir), mode="simple")
    assert "Expand" not in plan, "distinct-aggregate Expand reappeared"
    # shuffles only: BroadcastExchange is the (cheap) broadcast, not a
    # shuffle — don't let the substring inflate the count
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 3, plan
    assert "BroadcastHashJoin" in plan


def test_geo_radius_join_is_equi_join(spark, sf_dir):
    """The radius join must stay a hash EQUI-join on the cell key —
    never a nested loop / cartesian (which a <=-radius theta-join
    would produce without the cell blocking)."""
    plan = _plan(QUERIES["q_geo_radius_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_geo_polygon_join_is_equi_join(spark, sf_dir):
    """The containment join must stay a hash EQUI-join on the blocking
    cell key — never a nested loop / cartesian (which the bbox BETWEEN
    predicates alone would produce), with the bbox + ray-cast as a
    post-join filter."""
    plan = _plan(QUERIES["q_geo_polygon_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_geo_dbscan_single_scan_no_nested_loop(spark, sf_dir):
    """DBSCAN's pair stream must be a hash equi-join on the cell key
    (never a cartesian/nested loop), and the three pair-stream
    consumers (degree, core edges, border) must read ONE materialized
    pair frame — the naive lazy plan re-derived the scan+join lineage
    per consumer (measured: 33 corpus scans, 110 exchanges)."""
    from openmaptiles_zh_modifier_spark.queries_geo import (
        _DB_PX,
        _DB_PY,
        dbscan_labels,
    )

    pts = spark.read.parquet(f"{sf_dir}/documents.parquet").selectExpr(
        "doc_id AS id", f"{_DB_PX} AS px", f"{_DB_PY} AS py"
    )
    plan = _plan(dbscan_labels(pts))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert plan.count("documents.parquet") <= 1


def test_geo_segment_join_is_equi_join(spark, sf_dir):
    """The segment overlay join must stay a hash EQUI-join on the
    blocking cell (never a nested loop), with bbox overlap, the
    reference-point owner rule, and the orientation test as post-join
    filters."""
    plan = _plan(QUERIES["q_geo_segment_join"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_geo_polygon_overlay_is_equi_join(spark, sf_dir):
    """The polygon-polygon overlay must stay a hash EQUI-join on the
    blocking cell (never a nested loop / cartesian), with bbox
    overlap, the reference-point owner rule, the center ray-cast, and
    the exists() edge test all evaluated as post-join row expressions."""
    plan = _plan(QUERIES["q_geo_polygon_overlay"](spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
