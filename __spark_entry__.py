"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``openmaptiles_zh_modifier_spark.registry``;
this module is the thin driver-facing adapter.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from openmaptiles_zh_modifier_spark.registry import ORACLE_SQL, QUERIES  # noqa: E402
from openmaptiles_zh_modifier_spark.session import apply_semantic_confs  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the zh back-fill pipeline) on sf0.001."""
    apply_semantic_confs(spark)
    return QUERIES["zh_backfill"](spark, "/root/testdata/sf0.001")


# The driver gate samples the FIRST 50 registry entries each round, so the
# dict ordering decides what gets externally verified. Round-4 window
# (per VERDICT.md round-3 item #1): the 35 round-3-new queries that have
# never had a driver row (judge-verified in round 3, now driven through
# the external gate), then five of the seven round-4-new queries, then
# the stalest r01-greens most exposed to round-3 refactors — exactly 50.
# After round 4 every registry entry has a driver row in r01 ∪ … ∪ r04
# EXCEPT: q1/q3/q4/q5/q_advanced_aggregates (r01-green, plans untouched
# since) and the five late round-4 additions (q_dsir_selection,
# q_embed_pq_adc, q_pq_recall, q_split_leakage, q_boilerplate_segments
# — local-gate-verified 171/171 at sf0.01 AND sf0.1; they head the
# round-5 rotation, see tools/gate_coverage.py). Names are stable —
# only the dict ordering changes.
_R04_WINDOW = [
    # never driver-sampled (round-3-new), registry order
    "q_time_weighted_avg", "q_rolling_median", "q_event_debounce",
    "q_attribution", "q_ses_forecast", "q_funnel_windowed",
    "q_session_bounce", "q_pit_feature_join", "q_quantile_sketch",
    "q_native_sketches", "q_sliding_distinct_hll", "q_theta_set_algebra",
    "q_source_kl", "q_balanced_sample", "q_rfm_segmentation",
    "q_benford_audit", "q_chisq_independence", "q_ols_trend",
    "q_ks_drift", "q_delta_join_ivm", "q_label_propagation",
    "q_bfs_reachability", "q_degree_distribution", "q_assign_ids",
    "q_column_stats", "q_variant_json", "q_tfidf_topk",
    "q_rank_fusion_rrf", "q_perplexity_filter", "q_record_linkage",
    "q_semdedup", "q_substring_dupfrac", "q_pmi_cooccurrence",
    "q_skyline_parts", "q_stream_stream_left",
    # round-4-NEW queries (no earlier round could have sampled them)
    "q_degree_capped_triangles", "q_multimodal_ppm_decode",
    "q_stream_minhash_buckets", "q_mixture_weights",
    "q_stream_running_totals",
    # stalest greens (r01-only driver row) most exposed to round-3
    # refactors: graph, dedup, the whole embeddings block, and the
    # oldest relational spot checks (the plain TPC-H q1-q5 block stays
    # out — those plans are untouched since r01 and the window is full)
    "q_connected_components", "q_dedup_ngram_jaccard",
    "q_dedup_prefix_filter", "q_embed_topk_cosine", "q_embed_lsh_topk",
    "q_embed_lsh_buckets", "q_embed_centroid_assign", "q_embed_ivf_topk",
    "q_top3_parts_per_brand", "q_setops_nations",
]


def _gate_order(names) -> list[str]:
    head = [n for n in _R04_WINDOW if n in names]
    return head + [n for n in names if n not in set(head)]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            apply_semantic_confs(spark)
            return fn(spark, sf_dir)

        return run

    return {name: wrap(QUERIES[name]) for name in _gate_order(QUERIES)}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each oracle-checkable query."""
    return dict(ORACLE_SQL)
