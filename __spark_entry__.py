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
from openmaptiles_zh_modifier_spark.session import (  # noqa: E402
    _export_package_pythonpath,
    apply_semantic_confs,
)

# workers must be able to re-import the package even if the driver was
# launched from another directory; effective when this import precedes
# the JVM launch (see session._export_package_pythonpath)
_export_package_pythonpath()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (the zh back-fill pipeline) on sf0.001."""
    apply_semantic_confs(spark)
    return QUERIES["zh_backfill"](spark, "/root/testdata/sf0.001")


# The driver gate samples the FIRST 50 registry entries each round, so the
# dict ordering decides what gets externally verified. Round-11 window
# (VERDICT r10 #1): the 17 remaining r04 rows (finishing the freshness
# retirement — q_stream_minhash_buckets is both an r04 row AND a bench
# mover), the five other >1.3x r9->r10 bench movers for their
# driver-vs-driver confirmation read after the BASELINE.md settlement
# (all six adjudicated environment-band in isolation), the THREE
# round-11 additions (the geodesic trilogy), and the 25 stalest r06
# rows. Base list from ``python tools/gate_coverage.py --window``.
_R11_WINDOW = [
    # 17 r04 rows — after this window, no row is older than r06
    "q_rolling_median",
    "q_semdedup",
    "q_ses_forecast",
    "q_session_bounce",
    "q_setops_nations",
    "q_skyline_parts",
    "q_sliding_distinct_hll",
    "q_source_kl",
    "q_stream_minhash_buckets",
    "q_stream_running_totals",
    "q_stream_stream_left",
    "q_substring_dupfrac",
    "q_tfidf_topk",
    "q_theta_set_algebra",
    "q_time_weighted_avg",
    "q_top3_parts_per_brand",
    "q_variant_json",
    # the other five settled bench movers (confirmation read)
    "q_stream_zh_backfill",
    "q_stream_cusum",
    "q_stream_stream_join",
    "q_rank_fusion_rrf",
    "q_geo_nearest",
    # round-11 additions
    "q_geo_polygon_join_geodesic",
    "q_geo_segment_join_geodesic",
    "q_geo_polygon_overlay_geodesic",
    # 25 stalest r06 rows
    "q1_pricing_summary",
    "q_anomaly_residual",
    "q_balanced_shards",
    "q_boilerplate_cleaned",
    "q_boilerplate_segments",
    "q_bootstrap_ci",
    "q_bpe_apply",
    "q_char_entropy",
    "q_corpus_datasheet",
    "q_cross_source_overlap",
    "q_cusum_changepoint",
    "q_dsir_selection",
    "q_embed_class_drift",
    "q_embed_covariance",
    "q_embed_matryoshka",
    "q_embed_pca_power",
    "q_embed_pq_adc",
    "q_embed_rand_projection",
    "q_gopher_rules",
    "q_hard_negatives",
    "q_hits_scores",
    "q_holt_linear",
    "q_kanonymity",
    "q_kcore",
    "q_km_survival",
]

# retained for provenance (round-10 ordering)
_R10_WINDOW = [
    "q_band_join",
    "q_multimodal_scene_cut",
    "q_multimodal_vad",
    "q_image_phash_dedup",
    "q_snapshot_diff",
    "q_zorder_vs_linear",
    "q_cow_compact_zorder",
    "q_prefix_cache_hits",
    "q_token_drift",
    "q_zh_convert_audit",
    "q_geo_nearest",
    "q_geo_geohash",
    "q_geo_bbox_join",
    "q_tile_pyramid",
    "q_geo_trajectory",
    "q_geo_radius_join",
    "q_tile_rollup",
    "q_geo_knn_join",
    "q_geo_polygon_join",
    "q_geo_dbscan",
    "q_geo_segment_join",
    "q_geo_polygon_overlay",
    "q_cow_schema_evolution",
    "q_stream_geofence",
    "q_stream_trajectory",
    "q_dedup_ngram_jaccard",
    "q_dedup_prefix_filter",
    "q_degree_capped_triangles",
    "q_degree_distribution",
    "q_delta_join_ivm",
    "q_embed_centroid_assign",
    "q_embed_ivf_topk",
    "q_embed_lsh_buckets",
    "q_embed_lsh_topk",
    "q_embed_topk_cosine",
    "q_event_debounce",
    "q_funnel_windowed",
    "q_ks_drift",
    "q_label_propagation",
    "q_mixture_weights",
    "q_multimodal_ppm_decode",
    "q_native_sketches",
    "q_ols_trend",
    "q_perplexity_filter",
    "q_pit_feature_join",
    "q_pmi_cooccurrence",
    "q_quantile_sketch",
    "q_rank_fusion_rrf",
    "q_record_linkage",
    "q_rfm_segmentation",
]

def _gate_order(names) -> list[str]:
    head = [n for n in _R11_WINDOW if n in names]
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
