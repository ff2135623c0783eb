"""Physical-plan audit: regenerates PLANS.md with scale-relevant evidence
for headline queries — parquet pushdown (PushedFilters), column pruning
(ReadSchema), join strategies (broadcast vs sort-merge), whole-stage
codegen span count, and exchange (shuffle) count.

Usage: python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from openmaptiles_zh_modifier_spark.registry import QUERIES  # noqa: E402
from openmaptiles_zh_modifier_spark.session import get_spark  # noqa: E402

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q9_product_profit",
    "q18_large_volume_customers",
    "zh_backfill",
    "q_dedup_minhash_lsh",
    "q_embed_topk_cosine",
    "q_events_sessionize",
    "q_salted_skew_join",
    "q_time_rollup",
    "q_stratified_sample",
    "q_integrity_audit",
    "q_multimodal_framesample",
    "q_text_bm25",
    "q_dedup_prefix_filter",
    "q_embed_int8_rerank",
    "q_priority_sample",
    "q_bloom_join_prune",
    "q_tablediff_checksum",
    "q_pagerank_nations",
    "q_merge_upsert",
    "q_trailing_window",
    "q_curation_pipeline",
    "q_triangle_count",
    "q_zorder_layout",
    "q_lateral_topn",
    "q_decimal_exact",
    "q_gdpr_cascade",
    "q_dedup_simhash",
    "q_embed_neardup",
    "q_decontaminate_ngram",
    "q_source_mixture",
    "q_dedup_canonical",
    "q_decontamination",
    "q_char_entropy",
    "q_cross_source_overlap",
    "q_holt_linear",
    "q_embed_covariance",
    "q_record_linkage",
    "q_semdedup",
    "q_tfidf_topk",
    "q_rank_fusion_rrf",
    "q_variant_json",
    "q_perplexity_filter",
    "q_substring_dupfrac",
    "q_pmi_cooccurrence",
    "q_time_weighted_avg",
    "q_skyline_parts",
    "q_label_propagation",
    "q_bfs_reachability",
    "q_source_kl",
    "q_rolling_median",
    "q_assign_ids",
    "q_event_debounce",
    "q_chisq_independence",
    "q_ols_trend",
    "q_delta_join_ivm",
    "q_quantile_sketch",
    "q_pit_feature_join",
    "q_geo_radius_join",
    "q_geo_knn_join",
    "q_geo_polygon_join",
    "q_geo_polygon_join_geodesic",
    "q_geo_segment_join_geodesic",
    "q_geo_polygon_overlay_geodesic",
    "q_tile_rollup",
    "q_cow_compact_zorder",
    "q_geo_dbscan",
    "q_geo_dbscan_geodesic",
    "q_geo_segment_join",
    "q_geo_polygon_overlay",
    "q_cow_schema_evolution",
    "q_cow_delete_dv",
    "q_cow_partition_evolution",
    "q_multimodal_flac_decode",
    "q_balanced_sample",
    "q_column_stats",
    "q_native_sketches",
    "q_sliding_distinct_hll",
    "q_theta_set_algebra",
    "q_attribution",
    "q_ks_drift",
    "q_rfm_segmentation",
    "q_benford_audit",
    "q_ses_forecast",
    "q_degree_distribution",
    # round 4
    "q_degree_capped_triangles",
    "q_multimodal_ppm_decode",
    "q_mixture_weights",
    "q_dsir_selection",
    "q_embed_pq_adc",
    "q_pq_recall",
    "q_split_leakage",
    # round 6
    "q_mannwhitney_u",
    "q_bootstrap_ci",
    "q_gopher_rules",
    "q_nb_source_classifier",
    "q_hits_scores",
    "q_kcore",
    "q_link_prediction",
    "q_embed_matryoshka",
    "q_span_corruption",
    "q_weighted_sample",
    "q_ndcg_mrr",
    "q_km_survival",
    # round-7 operators
    "q_annotator_kappa",
    "q_vocab_coverage",
    "q_embed_binary_hamming",
    "q_blocklist_filter",
    "q_token_budget_select",
    "q_negative_sampling",
    "q_skew_audit",
    "q_dp_census",
    "q_unigram_lm_step",
    "q_langid_confusion",
    "q_epoch_shuffle",
    "q_nb_auc",
    "q_logreg_step",
    # round-8 operators
    "q_zh_segment_fmm",
    "q_multimodal_jpeg_decode",
    "q_unigram_train3",
    "q_tokenize_wordpiece",
    "q_dedup_edit_distance",
    "q_url_dedup",
    "q_pii_scrub",
    "q_length_bucketing",
    "q_mixture_temperature",
    "q_salted_skew_join",
    "q_band_join",
    "q_token_drift",
    "q_snapshot_diff",
    "q_multimodal_scene_cut",
    "q_multimodal_vad",
    "q_image_phash_dedup",
    "q_zorder_vs_linear",
    "q_prefix_cache_hits",
    "q_geo_nearest",
    "q_geo_geohash",
    "q_geo_bbox_join",
    "q_tile_pyramid",
    "q_geo_trajectory",
    # round-9 operators (q_stream_trajectory is a streaming drain — its
    # batch-side aggregation plan is trivial; the stateful plan is
    # exercised by the multibatch proof instead)
    "q_geo_radius_join",
    "q_tile_rollup",
    "q_zh_convert_audit",
    "q_geo_knn_join",
    # round-12 late additions (VERDICT r12 #2: the five rows PLANS.md
    # lacked at the r12 close)
    "q_cc_star",
    "q_embed_rvq_adc",
    "q_rvq_recall",
    "q_ldiversity",
    "q_resample_interpolate",
    # round-13 operators
    "q_cow_merge_dv",
    "q_multimodal_mulaw_roundtrip",
    "q_multimodal_adpcm_roundtrip",
    "q_spearman_corr",
    "q_acf_lags",
    "q_gini_concentration",
    "q_jaro_winkler_linkage",
    # round-13 second batch
    "q_kendall_tau",
    "q_quantile_normalize",
    "q_sprt_monitor",
    "q_cow_txn",
    "q_geo_convex_hull",
    "q_textrank_keywords",
    "q_theilsen_trend",
    "q_dtw_profiles",
    "q_haar_wavelet",
    "q_fellegi_sunter",
    "q_cow_clone",
    "q_isotonic_fit",
]


def plan_text(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def audit(plan: str, executed: str) -> dict[str, object]:
    # scan details (PushedFilters/ReadSchema) come from formatted mode;
    # node counts come from the executed string, which prints ONLY the
    # AQE-final plan (formatted mode after execution repeats every node
    # in an "Initial Plan" section and would double-count).
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    executed = executed.split("== Initial Plan ==")[0]
    return {
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", executed))),
        "exchanges": len(re.findall(r"\bExchange (?:hash|range|Single)", executed)),
        "broadcast_joins": len(re.findall(r"BroadcastHashJoin", executed)),
        "smj_joins": len(re.findall(r"SortMergeJoin", executed)),
        "pushed_filters": [p for p in pushed if p.strip()],
        "scan_cols": [len(s.split(",")) for s in schemas],
        "aqe": "AdaptiveSparkPlan" in executed,
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="omt-zh-plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# Physical-plan audit",
        "",
        f"Generated by `tools/explain_audit.py` over `{sf_dir}`. Evidence that",
        "the headline plans are the plans you'd want at 100 TB: filters reach",
        "the parquet scan, scans read only projected columns, small dims",
        "broadcast, big joins sort-merge under AQE, and the work sits inside",
        "whole-stage codegen (the Python boundaries — pandas UDF / mapInPandas",
        "stages — are the deliberate exceptions).",
        "",
        "| query | codegen spans | shuffles | BHJ | SMJ | scan cols/file | pushed filters | AQE |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for name in HEADLINE:
        df = QUERIES[name](spark, sf_dir)
        # collect, not count: count() builds a separate QueryExecution, so
        # THIS df's plan would stay isFinalPlan=false with no codegen marks
        df.collect()
        a = audit(plan_text(df), str(df._jdf.queryExecution().executedPlan()))
        pf = "; ".join(a["pushed_filters"])[:90] or "—"
        sc = ",".join(str(c) for c in a["scan_cols"]) or "—"
        lines.append(
            f"| {name} | {a['codegen_spans']} | {a['exchanges']} "
            f"| {a['broadcast_joins']} | {a['smj_joins']} | {sc} | {pf} "
            f"| {'on' if a['aqe'] else 'off'} |"
        )
        print(f"audited {name}", file=sys.stderr)

    lines += [
        "",
        "Notes:",
        "- `scan cols/file` counts fields in each scan's ReadSchema — column",
        "  pruning proof (lineitem has 16 columns; q6 reads 4).",
        "- Shuffle counts are plan-time; AQE coalesces/splits them at runtime.",
        "- Streaming queries are excluded (their plans are per-micro-batch);",
        "  their state-bound configs are documented in streaming/events.py.",
        "",
    ]
    Path(__file__).resolve().parent.parent.joinpath("PLANS.md").write_text(
        "\n".join(lines)
    )
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
