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
# dict ordering decides what gets externally verified. Round-8 window
# (tools/gate_coverage.py --window over CORRECTNESS_r01-r07, per VERDICT
# r7 item #1): ALL 33 queries whose newest driver row is still r02 lead —
# closing the rotation debt so no entry's newest row is older than r03 —
# then the 9 round-8-new never-sampled operators, then the 8 stalest r03
# greens. Names are stable — only dict ordering changes round to round.
_R08_WINDOW = [
    "q_embed_maxsim",
    "q_embed_neardup",
    "q_event_transitions",
    "q_events_from_json",
    "q_events_sessionize",
    "q_events_sliding",
    "q_events_tumbling",
    "q_funnel_analysis",
    "q_hll_distinct",
    "q_kmeans_step",
    "q_kmv_set_overlap",
    "q_late_data_audit",
    "q_latest_per_key",
    "q_locf_gapfill",
    "q_map_functions",
    "q_multimodal_decode",
    "q_multimodal_framesample",
    "q_multimodal_resize",
    "q_ngram_counts",
    "q_nullsafe_join",
    "q_pivot_user_activity",
    "q_quality_repetition",
    "q_scd2_intervals",
    "q_sequence_packing",
    "q_source_mixture",
    "q_text_bm25",
    "q_text_bpe_tokens",
    "q_text_fingerprint",
    "q_text_langid",
    "q_text_scrub",
    "q_text_stats",
    "q_time_rollup",
    "q_trailing_window",
    "q_zh_segment_fmm",
    "q_multimodal_jpeg_decode",
    "q_unigram_train3",
    "q_tokenize_wordpiece",
    "q_dedup_edit_distance",
    "q_url_dedup",
    "q_pii_scrub",
    "q_length_bucketing",
    "q_mixture_temperature",
    "q10_returned_items",
    "q11_important_parts",
    "q12_late_shipments",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_part_supplier_counts",
    "q17_small_quantity_revenue",
    "q18_large_volume_customers",
]

# retained for provenance (round-7 ordering)
_R07_WINDOW = [
    "zh_backfill_typo_compat",
    "q_multimodal_png_decode",
    "q_annotator_kappa",
    "q_vocab_coverage",
    "q_embed_binary_hamming",
    "q_blocklist_filter",
    "q_token_budget_select",
    "q_negative_sampling",
    "q_skew_audit",
    "q_multimodal_bmp_decode",
    "q_dp_census",
    "q_unigram_lm_step",
    "q_langid_confusion",
    "q_epoch_shuffle",
    "q_multimodal_wav_features",
    "q_nb_auc",
    "q_logreg_step",
    "q_unigram_apply",
    "q3_shipping_priority",
    "q4_order_priority",
    "q5_local_supplier_volume",
    "q_advanced_aggregates",
    "q_cube_orders",
    "q_customer_order_running",
    "q_customers_without_orders",
    "q_date_functions",
    "q_distinct_agg",
    "q_integrity_audit",
    "q_priority_sample",
    "q_recursive_calendar",
    "q_rollup_returns",
    "q_scalar_functions",
    "q_stratified_sample",
    "q_topk_per_group_agg",
    "q_unpivot_measures",
    "q13_customer_distribution",
    "q6_forecast_revenue",
    "q_array_functions",
    "q_asof_click_purchase",
    "q_bpe_merge_candidates",
    "q_cms_heavy_hitters",
    "q_cohort_retention",
    "q_curation_pipeline",
    "q_decontaminate_ngram",
    "q_decontamination",
    "q_dedup_canonical",
    "q_dedup_exact",
    "q_dedup_simhash",
    "q_doc_chunking",
    "q_embed_int8_rerank",
]


def _gate_order(names) -> list[str]:
    head = [n for n in _R08_WINDOW if n in names]
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
