"""Tests for the round-3 retrieval/linkage/semantic-dedup operators
(queries_retrieval.py). The DuckDB oracle harness checks value parity;
these tests check the SEMANTIC invariants the oracle can't express —
blocking losslessness against an in-process brute force, greedy-dedup
monotonicity, rank-fusion bounds — at sf0.001 for speed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.registry import QUERIES


def test_record_linkage_blocking_is_lossless(spark, sf_dir):
    """The deletion-neighborhood blocked join must find EXACTLY the pairs
    the naive all-pairs levenshtein scan finds."""
    got = {
        (r.c_custkey, r.n_nb, r.min_nb, r.max_nb)
        for r in QUERIES["q_record_linkage"](spark, sf_dir).collect()
    }
    names = [
        (r.c_custkey, r.c_name)
        for r in spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select("c_custkey", "c_name")
        .collect()
    ]

    def lev1(a: str, b: str) -> bool:
        # equal-length fixture names: lev<=1 <=> Hamming<=1
        assert len(a) == len(b)
        return sum(x != y for x, y in zip(a, b)) <= 1

    import collections

    nbs = collections.defaultdict(list)
    for k1, n1 in names:
        for k2, n2 in names:
            if k1 != k2 and lev1(n1, n2):
                nbs[k1].append(k2)
    want = {(k, len(v), min(v), max(v)) for k, v in nbs.items()}
    assert got == want and len(got) > 0


def test_semdedup_greedy_invariants(spark, sf_dir):
    rows = QUERIES["q_semdedup"](spark, sf_dir).collect()
    assert len(rows) == spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    for cluster, members in by_cluster.items():
        # greedy keeps the lowest id unconditionally
        first = min(members, key=lambda r: r.vec_id)
        assert first.kept == 1, (cluster, first)
        assert {r.kept for r in members} <= {0, 1}


def test_rank_fusion_bounds_and_order(spark, sf_dir):
    rows = QUERIES["q_rank_fusion_rrf"](spark, sf_dir).collect()
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.rrf for r in rows]
    assert scores == sorted(scores, reverse=True)
    for r in rows:
        # max possible: rank 1 in both lists
        assert 0 < r.rrf <= round(2 / 61, 6) + 1e-9
        assert r.ra is not None or r.rb is not None


def test_tfidf_topk_shape(spark, sf_dir):
    rows = QUERIES["q_tfidf_topk"](spark, sf_dir).collect()
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    assert all(r.tf >= 1 for r in rows)
    scores = [r.tfidf for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_perplexity_filter_invariants(spark, sf_dir):
    from openmaptiles_zh_modifier_spark.queries_retrieval import PPL_MAX_NLL

    rows = QUERIES["q_perplexity_filter"](spark, sf_dir).collect()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.where(F.size(F.split("text", " ")) >= 2).count()
    assert len(rows) == n_docs
    for r in rows:
        assert r.n_bigrams >= 1
        assert r.avg_nll > 0  # -log p of a proper distribution
        assert r.kept == (1 if r.avg_nll <= PPL_MAX_NLL else 0)
    # the filter must actually discriminate (not keep/drop everything)
    kept = sum(r.kept for r in rows)
    assert 0 < kept < len(rows)


def test_substring_dupfrac_bounds(spark, sf_dir):
    rows = QUERIES["q_substring_dupfrac"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_dup <= r.n_grams
        assert 0.0 <= r.dup_frac <= 1.0


def test_pmi_and_twa_shapes(spark, sf_dir):
    pmi = QUERIES["q_pmi_cooccurrence"](spark, sf_dir).collect()
    assert pmi, "min-count guard must not filter the whole fixture corpus"
    scores = [r.pmi for r in pmi]
    assert scores == sorted(scores, reverse=True)
    twa = QUERIES["q_time_weighted_avg"](spark, sf_dir).collect()
    assert twa
    vals = spark.read.parquet(f"{sf_dir}/events.parquet").agg(
        F.min("value"), F.max("value")
    ).collect()[0]
    for r in twa:
        # a weighted average must stay inside the value range
        assert vals[0] - 1e-6 <= r.twa <= vals[1] + 1e-6


def test_variant_json_matches_from_json(spark, sf_dir):
    """Variant typed extraction must agree with the declared-schema
    from_json path on the same column."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    via_variant = (
        ev.select(
            F.try_variant_get(
                F.try_parse_json("props"), "$.k", "int"
            ).alias("k")
        )
        .groupBy()
        .agg(F.sum("k").alias("s"), F.count("k").alias("n"))
        .collect()[0]
    )
    via_schema = (
        ev.select(F.from_json("props", "k INT").alias("p"))
        .groupBy()
        .agg(F.sum("p.k").alias("s"), F.count("p.k").alias("n"))
        .collect()[0]
    )
    assert (via_variant.s, via_variant.n) == (via_schema.s, via_schema.n)
    out = QUERIES["q_variant_json"](spark, sf_dir).collect()
    assert sum(r.n for r in out) == via_variant.n
    assert all(0 <= r.k_decade <= 9 for r in out)
