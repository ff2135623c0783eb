"""Invariant tests for the round-3 graph additions: label-propagation
communities and multi-source BFS reachability (both oracle-paired in the
gate; these assert the graph-theoretic invariants the hash can't see)."""

from __future__ import annotations

from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.queries_graph import (
    BFS_MAX_HOPS,
    BFS_SEED_MOD,
    _copurchase_adj,
    q_bfs_reachability,
    q_label_propagation,
)


def test_lpa_labels_are_member_nodes(spark, sf_dir):
    """Every community label is itself a node of the graph (labels only
    ever propagate from real nodes), and every graph node is labeled."""
    labels = q_label_propagation(spark, sf_dir)
    nodes = _copurchase_adj(spark, sf_dir).select("node").distinct()
    assert labels.count() == nodes.count()
    orphan_labels = (
        labels.select(F.col("community").alias("node"))
        .distinct()
        .join(nodes, "node", "left_anti")
    )
    assert orphan_labels.count() == 0


def test_lpa_groups_triangles_together(spark, sf_dir):
    """A node and at least one neighbor share a community for most nodes:
    LPA on a co-purchase graph must not degenerate into all-singletons."""
    labels = q_label_propagation(spark, sf_dir)
    n_nodes = labels.count()
    n_communities = labels.select("community").distinct().count()
    assert n_communities < n_nodes  # at least one non-singleton community


def test_bfs_seeds_at_hop_zero_and_edges_relax(spark, sf_dir):
    dist = q_bfs_reachability(spark, sf_dir)
    rows = {r.node: r.hop for r in dist.collect()}
    adj = _copurchase_adj(spark, sf_dir)
    seeds = [
        r.node
        for r in adj.select("node").distinct().collect()
        if r.node % BFS_SEED_MOD == 0
    ]
    assert seeds and all(rows[s] == 0 for s in seeds)
    assert all(0 <= h <= BFS_MAX_HOPS for h in rows.values())
    # triangle inequality on every edge whose both ends were reached
    for e in adj.collect():
        if e.node in rows and e.nbr in rows:
            assert abs(rows[e.node] - rows[e.nbr]) <= 1
