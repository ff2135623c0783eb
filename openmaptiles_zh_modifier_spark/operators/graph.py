"""Connected components via iterative min-label propagation.

The transitive-closure step a dedup pipeline needs after pair generation:
near-dup PAIRS (a~b, b~c) must collapse into CLUSTERS ({a,b,c}) before
canonical-document election, and no single groupBy can do it — cluster
membership is reachability, an inherently iterative fixpoint. The
reference has no graph surface at all (SURVEY.md §2); this is
engine-extension surface for the dedup north star.

Algorithm: every node starts labeled with itself; each round every node
takes the min of its own label and its neighbors' labels; stop when a
round changes nothing. Rounds needed = graph diameter (not node count).
Scale notes: each round is one join edges-to-labels + one min-aggregate —
both hash-partitioned on the node key, so successive rounds reuse the
same partitioning under AQE. Labels are local-checkpointed every few
rounds to truncate the lineage (an iterative plan otherwise grows
exponentially in the optimizer). For power-law graphs at 100 TB the
large-star/small-star variant (alternating conditional joins) halves
rounds; diameter-bounded dedup graphs (short chains) converge in a
handful of rounds and don't need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.operators.lineage import eager_checkpoint


def connected_components(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Return (node, component) where component = min node id reachable.

    ``edges`` is undirected input (each pair listed once is enough; both
    directions are added internally). Nodes are longs.

    Each round combines neighbor-min propagation with pointer jumping
    (label := min over {own label, neighbors' labels, label's label}), so
    chains collapse in O(log diameter) rounds, not O(diameter). Labels
    are eagerly local-checkpointed every round: the convergence count
    then reads materialized data instead of replaying the whole
    iterative lineage (which would make round k cost O(k) recomputes —
    quadratic overall).
    """
    both = edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    # eager_checkpoint (not plain localCheckpoint): the loop below uses
    # `labels` twice per round, so an inherited Catalyst size estimate
    # would be SQUARED every round — see operators/lineage.py for the
    # 10x-anchor incident this fixed.
    both = eager_checkpoint(both)
    nodes = both.select(F.col("u").alias("node")).distinct()
    labels = eager_checkpoint(nodes.withColumn("component", F.col("node")))

    for _ in range(max_iter):
        neighbor_min = (
            both.join(
                labels.withColumnRenamed("node", "v").withColumnRenamed(
                    "component", "v_comp"
                ),
                "v",
            )
            .groupBy("u")
            .agg(F.min("v_comp").alias("n_comp"))
            .withColumnRenamed("u", "node")
        )
        once = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(
                F.col("component"), F.coalesce("n_comp", F.col("component"))
            ).alias("component"),
        )
        # pointer jump: follow the new label one hop (label of label)
        parent = once.select(
            F.col("node").alias("component"), F.col("component").alias("gp")
        )
        updated = (
            once.join(parent, "component", "left")
            .select(
                "node",
                F.least(
                    F.col("component"), F.coalesce("gp", F.col("component"))
                ).alias("component"),
            )
        )
        updated = eager_checkpoint(updated)
        n_changed = (
            updated.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = updated
        if n_changed == 0:
            break
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14 — the published at-scale alternative to label
    propagation): each round is two grouped aggregates + joins that
    rewire every node toward its neighborhood minimum, converging to
    star graphs rooted at component minima in O(log^2 n) rounds with
    NO per-node state carried between rounds — the edge set IS the
    state, which is why the algorithm tolerates massive skew (a hot
    node's neighborhood is one reduce group, never a driver structure).

    large-star: for each u, with m = min(N(u) ∪ {u}), emit (v, m) for
    every STRICTLY LARGER neighbor v > u. small-star: direct edges
    large->small; for each u, with m = min(N⁻(u) ∪ {u}), emit (v, m)
    for v ∈ N⁻(u) ∪ {u}, v ≠ m. Fixpoint when the canonical edge set
    stops changing; labels then read straight off the final stars.

    Returns (node, component) with component = min node id, identical
    contract to :func:`connected_components` (the two are cross-checked
    property-wise in tests/test_graph_ops.py)."""
    e = (
        edges.select(F.col(src).alias("x"), F.col(dst).alias("y"))
        .where(F.col("x") != F.col("y"))
        .select(
            F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v")
        )
        .distinct()
    )
    e = eager_checkpoint(e)  # fresh stats: the loop re-joins e with itself
    all_nodes = eager_checkpoint(
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
    )

    for _ in range(max_iter):
        # ----- large-star over the symmetrized neighborhoods
        nbrs = e.unionByName(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mins = (
            nbrs.groupBy("u")
            .agg(F.min("v").alias("nm"))
            .select("u", F.least("u", "nm").alias("m"))
        )
        ls = (
            nbrs.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
            .where(F.col("x") != F.col("y"))
            .select(
                F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v")
            )
            .distinct()
        )
        # ----- small-star on large->small directed edges (u > v here
        # by canonical form already)
        mins2 = (
            ls.groupBy("u")
            .agg(F.min("v").alias("nm"))
            .select("u", F.least("u", "nm").alias("m"))
        )
        ss = (
            ls.join(mins2, "u")
            .select(F.col("v").alias("n"), F.col("m"))
            .unionByName(mins2.select(F.col("u").alias("n"), F.col("m")))
            .where(F.col("n") != F.col("m"))
            .select(
                F.greatest("n", "m").alias("u"), F.least("n", "m").alias("v")
            )
            .distinct()
        )
        ss = eager_checkpoint(ss)
        changed = (
            ss.exceptAll(e).count() + e.exceptAll(ss).count()
        )
        e = ss
        if changed == 0:
            break
    # final stars: u -> v=min; roots and isolated nodes label themselves
    labels = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return (
        all_nodes.join(labels, "node", "left")
        .select(
            "node", F.coalesce("component", F.col("node")).alias("component")
        )
    )
