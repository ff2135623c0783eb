"""IVF index building: distributed Lloyd k-means over an embedding column.

The search side (coarse assign + nprobe probe + in-cell fine rank) lives
in ``queries_embeddings.q_embed_ivf_topk`` / ``q_embed_centroid_assign``;
this module trains the coarse quantizer itself.

Spark-first shape (the same loop structure MLlib's KMeans uses):
- centroids live on the DRIVER (k x d doubles — tiny) and enter the plan
  as a literal nested-array column, so assignment is a pure projection:
  ``transform(centroids, c -> dist(e, c))`` + argmin. No join, no extra
  shuffle — one narrow pass over the corpus per iteration.
- the mean-update is ONE partial-aggregatable groupBy: posexplode the
  vector to (cell, dim, value), avg per (cell, dim) — map-side combine
  collapses each partition to at most k*d rows before the shuffle, and
  the collected result is k*d rows regardless of corpus size. That is
  the only data movement per iteration; it is O(k*d), not O(n).
- deterministic init (k lowest-id vectors) and first-min tie-break keep
  the trainer reproducible run-to-run — required for testability and for
  resumable index builds at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _sq_l2(a: Column, b: Column) -> Column:
    """Sequential-fold squared L2 between two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _centroid_literal(centroids: list[list[float]]) -> Column:
    return F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in centroids]
    )


def assign_cells(df: DataFrame, vec_col: str, centroids: list[list[float]]) -> DataFrame:
    """Append ``cell`` (0-based nearest-centroid index, first-min
    tie-break) and ``cell_dist`` (squared L2 to it) to ``df``."""
    cents = _centroid_literal(centroids)
    dists = F.transform(cents, lambda c: _sq_l2(F.col(vec_col), c))
    return df.withColumn("__d", dists).select(
        "*",
        (F.array_position(F.col("__d"), F.array_min(F.col("__d"))) - 1)
        .cast("int")
        .alias("cell"),
        F.array_min(F.col("__d")).alias("cell_dist"),
    ).drop("__d")


def kmeans_fit(
    df: DataFrame,
    vec_col: str,
    k: int,
    id_col: str,
    max_iter: int = 10,
    tol: float = 1e-6,
) -> tuple[list[list[float]], list[float]]:
    """Lloyd's algorithm; returns (centroids, per-iteration inertia).

    Init = the k lowest-``id_col`` vectors (deterministic). Stops early
    when relative inertia improvement falls below ``tol``. Empty cells
    keep their previous centroid (k never shrinks)."""
    v = df.select(F.col(id_col).alias("__id"), F.col(vec_col).cast("array<double>").alias("__e"))
    init_rows = v.orderBy("__id").limit(k).collect()
    if len(init_rows) < k:
        raise ValueError(
            f"kmeans_fit: k={k} but corpus has only {len(init_rows)} rows — "
            "an IVF index sized for k cells cannot be trained; lower k or "
            "grow the corpus"
        )
    centroids = [list(r["__e"]) for r in init_rows]
    dim = len(centroids[0])
    history: list[float] = []
    for _ in range(max_iter):
        assigned = assign_cells(v, "__e", centroids)
        stats = (
            assigned.select(
                "cell", "cell_dist", F.posexplode("__e").alias("dim", "x")
            )
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("mean"), F.sum("cell_dist").alias("dsum"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        inertia = 0.0
        for r in stats:
            new_centroids[r["cell"]][r["dim"]] = r["mean"]
            if r["dim"] == 0:
                inertia += r["dsum"]
        history.append(inertia)
        if len(history) >= 2 and history[-2] > 0:
            if (history[-2] - history[-1]) / history[-2] < tol:
                centroids = new_centroids
                break
        centroids = new_centroids
    assert all(len(c) == dim for c in centroids)
    return centroids, history
