"""Point-in-polygon join (VERDICT r9 #3): cell-blocked candidates +
exact-integer ray-cast must equal the brute-force cross join, including
on the degeneracy hazards — ray through a vertex, point exactly on an
edge, and points/bboxes sitting exactly on blocking-cell boundaries."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.queries_geo import (
    _PCELL,
    _PG_BBOX,
    _STAR_OFFS,
    _raycast_inside,
    polygon_contains_pairs,
)


def _brute(poly, pts):
    return (
        pts.crossJoin(poly)
        .where(F.expr(_PG_BBOX))
        .withColumn(
            "inside",
            F.when(
                F.expr(_raycast_inside("px", "py", "cx", "cy", "s")), 1
            ).otherwise(0),
        )
    )


def _rows(df):
    return sorted(
        (r.pid, r.gid, r.inside)
        for r in df.select("pid", "gid", "inside").collect()
    )


def _winding_inside(px, py, s, cx, cy):
    """Independent ground truth: float winding number (angle sum).
    Valid for points NOT on the boundary."""
    total = 0.0
    verts = [(cx + s * ox, cy + s * oy) for ox, oy in _STAR_OFFS]
    for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1]):
        a1 = math.atan2(y1 - py, x1 - px)
        a2 = math.atan2(y2 - py, x2 - px)
        d = a2 - a1
        while d > math.pi:
            d -= 2 * math.pi
        while d < -math.pi:
            d += 2 * math.pi
        total += d
    return abs(total) > math.pi  # ~2*pi inside, ~0 outside


def test_raycast_matches_winding_number_ground_truth(spark):
    # one polygon: s=100, centered at origin. Points probe the star's
    # concavities and vertex-aligned rays.
    pts = [
        (1, 0, 0),        # center: inside
        (2, -2000, 0),    # vertex-y-aligned ray from outside-left: out
        (3, 0, 350),      # inside the notch floor (boundary at y=400)
        (4, 0, 500),      # in the notch above the inner vertex: out
        (5, 999, 1),      # just inside bbox, right of the outer vertex
        (6, -430, 800),   # inside the upper-left spike
        (7, 430, -800),   # inside the lower-right spike
        (8, 700, 700),    # between spikes: out
        (9, 0, 399),      # 1 below the inner vertex: inside
        (10, 0, 401),     # 1 above the inner vertex: outside
    ]
    poly = spark.createDataFrame(
        [(0, 100, 0, 0)], "gid long, s long, cx long, cy long"
    )
    pdf = spark.createDataFrame(pts, "pid long, px long, py long")
    got = {
        r.pid: r.inside
        for r in polygon_contains_pairs(poly, pdf).collect()
    }
    for pid, px, py in pts:
        want = int(_winding_inside(px, py, 100, 0, 0))
        assert got.get(pid, 0) == want, (pid, px, py, got.get(pid), want)


def test_on_edge_and_vertex_points_are_deterministic(spark):
    # points exactly ON boundary features: the half-open rule gives
    # SOME deterministic answer; blocked must equal brute (and the
    # oracle runs the identical integer expression, so cross-engine
    # agreement is structural).
    pts = [
        (1, 650, 100),    # exactly on edge (1000,0)-(300,200), t=1/2
        (2, 1000, 0),     # exactly on the rightmost vertex
        (3, 0, 400),      # exactly on the inner top vertex
        (4, -300, -200),  # exactly on a reflex (inner) vertex
    ]
    poly = spark.createDataFrame(
        [(0, 100, 0, 0)], "gid long, s long, cx long, cy long"
    )
    pdf = spark.createDataFrame(pts, "pid long, px long, py long")
    assert _rows(polygon_contains_pairs(poly, pdf)) == _rows(
        _brute(poly, pdf)
    )


def test_blocking_lossless_on_cell_boundaries(spark):
    # bbox edges and points sitting EXACTLY on blocking-cell boundaries
    # (multiples of _PCELL from the -18000/-6000 anchors) must not lose
    # candidates. Polygon A's bbox right edge lands exactly on a cell
    # line: cx + 10*s = -18000 + 2*_PCELL with s=100 -> cx = -15000.
    c = _PCELL
    polys = [
        (0, 100, -18000 + 2 * c - 1000, 0),  # bbox right edge ON a line
        (1, 100, -18000 + c, -6000 + c),     # center ON a cell corner
        (2, 200, 0, 0),
    ]
    pts = [
        (1, -18000 + 2 * c, 0),       # point ON the cell line, in A
        (2, -18000 + c, -6000 + c),   # ON the corner, center of B
        (3, -18000 + c - 1, -6000 + c - 1),  # one unit into the
                                             # neighbor cell, still in B
        (4, 1999, 1),                 # inside C near its bbox corner
        (5, 2000, 0),                 # ON C's bbox right-edge corner
    ]
    poly = spark.createDataFrame(
        polys, "gid long, s long, cx long, cy long"
    )
    pdf = spark.createDataFrame(pts, "pid long, px long, py long")
    got, want = _rows(polygon_contains_pairs(poly, pdf)), _rows(
        _brute(poly, pdf)
    )
    assert got == want
    assert {(p, g) for p, g, _ in want} >= {(1, 0), (2, 1), (3, 1)}


def test_polygon_join_query_matches_spark_cross_join(spark, sf_dir):
    # whole-query blocking losslessness on the real fixture lattice
    from openmaptiles_zh_modifier_spark.queries_geo import (
        q_geo_polygon_join,
    )
    from openmaptiles_zh_modifier_spark.registry import load

    poly = load(spark, sf_dir, "nation").selectExpr(
        "n_nationkey AS gid",
        "(100 + (n_nationkey * 89) % 150) AS s",
        "(-15000 + (n_nationkey * 6073) % 30000) AS cx",
        "(-3500 + (n_nationkey * 2741) % 7000) AS cy",
    )
    pts = load(spark, sf_dir, "documents").selectExpr(
        "doc_id AS pid",
        "(-18000 + (doc_id * 73) % 36000) AS px",
        "(-6000 + (doc_id * 37) % 12000) AS py",
    )
    brute = (
        _brute(poly, pts)
        .groupBy("gid")
        .agg(
            F.count(F.lit(1)).alias("n_bbox"),
            F.sum("inside").alias("n_inside"),
        )
    )
    want = {
        r.gid: (r.n_bbox, r.n_inside) for r in brute.collect()
    }
    got = {
        r.n_nationkey: (r.n_bbox, r.n_inside)
        for r in q_geo_polygon_join(spark, sf_dir).collect()
    }
    assert got == want and sum(v[1] for v in got.values()) > 0
