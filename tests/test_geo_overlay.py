"""Polygon-polygon overlay (late round 10): the cell-blocked star x box
overlay must equal the brute-force cross join as a MULTISET (each pair
exactly once through the PBSM reference-point rule), and the exact
classification (fully-inside vs boundary-straddle vs disjoint) must
match an INDEPENDENT exact implementation — the ray-cast here uses
Fraction-based intersection-x division and the segment test is coded
from the CLRS spec separately, so a shared algebra bug in the
production cross-product forms cannot self-confirm."""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.queries_geo import (
    _OXMAX,
    _OYMAX,
    _PCELL,
    _STAR_EDGES,
    _edge_box_hit,
    _raycast_inside,
    _EDGE_STRUCTS,
    polygon_box_overlay_pairs,
)


# --- independent exact reference (Fractions + spec-coded CLRS) -----------


def _inside_py(px, py, cx, cy, s) -> bool:
    crossings = 0
    for (ox1, oy1), (ox2, oy2) in _STAR_EDGES:
        x1, y1 = cx + s * ox1, cy + s * oy1
        x2, y2 = cx + s * ox2, cy + s * oy2
        if (y1 > py) != (y2 > py):
            x_int = Fraction(x1) + Fraction(py - y1, y2 - y1) * (x2 - x1)
            if x_int > px:
                crossings += 1
    return crossings % 2 == 1


def _orient(ox, oy, px, py, qx, qy) -> int:
    v = (px - ox) * (qy - oy) - (py - oy) * (qx - ox)
    return (v > 0) - (v < 0)


def _on_seg(px, py, ux, uy, vx, vy) -> bool:
    return min(ux, vx) <= px <= max(ux, vx) and min(uy, vy) <= py <= max(
        uy, vy
    )


def _seg_py(a1, a2, b1, b2) -> bool:
    d1 = _orient(*b1, *b2, *a1)
    d2 = _orient(*b1, *b2, *a2)
    d3 = _orient(*a1, *a2, *b1)
    d4 = _orient(*a1, *a2, *b2)
    if ((d1 > 0 and d2 < 0) or (d1 < 0 and d2 > 0)) and (
        (d3 > 0 and d4 < 0) or (d3 < 0 and d4 > 0)
    ):
        return True
    if d1 == 0 and _on_seg(*a1, *b1, *b2):
        return True
    if d2 == 0 and _on_seg(*a2, *b1, *b2):
        return True
    if d3 == 0 and _on_seg(*b1, *a1, *a2):
        return True
    if d4 == 0 and _on_seg(*b2, *a1, *a2):
        return True
    return False


def _edge_hit_py(bcx, bcy, w, cx, cy, s) -> bool:
    blx, bhx, bly, bhy = bcx - w, bcx + w, bcy - w, bcy + w
    sides = [
        ((blx, bly), (blx, bhy)),
        ((bhx, bly), (bhx, bhy)),
        ((blx, bly), (bhx, bly)),
        ((blx, bhy), (bhx, bhy)),
    ]
    for (ox1, oy1), (ox2, oy2) in _STAR_EDGES:
        e1 = (cx + s * ox1, cy + s * oy1)
        e2 = (cx + s * ox2, cy + s * oy2)
        if blx <= e1[0] <= bhx and bly <= e1[1] <= bhy:
            return True
        if blx <= e2[0] <= bhx and bly <= e2[1] <= bhy:
            return True
        if any(_seg_py(e1, e2, s1, s2) for s1, s2 in sides):
            return True
    return False


# --- Spark harnesses ------------------------------------------------------


def _mk_polys(spark, rows):
    return spark.createDataFrame(
        [(i, s, cx, cy) for i, (s, cx, cy) in enumerate(rows)],
        "pid long, s long, cx long, cy long",
    )


def _mk_boxes(spark, rows):
    return spark.createDataFrame(
        [(i, bcx, bcy, w) for i, (bcx, bcy, w) in enumerate(rows)],
        "bid long, bcx long, bcy long, w long",
    )


def _blocked(spark, poly_rows, box_rows):
    out = polygon_box_overlay_pairs(
        _mk_polys(spark, poly_rows), _mk_boxes(spark, box_rows)
    )
    return sorted(
        (r.bid, r.pid, r.center_inside, r.edge_hit)
        for r in out.select(
            "bid", "pid", "center_inside", "edge_hit"
        ).collect()
    )


def _brute(spark, poly_rows, box_rows):
    p = _mk_polys(spark, poly_rows).selectExpr(
        "*",
        f"cx - {_OXMAX} * s AS plx",
        f"cx + {_OXMAX} * s AS phx",
        f"cy - {_OYMAX} * s AS ply",
        f"cy + {_OYMAX} * s AS phy",
    )
    b = _mk_boxes(spark, box_rows).selectExpr(
        "*",
        "bcx - w AS blx",
        "bcx + w AS bhx",
        "bcy - w AS bly",
        "bcy + w AS bhy",
    )
    out = (
        b.crossJoin(p)
        .where("blx <= phx AND plx <= bhx AND bly <= phy AND ply <= bhy")
        .withColumn(
            "center_inside",
            F.when(
                F.expr(_raycast_inside("bcx", "bcy", "cx", "cy", "s")), 1
            ).otherwise(0),
        )
        .withColumn(
            "edge_hit",
            F.when(
                F.expr(
                    f"exists(array({_EDGE_STRUCTS}), e -> {_edge_box_hit()})"
                ),
                1,
            ).otherwise(0),
        )
    )
    return sorted(
        (r.bid, r.pid, r.center_inside, r.edge_hit)
        for r in out.select(
            "bid", "pid", "center_inside", "edge_hit"
        ).collect()
    )


def test_size_separation_makes_box_contains_star_impossible():
    # the classification omits the box-contains-polygon branch; that is
    # sound only while every fixture box is smaller than every star's
    # extent. Pin the constants the argument rests on.
    min_star_extent = 2 * min(_OXMAX, _OYMAX) * 100  # min scale s=100
    max_box_extent = 2 * 119  # max half-width in _BW_RULE
    assert max_box_extent < min_star_extent


def test_blocked_overlay_equals_brute_force_multiset(spark):
    # polygons big enough to cover multiple blocking cells (s up to
    # 240 -> bbox 4800 wide vs 2000-wide cells) and boxes straddling
    # cell boundaries: the blocked join must produce each bbox-overlap
    # pair EXACTLY once with identical flags (list equality).
    poly_rows = [
        (100 + (i * 89) % 150, -6000 + (i * 2911) % 12000, -3000 + (i * 1723) % 6000)
        for i in range(12)
    ]
    box_rows = [
        (-6500 + (j * 1499) % 13000, -3200 + (j * 911) % 6400, 20 + (j * 13) % 100)
        for j in range(120)
    ]
    got = _blocked(spark, poly_rows, box_rows)
    want = _brute(spark, poly_rows, box_rows)
    assert got == want
    # fixture exercises all three classes
    assert any(ci == 1 and eh == 0 for _, _, ci, eh in got)
    assert any(eh == 1 for _, _, ci, eh in got)
    assert any(ci == 0 and eh == 0 for _, _, ci, eh in got)
    # each pair exactly once
    keys = [(b, p) for b, p, _, _ in got]
    assert len(keys) == len(set(keys))


def test_classification_matches_independent_exact_reference(spark):
    # degenerate probes against one star (s=100, centered at 1000,500):
    # fully-inside, disjoint-but-bbox-overlapping (notch), boundary
    # straddle, box touching a vertex exactly, star vertex inside the
    # box, edge passing through a box whose endpoints are outside, and
    # a box whose center sits exactly ON an edge lattice point.
    s, cx, cy = 100, 1000, 500
    probes = [
        (cx, cy, 50),  # around the center: fully inside
        (cx + 850, cy + 850, 40),  # inside bbox, outside star (between spikes)
        (cx + 1000, cy, 30),  # right spike vertex (cx+1000,cy) ON box corner path
        (cx + 995, cy, 30),  # vertex strictly inside the box
        (cx + 650, cy + 330, 25),  # near the upper-right edge: straddle band
        (cx - 1030, cy, 30),  # just past the left spike: disjoint
        (cx + 300, cy + 200, 110),  # wide box deep inside
        (cx, cy + 400, 10),  # center exactly on the (0,4)-vertex... inside region
    ]
    got = dict(
        ((b, p), (ci, eh))
        for b, p, ci, eh in _blocked(spark, [(s, cx, cy)], probes)
    )
    for j, (bcx, bcy, w) in enumerate(probes):
        # bbox prefilter parity
        in_bbox = (
            bcx - w <= cx + _OXMAX * s
            and cx - _OXMAX * s <= bcx + w
            and bcy - w <= cy + _OYMAX * s
            and cy - _OYMAX * s <= bcy + w
        )
        if not in_bbox:
            assert (j, 0) not in got
            continue
        ci, eh = got[(j, 0)]
        assert ci == int(_inside_py(bcx, bcy, cx, cy, s)), (j, "center")
        assert eh == int(_edge_hit_py(bcx, bcy, w, cx, cy, s)), (j, "edge")
    # the probe set genuinely exercises both flags
    flags = set(got.values())
    assert (1, 0) in flags and any(eh == 1 for _, eh in flags)


def test_query_census_on_sf0001(spark, sf_dir):
    from openmaptiles_zh_modifier_spark.registry import QUERIES

    rows = QUERIES["q_geo_polygon_overlay"](spark, sf_dir).collect()
    assert rows == sorted(rows, key=lambda r: r.n_nationkey)
    assert all(
        r.n_cand >= r.n_inside + r.n_straddle >= 0 for r in rows
    )  # classes partition candidates (disjoint remainder)


def test_out_of_domain_coordinates_stay_exactly_once(spark):
    # beyond the fixture domain the packed cell id (gy * 20 + gx) can
    # alias two different raw cells; a polygon wide enough to span >= 20
    # x-cells would then surface a pair through two join rows. The raw
    # (gx, gy) equality guard must keep the blocked join a multiset
    # match of the brute force even with coordinates far outside
    # [-18000, 18000] and polygons spanning many cells.
    poly_rows = [
        (2400, 90000, 41000),   # bbox 48000 wide: 25 x-cells
        (150, -87000, -39000),
        (2400, -90000, 40000),
    ]
    box_rows = [
        (88000 + (j * 3001) % 8000, 39000 + (j * 1709) % 6000, 20 + j * 7)
        for j in range(25)
    ] + [
        (-87000 + (j * 911) % 4000, -39000 + (j * 501) % 3000, 30 + j * 5)
        for j in range(25)
    ]
    got = _blocked(spark, poly_rows, box_rows)
    want = _brute(spark, poly_rows, box_rows)
    assert got == want
    keys = [(b, p) for b, p, _, _ in got]
    assert len(keys) == len(set(keys))
    assert len(keys) > 0
