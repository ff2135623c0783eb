"""Convex hull: chain-function unit pins + whole-query geometric
invariants (the dual-scale oracle hash is the cross-algorithm check —
monotone chain vs the SQL support-edge derivation)."""

from __future__ import annotations

import itertools
import random

from openmaptiles_zh_modifier_spark.queries_geo import _monotone_chain
from openmaptiles_zh_modifier_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def test_chain_square_ccw():
    hull = _monotone_chain([(0, 0), (1, 0), (1, 1), (0, 1)])
    assert hull == [(0, 0), (1, 0), (1, 1), (0, 1)]  # CCW from min point


def test_chain_drops_collinear_and_interior():
    # interior (5,5), edge-midpoints collinear on every side
    pts = [(0, 0), (10, 0), (10, 10), (0, 10), (5, 0), (10, 5), (5, 10),
           (0, 5), (5, 5)]
    hull = _monotone_chain(pts)
    assert hull == [(0, 0), (10, 0), (10, 10), (0, 10)]


def test_chain_degenerate():
    assert _monotone_chain([(3, 4)]) == [(3, 4)]
    assert _monotone_chain([(3, 4), (3, 4)]) == [(3, 4)]
    # all collinear -> two endpoints
    assert _monotone_chain([(0, 0), (2, 2), (4, 4), (1, 1)]) == [
        (0, 0),
        (4, 4),
    ]


def test_chain_random_brute_force():
    rng = random.Random(13)
    for _ in range(25):
        pts = [(rng.randint(-50, 50), rng.randint(-50, 50))
               for _ in range(30)]
        hull = _monotone_chain(pts)
        hs = set(hull)
        # every input point inside-or-on the hull polygon
        if len(hull) >= 3:
            for p in set(pts):
                assert all(
                    _cross(hull[i], hull[(i + 1) % len(hull)], p) >= 0
                    for i in range(len(hull))
                ), (p, hull)
        # hull vertices are strict corners: no three consecutive collinear
        for i in range(len(hull)):
            if len(hull) >= 3:
                assert (
                    _cross(
                        hull[i - 1], hull[i], hull[(i + 1) % len(hull)]
                    )
                    > 0
                )
        # brute-force vertex set: p is a vertex iff it is not inside the
        # hull of the others
        for p in set(pts):
            others = [q for q in set(pts) if q != p]
            oh = _monotone_chain(others)
            if len(oh) >= 3:
                inside = all(
                    _cross(oh[i], oh[(i + 1) % len(oh)], p) >= 0
                    for i in range(len(oh))
                )
            elif len(oh) == 2:
                a, b = oh
                inside = _cross(a, b, p) == 0 and (
                    min(a[0], b[0]) <= p[0] <= max(a[0], b[0])
                    and min(a[1], b[1]) <= p[1] <= max(a[1], b[1])
                )
            else:
                inside = oh[0] == p
            assert (p in hs) == (not inside), (p, hull)


def test_hull_query_invariants(spark):
    rows = QUERIES["q_geo_convex_hull"](spark, SF).collect()
    assert rows
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for src, rs in by_source.items():
        assert len(rs) == rs[0].n_hull  # one row per hull vertex
        assert rs[0].area2x >= 0  # CCW shoelace
        assert rs[0].n_hull <= rs[0].n_points
        # vertices unique
        assert len({(r.x, r.y) for r in rs}) == len(rs)
