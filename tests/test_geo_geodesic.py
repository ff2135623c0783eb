"""Geodesic containment join (VERDICT r10 #3): the lat/lon polygon
machinery with per-row adaptive-latitude lon spans must equal the
brute-force cross join — including at 75°N+ (where the lon stretch
forces a multi-cell probe span) and across the antimeridian (where the
signed lon difference wraps). Ground truth is an independent float
winding-number test in the polygon's local anisotropic frame."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.queries_geo import (
    _GP_BBOX,
    _GP_DX,
    _STAR_OFFS,
    _gp_w,
    _raycast_inside_xy,
    geodesic_polygon_contains_pairs,
)


def _poly(spark, rows):
    """rows: (gid, clat, clon, s); w derived by the fixture rule."""
    df = spark.createDataFrame(
        rows, "gid long, clat long, clon long, s long"
    )
    return df.selectExpr("*", f"{_gp_w('s', 'clat')} AS w")


def _pts(spark, rows):
    return spark.createDataFrame(rows, "pid long, px long, py long")


def _brute(poly, pts):
    return (
        pts.crossJoin(poly)
        .where(F.expr(_GP_BBOX))
        .withColumn(
            "inside",
            F.when(
                F.expr(
                    _raycast_inside_xy(_GP_DX, "py", "0", "clat", "w", "s")
                ),
                1,
            ).otherwise(0),
        )
    )


def _rows(df):
    return sorted(
        (r.pid, r.gid, r.inside)
        for r in df.select("pid", "gid", "inside").collect()
    )


def _winding_inside(dx, py, w, s, clat):
    """Independent float ground truth in the recentred frame: vertices
    at (w*ox, clat + s*oy), point at (dx, py). Boundary excluded."""
    total = 0.0
    verts = [(w * ox, clat + s * oy) for ox, oy in _STAR_OFFS]
    for (x1, y1), (x2, y2) in zip(verts, verts[1:] + verts[:1]):
        a1 = math.atan2(y1 - py, x1 - dx)
        a2 = math.atan2(y2 - py, x2 - dx)
        d = a2 - a1
        while d > math.pi:
            d -= 2 * math.pi
        while d < -math.pi:
            d += 2 * math.pi
        total += d
    return abs(total) > math.pi


def test_high_latitude_polygon_is_lossless_and_correct(spark):
    """A 75°N and an 85°N polygon: the stretched lon bbox spans many
    probe cells; the blocked join must equal brute force AND the float
    winding ground truth on every probed point."""
    polys = [(1, 7500, 3000, 150), (2, 8500, -12000, 200)]
    pw = {g: (150 * 36000) // (36600 - 4 * 7500) if g == 1
          else (200 * 36000) // (36600 - 4 * 8500) for g, *_ in polys}
    # probe a ring of points around each center: some inside arms, some
    # in concavities, some far outside
    pts, expected = [], {}
    pid = 0
    for gid, clat, clon, s in polys:
        w = pw[gid]
        for fx, fy in [(0.0, 0.0), (0.5, 0.1), (9.5, 0.0), (0.0, 3.9),
                       (2.0, 2.0), (6.0, 6.0), (-4.0, -6.0), (0.0, -3.9),
                       (-9.9, 0.0), (3.0, -8.0), (11.0, 0.0), (0.0, 9.5)]:
            dx, dy = int(fx * w), int(fy * s)
            px = ((clon + dx + 54000) % 36000) - 18000
            py = clat + dy
            if abs(py) >= 9000:
                continue
            pid += 1
            pts.append((pid, px, py))
            # cylinder semantics: a probe past the half-ring wraps to
            # the polygon's other side (the 85° polygon's 10*w exceeds
            # 18000, so its (11, 0) probe re-enters from the west) —
            # the ground truth must evaluate the WRAPPED offset
            dx_eff = ((dx + 54000) % 36000) - 18000
            expected[(pid, gid)] = _winding_inside(dx_eff, py, w, s, clat)
    poly_df = _poly(spark, polys)
    pts_df = _pts(spark, pts)
    got = _rows(geodesic_polygon_contains_pairs(poly_df, pts_df))
    assert got == _rows(_brute(poly_df, pts_df))
    for pid_, gid_, inside in got:
        if (pid_, gid_) in expected:
            assert bool(inside) == expected[(pid_, gid_)], (pid_, gid_)


def test_antimeridian_polygon_contains_across_the_seam(spark):
    """Polygon centered at 179.5°E whose bbox wraps: points just west
    of -180° must be found (and classified) despite living at the far
    end of the raw coordinate range."""
    s = 200
    clat, clon = 2000, 17950
    w = (s * 36000) // (36600 - 4 * clat)
    poly_df = _poly(spark, [(7, clat, clon, s)])
    # dx = +0.3*w lies EAST of the seam (raw px negative after wrap)
    pts, expected = [], {}
    for pid, fdx in [(1, 0.3), (2, 9.9), (3, -0.3), (4, 5.0)]:
        dx = int(fdx * w)
        px = ((clon + dx + 54000) % 36000) - 18000
        pts.append((pid, px, clat))
        expected[pid] = _winding_inside(dx, clat, w, s, clat)
    assert any(px < 0 for _, px, _ in pts)  # the seam is actually crossed
    pts_df = _pts(spark, pts)
    got = _rows(geodesic_polygon_contains_pairs(poly_df, pts_df))
    assert got == _rows(_brute(poly_df, pts_df))
    assert len(got) == 4  # every probe survives the wrapped bbox
    for pid_, _gid, inside in got:
        assert bool(inside) == expected[pid_], pid_


def test_full_ring_polygon_probes_every_lon_cell(spark):
    """Above ~80° the stretch makes 10*w exceed the half-ring: the probe
    must degrade to the full 18-cell ring (not silently truncate), so a
    point on the OPPOSITE meridian still pairs when the bbox allows."""
    s = 249
    clat = 8176  # nation-8 latitude: w = 1958, 10*w = 19580 > 18000
    clon = 0
    w = (s * 36000) // (36600 - 4 * clat)
    assert 10 * w > 18000
    poly_df = _poly(spark, [(8, clat, clon, s)])
    pts_df = _pts(spark, [(1, 17999, clat), (2, -17999, clat), (3, 0, clat)])
    got = _rows(geodesic_polygon_contains_pairs(poly_df, pts_df))
    assert got == _rows(_brute(poly_df, pts_df))
    assert {p for p, _, _ in got} == {1, 2, 3}


def test_blocking_lossless_on_probe_cell_boundaries(spark):
    """Points and bbox edges sitting exactly on _GP_CELL boundaries must
    not fall between probe cells."""
    s = 100
    clat, clon = 0, 0
    poly_df = _poly(spark, [(1, clat, clon, s)])
    w = (s * 36000) // 36600
    pts = [(1, 10 * w, 0), (2, -10 * w, 0), (3, 0, 9 * s), (4, 0, -9 * s),
           (5, 2000, 0), (6, -2000, 0), (7, 0, 2000), (8, 1999, 1999)]
    pts_df = _pts(spark, pts)
    got = _rows(geodesic_polygon_contains_pairs(poly_df, pts_df))
    assert got == _rows(_brute(poly_df, pts_df))


# ---------------------------------------------------------------------------
# Geodesic segment-intersection join
# ---------------------------------------------------------------------------


def _wrap(x):
    return (x + 54000) % 36000 - 18000


def _py_seg_cross(a1, a2, b1, b2):
    """Pure-int planar segment intersection (incl. collinear touches) —
    the independent reference for the recentred predicate."""
    def x(o, p, q):
        return (p[0] - o[0]) * (q[1] - o[1]) - (p[1] - o[1]) * (q[0] - o[0])

    def onseg(d, p, u, v):
        return (d == 0 and min(u[0], v[0]) <= p[0] <= max(u[0], v[0])
                and min(u[1], v[1]) <= p[1] <= max(u[1], v[1]))

    d1, d2 = x(b1, b2, a1), x(b1, b2, a2)
    d3, d4 = x(a1, a2, b1), x(a1, a2, b2)
    if ((d1 > 0) != (d2 > 0)) and d1 != 0 and d2 != 0 and \
       ((d3 > 0) != (d4 > 0)) and d3 != 0 and d4 != 0:
        return True
    return (onseg(d1, a1, b1, b2) or onseg(d2, a2, b1, b2)
            or onseg(d3, b1, a1, a2) or onseg(d4, b2, a1, a2))


def _py_geodesic_cross(a, b):
    """Recentre into a's frame (modular anchor + linear offsets) and run
    the planar test — the operator's documented semantics."""
    ax1, ay1, ax2, ay2 = a
    bx1, by1, bx2, by2 = b
    relax2 = _wrap(ax2 - ax1)
    relbx1 = _wrap(bx1 - ax1)
    relbx2 = relbx1 + _wrap(bx2 - bx1)
    # bbox prefilter in the same frame
    if not (min(0, relax2) <= max(relbx1, relbx2)
            and min(relbx1, relbx2) <= max(0, relax2)
            and min(ay1, ay2) <= max(by1, by2)
            and min(by1, by2) <= max(ay1, ay2)):
        return None  # not a candidate
    return _py_seg_cross(
        (0, ay1), (relax2, ay2), (relbx1, by1), (relbx2, by2)
    )


def _seg_frames(spark, roads, ways):
    a = spark.createDataFrame(
        [(i, *r) for i, r in enumerate(roads)],
        "rid long, ax1 long, ay1 long, ax2 long, ay2 long",
    )
    b = spark.createDataFrame(
        [(j, *w) for j, w in enumerate(ways)],
        "wid long, bx1 long, by1 long, bx2 long, by2 long",
    )
    return a, b


def test_geodesic_segments_cross_the_seam(spark):
    """Segments with genuinely wrapped endpoints: a road from 179.5°E
    into -179.5°E must cross a meridian-ish way sitting AT the seam, and
    must NOT cross one a few cells east. Every pair verified against the
    pure-python recentred reference."""
    from openmaptiles_zh_modifier_spark.queries_geo import (
        geodesic_segment_crossing_pairs,
    )

    roads = [
        (17950, 0, _wrap(17950 + 500), 100),    # crosses the seam
        (17900, 5000, _wrap(17900 + 300), 5050),  # seam, different lat
        (0, 0, 300, 200),                        # far from the seam
    ]
    ways = [
        (17999, -200, -17990, 250),   # straddles the seam, steep
        (-17800, -100, -17700, 150),  # just east of the seam
        (100, 150, 200, -50),         # near origin
        (9000, 0, 9100, 100),         # unrelated
    ]
    a, b = _seg_frames(spark, roads, ways)
    got = {
        (r.rid, r.wid): r.crossing
        for r in geodesic_segment_crossing_pairs(a, b).collect()
    }
    want = {}
    for i, rr in enumerate(roads):
        for j, ww in enumerate(ways):
            res = _py_geodesic_cross(rr, ww)
            if res is not None:
                want[(i, j)] = int(res)
    assert got == want
    assert want[(0, 0)] == 1      # the seam crossing is REAL and found
    assert want.get((2, 2)) == 1  # the plain planar case still works


def test_geodesic_segments_exactly_once_and_boundaries(spark):
    """Bbox corners exactly on cell boundaries and multi-cell overlaps:
    every candidate pair appears exactly once (the modular
    reference-point rule), matching the brute-force recentred census."""
    import itertools

    from openmaptiles_zh_modifier_spark.queries_geo import (
        _GS_CELL,
        geodesic_segment_crossing_pairs,
    )

    c = _GS_CELL
    roads = [
        (0, 0, c, c),                 # spans a 2x2 cell block exactly
        (-c, -c, c - 1, c - 1),       # crosses the origin cell corner
        (17950, -c, _wrap(17950 + 2 * c), c),  # seam, 2 lon cells
    ]
    ways = [
        (c, 0, 0, c),                 # anti-diagonal of road 0
        (0, -c, 0, c),                # vertical through the corner
        (18000 - c, 0, _wrap(18000 + c), 1),  # seam-straddler
        (2 * c, 2 * c, 3 * c, 3 * c),  # disjoint
    ]
    a, b = _seg_frames(spark, roads, ways)
    rows = geodesic_segment_crossing_pairs(a, b).collect()
    seen = [(r.rid, r.wid) for r in rows]
    assert len(seen) == len(set(seen)), "duplicate pair emitted"
    got = {(r.rid, r.wid): r.crossing for r in rows}
    want = {}
    for i, j in itertools.product(range(len(roads)), range(len(ways))):
        res = _py_geodesic_cross(roads[i], ways[j])
        if res is not None:
            want[(i, j)] = int(res)
    assert got == want


# ---------------------------------------------------------------------------
# Geodesic polygon-box overlay
# ---------------------------------------------------------------------------


def _py_edge_box_hit(clat, w, s, box):
    """Pure-int reference: does any (w, s)-scaled star edge intersect
    the axis-aligned box (frame coords)?"""
    blx, bhx, bly, bhy = box
    sides = [((blx, bly), (blx, bhy)), ((bhx, bly), (bhx, bhy)),
             ((blx, bly), (bhx, bly)), ((blx, bhy), (bhx, bhy))]
    for (ox1, oy1), (ox2, oy2) in zip(_STAR_OFFS,
                                      _STAR_OFFS[1:] + _STAR_OFFS[:1]):
        p1 = (w * ox1, clat + s * oy1)
        p2 = (w * ox2, clat + s * oy2)
        if (blx <= p1[0] <= bhx and bly <= p1[1] <= bhy) or \
           (blx <= p2[0] <= bhx and bly <= p2[1] <= bhy):
            return True
        for u, v in sides:
            if _py_seg_cross(p1, p2, u, v):
                return True
    return False


def _py_overlay(polys, boxes):
    """(gid, bid) -> (center_inside, edge_hit) for bbox-overlap
    candidates, via the recentred-frame reference."""
    out = {}
    for gid, clat, clon, s in polys:
        w = (s * 36000) // (36600 - 4 * abs(clat))
        for bid, bclat, bclon, wb in boxes:
            rbcx = _wrap(bclon - clon)
            blx, bhx = rbcx - wb, rbcx + wb
            bly, bhy = bclat - wb, bclat + wb
            if not (blx <= 10 * w and -10 * w <= bhx
                    and bly <= clat + 9 * s and clat - 9 * s <= bhy):
                continue
            ci = _winding_inside(rbcx, bclat, w, s, clat)
            eh = _py_edge_box_hit(clat, w, s, (blx, bhx, bly, bhy))
            out[(gid, bid)] = (int(ci), int(eh))
    return out


def test_geodesic_overlay_matches_reference_incl_seam_and_poles(spark):
    from openmaptiles_zh_modifier_spark.queries_geo import (
        geodesic_polygon_box_overlay_pairs,
    )

    polys = [
        (1, 7500, 17800, 150),    # 75°N, straddling the seam
        (2, 0, 0, 200),           # equator control
        (3, 8500, -12000, 249),   # 85°N, near-full-ring stretch
    ]
    boxes = []
    bid = 0
    for gid, clat, clon, s in polys:
        w = (s * 36000) // (36600 - 4 * abs(clat))
        # boxes at the center, on an arm tip, in a concavity, on the
        # boundary band, outside the bbox, and ACROSS the seam from the
        # polygon center
        for fx, fy, wb in [(0.0, 0.0, 60), (9.8, 0.0, 80), (6.0, 6.0, 50),
                           (10.0, 0.0, 119), (0.0, 9.2, 40),
                           (-9.9, 0.0, 100)]:
            bid += 1
            bclon = _wrap(clon + int(fx * w))
            bclat = clat + int(fy * s)
            if abs(bclat) >= 8900:
                continue
            boxes.append((bid, bclat, bclon, wb))
    poly_df = spark.createDataFrame(
        polys, "gid long, clat long, clon long, s long"
    ).selectExpr("*", f"{_gp_w('s', 'clat')} AS w")
    box_df = spark.createDataFrame(
        boxes, "bid long, bclat long, bclon long, wb long"
    )
    rows = geodesic_polygon_box_overlay_pairs(poly_df, box_df).collect()
    seen = [(r.gid, r.bid) for r in rows]
    assert len(seen) == len(set(seen)), "duplicate pair emitted"
    got = {(r.gid, r.bid): (r.center_inside, r.edge_hit) for r in rows}
    want = _py_overlay(polys, boxes)
    # the float winding reference is only authoritative off-boundary;
    # compare edge_hit exactly everywhere and center_inside where the
    # box center is not ON the star boundary (edge_hit=0 pairs)
    assert set(got) == set(want)
    for k, (ci, eh) in got.items():
        assert eh == want[k][1], (k, "edge_hit")
        if eh == 0:
            assert ci == want[k][0], (k, "center_inside")
    # the seam polygon really pairs with a box across the seam
    seam_pairs = [k for k in got if k[0] == 1]
    assert any(
        b[2] * 17800 < 0  # box lon sign opposite the polygon's
        for k in seam_pairs for b in [boxes[[x[0] for x in boxes].index(k[1])]]
    )
    # and classification exercises all three outcomes: inside,
    # straddle (either center flag), and disjoint-candidate
    flags = set(got.values())
    assert (1, 0) in flags, flags                  # fully inside
    assert any(eh == 1 for _, eh in flags), flags  # straddle
    assert (0, 0) in flags, flags                  # bbox-only candidate


def test_w_overflow_guard_raises_and_bound_is_documented(spark):
    """ADVICE r11 #3 / VERDICT r11 #7: a caller-supplied w beyond the
    int64-safety bound must raise at the verify stage instead of
    silently overflowing the exact-integer cross products; an in-bound
    caller w (not derived from _gp_w) still works."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from openmaptiles_zh_modifier_spark.queries_geo import _GP_W_MAX

    pts_df = _pts(spark, [(1, 0, 0)])

    # custom in-bound w: equator square-ish polygon, w chosen by caller
    ok = spark.createDataFrame(
        [(1, 0, 0, 100, 250)], "gid long, clat long, clon long, s long, w long"
    )
    got = geodesic_polygon_contains_pairs(ok, pts_df).collect()
    assert len(got) == 1 and got[0].inside == 1

    bad = spark.createDataFrame(
        [(1, 0, 0, 100, _GP_W_MAX * 10)],
        "gid long, clat long, clon long, s long, w long",
    )
    with pytest.raises(SparkRuntimeException, match="int64 bound"):
        geodesic_polygon_contains_pairs(bad, pts_df).collect()

    # the _gp_w proxy never exceeds the bound inside its ±86° domain
    # (docstring validity bound): max at s big, |clat| = 8600
    assert (100_000 * 36000) // (36600 - 8600 * 4) < _GP_W_MAX
