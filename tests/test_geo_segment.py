"""Segment-intersection join (round 10): the cell-blocked candidate
join with PBSM reference-point duplicate avoidance must equal the
brute-force cross join as a MULTISET (each pair exactly once), and the
exact integer orientation test must get the degenerate cases right —
collinear overlap, T-touch, shared endpoints, and off-by-one misses."""

from __future__ import annotations

from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.queries_geo import (
    _SEG_BBOX_OVERLAP,
    _SEG_CELL,
    _SEG_CROSS,
    segment_crossing_pairs,
)


def _mk(spark, rows, side):
    p = "a" if side == "a" else "b"
    return spark.createDataFrame(
        [(i, x1, y1, x2, y2) for i, (x1, y1, x2, y2) in enumerate(rows)],
        f"{p}id long, {p}x1 long, {p}y1 long, {p}x2 long, {p}y2 long",
    )


def _blocked(spark, a_rows, b_rows):
    out = segment_crossing_pairs(
        _mk(spark, a_rows, "a"), _mk(spark, b_rows, "b")
    )
    return sorted(
        (r.aid, r.bid, r.crossing)
        for r in out.select("aid", "bid", "crossing").collect()
    )


def _brute(spark, a_rows, b_rows):
    a = _mk(spark, a_rows, "a").selectExpr(
        "*",
        "LEAST(ax1, ax2) AS alx",
        "GREATEST(ax1, ax2) AS ahx",
        "LEAST(ay1, ay2) AS aly",
        "GREATEST(ay1, ay2) AS ahy",
    )
    b = _mk(spark, b_rows, "b").selectExpr(
        "*",
        "LEAST(bx1, bx2) AS blx",
        "GREATEST(bx1, bx2) AS bhx",
        "LEAST(by1, by2) AS bly",
        "GREATEST(by1, by2) AS bhy",
    )
    out = (
        a.crossJoin(b)
        .where(F.expr(_SEG_BBOX_OVERLAP))
        .withColumn("crossing", F.when(F.expr(_SEG_CROSS), 1).otherwise(0))
    )
    return sorted(
        (r.aid, r.bid, r.crossing)
        for r in out.select("aid", "bid", "crossing").collect()
    )


def test_blocked_join_equals_brute_force_multiset(spark):
    # deterministic scatter long enough that bboxes share multiple
    # cells (segment extent up to 700 vs 800-wide cells): the blocked
    # join must produce each candidate pair EXACTLY once (list
    # equality, not set equality — a reference-point bug shows up as a
    # duplicate) with identical crossing flags.
    a_rows = []
    b_rows = []
    for i in range(40):
        x = (i * i % 997) * 7 % 3000
        y = (i * i % 991) * 11 % 3000
        a_rows.append((x, y, x + (i * 37) % 701, y + (i * 53) % 701 - 350))
    for j in range(60):
        x = (j * j % 983) * 13 % 3000
        y = (j * j % 977) * 17 % 3000
        b_rows.append((x, y, x + (j * 41) % 701 - 350, y + (j * 29) % 701))
    got = _blocked(spark, a_rows, b_rows)
    want = _brute(spark, a_rows, b_rows)
    assert got == want
    assert any(c == 1 for _, _, c in got)  # fixture has real crossings
    assert any(c == 0 for _, _, c in got)  # ... and bbox-only pairs


def test_degenerate_cases_exact(spark):
    # one horizontal road (0,0)-(100,0); ways exercising each branch of
    # the CLRS test. Expected flags computed by hand.
    a_rows = [(0, 0, 100, 0)]
    b_rows = [
        (50, -10, 50, 10),  # proper crossing
        (50, 0, 50, 10),  # T-touch: way endpoint ON the road
        (100, 0, 150, 50),  # shared endpoint
        (20, 0, 80, 0),  # collinear overlap (containment)
        (-50, 0, 10, 0),  # collinear partial overlap
        (60, 40, 120, 0),  # endpoint ON the road's LINE but past its
        # end (d=0, on-segment check must reject) -> no
        (99, -5, 105, 5),  # bbox candidate; crosses y=0 at x=102,
        # just past the road's end -> no (all-strict branch)
        (200, -5, 210, 5),  # far away -> not even a candidate
    ]
    got = dict(
        ((aid, bid), c) for aid, bid, c in _blocked(spark, a_rows, b_rows)
    )
    assert got[(0, 0)] == 1
    assert got[(0, 1)] == 1
    assert got[(0, 2)] == 1
    assert got[(0, 3)] == 1
    assert got[(0, 4)] == 1
    assert got[(0, 5)] == 0
    assert got[(0, 6)] == 0
    assert (0, 7) not in got  # bbox prefilter removed it
    assert got == dict(
        ((aid, bid), c)
        for aid, bid, c in _brute(spark, a_rows, b_rows)
    )


def test_cell_boundary_alignment(spark):
    # segments whose bboxes END exactly on a cell boundary and a pair
    # whose bbox-intersection corner IS a boundary point: the owner
    # cell must still be unique (one row, not zero or two).
    c = _SEG_CELL
    a_rows = [(c - 50, 10, c + 50, 10)]  # spans the x boundary
    b_rows = [
        (c, 0, c, 20),  # vertical, exactly on the boundary -> crossing
        (c - 60, 5, c - 10, 15),  # overlaps left cell only
    ]
    got = _blocked(spark, a_rows, b_rows)
    want = _brute(spark, a_rows, b_rows)
    assert got == want
    assert got == [(0, 0, 1), (0, 1, 1)]


def test_negative_coordinates_block_losslessly(spark):
    # fixture offsets can push endpoints below zero; integer division
    # truncates toward zero there, which widens cell 0 but never
    # separates a within-cell-width pair by more than one cell index —
    # pin that with segments straddling the origin.
    a_rows = [(-100, -100, 100, 100)]
    b_rows = [(-100, 100, 100, -100), (-300, -300, -150, -150)]
    got = _blocked(spark, a_rows, b_rows)
    want = _brute(spark, a_rows, b_rows)
    assert got == want
    assert got[0] == (0, 0, 1)


def test_out_of_domain_coordinates_stay_exactly_once(spark):
    # beyond the fixture domain the packed cell id ((gy+1)*64 + gx+1)
    # can alias two different raw cells (x past 64 cells * 800 = 51200
    # wraps the row stride); a long segment spanning >= 64 x-cells
    # would then surface a pair through two join rows. The raw (gx, gy)
    # equality guard must keep the blocked join a multiset match of
    # the brute force at any coordinate range.
    a_rows = [
        (0, 0, 60000, 600),            # spans ~75 x-cells
        (55000, -900, 55000, 900),     # far right, vertical
        (-3000, 100, -3000 + 58000, 220),
    ]
    b_rows = [
        (54000 + (j * 977) % 4000, -800 + (j * 391) % 1600,
         54000 + (j * 977) % 4000 + 300, -800 + (j * 391) % 1600 + 300)
        for j in range(30)
    ] + [
        ((j * 2003) % 60000, (j * 157) % 700, (j * 2003) % 60000 + 400,
         (j * 157) % 700 - 350)
        for j in range(30)
    ]
    got = _blocked(spark, a_rows, b_rows)
    want = _brute(spark, a_rows, b_rows)
    assert got == want
    keys = [(a, b) for a, b, _ in got]
    assert len(keys) == len(set(keys))
    assert any(c == 1 for _, _, c in got)
