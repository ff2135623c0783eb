"""Radius-join losslessness (VERDICT r8 #3): geo_radius_pairs (cell +
8-neighbor probing) must equal the brute-force cross join on inputs
chosen to sit ON the hazard boundaries — cell edges, the antimeridian,
and distances straddling the radius."""

from __future__ import annotations

from pyspark.sql import functions as F

from openmaptiles_zh_modifier_spark.queries_geo import (
    RADIUS_MM,
    _hav_mm,
    geo_radius_pairs,
)


def _brute(qdf, pdf, radius_mm):
    return (
        qdf.crossJoin(pdf)
        .withColumn(
            "d_mm",
            F.expr(
                _hav_mm(
                    "qlatc / 100.0",
                    "qlonc / 100.0",
                    "platc / 100.0",
                    "plonc / 100.0",
                )
            ),
        )
        .where(F.col("d_mm") <= radius_mm)
    )


def _pairs(df):
    return sorted(
        (r.qid, r.pid, r.d_mm)
        for r in df.select("qid", "pid", "d_mm").collect()
    )


def test_radius_join_matches_brute_force_on_boundary_cases(spark):
    # centi-degree fixtures. Cell grid: 200 cdeg lat x 400 cdeg lon,
    # lon cell boundaries at multiples of 400 from -18000.
    queries = [
        (1, 0, 399),      # just left of a lon cell edge
        (2, 0, 400),      # exactly ON a lon cell edge
        (3, 199, 0),      # just below a lat cell edge
        (4, 200, 0),      # exactly ON a lat cell edge
        (5, 5999, 0),     # top of the latitude band (worst cos)
        (6, 0, -17990),   # 0.1 deg east of the antimeridian
        (7, -6000, -18000),  # both extreme corners
        (8, 3000, 10000),  # interior control
    ]
    pois = [
        (101, 0, 401),    # across the lon edge from q1/q2 (~0.02-0.2 km)
        (102, 201, 0),    # across the lat edge from q3/q4
        (103, 5999, 260),  # ~2.6 deg lon at lat 59.99: inside R only
                           # because of the cos shrink (~145 km)
        (104, 0, 17990),   # 0.2 deg across the antimeridian from q6
        (105, 135, 0),     # 1.35 deg lat from q8's axis: near-R probe
        (106, 3000 - 134, 10000),  # 134 cdeg below q8 (~149 km: inside)
        (107, 3000 + 136, 10000),  # 136 cdeg above q8 (~151 km: outside)
        (108, -6000, 17999),  # wraps to q7 across the corner
        (109, 4000, -9000),   # far from everything
    ]
    qdf = spark.createDataFrame(
        queries, "qid long, qlatc long, qlonc long"
    )
    pdf = spark.createDataFrame(pois, "pid long, platc long, plonc long")

    got = _pairs(geo_radius_pairs(qdf, pdf, RADIUS_MM))
    want = _pairs(_brute(qdf, pdf, RADIUS_MM))
    assert got == want and len(want) >= 6  # non-trivial overlap
    # the hazard pairs are actually exercised
    found = {(q, p) for q, p, _ in want}
    assert (6, 104) in found  # antimeridian wrap pair found by pmod
    assert (7, 108) in found  # corner wrap
    assert (8, 106) in found and (8, 107) not in found  # radius edge


def test_radius_join_lossless_at_high_latitude(spark):
    # VERDICT r9 #2: poleward of the fixture band the static 3x3 grid
    # would MISS pairs (at 75 N a 150 km radius spans ~5.8 deg of
    # longitude > one 4-deg cell); the per-row adaptive probe width must
    # keep the join equal to the brute force there.
    queries = [
        (1, 7500, 0),      # 75.00 N: needs a 5-cell lon neighborhood
        (2, 7500, 399),    # same band, just left of a lon cell edge
        (3, 8000, -17900),  # 80 N near the antimeridian
        (4, 8500, 1200),   # 85 N: ~15.5 deg lon span
    ]
    pois = [
        # ~2.7 cdeg/km of lon at 75N: 520 cdeg ~ 139 km (inside),
        # 580 cdeg ~ 155 km (outside) — both BEYOND one 400-cdeg cell,
        # so the static 3x3 grid would have dropped 101 entirely.
        (101, 7500, 520),
        (102, 7500, 580),
        (103, 7500, -120),   # across the -18000-anchored cell edge of q2
        (104, 8000, 17950),  # antimeridian wrap partner of q3
        (105, 8500, 2600),   # 14 deg east at 85N ~ 136 km: inside
        (106, 8500, 2900),   # 17 deg east at 85N ~ 165 km: outside
        (107, 0, 0),         # equator control, far from everything
    ]
    qdf = spark.createDataFrame(
        queries, "qid long, qlatc long, qlonc long"
    )
    pdf = spark.createDataFrame(pois, "pid long, platc long, plonc long")
    got = _pairs(geo_radius_pairs(qdf, pdf, RADIUS_MM))
    want = _pairs(_brute(qdf, pdf, RADIUS_MM))
    assert got == want
    found = {(q, p) for q, p, _ in want}
    assert (1, 101) in found and (1, 102) not in found
    assert (2, 103) in found
    assert (3, 104) in found  # high-lat antimeridian wrap
    assert (4, 105) in found and (4, 106) not in found


def test_radius_join_full_ring_at_pole(spark):
    # within 1.35 deg of the pole every longitude is a candidate: the
    # clamped asin degrades to a full (deduplicated) longitude ring,
    # so a partner on the OPPOSITE meridian is still found and probed
    # cells stay distinct (no duplicate pairs).
    qdf = spark.createDataFrame(
        [(1, 8990, 0)], "qid long, qlatc long, qlonc long"
    )
    pdf = spark.createDataFrame(
        # 89.95 N on the opposite meridian: ~22 km over the pole
        [(201, 8995, 17999), (202, 8995, 9000), (203, 8700, 0)],
        "pid long, platc long, plonc long",
    )
    got = _pairs(geo_radius_pairs(qdf, pdf, RADIUS_MM))
    want = _pairs(_brute(qdf, pdf, RADIUS_MM))
    assert got == want
    found = {(q, p) for q, p, _ in want}
    assert (1, 201) in found and (1, 202) in found
    # no duplicates from the ring: each pair appears exactly once
    assert len(got) == len({(q, p) for q, p, _ in got})


def test_radius_join_never_duplicates_candidates(spark):
    # a facility reachable through multiple probe offsets must appear
    # once: co-located query/facility at a 4-corner cell junction
    qdf = spark.createDataFrame(
        [(1, 200, 400)], "qid long, qlatc long, qlonc long"
    )
    pdf = spark.createDataFrame(
        [(201, 200, 400), (202, 199, 399)],
        "pid long, platc long, plonc long",
    )
    out = geo_radius_pairs(qdf, pdf, RADIUS_MM).collect()
    assert sorted(r.pid for r in out) == [201, 202]


def test_tile_rollup_shift_equals_direct_assignment(spark):
    # the load-bearing identity: floor-div nesting makes the shifted z8
    # census equal the DIRECT z4 assignment q_tile_pyramid computes —
    # so the rollup's z4 row must match the pyramid's z4 row exactly
    from openmaptiles_zh_modifier_spark.queries_geo import (
        q_tile_pyramid,
        q_tile_rollup,
    )

    sf = "/root/testdata/sf0.01"
    pyr = {r.zoom: r for r in q_tile_pyramid(spark, sf).collect()}
    roll = {r.zoom: r for r in q_tile_rollup(spark, sf).collect()}
    for z in (4, 8):
        assert roll[z].n_tiles == pyr[z].n_tiles
        assert roll[z].n_points == pyr[z].n_points
        assert roll[z].hottest_tile_n == pyr[z].hottest_tile_n
    # monotone pyramid invariants
    assert roll[2].n_tiles <= roll[4].n_tiles <= roll[8].n_tiles
    assert roll[2].n_points == roll[4].n_points == roll[8].n_points
