"""Grid-blocked DBSCAN (round 10): the cell-blocked pair stream +
iterative component labels must reproduce the textbook definitions —
verified against an independent in-process brute force (numpy distance
matrix + union-find) on scattered points that straddle cell boundaries,
plus targeted fixtures for the isolated-core, border-tie-break, and
all-noise shapes."""

from __future__ import annotations

import numpy as np

from openmaptiles_zh_modifier_spark.queries_geo import dbscan_labels


def _brute_labels(ids, px, py, eps2, min_pts):
    """Reference DBSCAN: exact definitions, min-core-id cluster labels,
    min-cluster border tie-break (the operator's documented contract)."""
    ids = np.asarray(ids, dtype=np.int64)
    px = np.asarray(px, dtype=np.int64)
    py = np.asarray(py, dtype=np.int64)
    n = len(ids)
    dx = px[:, None] - px[None, :]
    dy = py[:, None] - py[None, :]
    adj = dx * dx + dy * dy <= eps2  # includes self
    core = adj.sum(1) >= min_pts

    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        if not core[i]:
            continue
        for j in np.nonzero(adj[i])[0]:
            if core[j]:
                ri, rj = find(i), find(int(j))
                if ri != rj:
                    parent[ri] = rj

    cluster = {}
    for i in range(n):
        if core[i]:
            root = find(i)
            members = [ids[k] for k in range(n) if core[k] and find(k) == root]
            cluster[ids[i]] = (min(members), 2)
    for i in range(n):
        if core[i]:
            continue
        neigh = [
            cluster[ids[j]][0]
            for j in np.nonzero(adj[i])[0]
            if j != i and core[j]
        ]
        cluster[ids[i]] = (min(neigh), 1) if neigh else (-1, 0)
    return {int(k): (int(v[0]), v[1]) for k, v in cluster.items()}


def _spark_labels(spark, ids, px, py, eps2_budget, min_pts):
    pts = spark.createDataFrame(
        list(zip(map(int, ids), map(int, px), map(int, py))),
        "id long, px long, py long",
    )
    out = dbscan_labels(pts, eps2_budget=eps2_budget, min_pts=min_pts)
    return {
        int(r.id): (int(r.cluster), int(r.role)) for r in out.collect()
    }


def test_dbscan_matches_brute_force_across_cell_boundaries(spark):
    # 60 scattered points (quadratic hash onto a 3000x3000 plane):
    # eps ~ 387 vs a 3000-wide plane means neighbor pairs routinely
    # straddle cell edges — any blocking leak shows up as a missing
    # pair, hence a wrong degree or label. 23 core / 13 border / 24
    # noise at this eps (measured).
    ids = list(range(60))
    px = [(i * i % 9973) * 271 % 3000 for i in ids]
    py = [(i * i % 9967) * 331 % 3000 for i in ids]
    eps2_budget = 60 * 150_000  # eps2 = 150000, eps ~ 387
    got = _spark_labels(spark, ids, px, py, eps2_budget, 4)
    want = _brute_labels(ids, px, py, 150_000, 4)
    assert got == want
    roles = {r for _, r in got.values()}
    assert roles == {0, 1, 2}, "fixture must exercise core+border+noise"


def test_dbscan_all_noise_when_sparse(spark):
    ids = [1, 2, 3, 4, 5]
    px = [0, 1000, 2000, 3000, 4000]
    py = [0, 0, 0, 0, 0]
    got = _spark_labels(spark, ids, px, py, 5 * 100, 4)  # eps = 10
    assert got == {i: (-1, 0) for i in ids}


def test_dbscan_isolated_core_keeps_own_id(spark):
    # a plus-shape: center has 5 eps-neighbors (core); each arm tip has
    # only 2 (border) — the lone core has NO core neighbor, so the
    # component loop never sees it and the left-join fallback must
    # label it with its own id.
    # eps = 6: center-tip dist 5 (in), tip-tip dist sqrt(50) ~ 7.07 and
    # 10 (out) — tips see only {self, center} = 2 < 4 neighbors.
    ids = [10, 11, 12, 13, 14]
    px = [0, 5, -5, 0, 0]
    py = [0, 0, 0, 5, -5]
    got = _spark_labels(spark, ids, px, py, 5 * 36, 4)  # eps2 = 36
    assert got == _brute_labels(ids, px, py, 36, 4)
    assert got[10] == (10, 2)
    for tip in (11, 12, 13, 14):
        assert got[tip] == (10, 1)


def test_dbscan_border_tiebreak_is_min_cluster(spark):
    # two 4-point blobs (both core) with one point equidistant between
    # them, within eps of a core in EACH: the documented deterministic
    # tie-break assigns the MIN cluster id.
    ids, px, py = [], [], []
    for i, x0 in ((0, 0), (100, 1000)):
        for k in range(4):
            ids.append(i + k)
            px.append(x0 + k)
            py.append(0)
    ids.append(500)
    px.append(501)
    py.append(0)
    # eps = 499, minPts = 5: the bridge at x=501 reaches cores in BOTH
    # blobs (ids 2,3 at 499,498 and id 100 at 499) but has only 4
    # eps-neighbors itself — border, assigned the MIN cluster (2, not
    # 100). The bridge must NOT become core, or it would merge the
    # blobs into one cluster.
    eps2 = 499 * 499
    got = _spark_labels(spark, ids, px, py, len(ids) * eps2, 5)
    want = _brute_labels(ids, px, py, eps2, 5)
    assert got == want
    assert got[500] == (2, 1)  # border, min cluster id wins
    assert got[100][0] == 100 and got[2][0] == 2  # two distinct clusters


def test_dbscan_roles_partition_the_input(spark):
    ids = list(range(40))
    px = [(i * 313) % 500 for i in ids]
    py = [(i * 197) % 500 for i in ids]
    got = _spark_labels(spark, ids, px, py, 40 * 3600, 4)
    assert set(got) == set(ids)  # every point labeled exactly once
    for i, (c, role) in got.items():
        assert (c == -1) == (role == 0)


def test_dbscan_eps2_floors_at_one_past_the_budget(spark):
    # n > eps2_budget drives the integer division to 0; without the
    # floor, cw = ceil(sqrt(0)) = 0 NULLs every cell (px div 0) and the
    # whole input silently labels noise while the declarative oracle
    # still pairs coincident points. eps2 = 1 is the correct degenerate
    # limit: only exact-coincidence pairs survive.
    ids = list(range(8))
    px = [100, 100, 100, 100, 500, 900, 1300, 1700]  # 4 coincident
    py = [100, 100, 100, 100, 500, 900, 1300, 1700]
    got = _spark_labels(spark, ids, px, py, 4, 4)  # budget 4 < n=8 -> eps2=1
    want = _brute_labels(ids, px, py, 1, 4)
    assert got == want
    # the coincident quadruple clusters (deg 4 incl. self); the rest is noise
    assert got[0] == (0, 2)
    assert all(got[i] == (0, 2) for i in (1, 2, 3))
    assert all(got[i] == (-1, 0) for i in (4, 5, 6, 7))


def test_dbscan_fixed_eps_matches_brute_force(spark):
    """VERDICT r10 #4: eps as a DOMAIN parameter (eps2 passed directly)
    must reproduce the same textbook labels as the budget policy at the
    equivalent radius — the budget is policy, not geometry."""
    ids = list(range(60))
    px = [(i * i % 9973) * 271 % 3000 for i in ids]
    py = [(i * i % 9967) * 331 % 3000 for i in ids]
    pts = spark.createDataFrame(
        list(zip(ids, px, py)), "id long, px long, py long"
    )
    out = dbscan_labels(pts, eps2=150_000, min_pts=4)
    got = {int(r.id): (int(r.cluster), int(r.role)) for r in out.collect()}
    assert got == _brute_labels(ids, px, py, 150_000, 4)
    # and the fixed-eps path equals the budget path at the same radius
    assert got == _spark_labels(spark, ids, px, py, 60 * 150_000, 4)


def test_dbscan_core_edge_guard_reports_supercritical_eps(spark):
    """The percolation guard: a supercritical eps (every point within
    eps of every other) must raise with the measured core-edge count
    BEFORE the component loop runs — not stall inside it."""
    import pytest

    from openmaptiles_zh_modifier_spark.queries_geo import (
        DbscanEdgeBudgetError,
    )

    ids = list(range(20))
    px = [i * 3 for i in ids]     # 20 points inside a 60-unit span
    py = [0] * 20
    pts = spark.createDataFrame(
        list(zip(ids, px, py)), "id long, px long, py long"
    )
    # eps = 1000 >> span: complete graph, 190 core-core edges
    with pytest.raises(DbscanEdgeBudgetError, match="190 core-core"):
        dbscan_labels(pts, eps2=1_000_000, min_pts=4, max_core_edges=50)
    # under the cap the same call completes and labels one cluster
    out = dbscan_labels(pts, eps2=1_000_000, min_pts=4, max_core_edges=200)
    got = {int(r.id): (int(r.cluster), int(r.role)) for r in out.collect()}
    assert all(v == (0, 2) for v in got.values())


# ---------------------------------------------------------------------------
# Geodesic DBSCAN (round 12, VERDICT r11 #6)
# ---------------------------------------------------------------------------


def _hav_mm_py(lat1, lon1, lat2, lon2):
    import math

    d = (
        2
        * 6371000.0
        * math.asin(
            math.sqrt(
                math.sin(math.radians((lat2 - lat1) / 2.0)) ** 2
                + math.cos(math.radians(lat1))
                * math.cos(math.radians(lat2))
                * math.sin(math.radians((lon2 - lon1) / 2.0)) ** 2
            )
        )
    )
    return round(d * 1000)


def _brute_labels_geo(ids, latc, lonc, eps_mm, min_pts):
    """Reference geodesic DBSCAN over the haversine-mm metric, same
    label contract as the planar brute force."""
    n = len(ids)
    adj = np.zeros((n, n), dtype=bool)
    for i in range(n):
        for j in range(n):
            adj[i, j] = (
                _hav_mm_py(
                    latc[i] / 100.0, lonc[i] / 100.0,
                    latc[j] / 100.0, lonc[j] / 100.0,
                )
                <= eps_mm
            )
    core = adj.sum(1) >= min_pts
    parent = list(range(n))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for i in range(n):
        if core[i]:
            for j in np.nonzero(adj[i])[0]:
                if core[j]:
                    ri, rj = find(i), find(int(j))
                    if ri != rj:
                        parent[ri] = rj
    cluster = {}
    for i in range(n):
        if core[i]:
            root = find(i)
            members = [ids[k] for k in range(n) if core[k] and find(k) == root]
            cluster[ids[i]] = (min(members), 2)
    for i in range(n):
        if core[i]:
            continue
        neigh = [
            cluster[ids[j]][0]
            for j in np.nonzero(adj[i])[0]
            if j != i and core[j]
        ]
        cluster[ids[i]] = (min(neigh), 1) if neigh else (-1, 0)
    return {int(k): (int(v[0]), v[1]) for k, v in cluster.items()}


def test_geodesic_dbscan_antimeridian_and_polar_clusters(spark):
    """The two shapes a planar grid cannot cluster: a blob straddling
    ±180° (pairs exist only through the modular lon ring) and a blob at
    82°N whose lon extent exceeds one probe cell ONLY because the probe
    width stretches with latitude. Plus nearby-but-outside noise."""
    from openmaptiles_zh_modifier_spark.queries_geo import (
        dbscan_labels_geodesic,
    )

    rows = []
    # antimeridian blob: lon 179.9°..180° and -180°..-179.9°, lat ~0
    for k in range(4):
        rows.append((k, 0 + k, 17990 + k * 5))          # east of the seam
        rows.append((10 + k, 0 + k, -18000 + k * 5))    # west of the seam
    # 82°N blob: lon spread 3° wide ~= 46 km east-west at that latitude
    for k in range(6):
        rows.append((20 + k, 8200 + k, 3000 + k * 60))
    # noise: same lons at the EQUATOR, where 3° of lon = 334 km >> eps
    for k in range(3):
        rows.append((30 + k, 0, 3000 + k * 160))

    ids = [r[0] for r in rows]
    latc = [r[1] for r in rows]
    lonc = [r[2] for r in rows]
    eps_mm = 50_000_000
    want = _brute_labels_geo(ids, latc, lonc, eps_mm, min_pts=4)

    pts = spark.createDataFrame(rows, "id long, latc long, lonc long")
    got = {
        int(r.id): (int(r.cluster), int(r.role))
        for r in dbscan_labels_geodesic(pts, eps_mm=eps_mm).collect()
    }
    assert got == want
    # the seam blob really is ONE cluster spanning both hemispheres
    assert got[0][0] == got[10][0] != -1
    # the 82° blob is one cluster; the equator twins are noise
    assert len({got[20 + k][0] for k in range(6)}) == 1
    assert all(got[30 + k] == (-1, 0) for k in range(3))


def test_geodesic_dbscan_fixture_has_the_mandated_shapes(spark, sf_dir):
    """The registered query's fixture must actually exercise what the
    oracle certifies: a >=75° cluster and an antimeridian-straddling
    cluster, both labeled as clusters (not noise)."""
    from openmaptiles_zh_modifier_spark.queries_geo import (
        _GDB_LAT,
        _GDB_LON,
        dbscan_labels_geodesic,
    )
    from openmaptiles_zh_modifier_spark.registry import load

    pts = load(spark, sf_dir, "documents").selectExpr(
        "doc_id AS id", f"{_GDB_LAT} AS latc", f"{_GDB_LON} AS lonc"
    )
    labeled = dbscan_labels_geodesic(pts).join(pts, "id")
    rows = labeled.where("cluster >= 0").collect()
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster, []).append(r)
    assert len(by_cluster) == 2
    polar = [
        c for c, ms in by_cluster.items() if all(m.latc >= 7500 for m in ms)
    ]
    seam = [
        c
        for c, ms in by_cluster.items()
        if {m.lonc >= 0 for m in ms} == {True, False}
    ]
    assert len(polar) == 1 and len(seam) == 1 and polar != seam
