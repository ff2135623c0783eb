"""Round-13 second stats batch + multi-table txn query: unit pins
beside the dual-scale oracle hashes (tools/check_oracle.py covers both
scales; these pin the algebra against independent in-test replicas)."""

from __future__ import annotations

import itertools
import math

import duckdb

from openmaptiles_zh_modifier_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _kendall_tau_b(xs, ys):
    c = d = tx = ty = 0
    n0 = 0
    for (xa, ya), (xb, yb) in itertools.combinations(zip(xs, ys), 2):
        n0 += 1
        if xa == xb:
            tx += 1
        if ya == yb:
            ty += 1
        s = (xa - xb) * (ya - yb)
        if s > 0:
            c += 1
        elif s < 0:
            d += 1
    denom = (n0 - tx) * (n0 - ty)
    tau = (c - d) / math.sqrt(denom) if denom else None
    return tau, n0, c, d


def test_kendall_matches_pure_python_reference(spark):
    rows = {r.n_name: r for r in QUERIES["q_kendall_tau"](spark, SF).collect()}
    con = duckdb.connect()
    series = con.execute(
        f"""
        SELECT n.n_name, date_trunc('month', o.o_orderdate) AS mth,
               COUNT(*) AS x,
               SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS y
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON c.c_custkey = o.o_custkey
        JOIN '{SF}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    by_nation: dict[str, list] = {}
    for n_name, _mth, x, y in series:
        by_nation.setdefault(n_name, []).append((x, y))
    assert set(by_nation) == set(rows)
    for n_name, pts in by_nation.items():
        if len(pts) < 2:
            continue
        tau, n0, c, d = _kendall_tau_b(
            [p[0] for p in pts], [p[1] for p in pts]
        )
        r = rows[n_name]
        assert r.n_pairs == n0
        assert r.concordant == c
        assert r.discordant == d
        if tau is None:
            assert r.tau_b is None
        else:
            assert abs(r.tau_b - round(tau, 6)) < 1e-9
            assert -1.0 <= r.tau_b <= 1.0


def test_quantile_normalize_invariants(spark):
    rows = QUERIES["q_quantile_normalize"](spark, SF).collect()
    assert rows, "empty normalization table"
    by_bucket: dict[int, list] = {}
    per_source_docs: dict[str, int] = {}
    for r in rows:
        assert 1 <= r.bucket <= 20
        by_bucket.setdefault(r.bucket, []).append(r)
        per_source_docs[r.source] = (
            per_source_docs.get(r.source, 0) + r.n_docs
        )
    con = duckdb.connect()
    truth = dict(
        con.execute(
            f"SELECT source, COUNT(*) FROM '{SF}/documents.parquet' "
            "GROUP BY 1"
        ).fetchall()
    )
    assert per_source_docs == truth
    for bucket, rs in by_bucket.items():
        targets = {r.qn_target_micro for r in rs}
        assert len(targets) == 1, "target must be shared within a bucket"
        t = targets.pop()
        means = [r.src_mean_micro for r in rs]
        assert min(means) <= t <= max(means)
        # exact definition: floor(sum/n) of the per-source means
        assert t == sum(means) // len(means) or t == math.floor(
            sum(means) / len(means)
        )
    # monotone within source: later buckets have >= mean length
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for src, rs in by_source.items():
        rs.sort(key=lambda r: r.bucket)
        means = [r.src_mean_micro for r in rs]
        assert means == sorted(means), f"non-monotone buckets for {src}"


def test_sprt_matches_pandas_replica(spark):
    import pandas as pd

    rows = {r.arm: r for r in QUERIES["q_sprt_monitor"](spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")[
        ["user_id", "event_type", "ts", "event_id"]
    ]
    c1, c0 = float("0.2006706955"), float("-0.0500104206")
    up, lo = float("2.9444389792"), float("-2.9444389792")
    for arm in (0, 1):
        sub = ev[ev.user_id % 2 == arm].sort_values(["ts", "event_id"])
        conv = (sub.event_type == "purchase").astype(int).to_numpy()
        n1 = conv.cumsum()
        n = 1 + pd.RangeIndex(len(conv)).to_numpy()
        llr = n1 * c1 + (n - n1) * c0
        outside = (llr >= up) | (llr <= lo)
        r = rows[arm]
        assert r.n_obs == len(conv)
        if outside.any():
            i = int(outside.argmax())
            assert r.n_cross == i + 1
            assert abs(r.llr_cross - round(float(llr[i]), 6)) < 1e-9
            assert r.decision == (
                "accept_h1" if llr[i] >= up else "accept_h0"
            )
        else:
            assert r.n_cross is None
            assert r.decision == "continue"


def test_cow_txn_conservation(spark):
    rows = QUERIES["q_cow_txn"](spark, SF).collect()
    got = {(r.cat_version, r.tname): r for r in rows}
    assert len(got) == 6
    for cv in (1, 2):
        assert (
            got[(cv, "a")].n_rows + got[(cv, "b")].n_rows
            == got[(cv, "all")].n_rows
        )
        assert (
            got[(cv, "a")].sum_orderkey + got[(cv, "b")].sum_orderkey
            == got[(cv, "all")].sum_orderkey
        )
    # the move conserves the union across versions
    assert got[(1, "all")].n_rows == got[(2, "all")].n_rows
    assert got[(1, "all")].sum_orderkey == got[(2, "all")].sum_orderkey
    # and actually moved something
    assert got[(2, "a")].n_rows < got[(1, "a")].n_rows
    assert got[(2, "b")].n_rows > got[(1, "b")].n_rows


def test_textrank_invariants(spark):
    rows = QUERIES["q_textrank_keywords"](spark, SF).collect()
    assert [r.rk for r in rows] == list(range(1, len(rows) + 1))
    vals = [r.textrank for r in rows]
    assert vals == sorted(vals, reverse=True)
    for r in rows:
        assert 0.0 < r.textrank < 1.0
        assert " " not in r.word


def test_theilsen_matches_pure_python_reference(spark):
    import statistics

    rows = {
        r.n_name: r for r in QUERIES["q_theilsen_trend"](spark, SF).collect()
    }
    con = duckdb.connect()
    series = con.execute(
        f"""
        SELECT n.n_name,
               CAST(EXTRACT(YEAR FROM o.o_orderdate) * 12
                    + EXTRACT(MONTH FROM o.o_orderdate) AS BIGINT) AS x,
               SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS y
        FROM '{SF}/orders.parquet' o
        JOIN '{SF}/customer.parquet' c ON c.c_custkey = o.o_custkey
        JOIN '{SF}/nation.parquet' n ON n.n_nationkey = c.c_nationkey
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    by_nation: dict[str, list] = {}
    for n_name, x, y in series:
        by_nation.setdefault(n_name, []).append((x, y))
    for n_name, pts in by_nation.items():
        slopes = [
            (yb - ya) / (xb - xa)
            for (xa, ya), (xb, yb) in itertools.combinations(pts, 2)
        ]
        if not slopes:
            continue
        slope = statistics.median(slopes)
        inter = statistics.median(y - slope * x for x, y in pts)
        r = rows[n_name]
        assert r.n_pairs == len(slopes)
        assert r.ts_slope == slope  # bit-identical by construction
        assert r.ts_intercept == inter


def test_fellegi_sunter_patterns(spark):
    import itertools

    rows = {
        (r.ag_name, r.ag_type, r.ag_price): r
        for r in QUERIES["q_fellegi_sunter"](spark, SF).collect()
    }
    W = {
        "name": (2.8903717579, -2.2512917986),
        "type": (1.7346010554, -1.7346010554),
        "price": (1.9459101491, -1.0986122887),
    }
    total = 0
    for bits in itertools.product((0, 1), repeat=3):
        if bits not in rows:
            continue  # pattern absent in the tiny fixture is fine
        r = rows[bits]
        w = sum(
            W[f][0] if b else W[f][1]
            for f, b in zip(("name", "type", "price"), bits)
        )
        assert r.weight == round(w, 6)
        want = (
            "match" if w >= 3.0 else "non_match" if w <= -3.0 else "possible"
        )
        assert r.decision == want
        total += r.n_pairs
    con = duckdb.connect()
    n = con.execute(
        f"""SELECT COUNT(*) FROM '{SF}/part.parquet' a
            JOIN '{SF}/part.parquet' b
            ON a.p_brand = b.p_brand AND a.p_size = b.p_size
            AND a.p_partkey < b.p_partkey"""
    ).fetchone()[0]
    assert total == n  # every blocked pair classified exactly once
