"""Independent-reference tests for the round-5 statistics/linear-algebra
operators: covariance vs full-precision numpy, Holt vs a pure-Python
replay, char entropy vs a scipy-free formula, and cross-source overlap
invariants."""

from __future__ import annotations

import math

import numpy as np
import pyarrow.parquet as pq

from openmaptiles_zh_modifier_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_embed_covariance_matches_numpy(spark):
    out = {
        (r["i"], r["j"]): (r["cov_num"], r["n"])
        for r in QUERIES["q_embed_covariance"](spark, SF).collect()
    }
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    X = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )
    Q = (np.floor(np.abs(X) * 10000 + 0.5) * np.sign(X)).astype(np.int64)
    n, d = Q.shape
    S = Q.T @ Q
    m = Q.sum(axis=0)
    assert len(out) == d * (d + 1) // 2
    for (i, j), (cov_num, nn) in out.items():
        assert nn == n
        assert cov_num == n * S[i, j] - m[i] * m[j], (i, j)
    # the centered matrix must be positive semidefinite (up to the
    # quantization scale): its smallest eigenvalue cannot be materially
    # negative — catches sign/index transposition bugs numerically.
    C = np.zeros((d, d), dtype=np.float64)
    for (i, j), (cov_num, _) in out.items():
        C[i, j] = C[j, i] = cov_num / (n * n)
    ev = np.linalg.eigvalsh(C)
    assert ev.min() >= -1e-6 * max(1.0, ev.max())


def test_holt_linear_matches_python_replay(spark):
    rows = QUERIES["q_holt_linear"](spark, SF).collect()
    ev = pq.read_table(f"{SF}/events.parquet").to_pylist()
    daily: dict[tuple, int] = {}
    for e in ev:
        ts = e["ts"]
        day = ts.date() if hasattr(ts, "date") else ts
        key = (e["user_id"], day)
        daily[key] = daily.get(key, 0) + int(round(e["value"] * 100))
    series: dict[int, list] = {}
    for (u, day), cents in daily.items():
        series.setdefault(u, []).append((day, float(cents)))
    a, b = 0.4, 0.2
    for r in rows:
        xs = [x for _, x in sorted(series[r["user_id"]])]
        lv, tr = xs[0], 0.0
        for x in xs[1:]:
            nl = a * x + (1.0 - a) * (lv + tr)
            tr = b * (nl - lv) + (1.0 - b) * tr
            lv = nl
        assert r["n_days"] == len(xs)
        assert r["level_cents"] == round(lv, 4)
        assert r["trend_cents"] == round(tr, 4)
        assert r["forecast_h1"] == round(lv + tr, 4)
        assert r["forecast_h3"] == round(lv + 3.0 * tr, 4)


def test_char_entropy_matches_reference(spark):
    rows = QUERIES["q_char_entropy"](spark, SF).collect()
    docs = pq.read_table(f"{SF}/documents.parquet").to_pylist()
    texts = {d["doc_id"]: d["text"] for d in docs}
    assert len(rows) == len(texts)
    for r in rows:
        t = texts[r["doc_id"]]
        counts: dict[str, int] = {}
        for ch in t:
            counts[ch] = counts.get(ch, 0) + 1
        n = len(t)
        assert r["n_chars"] == n
        assert r["n_distinct_chars"] == len(counts)
        s_micro = sum(
            int(math.floor(abs(c * math.log(c)) * 1e6 + 0.5))
            for c in counts.values()
        )
        h = (math.log(n) - (s_micro / 1e6) / n) / math.log(2.0)
        assert abs(r["entropy_bits"] - h) < 5e-4
        # plausibility: entropy within [0, log2(alphabet)]
        assert 0.0 <= r["entropy_bits"] <= math.log2(len(counts)) + 1e-9


def test_cross_source_overlap_invariants(spark):
    rows = QUERIES["q_cross_source_overlap"](spark, SF).collect()
    for r in rows:
        assert r["src_a"] < r["src_b"]
        assert 1 <= r["n_shared"] <= min(r["n_a"], r["n_b"])
        assert 0.0 < r["containment"] <= 1.0
        assert r["containment"] == round(
            r["n_shared"] / min(r["n_a"], r["n_b"]), 4
        )
    # no duplicate pairs
    pairs = [(r["src_a"], r["src_b"]) for r in rows]
    assert len(pairs) == len(set(pairs))


def test_embed_pca_power_matches_quantized_replica(spark):
    from openmaptiles_zh_modifier_spark.queries_embeddings import (
        PCA_ITERS,
        PCA_VQ,
    )

    out = QUERIES["q_embed_pca_power"](spark, SF).collect()
    got = np.zeros(len(out), dtype=np.int64)
    for r in out:
        got[r["component"]] = r["loading_micro"]
    # exact replica of the quantized iteration in pure Python ints
    tbl = pq.read_table(f"{SF}/embeddings.parquet")
    X = np.stack(
        [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
    )
    Q = (np.floor(np.abs(X) * 10000 + 0.5) * np.sign(X)).astype(np.int64)
    n, d = Q.shape
    S = Q.T @ Q
    m = Q.sum(0)
    C = n * S.astype(object) - np.outer(m, m).astype(object)
    maxc = max(abs(int(C[i, j])) for i in range(d) for j in range(d))
    Cn = np.array([[int(C[i, j]) / maxc for j in range(d)] for i in range(d)])

    def rnd(x: float) -> int:
        return int(math.floor(abs(x) + 0.5)) * (1 if x >= 0 else -1)

    v = np.zeros(d, dtype=np.int64)
    v[0] = PCA_VQ
    rayleigh0 = None
    Cf = np.array([[float(int(C[i, j])) for j in range(d)] for i in range(d)])
    for _ in range(PCA_ITERS):
        if rayleigh0 is None:
            vf = v.astype(np.float64)
            rayleigh0 = vf @ Cf @ vf / (vf @ vf)
        w = np.array(
            [sum(rnd(Cn[i, j] * int(v[j])) for j in range(d)) for i in range(d)],
            dtype=np.int64,
        )
        wm = max(abs(int(x)) for x in w)
        v = np.array([rnd(int(wi) * float(PCA_VQ) / wm) for wi in w], dtype=np.int64)
    assert (got == v).all(), (got[:8], v[:8])
    # quality: Rayleigh quotient strictly improved from the basis seed,
    # and alignment with the true eigh top component is material (the
    # docstring's honest ~0.8 at sf0.001-0.01 scale; floor kept loose)
    vf = v.astype(np.float64)
    rayleighK = vf @ Cf @ vf / (vf @ vf)
    assert rayleighK > rayleigh0 * 1.5
    evals, evecs = np.linalg.eigh(Cf)
    top = evecs[:, -1]
    cos = abs(vf @ top / (np.linalg.norm(vf) * np.linalg.norm(top)))
    assert cos > 0.5, cos
