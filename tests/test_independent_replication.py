"""Independent numpy/duckdb replications of statistical queries.

The one bug class the driver's hash gate CANNOT catch is an oracle that
faithfully replays a wrong formula — round 4's Hurst (/w twice) and the
size-weighted changepoint argmin both shipped green that way and were
found only by an external recomputation. These tests recompute each
query's headline statistic FROM THE RAW PARQUET with an implementation
that shares no code (and no algebraic rearrangement) with the query,
then compare within grid tolerance. Loose tolerances (1e-3-ish) are
deliberate: they absorb micro-grid rounding while still catching
whole-formula errors, which historically are off by factors or units.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _daily_counts(con):
    return np.array([r[0] for r in con.execute(
        "SELECT CAST(COUNT(*) AS BIGINT) AS y FROM events "
        "GROUP BY CAST(ts AS DATE) ORDER BY CAST(ts AS DATE)").fetchall()],
        dtype=np.float64)


def test_acf_matches_textbook_formula(spark, sf_dir):
    """Query computes ACF via multiplied-out int64 sufficient stats;
    replication uses the plain centered covariance ratio."""
    con = _con(sf_dir)
    y = _daily_counts(con)
    con.close()
    ybar = y.mean()
    denom = ((y - ybar) ** 2).sum()
    expected = {k: float(((y[k:] - ybar) * (y[:-k] - ybar)).sum() / denom)
                for k in range(1, 8)}
    rows = {r.lag_k: r.acf for r in
            QUERIES["autocorrelation_function"](spark, sf_dir).collect()}
    assert set(rows) == set(expected)
    for k in expected:
        assert abs(rows[k] - expected[k]) < 1e-3, (k, rows[k], expected[k])


def test_spearman_matches_scipy_free_ranks(spark, sf_dir):
    """Replication ranks with numpy argsort (same orderkey tiebreak) and
    applies rho = 1 - 6Σd²/(n(n²-1)) -- plus a cross-check through the
    Pearson-on-ranks definition, which must agree when ranks are a
    permutation."""
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice, c.c_acctbal
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """).fetchall()
    con.close()
    by_seg = {}
    for seg, k, price, bal in rows:
        by_seg.setdefault(seg, []).append((k, price, bal))
    got = {r.seg: r for r in
           QUERIES["spearman_rank_correlation"](spark, sf_dir).collect()}
    assert set(got) == set(by_seg)
    for seg, vals in by_seg.items():
        ks = np.array([v[0] for v in vals])
        price = np.array([v[1] for v in vals])
        bal = np.array([v[2] for v in vals])
        rp = np.empty(len(vals)); rp[np.lexsort((ks, price))] = np.arange(1, len(vals) + 1)
        rb = np.empty(len(vals)); rb[np.lexsort((ks, bal))] = np.arange(1, len(vals) + 1)
        n = len(vals)
        d2 = ((rp - rb) ** 2).sum()
        rho = 1 - 6 * d2 / (n * (n * n - 1))
        pearson = np.corrcoef(rp, rb)[0, 1]
        assert abs(rho - pearson) < 1e-9  # permutation-rank identity
        assert got[seg].n == n
        assert got[seg].sum_d2 == int(d2)
        assert abs(got[seg].spearman_rho - rho) < 1e-4


def test_wilcoxon_w_plus_matches_average_ranks(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT SUM(CASE WHEN o_orderdate <  DATE '1998-01-01'
                        THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS r1,
               SUM(CASE WHEN o_orderdate >= DATE '1998-01-01'
                        THEN CAST(ROUND(o_totalprice * 100) AS BIGINT) END) AS r2
        FROM orders GROUP BY o_custkey
    """).fetchall()
    con.close()
    d = np.array([r2 - r1 for r1, r2 in rows if r1 is not None and r2 is not None],
                 dtype=np.int64)
    d = d[d != 0]
    absd = np.abs(d)
    order = np.argsort(absd, kind="stable")
    ranks = np.empty(len(d), dtype=np.float64)
    # average ranks over ties, computed the pedestrian way
    sorted_abs = absd[order]
    i = 0
    while i < len(d):
        j = i
        while j < len(d) and sorted_abs[j] == sorted_abs[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    w_plus = ranks[d > 0].sum()
    r = QUERIES["wilcoxon_signed_rank"](spark, sf_dir).first()
    assert r.n_pairs == len(d)
    assert abs(r.w_plus - w_plus) < 1e-6
    n = len(d)
    mu, sd = n * (n + 1) / 4, math.sqrt(n * (n + 1) * (2 * n + 1) / 24)
    assert abs(r.z_score - (w_plus - mu) / sd) < 1e-3


def test_hill_alpha_matches_direct_estimator(spark, sf_dir):
    con = _con(sf_dir)
    cents = np.array([r[0] for r in con.execute("""
        SELECT SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS c
        FROM orders GROUP BY o_custkey ORDER BY c DESC, o_custkey
    """).fetchall()], dtype=np.float64)
    con.close()
    k = 50
    xk1 = cents[k]  # the (k+1)-th order statistic
    h = np.log(cents[:k] / xk1).mean()
    r = QUERIES["hill_tail_index"](spark, sf_dir).first()
    assert abs(r.threshold_revenue - xk1 / 100.0) < 1e-6
    assert abs(r.hill_h - h) < 1e-3
    assert abs(r.tail_alpha - 1.0 / h) < 1e-2 * max(1.0, 1.0 / h)


def test_gumbel_fit_matches_method_of_moments(spark, sf_dir):
    con = _con(sf_dir)
    m = np.array([r[0] for r in con.execute("""
        SELECT MAX(c) FROM (
          SELECT CAST(ts AS DATE) AS day, date_trunc('hour', ts) AS hr,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2
        ) GROUP BY day
    """).fetchall()], dtype=np.float64)
    con.close()
    mean, sd = m.mean(), m.std()  # population sd, matching the query's /n
    beta = sd * math.sqrt(6) / math.pi
    mu = mean - 0.5772156649015329 * beta
    rl = mu - beta * math.log(-math.log(1 - 1 / 30))
    r = QUERIES["gumbel_block_maxima_fit"](spark, sf_dir).first()
    assert r.n_blocks == len(m)
    assert abs(r.mean_max - mean) < 1e-3
    assert abs(r.gumbel_beta - beta) < 2e-3 * max(1.0, beta)
    assert abs(r.gumbel_mu - mu) < 2e-3 * max(1.0, abs(mu))
    assert abs(r.return_level_30d - rl) < 5e-3 * max(1.0, rl)


def test_permutation_entropy_matches_direct_count(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1 ORDER BY 1
    """).fetchall()
    con.close()
    import collections
    from datetime import timedelta

    pats = collections.Counter()
    for i in range(len(rows) - 2):
        (h1, a), (h2, b), (h3, c) = rows[i], rows[i + 1], rows[i + 2]
        if h3 - h1 != timedelta(hours=2):
            continue  # strict adjacency guard, as the query enforces
        # stable rank pattern: earlier hour wins ties
        trip = [(a, 0), (b, 1), (c, 2)]
        order = tuple(t[1] for t in sorted(trip, key=lambda t: (t[0], t[1])))
        pats[order] += 1
    n = sum(pats.values())
    probs = np.array([v / n for v in pats.values()])
    h = float(-(probs * np.log(probs)).sum())
    r = QUERIES["permutation_entropy"](spark, sf_dir).first()
    assert r.n_triples == n
    assert r.n_patterns_seen == len(pats)
    assert abs(r.perm_entropy_nats - h) < 1e-3
    assert abs(r.normalized - h / math.log(6)) < 1e-3


def test_mahalanobis_top10_matches_direct_quadratic_form(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o.o_orderkey, o.o_totalprice * 0.001 AS x, q.qty
        FROM orders o JOIN (
          SELECT l_orderkey, SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
          FROM lineitem GROUP BY l_orderkey
        ) q ON q.l_orderkey = o.o_orderkey
    """).fetchall()
    con.close()
    ks = np.array([r[0] for r in rows])
    X = np.array([[r[1], r[2]] for r in rows], dtype=np.float64)
    mu = X.mean(axis=0)
    Xc = X - mu
    cov = (Xc.T @ Xc) / len(X)  # population covariance, matching the /n fit
    inv = np.linalg.inv(cov)
    d2 = np.einsum("ij,jk,ik->i", Xc, inv, Xc)
    # top-10 by d2, orderkey tiebreak — replicate the query's ranking
    top = sorted(zip(d2, ks), key=lambda t: (-t[0], t[1]))[:10]
    got = QUERIES["mahalanobis_outliers_2d"](spark, sf_dir).collect()
    assert len(got) == 10
    assert [g.orderkey for g in got] == [int(k) for _, k in top]
    for g, (dd, _) in zip(got, top):
        assert abs(g.mahalanobis_sq - dd) < 1e-2 * max(1.0, dd)
