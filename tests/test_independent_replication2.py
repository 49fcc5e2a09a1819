"""Second wave of independent replications (see
test_independent_replication.py for the rationale): runs test, Gini,
higher moments, Mann-Kendall + Theil-Sen, blocked Kendall tau-b, DiD,
log-log elasticity, and empirical-Bayes shrinkage, each recomputed from
raw parquet with no shared algebra."""

from __future__ import annotations

import math
from datetime import date

import duckdb
import numpy as np

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "customer", "lineitem", "events", "part"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_runs_test_matches_direct_count(spark, sf_dir):
    con = _con(sf_dir)
    y = [r[0] for r in con.execute(
        "SELECT CAST(COUNT(*) AS BIGINT) FROM events "
        "GROUP BY CAST(ts AS DATE) ORDER BY CAST(ts AS DATE)").fetchall()]
    con.close()
    signs = []
    for a, b in zip(y, y[1:]):
        if b > a:
            signs.append(1)
        elif b < a:
            signs.append(-1)  # zero-change days drop
    n1 = signs.count(1)
    n2 = signs.count(-1)
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    mu = 1 + 2 * n1 * n2 / (n1 + n2)
    var = (2 * n1 * n2 * (2 * n1 * n2 - n1 - n2)) / (
        (n1 + n2) ** 2 * (n1 + n2 - 1))
    r = QUERIES["runs_test_randomness"](spark, sf_dir).first()
    assert (r.n_up, r.n_down, r.runs) == (n1, n2, runs)
    assert abs(r.expected_runs - mu) < 1e-4
    assert abs(r.z_score - (runs - mu) / math.sqrt(var)) < 1e-3


def test_gini_matches_rank_formula_and_mean_abs_difference(spark, sf_dir):
    """Check against the rank formula AND the definitional
    mean-absolute-difference form G = Σ|xi-xj| / (2n²x̄) — two
    independent routes that must agree."""
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT c.c_mktsegment,
               SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment, o.o_custkey
    """).fetchall()
    con.close()
    by_seg = {}
    for seg, cents in rows:
        by_seg.setdefault(seg, []).append(cents)
    got = {r.seg: r for r in
           QUERIES["gini_coefficient_revenue"](spark, sf_dir).collect()}
    assert set(got) == set(by_seg)
    for seg, xs in by_seg.items():
        x = np.sort(np.array(xs, dtype=np.float64))
        n = len(x)
        i = np.arange(1, n + 1)
        g_rank = 2 * (i * x).sum() / (n * x.sum()) - (n + 1) / n
        g_mad = np.abs(x[:, None] - x[None, :]).sum() / (2 * n * n * x.mean())
        assert abs(g_rank - g_mad) < 1e-9
        assert got[seg].n == n
        assert abs(got[seg].gini - g_rank) < 1e-4


def test_higher_moments_match_numpy(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT o_orderpriority, o_totalprice * 0.001 FROM orders").fetchall()
    con.close()
    by_grp = {}
    for g, z in rows:
        by_grp.setdefault(g, []).append(z)
    got = {r.grp: r for r in
           QUERIES["higher_moments_skew_kurtosis"](spark, sf_dir).collect()}
    assert set(got) == set(by_grp)
    for g, zs in by_grp.items():
        z = np.array(zs, dtype=np.float64)
        mu, sd = z.mean(), z.std()  # population sd
        g1 = (((z - mu) / sd) ** 3).mean()
        g2 = (((z - mu) / sd) ** 4).mean() - 3.0
        r = got[g]
        assert r.n == len(z)
        assert abs(r.mean_price - mu * 1000) < 1e-2 * max(1.0, mu * 1000)
        assert abs(r.sd_price - sd * 1000) < 1e-2 * max(1.0, sd * 1000)
        assert abs(r.skewness - g1) < 5e-3 * max(1.0, abs(g1))
        assert abs(r.excess_kurtosis - g2) < 5e-3 * max(1.0, abs(g2))


def test_mann_kendall_theil_sen_match_direct(spark, sf_dir):
    con = _con(sf_dir)
    y = np.array([r[0] for r in con.execute(
        "SELECT CAST(COUNT(*) AS BIGINT) FROM events "
        "GROUP BY CAST(ts AS DATE) ORDER BY CAST(ts AS DATE)").fetchall()],
        dtype=np.float64)
    con.close()
    n = len(y)
    s = 0
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            s += int(np.sign(y[j] - y[i]))
            slopes.append((y[j] - y[i]) / (j - i))
    # tie-corrected variance
    _, counts = np.unique(y, return_counts=True)
    var = (n * (n - 1) * (2 * n + 5)
           - sum(t * (t - 1) * (2 * t + 5) for t in counts)) / 18
    if s > 0:
        z = (s - 1) / math.sqrt(var)
    elif s < 0:
        z = (s + 1) / math.sqrt(var)
    else:
        z = 0.0
    slope = float(np.median(np.array(slopes)))
    r = QUERIES["mann_kendall_theil_sen"](spark, sf_dir).first()
    assert r.n_days == n
    assert r.mk_s == s
    assert abs(r.var_s - var) < 1e-3  # output rounded to 4dp
    assert abs(r.mk_z - z) < 1e-3
    assert abs(r.theil_sen_slope - slope) < 1e-3 * max(1.0, abs(slope))


def test_kendall_tau_blocked_matches_direct(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT c.c_mktsegment, date_trunc('month', o.o_orderdate) AS mo,
               o.o_orderkey, o.o_totalprice, c.c_acctbal
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """).fetchall()
    con.close()
    blocks = {}
    for seg, mo, k, x, yv in rows:
        blocks.setdefault((seg, mo), []).append((x, yv))
    agg = {}
    for (seg, _), vals in blocks.items():
        C = D = tx = ty = 0
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                dx = vals[i][0] - vals[j][0]
                dy = vals[i][1] - vals[j][1]
                if dx == 0 and dy == 0:
                    tx += 1
                    ty += 1
                elif dx == 0:
                    tx += 1
                elif dy == 0:
                    ty += 1
                elif (dx > 0) == (dy > 0):
                    C += 1
                else:
                    D += 1
        c0, d0, tx0, ty0 = agg.get(seg, (0, 0, 0, 0))
        agg[seg] = (c0 + C, d0 + D, tx0 + tx, ty0 + ty)
    got = {r.seg: r for r in
           QUERIES["kendall_tau_blocked"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for seg, (C, D, tx, ty) in agg.items():
        r = got[seg]
        assert (r.concordant, r.discordant) == (C, D)
        tau = (C - D) / math.sqrt((C + D + tx) * (C + D + ty))
        assert abs(r.kendall_tau_b - tau) < 1e-4


def test_did_estimate_matches_2x2_means(spark, sf_dir):
    con = _con(sf_dir)
    mid_us = con.execute(
        "SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 FROM events"
    ).fetchone()[0]
    first_is_signup = dict(con.execute("""
        SELECT user_id, FIRST(event_type ORDER BY ts, event_id) = 'signup'
        FROM events GROUP BY user_id
    """).fetchall())
    rows = con.execute("""
        SELECT user_id, epoch_us(ts) >= ?, event_type, value
        FROM events
    """, [mid_us]).fetchall()
    con.close()
    cells = {}  # (treated, post) -> [sum_rev, users]
    users_in_cell = {}
    for uid, post, etype, value in rows:
        key = (first_is_signup[uid], bool(post))
        users_in_cell.setdefault(key, set()).add(uid)
        if etype == "purchase":
            cells[key] = cells.get(key, 0.0) + round(value, 2)
    means = {k: cells.get(k, 0.0) / len(users_in_cell[k]) for k in users_in_cell}
    did = (means[(True, True)] - means[(True, False)]) \
        - (means[(False, True)] - means[(False, False)])
    r = QUERIES["difference_in_differences"](spark, sf_dir).first()
    assert abs(r.treated_pre - means[(True, False)]) < 0.02
    assert abs(r.treated_post - means[(True, True)]) < 0.02
    assert abs(r.control_pre - means[(False, False)]) < 0.02
    assert abs(r.control_post - means[(False, True)]) < 0.02
    assert abs(r.did_estimate - did) < 0.05


def test_elasticity_matches_numpy_ols(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS price_cents,
               SUM(CAST(ROUND(l.l_quantity) AS BIGINT)) AS qty
        FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        GROUP BY p.p_partkey, p.p_retailprice
    """).fetchall()
    con.close()
    x = np.log([pc for pc, q in rows if q > 0])
    y = np.log([q for _, q in rows if q > 0])
    slope, _ = np.polyfit(x, y, 1)
    ss_res = ((y - np.polyval(np.polyfit(x, y, 1), x)) ** 2).sum()
    r2 = 1 - ss_res / ((y - y.mean()) ** 2).sum()
    r = QUERIES["price_elasticity_loglog"](spark, sf_dir).first()
    assert r.n_parts == len(x)
    assert abs(r.elasticity - slope) < 5e-3 * max(1.0, abs(slope))
    assert abs(r.r_squared - r2) < 5e-3


def test_eb_shrinkage_posterior_means(spark, sf_dir):
    """Replicate the Beta method-of-moments prior and check every output
    row's shrunk rate equals (x+α)/(n+α+β)."""
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x,
               COUNT(*) AS n
        FROM events GROUP BY user_id
    """).fetchall()
    con.close()
    rates = np.array([x / n for x, n in rows])
    m, v = rates.mean(), rates.var()
    strength = m * (1 - m) / v - 1
    alpha, beta = strength * m, strength * (1 - m)
    got = QUERIES["empirical_bayes_shrinkage"](spark, sf_dir).collect()
    assert got
    for r in got:
        post = (r.purchases + alpha) / (r.n_events + alpha + beta)
        assert abs(r.shrunk_rate - post) < 1e-3
        # shrinkage moves toward the global mean, never past it
        lo, hi = sorted((r.raw_rate, m))
        assert lo - 1e-9 <= r.shrunk_rate <= hi + 1e-9
