"""Fourth replication wave: the FULL Hurst R/S pipeline (the query fixed
this round — this is the recomputation that would have caught the /w
bug), CUSUM's prefix-sum form vs the literal sequential recursion,
Holt/Brown's truncated kernel vs the true recursion, PSI, SPRT
trajectory, Simpson's strata, and the rich-club coefficient."""

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


def _hourly_series(con):
    """Zero-filled hourly counts from the first to last hour."""
    rows = con.execute("""
        SELECT date_trunc('hour', ts) AS hr, CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1 ORDER BY 1
    """).fetchall()
    from datetime import timedelta

    h0, h1 = rows[0][0], rows[-1][0]
    n = int((h1 - h0).total_seconds() // 3600) + 1
    y = np.zeros(n)
    for hr, c in rows:
        y[int((hr - h0).total_seconds() // 3600)] = c
    return y


def test_hurst_full_rs_replication(spark, sf_dir):
    """Textbook rescaled-range: for each window size w, split into
    blocks, R = range of mean-adjusted cumulative deviations, S =
    population sd, average R/S per w, H = log-log OLS slope. This is
    the external recomputation that catches scaling bugs like the
    doubled /w fixed in round 5 (pre-fix this test would read H-1)."""
    con = _con(sf_dir)
    y = _hourly_series(con)
    con.close()
    pts = []
    for w in (24, 72, 168):
        rs_vals = []
        for b in range(len(y) // w):
            blk = y[b * w:(b + 1) * w]
            dev = np.cumsum(blk - blk.mean())
            r = dev.max() - dev.min()
            s = blk.std()
            if s > 0:
                rs_vals.append(r / s)
        pts.append((math.log(w), math.log(np.mean(rs_vals))))
    xs = np.array([p[0] for p in pts])
    ys = np.array([p[1] for p in pts])
    h = np.polyfit(xs, ys, 1)[0]
    r = QUERIES["hurst_exponent_rs"](spark, sf_dir).first()
    assert r.n_window_sizes == 3
    assert abs(r.hurst_h - h) < 5e-3


def test_cusum_prefix_form_equals_sequential_recursion(spark, sf_dir):
    """The query claims S_t = P_t - min(0, min_j<=t P_j) == the textbook
    max(0, S_{t-1} + dev_t); replication runs the literal recursion."""
    con = _con(sf_dir)
    daily = con.execute("""
        SELECT CAST(ts AS DATE) AS day,
               ROUND(SUM(CAST(value AS DECIMAL(30,2))) / COUNT(*), 4) AS x
        FROM events GROUP BY 1 ORDER BY 1
    """).fetchall()
    con.close()
    x = np.array([float(r[1]) for r in daily])
    mu = round(x.sum() / len(x), 4)
    dv = np.round(x - mu, 4)
    s = 0.0
    seq = []
    for d in dv:
        s = max(0.0, s + d)
        seq.append(s)
    got = {r.day: r for r in
           QUERIES["cusum_changepoint_detection"](spark, sf_dir).collect()}
    days = [r[0] for r in daily]
    assert sorted(got) == sorted(days)
    for day, expect in zip(days, seq):
        assert abs(got[day].cusum_stat - expect) < 1e-3, day


def test_holt_brown_kernel_tracks_true_recursion(spark, sf_dir):
    """The 12-tap truncated kernel approximates the exact recursion
    S1_t = a*y_t + (1-a)*S1_{t-1} (a=0.3, S1_0 = y_0). Truncation tail
    is 0.7^12 ≈ 1.4% of mass — the query's numbers must track the true
    recursion within a few percent or the kernel is mis-built."""
    con = _con(sf_dir)
    y = np.array([r[0] for r in con.execute(
        "SELECT CAST(COUNT(*) AS DOUBLE) FROM events "
        "GROUP BY CAST(ts AS DATE) ORDER BY CAST(ts AS DATE)").fetchall()])
    con.close()
    a = 0.3
    s1 = y[0]
    s1_series = [s1]
    for v in y[1:]:
        s1 = a * v + (1 - a) * s1
        s1_series.append(s1)
    s2 = s1_series[0]
    for v in s1_series[1:]:
        s2 = a * v + (1 - a) * s2
    s1 = s1_series[-1]
    level = 2 * s1 - s2
    trend = a / (1 - a) * (s1 - s2)
    r = QUERIES["holt_brown_double_smoothing"](spark, sf_dir).first()
    tol = 0.05
    assert abs(r.s1 - s1) < tol * max(1.0, abs(s1))
    assert abs(r.level - level) < tol * max(1.0, abs(level))
    assert abs(r.forecast_h1 - (level + trend)) < tol * max(1.0, abs(level))


def test_psi_matches_direct_binning(spark, sf_dir):
    con = _con(sf_dir)
    mid_us = con.execute(
        "SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 FROM events"
    ).fetchone()[0]
    rows = con.execute("""
        SELECT epoch_us(ts) < ? AS ref,
               LEAST(9, GREATEST(0, CAST(FLOOR(value / 10.0) AS INT))) AS bin
        FROM events
    """, [mid_us]).fetchall()
    con.close()
    cr = np.ones(10)
    cc = np.ones(10)  # Laplace +1
    for ref, b in rows:
        (cr if ref else cc)[b] += 1
    pr, pc = cr / cr.sum(), cc / cc.sum()
    psi = float(((pr - pc) * np.log(pr / pc)).sum())
    r = QUERIES["psi_drift_monitor"](spark, sf_dir).first()
    assert r.n_bins == 10
    assert abs(r.psi - psi) < 1e-4
    assert r.stable_population == (psi < 0.1)


def test_sprt_trajectory_matches_cumulative_llr(spark, sf_dir):
    con = _con(sf_dir)
    daily = con.execute("""
        SELECT CAST(ts AS DATE) AS day,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x,
               COUNT(*) AS n
        FROM events GROUP BY 1 ORDER BY 1
    """).fetchall()
    con.close()
    llr = 0.0
    a = math.log(19)
    got = {r.day: r for r in
           QUERIES["sprt_sequential_test"](spark, sf_dir).collect()}
    for day, x, n in daily:
        llr += x * math.log(0.22 / 0.18) + (n - x) * math.log(0.78 / 0.82)
        r = got[day]
        assert (r.purchases, r.trials) == (x, n)
        assert abs(r.cum_llr - llr) < 1e-3
        expect = ("accept_h1" if llr >= a else
                  "accept_h0" if llr <= -a else "continue")
        assert r.decision == expect, (day, r.decision, llr)


def test_simpsons_rates_match_direct_strata(spark, sf_dir):
    """Replicate per-user tertiles (ntile by n_events, user_id) and the
    clicky split, then check pooled + per-stratum rates."""
    con = _con(sf_dir)
    users = con.execute("""
        SELECT user_id, COUNT(*) AS n,
               SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS purch,
               SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS clicks
        FROM events GROUP BY user_id ORDER BY n, user_id
    """).fetchall()
    con.close()
    k = len(users)
    # ntile(3): first ceil splits
    sizes = [(k + 2) // 3, (k + 1) // 3, k // 3]
    strata = []
    idx = 0
    for s_no, sz in enumerate(sizes, start=1):
        for _ in range(sz):
            strata.append(s_no)
            idx += 1
    cells = {}
    for (uid, n, purch, clicks), s_no in zip(users, strata):
        grp = 1 if clicks * 5 >= n else 0
        for scope in ("pooled", f"stratum_{s_no}"):
            c = cells.setdefault((scope, grp), [0, 0])
            c[0] += purch
            c[1] += n
    rows = QUERIES["simpsons_paradox_detector"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        key = r.scope if r.scope == "pooled" else r.scope
        hi = cells[(key, 1)]
        lo = cells[(key, 0)]
        assert abs(r.purchase_rate_clicky - hi[0] / hi[1]) < 1e-6, r.scope
        assert abs(r.purchase_rate_other - lo[0] / lo[1]) < 1e-6, r.scope


def test_rich_club_phi_matches_direct_count(spark, sf_dir):
    """Recompute the co-purchase graph (distinct part pairs sharing an
    order), degrees, and φ(k) = club edges / C(n_k, 2)."""
    con = _con(sf_dir)
    # the co-purchase graph's construction filters (support >= 8 orders
    # per part, co-occurrence count >= 2 per pair) are part of the
    # operator's contract — replicate them, then count independently
    pairs = con.execute("""
        WITH sup AS (
          SELECT l_partkey FROM lineitem
          GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) >= 8
        ),
        items AS (
          SELECT DISTINCT l.l_orderkey, l.l_partkey
          FROM lineitem l JOIN sup USING (l_partkey)
        )
        SELECT a.l_partkey, b.l_partkey
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """).fetchall()
    con.close()
    deg = {}
    for u, v in pairs:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    got = {r.k: r for r in
           QUERIES["rich_club_coefficient"](spark, sf_dir).collect()}
    for k in (2, 4, 8):
        club = {n for n, d in deg.items() if d > k}
        e_k = sum(1 for u, v in pairs if u in club and v in club)
        n_k = len(club)
        r = got[k]
        assert r.club_size == n_k
        assert r.club_edges == e_k
        phi = 2 * e_k / (n_k * (n_k - 1)) if n_k > 1 else 0.0
        assert abs(r.phi - phi) < 1e-4
