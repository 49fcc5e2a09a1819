"""Tenth replication wave (round-6 judge item 8): the top risk-ranked
queries from tools/replication_coverage.py that had no independent
replication — per-group OLS, exact percentile SLOs, winsorized means,
rolling z-scores, equi-depth histograms, seasonal anomaly composition,
EWMA taps, global/personalized PageRank, and WL refinement — each
recomputed from raw parquet in numpy/pure Python with no shared algebra
(DuckDB is used only to FETCH raw rows; every statistic is re-derived
here from first principles or an independent solver).
"""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb
import numpy as np

from quantum_rag_data_pipeline_spark.queries import QUERIES

_EDGES_SQL = """
    WITH sup AS (
      SELECT l_partkey FROM lineitem
      GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) >= 8
    ),
    items AS (
      SELECT DISTINCT l.l_orderkey, l.l_partkey
      FROM lineitem l JOIN sup USING (l_partkey)
    )
    SELECT a.l_partkey AS u, b.l_partkey AS v, COUNT(*) AS co
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _r(x: float, n: int) -> float:
    """Spark's ROUND on DOUBLE: half-up on the shortest decimal
    representation (repr) — replicated via Decimal so .5 boundaries
    round the same way, not numpy's half-even."""
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# group_trend_ols — independent solver (np.polyfit QR path), not the
# closed-form sufficient sums the query and oracle both use.
# ---------------------------------------------------------------------------

def test_group_trend_ols_vs_polyfit(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o_orderpriority,
               date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)),
               o_totalprice
        FROM orders""").fetchall()
    con.close()
    pts = defaultdict(lambda: ([], []))
    for pri, x, y in rows:
        pts[pri][0].append(float(x))
        pts[pri][1].append(float(y))
    got = {r.o_orderpriority: r
           for r in QUERIES["group_trend_ols"](spark, sf_dir).collect()}
    assert set(got) == set(pts)
    for pri, (xs, ys) in pts.items():
        slope, intercept = np.polyfit(np.array(xs), np.array(ys), 1)
        r = got[pri]
        assert r.n_points == len(xs)
        # rounded outputs vs an independent least-squares solver: agree
        # to well under one rounding ulp of slack
        assert abs(r.slope - slope) < 1e-3, pri
        assert abs(r.intercept - intercept) < 5e-2, pri


# ---------------------------------------------------------------------------
# latency_percentile_slo — exact order statistics from a sorted list
# ---------------------------------------------------------------------------

def test_latency_percentiles_from_sorted_lists(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o.o_orderpriority,
               date_diff('day', CAST(o.o_orderdate AS DATE),
                         CAST(l.l_shipdate AS DATE)),
               l.l_orderkey, l.l_linenumber
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    """).fetchall()
    con.close()
    per = defaultdict(list)
    for pri, days, ok, ln in rows:
        per[pri].append((days, ok, ln))
    got = {r.o_orderpriority: r
           for r in QUERIES["latency_percentile_slo"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for pri, triples in per.items():
        triples.sort()
        n = len(triples)
        days = [t[0] for t in triples]
        r = got[pri]
        assert r.n_lines == n
        assert r.p50 == days[(n + 1) // 2 - 1]
        # the 0.90*n float product is the shared IEEE op all engines
        # compute identically (DETERMINISM.md rule 3)
        assert r.p90 == days[math.ceil(0.90 * n) - 1]
        assert r.p99 == days[math.ceil(0.99 * n) - 1]


# ---------------------------------------------------------------------------
# winsorized_robust_stats — percentiles + clipping from first principles
# ---------------------------------------------------------------------------

def test_winsorized_mean_first_principles(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT o_orderpriority, o_totalprice FROM orders").fetchall()
    con.close()
    per = defaultdict(list)
    for pri, v in rows:
        per[pri].append(float(v))

    def q_cont(sorted_vals, q):
        pos = q * (len(sorted_vals) - 1)
        f = math.floor(pos)
        lo = sorted_vals[f]
        hi = sorted_vals[min(f + 1, len(sorted_vals) - 1)]
        return lo + (hi - lo) * (pos - f)

    got = {r.o_orderpriority: r
           for r in QUERIES["winsorized_robust_stats"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for pri, vals in per.items():
        vals.sort()
        p01, p99 = q_cont(vals, 0.01), q_cont(vals, 0.99)
        clipped = [min(max(v, p01), p99) for v in vals]
        n_clip = sum(1 for v in vals if v < p01 or v > p99)
        # the engine casts each clipped value to DECIMAL(30,4) before the
        # exact sum — replicate as ten-thousandths ints
        total = sum(int(Decimal(repr(c)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP).scaleb(4)) for c in clipped)
        mean = _r(float(Decimal(total).scaleb(-4)) / len(vals), 2)
        r = got[pri]
        assert r.n_rows == len(vals)
        assert r.n_clipped == n_clip, pri
        assert abs(r.winsorized_mean - mean) < 2e-2, pri


# ---------------------------------------------------------------------------
# rolling_zscore_anomaly — trailing-7 z from integer-cent sums
# ---------------------------------------------------------------------------

def test_rolling_zscore_trailing_window(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT CAST(o_orderdate AS DATE), o_totalprice FROM orders
    """).fetchall()
    con.close()
    cents = defaultdict(int)
    for day, v in rows:
        cents[day] += int(math.floor(float(v) * 100 + 0.5))
    days = sorted(cents)
    totals = [cents[d] for d in days]  # exact integer cents
    got = {r.day: r for r in
           QUERIES["rolling_zscore_anomaly"](spark, sf_dir).collect()}
    expect_days = set()
    for i in range(7, len(days)):
        window = totals[i - 7:i]
        s1c, s2c = sum(window), sum(w * w for w in window)  # exact ints
        t = totals[i] / 100.0
        s1, s2 = s1c / 100.0, s2c / 10000.0
        z = (t - s1 / 7) / math.sqrt((s2 - s1 * s1 / 7) / 6)
        expect_days.add(days[i])
        r = got[days[i]]
        assert abs(r.total - t) < 1e-6
        assert abs(r.z - z) < 2e-6, days[i]
        assert r.is_anomaly == (1 if abs(z) > 2 else 0)
    assert set(got) == expect_days


# ---------------------------------------------------------------------------
# equidepth_histogram_stats — global rank from one sorted list
# ---------------------------------------------------------------------------

def test_equidepth_buckets_exact(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT l_extendedprice, l_orderkey, l_linenumber FROM lineitem
    """).fetchall()
    con.close()
    rows.sort()
    n = len(rows)
    buckets = defaultdict(list)
    for rk, (price, _ok, _ln) in enumerate(rows):
        buckets[math.floor(rk * 16.0 / n) + 1].append(price)
    got = {r.bucket: r for r in
           QUERIES["equidepth_histogram_stats"](spark, sf_dir).collect()}
    assert set(got) == set(buckets)
    for b, vals in buckets.items():
        assert got[b].n_rows == len(vals)
        assert got[b].lo == min(vals)
        assert got[b].hi == max(vals)


# ---------------------------------------------------------------------------
# seasonal_adjusted_anomalies — full pipeline in ten-thousandths ints
# ---------------------------------------------------------------------------

def test_seasonal_adjusted_anomaly_pipeline(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT CAST(o_orderdate AS DATE), o_totalprice FROM orders").fetchall()
    con.close()
    cents = defaultdict(int)
    for day, v in rows:
        cents[day] += int(math.floor(float(v) * 100 + 0.5))
    days = sorted(cents)
    # trend: mean revenue over calendar days within +-3 present in data
    dt4 = {}  # day -> detrended, ten-thousandths int
    for d in days:
        win = [cents[d2] for d2 in days if abs((d2 - d).days) <= 3]
        trend = _r(sum(win) / 100.0 / len(win), 4)
        dt = _r(cents[d] / 100.0 - trend, 4)
        dt4[d] = int(Decimal(repr(dt)).scaleb(4).to_integral_value())
    # weekday seasonal index over the detrended series
    by_wd = defaultdict(list)
    for d in days:
        by_wd[d.isoweekday()].append(dt4[d])
    seas4 = {wd: int(Decimal(repr(_r(sum(v) / 10000.0 / len(v), 4)))
                     .scaleb(4).to_integral_value())
             for wd, v in by_wd.items()}
    resid4 = {d: int(Decimal(repr(_r((dt4[d] - seas4[d.isoweekday()]) / 10000.0,
                                     4))).scaleb(4).to_integral_value())
              for d in days}
    n = len(days)
    med = sorted(resid4.values())[(n + 1) // 2 - 1]
    ad4 = {d: abs(r - med) for d, r in resid4.items()}
    mad = sorted(ad4.values())[(n + 1) // 2 - 1]
    expected = {d: (_r(resid4[d] / 10000.0, 2), True)
                for d in days if ad4[d] > 3 * mad}
    got = {r.day: (r.residual, r.is_anomaly) for r in
           QUERIES["seasonal_adjusted_anomalies"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# ewma_event_smoothing — 8-tap weights over each user's event tail
# ---------------------------------------------------------------------------

def test_ewma_last_event_taps(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT user_id, event_id, epoch_ns(ts), value FROM events
    """).fetchall()
    con.close()
    per = defaultdict(list)
    for uid, eid, ts, val in rows:
        per[uid].append((ts, eid, float(val)))
    w = [0.3 * 0.7 ** j for j in range(8)]
    got = {r.user_id: r for r in
           QUERIES["ewma_event_smoothing"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for uid, evs in per.items():
        evs.sort()
        tail = [v for _, _, v in evs][::-1][:8]  # latest first
        num = sum(w[j] * tail[j] for j in range(len(tail)))
        den = sum(w[j] for j in range(len(tail)))
        r = got[uid]
        assert r.event_id == evs[-1][1]
        assert abs(r.ewma_value - num / den) < 2e-6, uid


# ---------------------------------------------------------------------------
# pagerank_copurchase — float64 power iteration vs the decimal-grid run
# ---------------------------------------------------------------------------

def test_pagerank_float_replication(spark, sf_dir):
    con = _con(sf_dir)
    pairs = con.execute(_EDGES_SQL).fetchall()
    con.close()
    adj = defaultdict(list)
    for u, v, _co in pairs:
        adj[u].append(v)
        adj[v].append(u)
    nodes = sorted(adj)
    n = len(nodes)
    pr = {x: 1.0 / n for x in nodes}
    for _ in range(2):
        mass = defaultdict(float)
        for x in nodes:
            share = pr[x] / len(adj[x])
            for y in adj[x]:
                mass[y] += share
        pr = {x: 0.15 / n + 0.85 * mass[x] for x in nodes}
    top = sorted(nodes, key=lambda x: (-pr[x], x))[:20]
    got = QUERIES["pagerank_copurchase"](spark, sf_dir).collect()
    assert [r.node for r in got] == top or {r.node for r in got} == set(top)
    for r in got:
        # decimal-grid (1e-12 per contribution) vs float64: identical to
        # well inside the query's 6-dp rounding
        assert abs(r.pr - pr[r.node]) < 1e-6, r.node


# ---------------------------------------------------------------------------
# personalized_pagerank_seeds — exact integer nano-unit ledger
# ---------------------------------------------------------------------------

def test_ppr_integer_ledger(spark, sf_dir):
    con = _con(sf_dir)
    pairs = con.execute(_EDGES_SQL).fetchall()
    con.close()
    adj = defaultdict(list)
    for u, v, _co in pairs:
        adj[u].append(v)
        adj[v].append(u)
    deg = {x: len(nbrs) for x, nbrs in adj.items()}
    seeds = set(sorted(deg, key=lambda x: (-deg[x], x))[:3])
    pr = {x: (333333333 if x in seeds else 0) for x in adj}
    for _ in range(2):
        mass = defaultdict(int)
        for x in adj:
            share = pr[x] // deg[x]  # exact floor division
            for y in adj[x]:
                mass[y] += share
        pr = {x: (15 * (333333333 if x in seeds else 0) + 85 * mass[x]) // 100
              for x in adj}
    top = sorted(adj, key=lambda x: (-pr[x], x))[:15]
    got = QUERIES["personalized_pagerank_seeds"](spark, sf_dir).collect()
    assert [r.node for r in got] == top
    for r in got:
        assert r.ppr == pr[r.node] / 1000000000.0  # exact: both pure int
        assert r.is_seed == (r.node in seeds)


# ---------------------------------------------------------------------------
# wl_node_signatures — md5 color refinement, exact class counts
# ---------------------------------------------------------------------------

def test_wl_refinement_classes(spark, sf_dir):
    con = _con(sf_dir)
    pairs = con.execute(_EDGES_SQL).fetchall()
    con.close()
    adj = defaultdict(list)
    for u, v, _co in pairs:
        adj[u].append(v)
        adj[v].append(u)

    def md5(s: str) -> str:
        return hashlib.md5(s.encode()).hexdigest()

    sig = {x: md5(str(len(nbrs))) for x, nbrs in adj.items()}
    counts = [len(set(sig.values()))]
    for _ in range(2):
        nxt = {}
        for x in adj:
            nbr = md5("|".join(sorted(sig[y] for y in adj[x])))
            nxt[x] = md5(sig[x] + ":" + nbr)
        sig = nxt
        counts.append(len(set(sig.values())))
    [r] = QUERIES["wl_node_signatures"](spark, sf_dir).collect()
    assert r.n_nodes == len(adj)
    assert (r.classes_r0, r.classes_r1, r.classes_r2) == tuple(counts)
    assert r.refinement_monotone == (counts[0] <= counts[1] <= counts[2])
