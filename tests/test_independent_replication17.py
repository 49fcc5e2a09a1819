"""Seventeenth replication wave: connected components (union-find vs the
pointer-jumping engine), the exact 5-NN mutual graph, recommender
coverage/diversity, leaderboard churn, multiwindow SLO burn rates,
financial reconciliation on the decimal grid, the star join, TPC-H Q10,
Merkle zone fingerprints, and the join-key skew report — recomputed from
raw parquet in pure Python."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from datetime import date
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "nation", "region",
              "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _r(x: float, n: int) -> float:
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def _g(x: float) -> int:
    return int(math.floor(x + 0.5))


def _dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s = s + x * y
    return s


def _cos(a, b):
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


# ---------------------------------------------------------------------------
# graph_connected_components — union-find vs pointer jumping
# ---------------------------------------------------------------------------

def test_cc_union_find(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT DISTINCT l_suppkey, l_partkey + 100000000
        FROM lineitem WHERE l_quantity >= 49.5 AND l_discount >= 0.09
    """).fetchall()
    con.close()
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in rows:
        for x in (u, v):
            parent.setdefault(x, x)
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    clusters = defaultdict(list)
    for x in parent:
        clusters[find(x)].append(x)
    got = {r.cluster_id: r for r in
           QUERIES["graph_connected_components"](spark, sf_dir).collect()}
    assert set(got) == set(clusters)
    for cid, members in clusters.items():
        r = got[cid]
        assert r.n_nodes == len(members)
        assert r.n_suppliers == sum(1 for m in members if m < 100000000)
        assert r.n_parts == sum(1 for m in members if m >= 100000000)


# ---------------------------------------------------------------------------
# knn_graph_mutual — exact directed 5-NN with the mutual flag
# ---------------------------------------------------------------------------

def test_knn_mutual_exact(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    con.close()
    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    knn = {}
    for src, v in vecs.items():
        scored = sorted((-_cos(v, w), dst) for dst, w in vecs.items()
                        if dst != src)
        knn[src] = [(dst, -negc, rk + 1)
                    for rk, (negc, dst) in enumerate(scored[:5])]
    edge_set = {(s, d) for s, lst in knn.items() for d, _c, _rk in lst}
    got = {(r.src, r.dst): r for r in
           QUERIES["knn_graph_mutual"](spark, sf_dir).collect()}
    assert set(got) == edge_set
    for src, lst in knn.items():
        for dst, c, rk in lst:
            r = got[(src, dst)]
            assert r.rnk == rk
            assert r.cos_sim == _r(c, 6)
            assert r.is_mutual == ((dst, src) in edge_set)


# ---------------------------------------------------------------------------
# recsys_coverage_diversity — coverage + intra-list diversity
# ---------------------------------------------------------------------------

def test_recsys_coverage_and_ild(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    con.close()
    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    queries = {vid: v for vid, v in vecs.items() if vid < 10}
    corpus = {vid: v for vid, v in vecs.items() if vid >= 10}
    lists = {}
    for qid, qv in queries.items():
        scored = sorted((-_r(_cos(qv, v), 6), vid)
                        for vid, v in corpus.items())
        lists[qid] = [vid for _negc, vid in scored[:5]]
    recommended = {vid for lst in lists.values() for vid in lst}
    dists = []
    for qid, lst in lists.items():
        for i, a in enumerate(sorted(lst)):
            for b in sorted(lst)[i + 1:]:
                dists.append(_g((1.0 - _cos(vecs[a], vecs[b])) * 1e6))
    [r] = QUERIES["recsys_coverage_diversity"](spark, sf_dir).collect()
    assert r.n_recommended == len(recommended)
    assert r.n_catalog == len(corpus)
    assert r.catalog_coverage == _r(len(recommended) / len(corpus), 6)
    assert r.intra_list_diversity == _r(sum(dists) / 1e6 / len(dists), 6)


# ---------------------------------------------------------------------------
# topk_rank_churn — two yearly top-20s and their overlap
# ---------------------------------------------------------------------------

def test_topk_churn_jaccard(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o_custkey, CAST(o_orderdate AS DATE), o_totalprice FROM orders
        WHERE o_orderdate >= DATE '1999-01-01' AND o_orderdate < DATE '2001-01-01'
    """).fetchall()
    con.close()
    rev = {1: defaultdict(int), 2: defaultdict(int)}
    for ck, od, p in rows:
        period = 1 if od < date(2000, 1, 1) else 2
        rev[period][ck] += _g(float(p) * 100)
    tops = {}
    for period in (1, 2):
        ranked = sorted(rev[period].items(), key=lambda kv: (-kv[1], kv[0]))
        tops[period] = {ck for ck, _v in ranked[:20]}
    c = len(tops[1] & tops[2])
    [r] = QUERIES["topk_rank_churn"](spark, sf_dir).collect()
    assert r.k == 20
    assert r.n_stayed == c
    assert r.n_entered == 20 - c
    assert r.n_dropped == 20 - c
    assert r.jaccard_stability == _r(c / (40 - c), 6)


# ---------------------------------------------------------------------------
# slo_burn_rate_multiwindow — calendar windows, dual-window alert
# ---------------------------------------------------------------------------

def test_slo_burn_windows(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT CAST(ts AS DATE), value FROM events").fetchall()
    con.close()
    daily = defaultdict(lambda: [0, 0])
    for d, v in rows:
        daily[d][0] += 1
        if float(v) < 10:
            daily[d][1] += 1
    days = sorted(daily)
    got = {r.day: r for r in
           QUERIES["slo_burn_rate_multiwindow"](spark, sf_dir).collect()}
    assert set(got) == set(daily)
    for d in days:
        n1, e1 = daily[d]
        win7 = [daily[d2] for d2 in days if 0 <= (d - d2).days <= 6]
        n7 = sum(w[0] for w in win7)
        e7 = sum(w[1] for w in win7)
        b1 = e1 / n1 / 0.10
        b7 = e7 / n7 / 0.10
        r = got[d]
        assert r.burn_1d == _r(b1, 4)
        assert r.burn_7d == _r(b7, 4)
        assert r.page_alert == (b1 > 1.0 and b7 > 1.0)


# ---------------------------------------------------------------------------
# order_totals_reconciliation — decimal-grid pricing audit
# ---------------------------------------------------------------------------

def test_order_reconciliation_decimal(spark, sf_dir):
    con = _con(sf_dir)
    lines = con.execute("""
        SELECT l_orderkey, l_extendedprice, l_discount, l_tax FROM lineitem
    """).fetchall()
    orders = con.execute(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders").fetchall()
    con.close()
    derived = defaultdict(lambda: Decimal(0))
    for ok, p, d, t in lines:
        amt = (Decimal(repr(float(p)))
               * (1 - Decimal(repr(float(d))))
               * (1 + Decimal(repr(float(t)))))
        derived[ok] += amt.quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
    agg = defaultdict(lambda: [0, 0, Decimal(0), Decimal(0)])
    for ok, st, tot in orders:
        if ok not in derived:
            continue
        adiff = abs(Decimal(repr(float(tot))).quantize(Decimal("0.01"))
                    - derived[ok])
        a = agg[st]
        a[0] += 1
        if adiff <= Decimal("0.01"):
            a[1] += 1
        a[2] = max(a[2], adiff)
        a[3] += adiff
    got = {r.o_orderstatus: r for r in
           QUERIES["order_totals_reconciliation"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for st, (n, nrec, mx, sm) in agg.items():
        r = got[st]
        assert (r.n_orders, r.n_reconciled) == (n, nrec)
        assert r.max_abs_diff == _r(float(mx), 2)
        assert r.mean_abs_diff == _r(float(sm) / n, 2)


# ---------------------------------------------------------------------------
# star_join_revenue — all-dims-broadcast star rollup
# ---------------------------------------------------------------------------

def test_star_join_rollup(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT r.r_name, n.n_name, l.l_extendedprice, l.l_discount
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
    """).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0])
    for reg, nat, p, d in rows:
        a = agg[(reg, nat)]
        a[0] += 1
        a[1] += _g(float(p) * 100) * (100 - _g(float(d) * 100))
    got = {(r.region, r.nation): r for r in
           QUERIES["star_join_revenue"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for key, (n, units) in agg.items():
        r = got[key]
        assert r.n_lineitems == n
        assert r.revenue == _r(units / 10000.0, 4)


# ---------------------------------------------------------------------------
# tpch_q10_returned_items — returns revenue top-20
# ---------------------------------------------------------------------------

def test_q10_returned_items(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT c.c_custkey, c.c_name, n.n_name, l.l_extendedprice, l.l_discount
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= DATE '1996-10-01'
          AND o.o_orderdate < DATE '1997-01-01'
    """).fetchall()
    con.close()
    units = defaultdict(int)
    meta = {}
    for ck, name, nat, p, d in rows:
        units[ck] += _g(float(p) * 100) * _g(100 - 100 * float(d))
        meta[ck] = (name, nat)
    ranked = sorted(units.items(), key=lambda kv: (-kv[1], kv[0]))
    got = QUERIES["tpch_q10_returned_items"](spark, sf_dir).collect()
    assert len(got) == min(20, len(ranked))
    for r, (ck, u) in zip(got, ranked[:20]):
        assert r.c_custkey == ck
        assert (r.c_name, r.n_name) == meta[ck]
        assert r.revenue == _r(u / 10000.0, 2)


# ---------------------------------------------------------------------------
# table_fingerprint_merkle — order-independent zone hashes
# ---------------------------------------------------------------------------

def test_merkle_zone_hashes(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o_orderkey, o_custkey, o_totalprice,
               strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d')
        FROM orders""").fetchall()
    con.close()
    zones = defaultdict(lambda: [0, 0])
    for ok, ck, tot, ds in rows:
        canon = f"{ok}|{ck}|{_g(float(tot) * 100)}|{ds}"
        h = int(hashlib.md5(canon.encode()).hexdigest()[:15], 16)
        z = zones[ok // 1000]
        z[0] += 1
        z[1] += h
    got = {r.zone: r for r in
           QUERIES["table_fingerprint_merkle"](spark, sf_dir).collect()}
    assert set(got) == set(zones)
    for z, (n, s) in zones.items():
        r = got[z]
        assert r.n_rows == n
        assert r.content_hash == str(s)


# ---------------------------------------------------------------------------
# join_key_skew_report — hottest keys + skew factor
# ---------------------------------------------------------------------------

def test_join_key_skew(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("SELECT user_id FROM events").fetchall()
    con.close()
    counts = Counter(uid for (uid,) in rows)
    n_keys = len(counts)
    mx = max(counts.values())
    mean = sum(counts.values()) / n_keys
    top5 = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = sorted(QUERIES["join_key_skew_report"](spark, sf_dir).collect(),
                 key=lambda r: r.rnk)
    assert len(got) == 5
    for r, (rnk0, (uid, cnt)) in zip(got, enumerate(top5)):
        assert (r.user_id, r.cnt, r.rnk) == (uid, cnt, rnk0 + 1)
        assert r.n_keys == n_keys
        assert r.max_cnt == mx
        assert r.mean_cnt == _r(mean, 4)
        assert r.skew_factor == _r(mx / mean, 4)
