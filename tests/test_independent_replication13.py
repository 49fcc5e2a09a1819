"""Thirteenth replication wave: TPC-H Q3/Q5 revenue on the integer
percent grid, Murphy's Brier decomposition, HITS hubs/authorities
(decimal-grid walk), KS drift, dyadic decayed popularity, multi-agg
pivot, and the equi-width histogram — recomputed from raw parquet in
pure Python."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "supplier", "nation",
              "region", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _r(x: float, n: int) -> float:
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def _rd(x: float, n: int) -> Decimal:
    """Same rounding, kept as Decimal for exact downstream sums."""
    return Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP)


def _g(x: float) -> int:
    return int(math.floor(x + 0.5))


# ---------------------------------------------------------------------------
# TPC-H Q3 — revenue in cent·percent integer units
# ---------------------------------------------------------------------------

def test_q3_shipping_priority(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority,
               l.l_extendedprice, l.l_discount
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < DATE '1998-03-15'
          AND l.l_shipdate > DATE '1998-03-15'
    """).fetchall()
    con.close()
    units = defaultdict(int)  # cent·percent, exact
    meta = {}
    for ok, od, pri, price, disc in rows:
        units[ok] += _g(float(price) * 100) * _g(100 - 100 * float(disc))
        meta[ok] = (od, pri)
    ranked = sorted(units.items(), key=lambda kv: (-kv[1], meta[kv[0]][0], kv[0]))
    got = QUERIES["tpch_q3_shipping_priority"](spark, sf_dir).collect()
    assert len(got) == min(10, len(ranked))
    for r, (ok, u) in zip(got, ranked[:10]):
        assert r.l_orderkey == ok
        assert (r.o_orderdate, r.o_orderpriority) == meta[ok]
        assert r.revenue == _r(u / 10000.0, 2)


# ---------------------------------------------------------------------------
# TPC-H Q5 — six-way join with the local-supplier correlation predicate
# ---------------------------------------------------------------------------

def test_q5_local_supplier_volume(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT n.n_name, l.l_extendedprice, l.l_discount
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
                       AND c.c_nationkey = s.s_nationkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= DATE '1996-01-01'
          AND o.o_orderdate < DATE '1997-01-01'
    """).fetchall()
    con.close()
    units = defaultdict(int)
    for name, price, disc in rows:
        units[name] += _g(float(price) * 100) * _g(100 - 100 * float(disc))
    got = QUERIES["tpch_q5_local_supplier_volume"](spark, sf_dir).collect()
    assert {r.n_name for r in got} == set(units)
    revs = [r.revenue for r in got]
    assert revs == sorted(revs, reverse=True)
    for r in got:
        assert r.revenue == _r(units[r.n_name] / 10000.0, 2)


# ---------------------------------------------------------------------------
# brier_score_decomposition — REL/RES/UNC from per-user halves
# ---------------------------------------------------------------------------

def test_brier_murphy_decomposition(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT user_id, epoch_us(ts), event_type FROM events").fetchall()
    con.close()
    ts_all = [t for _, t, _ in rows]
    mid = (min(ts_all) + max(ts_all)) // 2
    per = defaultdict(lambda: [0, 0, 0])  # x1, n1, o
    for uid, t, et in rows:
        a = per[uid]
        if t < mid:
            a[1] += 1
            if et == "purchase":
                a[0] += 1
        elif et == "purchase":
            a[2] = 1
    scored = [(x1 / n1, o) for x1, n1, o in per.values() if n1 > 0]
    n = len(scored)
    so_all = sum(o for _, o in scored)
    sq = float(sum(_rd((f - o) * (f - o), 9) for f, o in scored))
    bins = defaultdict(lambda: [0, Decimal(0), 0])
    for f, o in scored:
        b = bins[int(math.floor(f * 10))]
        b[0] += 1
        b[1] += _rd(f, 9)
        b[2] += o
    rel = res = Decimal(0)
    ybar = so_all / n
    for nk, sf, so in bins.values():
        fk = float(sf) / nk
        ok = so / nk
        rel += _rd(nk * (fk - ok) * (fk - ok), 9)
        res += _rd(nk * (ok - ybar) * (ok - ybar), 9)
    [r] = QUERIES["brier_score_decomposition"](spark, sf_dir).collect()
    assert r.n_users == n
    assert r.brier_score == _r(sq / n, 6)
    assert r.reliability == _r(float(rel) / n, 6)
    assert r.resolution == _r(float(res) / n, 6)
    assert r.uncertainty == _r(ybar * (1.0 - ybar), 6)


# ---------------------------------------------------------------------------
# hits_hubs_authorities — two power iterations on the 12-dp decimal grid
# ---------------------------------------------------------------------------

def test_hits_decimal_grid_walk(spark, sf_dir):
    con = _con(sf_dir)
    pairs = con.execute("""
        SELECT DISTINCT o.o_custkey, l.l_partkey
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE l.l_partkey % 7 = 0
    """).fetchall()
    con.close()
    by_auth = defaultdict(list)
    by_hub = defaultdict(list)
    for hub, auth in pairs:
        by_auth[auth].append(hub)
        by_hub[hub].append(auth)
    a_raw = {auth: float(len(hubs)) for auth, hubs in by_auth.items()}
    s = float(sum(int(v) for v in a_raw.values()))
    a1 = {auth: _rd(v / s, 12) for auth, v in a_raw.items()}
    h_raw = {hub: sum(a1[auth] for auth in auths)  # exact decimal sum
             for hub, auths in by_hub.items()}
    sh = float(sum(h_raw.values()))
    h1 = {hub: _rd(float(v) / sh, 12) for hub, v in h_raw.items()}
    a2_raw = {auth: sum(h1[hub] for hub in hubs)
              for auth, hubs in by_auth.items()}
    sa = float(sum(a2_raw.values()))
    a2 = {auth: _r(float(v) / sa, 12) for auth, v in a2_raw.items()}
    top = sorted(a2, key=lambda k: (-a2[k], k))[:15]
    got = QUERIES["hits_hubs_authorities"](spark, sf_dir).collect()
    assert [r.part_key for r in got] == top
    for r in got:
        assert abs(r.authority_permille - a2[r.part_key] * 1000.0) < 1e-8


# ---------------------------------------------------------------------------
# ks_drift_detection — two-sample ECDF max gap
# ---------------------------------------------------------------------------

def test_ks_two_sample(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("SELECT source, n_chars FROM documents").fetchall()
    con.close()
    a = sorted(x for s, x in rows if s in {"src0", "src1", "src2", "src3", "src4"})
    b = sorted(x for s, x in rows if s not in {"src0", "src1", "src2", "src3", "src4"})
    na, nb = float(len(a)), float(len(b))
    import bisect
    ks = 0.0
    for x in set(a) | set(b):
        fa = bisect.bisect_right(a, x) / na
        fb = bisect.bisect_right(b, x) / nb
        ks = max(ks, abs(fa - fb))
    crit = 1.358 * math.sqrt(na + nb) / math.sqrt(na * nb)
    [r] = QUERIES["ks_drift_detection"](spark, sf_dir).collect()
    assert r.ks_stat == _r(ks, 6)
    assert r.drifted == (ks > crit)


# ---------------------------------------------------------------------------
# decayed_popularity_ranking — exact dyadic half-life weights
# ---------------------------------------------------------------------------

def test_decayed_popularity_dyadic(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT l.l_partkey, CAST(o.o_orderdate AS DATE)
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    """).fetchall()
    con.close()
    end_day = max(d for _, d in rows)
    score = defaultdict(int)
    n_sales = Counter()
    for pk, d in rows:
        h = min(19, (end_day - d).days // 28)
        score[pk] += 1048576 >> h
        n_sales[pk] += 1
    top = sorted(score, key=lambda k: (-score[k], k))[:15]
    got = QUERIES["decayed_popularity_ranking"](spark, sf_dir).collect()
    assert [r.l_partkey for r in got] == top
    for rk, r in enumerate(got, start=1):
        assert r.rk == rk
        assert r.decayed_score == score[r.l_partkey] / 1048576.0
        assert r.n_lifetime_sales == n_sales[r.l_partkey]


# ---------------------------------------------------------------------------
# pivot_multi_agg — CASE-projection hash aggregate
# ---------------------------------------------------------------------------

def test_pivot_multi_agg_cells(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem").fetchall()
    con.close()
    cells = defaultdict(lambda: [0, 0])  # (flag, status) -> [qty_cents, n]
    for fl, st, q in rows:
        c = cells[(fl, st)]
        c[0] += _g(float(q) * 100)
        c[1] += 1
    got = {r.l_returnflag: r for r in
           QUERIES["pivot_multi_agg"](spark, sf_dir).collect()}
    flags = {fl for fl, _st in cells}
    assert set(got) == flags
    for fl in flags:
        r = got[fl]
        for st, (sq_col, n_col) in (("F", ("F_sum_qty", "F_n_rows")),
                                    ("O", ("O_sum_qty", "O_n_rows"))):
            cents, cnt = cells.get((fl, st), (0, 0))
            if cnt == 0:
                assert getattr(r, sq_col) is None
            else:
                assert getattr(r, sq_col) == _r(cents / 100.0, 2)
            assert getattr(r, n_col) == cnt


# ---------------------------------------------------------------------------
# equiwidth_histogram_stats — 16 fixed-width buckets from one min/max
# ---------------------------------------------------------------------------

def test_equiwidth_buckets(spark, sf_dir):
    con = _con(sf_dir)
    vals = [float(v) for (v,) in con.execute(
        "SELECT l_extendedprice FROM lineitem").fetchall()]
    con.close()
    lo, hi = min(vals), max(vals)
    per = defaultdict(list)
    for v in vals:
        b = min(int(math.floor((v - lo) * 16.0 / (hi - lo + 1e-9))), 15)
        per[b].append(v)
    got = {r.bucket: r for r in
           QUERIES["equiwidth_histogram_stats"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for b, vs in per.items():
        r = got[b]
        assert r.n_rows == len(vs)
        assert r.lo_seen == _r(min(vs), 2)
        assert r.hi_seen == _r(max(vs), 2)
