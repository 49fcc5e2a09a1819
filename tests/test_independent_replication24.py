"""Twenty-fourth replication wave: distribution window functions,
rank/lag/lead, the top-N-plus-OTHER rollup, ordered array aggregation,
bag-vs-set multiset ops, the decorrelated correlated subquery, and
best-snippet windows — recomputed from raw parquet in pure Python."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "region", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _r(x: float, n: int) -> float:
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def _g(x: float) -> int:
    return int(math.floor(x + 0.5))


def _ntile(order, k):
    n = len(order)
    base, extra = divmod(n, k)
    out = {}
    i = 0
    for tile in range(1, k + 1):
        size = base + (1 if tile <= extra else 0)
        for key in order[i:i + size]:
            out[key] = tile
        i += size
    return out


# ---------------------------------------------------------------------------
# window_rank_distribution — ntile / percent_rank / cume_dist
# ---------------------------------------------------------------------------

def test_distribution_windows(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT c_custkey, c_acctbal FROM customer").fetchall()
    con.close()
    bal = {ck: float(b) for ck, b in rows}
    n = len(bal)
    deciles = _ntile(sorted(bal, key=lambda ck: (-bal[ck], ck)), 10)
    vals = sorted(bal.values())
    import bisect
    got = {r.c_custkey: r for r in
           QUERIES["window_rank_distribution"](spark, sf_dir).collect()}
    assert set(got) == set(bal)
    for ck, b in bal.items():
        r = got[ck]
        assert r.decile == deciles[ck]
        rank = bisect.bisect_left(vals, b) + 1  # ties share the min rank
        assert r.pr == _r((rank - 1) / (n - 1), 6)
        assert r.cd == _r(bisect.bisect_right(vals, b) / n, 6)


# ---------------------------------------------------------------------------
# rank_lag_lead — per-customer analytic functions
# ---------------------------------------------------------------------------

def test_rank_lag_lead(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice
        FROM orders""").fetchall()
    con.close()
    per = defaultdict(list)
    for ck, ok, od, p in rows:
        per[ck].append((od, ok, float(p)))
    expected = {}
    for ck, orders in per.items():
        orders.sort(key=lambda t: (t[0], t[1]))
        prices_desc = sorted((p for _od, _ok, p in orders), reverse=True)
        import bisect
        neg = [-p for p in prices_desc]
        for i, (od, ok, p) in enumerate(orders):
            price_rank = bisect.bisect_left(neg, -p) + 1
            prev_p = orders[i - 1][2] if i > 0 else None
            next_p = orders[i + 1][2] if i < len(orders) - 1 else None
            expected[(ck, ok)] = (i + 1, price_rank, prev_p, next_p)
    got = {(r.o_custkey, r.o_orderkey):
           (r.rn, r.price_rank, r.prev_price, r.next_price)
           for r in QUERIES["rank_lag_lead"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# topn_plus_other_rollup — top-3 nations + OTHER bucket per region
# ---------------------------------------------------------------------------

def test_topn_plus_other(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT n.n_name, r.r_name, o.o_totalprice
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
    """).fetchall()
    con.close()
    rev = defaultdict(int)
    for nat, reg, p in rows:
        rev[(reg, nat)] += _g(float(p) * 100)
    per = defaultdict(list)
    for (reg, nat), cents in rev.items():
        per[reg].append((cents, nat))
    expected = defaultdict(lambda: [0, 0])
    for reg, members in per.items():
        members.sort(key=lambda t: (-t[0], t[1]))
        for rk0, (cents, nat) in enumerate(members):
            bucket = nat if rk0 < 3 else "OTHER"
            a = expected[(reg, bucket)]
            a[0] += 1
            a[1] += cents
    got = {(r.region, r.nation_bucket): (r.n_nations, r.revenue) for r in
           QUERIES["topn_plus_other_rollup"](spark, sf_dir).collect()}
    assert set(got) == set(expected)
    for key, (n, cents) in expected.items():
        assert got[key] == (n, _r(cents / 100.0, 2))


# ---------------------------------------------------------------------------
# ordered_array_agg — deterministic serialized lists
# ---------------------------------------------------------------------------

def test_ordered_array_agg(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o_custkey, o_orderkey FROM orders
        WHERE o_orderpriority = '1-URGENT'""").fetchall()
    con.close()
    per = defaultdict(list)
    for ck, ok in rows:
        per[ck].append(ok)
    got = {r.o_custkey: r for r in
           QUERIES["ordered_array_agg"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for ck, oks in per.items():
        r = got[ck]
        assert r.n_orders == len(oks)
        assert r.order_keys == ",".join(str(k) for k in sorted(oks))


# ---------------------------------------------------------------------------
# multiset_ops_semantics — bag vs set counts
# ---------------------------------------------------------------------------

def test_multiset_bag_vs_set(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT o_custkey, o_orderpriority FROM orders").fetchall()
    con.close()
    a = Counter(ck for ck, pri in rows if pri == "1-URGENT")
    b = Counter(ck for ck, pri in rows if pri == "2-HIGH")
    expected = {
        "intersect_all": sum(min(a[k], b[k]) for k in set(a) & set(b)),
        "intersect_distinct": len(set(a) & set(b)),
        "except_all": sum(max(a[k] - b.get(k, 0), 0) for k in a),
        "except_distinct": len(set(a) - set(b)),
    }
    got = {r.op: r.n_rows for r in
           QUERIES["multiset_ops_semantics"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# correlated_subquery_decorrelated — per-customer 1.5x-average filter
# ---------------------------------------------------------------------------

def test_correlated_subquery(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT o_custkey, o_totalprice FROM orders").fetchall()
    con.close()
    per = defaultdict(list)
    for ck, p in rows:
        per[ck].append(float(p))
    expected = {}
    for ck, prices in per.items():
        avg = math.fsum(prices) / len(prices)
        above = [p for p in prices if p > 1.5 * avg]
        if above:
            expected[ck] = (len(above), _r(max(above), 2))
    got = {r.o_custkey: (r.n_above_avg, r.max_above) for r in
           QUERIES["correlated_subquery_decorrelated"](spark, sf_dir)
           .collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# snippet_best_window — densest 24-token keyword window per doc
# ---------------------------------------------------------------------------

def test_snippet_best_window(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 120").fetchall()
    con.close()
    kws = {"data", "model", "learning"}
    expected = {}
    for doc_id, text in rows:
        toks = text.strip().split()
        hits = [i for i, t in enumerate(toks) if t in kws]
        if not hits:
            continue
        best = None
        for start in hits:
            nm = sum(1 for h in hits if start <= h < start + 24)
            key = (-nm, start)
            if best is None or key < best[0]:
                best = (key, start, nm)
        _k, start, nm = best
        expected[doc_id] = (start, nm)
    got = {r.doc_id: (r.win_start, r.n_matches) for r in
           QUERIES["snippet_best_window"](spark, sf_dir).collect()}
    assert got == expected
