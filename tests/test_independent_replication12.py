"""Twelfth replication wave: business-day SLA arithmetic, gains/lift
deciles, accumulating-snapshot lifecycles, the price/volume bridge, ABC
classification, functional-dependency strength, hierarchical forecast
reconciliation, and TPC-H Q18 — recomputed from raw parquet in pure
Python. DuckDB only fetches raw rows."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import date, timedelta
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "nation", "events",
              "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _r(x: float, n: int) -> float:
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def _g(x: float) -> int:
    return int(math.floor(x + 0.5))


# ---------------------------------------------------------------------------
# business_days_latency — the weekday closed form, pure ints
# ---------------------------------------------------------------------------

def test_business_days_closed_form(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o.o_orderpriority, CAST(o.o_orderdate AS DATE), m.first_ship
        FROM orders o JOIN (
          SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
          FROM lineitem GROUP BY l_orderkey) m
          ON m.l_orderkey = o.o_orderkey
    """).fetchall()
    con.close()
    epoch = date(1970, 1, 5)  # a Monday

    def f(d):
        e = (d - epoch).days
        return 5 * (e // 7) + min(e % 7, 5)

    agg = defaultdict(lambda: [0, 0, 0])
    for pri, od, fs in rows:
        bd = f(fs) - f(od)
        a = agg[pri]
        a[0] += 1
        a[1] += bd
        a[2] += 1 if 0 <= bd <= 20 else 0
    got = {r.o_orderpriority: r for r in
           QUERIES["business_days_latency"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for pri, (n, s, within) in agg.items():
        r = got[pri]
        assert r.n_orders == n
        assert r.avg_business_days == _r(s / n, 4)
        assert r.n_within_20bd == within


# ---------------------------------------------------------------------------
# cumulative_gains_by_decile — score, rank, decile, gain and lift
# ---------------------------------------------------------------------------

def test_gains_and_lift_deciles(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT doc_id, lang, n_chars, text FROM documents").fetchall()
    con.close()
    scored = []
    for doc_id, lang, n_chars, text in rows:
        z = _r(-1.2 + 0.9 * _r(n_chars / 1000.0, 6)
               + 2.0 * _r(text.count(" ") / float(n_chars), 6), 6)
        scored.append((-z, doc_id, 1 if lang == "en" else 0))
    scored.sort()
    n = len(scored)
    per = defaultdict(lambda: [0, 0])
    for rk0, (_negz, _id, y) in enumerate(scored):
        d = min(9, rk0 * 10 // n)
        per[d][0] += 1
        per[d][1] += y
    p_tot = sum(v[1] for v in per.values())
    got = {r.decile: r for r in
           QUERIES["cumulative_gains_by_decile"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    cum = 0
    for d in sorted(per):
        nd, npos = per[d]
        cum += npos
        r = got[d]
        assert (r.n_docs, r.n_pos) == (nd, npos)
        assert r.cumulative_gain == _r(cum / p_tot, 6)
        assert r.lift == _r((npos / nd) / (p_tot / n), 6)


# ---------------------------------------------------------------------------
# order_lifecycle_durations — accumulating snapshot rollup
# ---------------------------------------------------------------------------

def test_order_lifecycle_snapshot(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o.o_orderpriority, CAST(o.o_orderdate AS DATE),
               m.first_ship, m.last_ship
        FROM orders o JOIN (
          SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship,
                 MAX(CAST(l_shipdate AS DATE)) AS last_ship
          FROM lineitem GROUP BY l_orderkey) m
          ON m.l_orderkey = o.o_orderkey
    """).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for pri, od, fs, ls in rows:
        a = agg[pri]
        a[0] += 1
        a[1] += (fs - od).days
        a[2] += (ls - fs).days
        a[3] += 1 if (ls - od).days > 90 else 0
    got = {r.o_orderpriority: r for r in
           QUERIES["order_lifecycle_durations"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for pri, (n, dfs, spread, over) in agg.items():
        r = got[pri]
        assert r.n_orders == n
        assert r.avg_days_to_first_ship == _r(dfs / n, 4)
        assert r.avg_fulfillment_spread == _r(spread / n, 4)
        assert r.n_orders_over_90d == over


# ---------------------------------------------------------------------------
# price_volume_decomposition — the FP&A bridge in exact cents
# ---------------------------------------------------------------------------

def test_price_volume_bridge(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o_orderpriority, CAST(o_orderdate AS DATE), o_totalprice
        FROM orders
        WHERE o_orderdate >= DATE '1999-01-01' AND o_orderdate < DATE '2001-01-01'
    """).fetchall()
    con.close()
    p1 = defaultdict(lambda: [0, 0])
    p2 = defaultdict(lambda: [0, 0])
    for pri, od, v in rows:
        tgt = p1 if od < date(2000, 1, 1) else p2
        tgt[pri][0] += 1
        tgt[pri][1] += _g(float(v) * 100.0)
    got = {r.o_orderpriority: r for r in
           QUERIES["price_volume_decomposition"](spark, sf_dir).collect()}
    assert set(got) == set(p1) & set(p2)
    for pri in got:
        (n1, r1), (n2, r2) = p1[pri], p2[pri]
        total = float(r2 - r1) / 100.0
        vol = _r(float(n2 - n1) * (float(r1) / n1) / 100.0, 2)
        price = _r(float(n2) * (float(r2) / n2 - float(r1) / n1) / 100.0, 2)
        r = got[pri]
        assert abs(r.total_change - total) < 1e-9
        assert r.volume_effect == vol
        assert r.price_effect == price
        assert r.bridge_closes == (abs(total - (
            float(n2 - n1) * (float(r1) / n1) / 100.0
            + float(n2) * (float(r2) / n2 - float(r1) / n1) / 100.0)) < 0.1)


# ---------------------------------------------------------------------------
# abc_inventory_classification — integer cross-multiplied boundaries
# ---------------------------------------------------------------------------

def test_abc_pareto_classes(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT l_partkey, l_extendedprice FROM lineitem").fetchall()
    con.close()
    cents = defaultdict(int)
    for pk, v in rows:
        cents[pk] += _g(float(v) * 100.0)
    t = sum(cents.values())
    ranked = sorted(cents.items(), key=lambda kv: (-kv[1], kv[0]))
    per = defaultdict(lambda: [0, 0])
    cum = 0
    for pk, c in ranked:
        cum += c
        cls = "A" if cum * 100 <= t * 80 else ("B" if cum * 100 <= t * 95
                                               else "C")
        per[cls][0] += 1
        per[cls][1] += c
    got = {r.abc_class: r for r in
           QUERIES["abc_inventory_classification"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for cls, (n, s) in per.items():
        r = got[cls]
        assert r.n_parts == n
        assert r.revenue == _r(s / 100.0, 2)
        assert r.revenue_share == _r(float(s) / t, 6)


# ---------------------------------------------------------------------------
# functional_dependency_profile — g3 strength over 5 candidates
# ---------------------------------------------------------------------------

def test_fd_strength_profile(spark, sf_dir):
    con = _con(sf_dir)
    cands = {
        ("nation", "n_nationkey", "n_regionkey"):
            con.execute("SELECT CAST(n_nationkey AS VARCHAR), "
                        "CAST(n_regionkey AS VARCHAR) FROM nation").fetchall(),
        ("customer", "c_nationkey", "c_mktsegment"):
            con.execute("SELECT CAST(c_nationkey AS VARCHAR), c_mktsegment "
                        "FROM customer").fetchall(),
        ("orders", "o_custkey", "o_orderpriority"):
            con.execute("SELECT CAST(o_custkey AS VARCHAR), o_orderpriority "
                        "FROM orders").fetchall(),
        ("lineitem", "l_orderkey", "l_returnflag"):
            con.execute("SELECT CAST(l_orderkey AS VARCHAR), l_returnflag "
                        "FROM lineitem").fetchall(),
        ("events", "user_id", "event_type"):
            con.execute("SELECT CAST(user_id AS VARCHAR), event_type "
                        "FROM events").fetchall(),
    }
    con.close()
    got = {(r.tbl, r.lhs, r.rhs): r for r in
           QUERIES["functional_dependency_profile"](spark, sf_dir).collect()}
    assert set(got) == set(cands)
    for key, rows in cands.items():
        per_l = defaultdict(Counter)
        for l, rv in rows:
            per_l[l][rv] += 1
        n_rows = len(rows)
        kept = sum(max(c.values()) for c in per_l.values())
        r = got[key]
        assert r.n_rows == n_rows
        assert r.n_lhs_groups == len(per_l)
        assert r.n_violations == n_rows - kept
        assert r.fd_strength == _r(kept / n_rows, 6)
        assert r.holds_exactly == (kept == n_rows)


# ---------------------------------------------------------------------------
# forecast_reconciliation — trailing medians + proportional scaling
# ---------------------------------------------------------------------------

def test_forecast_reconciliation_scaling(spark, sf_dir):
    con = _con(sf_dir)
    raw = con.execute(
        "SELECT event_type, CAST(ts AS DATE) FROM events").fetchall()
    con.close()
    daily = defaultdict(int)
    for et, d in raw:
        daily[(et, d)] += 1
    days_all = sorted({d for _, d in daily})
    d1 = days_all[-1]
    targets = [d for d in days_all if (d1 - d).days <= 6]

    def trailing_median(series, day):
        vals = [v for d, v in series.items()
                if timedelta(days=1) <= day - d <= timedelta(days=7)]
        vals.sort()
        n = len(vals)
        lo, hi = vals[(n + 1) // 2 - 1], vals[(n + 2) // 2 - 1]
        return (lo + hi) / 2

    types = sorted({et for et, _ in daily})
    per_type = {et: {d: v for (e, d), v in daily.items() if e == et}
                for et in types}
    totals = defaultdict(int)
    for (_et, d), v in daily.items():
        totals[d] += v
    fc = {}
    for et in types:
        for day in targets:
            if day in per_type[et]:
                fc[(et, day)] = trailing_median(per_type[et], day)
    fc_total = {day: trailing_median(totals, day) for day in targets}
    sum_base = defaultdict(float)
    for (et, day), v in fc.items():
        sum_base[day] += _r(v, 9)
    got = {(r.event_type, r.day): r for r in
           QUERIES["forecast_reconciliation"](spark, sf_dir).collect()}
    assert set(got) == set(fc)
    for (et, day), v in fc.items():
        r = got[(et, day)]
        assert r.base_forecast == _r(v, 4)
        assert abs(r.reconciled_forecast
                   - v * fc_total[day] / sum_base[day]) < 2e-4
        assert r.total_forecast == _r(fc_total[day], 4)
        assert abs(r.sum_of_base - sum_base[day]) < 2e-4


# ---------------------------------------------------------------------------
# tpch_q18_large_volume — HAVING subquery + 3-way join, top-20
# ---------------------------------------------------------------------------

def test_q18_large_volume_orders(spark, sf_dir):
    con = _con(sf_dir)
    qty = con.execute(
        "SELECT l_orderkey, l_quantity FROM lineitem").fetchall()
    orders = con.execute("""
        SELECT o_orderkey, o_custkey, CAST(o_orderdate AS DATE), o_totalprice
        FROM orders""").fetchall()
    cust = con.execute(
        "SELECT c_custkey, c_name FROM customer").fetchall()
    con.close()
    qsum = defaultdict(int)  # quantity in hundredths, exact
    for ok, q in qty:
        qsum[ok] += _g(float(q) * 100.0)
    big = {ok for ok, s in qsum.items() if s > 15000}
    cname = dict(cust)
    rows = []
    for ok, ck, od, tp in orders:
        if ok in big:
            rows.append((float(tp), ok, ck, od))
    rows.sort(key=lambda r: (-r[0], r[1]))
    top = rows[:20]
    got = QUERIES["tpch_q18_large_volume"](spark, sf_dir).collect()
    assert len(got) == len(top)
    for r, (tp, ok, ck, od) in zip(got, top):
        assert (r.o_orderkey, r.c_custkey, r.o_orderdate) == (ok, ck, od)
        assert r.c_name == cname[ck]
        assert r.o_totalprice == _r(tp, 2)
        assert r.total_qty == _r(qsum[ok] / 100.0, 2)
