"""Thirty-second replication wave — the relational core residue: J2/A3/
A5/P5-P6/U2 reference semantics, as-of and range joins, native session
windows, ROLLUP and GROUPING SETS (incl. the three-grain time
hierarchy), band/theta tiers, typed and permissive JSON extraction,
ANSI-safe division, and the lateral explode — recomputed from raw
parquet in pure Python."""

from __future__ import annotations

import json
from collections import Counter, defaultdict
from datetime import date, datetime, timedelta
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _r(x, n: int) -> float:
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def _dec(x, n: int) -> Decimal:
    return Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP)


def _ri(x) -> int:
    return int(Decimal(repr(float(x))).quantize(
        Decimal(1), rounding=ROUND_HALF_UP))


def _monday(d: date) -> date:
    return d - timedelta(days=d.weekday())


def _orders(sf_dir):
    con = _con(sf_dir, ("orders",))
    rows = con.execute("""
        SELECT o_orderkey, o_custkey, o_totalprice, CAST(o_orderdate AS DATE)
        FROM orders
    """).fetchall()
    con.close()
    return rows


def _events(sf_dir):
    con = _con(sf_dir, ("events",))
    rows = con.execute("""
        SELECT event_id, user_id, event_type, value, ts, epoch_us(ts), props
        FROM events
    """).fetchall()
    con.close()
    return rows


def _cust_dims(sf_dir):
    con = _con(sf_dir, ("customer", "nation", "region"))
    seg = dict(con.execute(
        "SELECT c_custkey, c_mktsegment FROM customer").fetchall())
    rows = con.execute("""
        SELECT c_custkey, r_name FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    """).fetchall()
    con.close()
    return seg, dict(rows)


# ---------------------------------------------------------------------------
# j2_join_agg / a5_first_per_group / a3_pivot_rowmean / p5_p6 / u2
# ---------------------------------------------------------------------------

def test_j2_join_agg(spark, sf_dir):
    seg, _region = _cust_dims(sf_dir)
    agg = defaultdict(lambda: [0, Decimal(0)])
    for _ok, ck, price, _od in _orders(sf_dir):
        a = agg[seg[ck]]
        a[0] += 1
        a[1] += _dec(price, 2)
    expected = {s: (n, _r(float(t), 2)) for s, (n, t) in agg.items()}
    got = {r.segment: (r.n_orders, r.total_price)
           for r in QUERIES["j2_join_agg"](spark, sf_dir).collect()}
    assert got == expected


def test_a5_first_per_group(spark, sf_dir):
    best = {}
    for ok, ck, price, od in _orders(sf_dir):
        cur = best.get(ck)
        if cur is None or (od, ok) < (cur[0], cur[1]):
            best[ck] = (od, ok, price)
    expected = {ck: (ok, p) for ck, (_od, ok, p) in best.items()}
    got = {r.c_custkey: (r.first_orderkey, r.first_totalprice)
           for r in QUERIES["a5_first_per_group"](spark, sf_dir).collect()}
    assert got == expected


def test_a3_pivot_rowmean(spark, sf_dir):
    agg = defaultdict(lambda: defaultdict(lambda: [Decimal(0), 0]))
    for _eid, _uid, et, v, ts, _us, _p in _events(sf_dir):
        if et in ("click", "purchase", "signup"):
            a = agg[datetime(ts.year, ts.month, ts.day)][et]
            a[0] += _dec(v, 2)
            a[1] += 1
    expected = {}
    for day, types in agg.items():
        vals = {}
        for et in ("click", "purchase", "signup"):
            s, n = types.get(et, (None, 0))
            vals[et] = _r(_r(float(s), 2) / n, 6) if n else None
        present = [v for v in vals.values() if v is not None]
        row_mean = sum(present) / len(present) if present else None
        expected[day] = (vals["click"], vals["purchase"], vals["signup"],
                         row_mean)
    got = {r.day: (r.v_click, r.v_purchase, r.v_signup, r.row_mean)
           for r in QUERIES["a3_pivot_rowmean"](spark, sf_dir).collect()}
    assert got == expected


def test_p5_p6_unit_conversion(spark, sf_dir):
    agg = defaultdict(lambda: [Decimal(0), 0])
    for _eid, _uid, et, v, _ts, _us, _p in _events(sf_dir):
        a = agg[et]
        a[0] += _dec(v, 2)
        a[1] += 1
    expected = {}
    for et, (s, n) in agg.items():
        avg_c = _r(_r(float(s), 2) / n, 6)
        expected[et] = (_r(avg_c, 2), _r(avg_c * 9 / 5 + 32, 2))
    got = {r.event_type: (r.avg_c, r.avg_f)
           for r in QUERIES["p5_p6_unit_conversion"](spark, sf_dir).collect()}
    assert got == expected


def test_u2_sentence_serialization(spark, sf_dir):
    _seg, region = _cust_dims(sf_dir)
    agg = defaultdict(lambda: [0, Decimal(0)])
    for _ok, ck, price, _od in _orders(sf_dir):
        a = agg[region[ck]]
        a[0] += 1
        a[1] += _dec(price, 2)
    expected = {}
    for reg, (n, s) in agg.items():
        revenue = _r(float(s), 2)
        avg = _r(_r(float(s), 2) / n, 6)
        expected[reg] = (
            f"ISO: {reg} / Orders: {n} / Revenue: {_ri(revenue)} USD"
            f" / Avg price: {_dec(_r(avg, 2), 2)} USD"
        )
    got = {r.region: r.sentence
           for r in QUERIES["u2_sentence_serialization"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# asof_click_attribution / range_join / sessionization
# ---------------------------------------------------------------------------

def test_asof_click_attribution(spark, sf_dir):
    per_user = defaultdict(list)
    for _eid, uid, et, _v, _ts, us, _p in _events(sf_dir):
        if et == "purchase":
            per_user[uid].append((us, 1))
        elif et == "click":
            per_user[uid].append((us, 0))
    expected = {}
    for uid, rows in per_user.items():
        rows.sort()  # (ts, is_purchase): clicks sort first at equal ts
        last_click = None
        n = att = gap = 0
        for us, isp in rows:
            if isp == 0:
                last_click = us if last_click is None else max(last_click, us)
            else:
                n += 1
                if last_click is not None:
                    att += 1
                    gap += us - last_click
        if n:
            expected[uid] = (n, att, gap if att else None)
    got = {r.user_id: (r.n_purchases, r.n_attributed, r.total_gap_us)
           for r in QUERIES["asof_click_attribution"](spark, sf_dir).collect()}
    assert got == expected


def test_range_join_clicks_before_purchase(spark, sf_dir):
    clicks = defaultdict(list)
    purchases = []
    for eid, uid, et, _v, _ts, us, _p in _events(sf_dir):
        if et == "click":
            clicks[uid].append(us)
        elif et == "purchase":
            purchases.append((eid, uid, us))
    expected = {eid: sum(1 for c in clicks.get(uid, ())
                         if us - 3_600_000_000 <= c < us)
                for eid, uid, us in purchases}
    got = {r.event_id: r.n_clicks_prev_hour
           for r in QUERIES["range_join_clicks_before_purchase"](spark, sf_dir).collect()}
    assert got == expected


def test_sessionization(spark, sf_dir):
    per_user = defaultdict(list)
    for _eid, uid, _et, v, ts, us, _p in _events(sf_dir):
        per_user[uid].append((us, ts, v))
    expected = {}
    for uid, rows in per_user.items():
        rows.sort()
        cur = None
        for us, ts, v in rows:
            if cur is None or us - cur[0] > 1_800_000_000:
                if cur is not None:
                    expected[(uid, cur[1])] = (cur[2], _r(float(cur[3]), 2))
                cur = [us, ts, 0, Decimal(0)]
            cur[0] = us
            cur[2] += 1
            cur[3] += _dec(v, 2)
        expected[(uid, cur[1])] = (cur[2], _r(float(cur[3]), 2))
    got = {(r.user_id, r.session_start): (r.n_events, r.session_value)
           for r in QUERIES["sessionization"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# ROLLUP / GROUPING SETS / time hierarchy / band join
# ---------------------------------------------------------------------------

def test_rollup_region_nation(spark, sf_dir):
    con = _con(sf_dir, ("customer", "nation", "region"))
    rows = con.execute("""
        SELECT r_name, n_name FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    """).fetchall()
    con.close()
    expected = Counter()
    for r, n in rows:
        expected[(r, n)] += 1
        expected[(r, None)] += 1
        expected[(None, None)] += 1
    got = {(r.region, r.nation): r.n_customers
           for r in QUERIES["rollup_region_nation"](spark, sf_dir).collect()}
    assert got == dict(expected)


def test_sql_grouping_sets(spark, sf_dir):
    seg, region = _cust_dims(sf_dir)
    agg = defaultdict(lambda: [0, Decimal(0)])
    for _ok, ck, price, _od in _orders(sf_dir):
        r, s = region[ck], seg[ck]
        for key in ((r, None), (None, s), (r, s)):
            agg[key][0] += 1
            agg[key][1] += _dec(price, 2)
    expected = {k: (n, _r(float(t), 2)) for k, (n, t) in agg.items()
                if n > 10}
    got = {(r.region, r.segment): (r.n_orders, r.revenue)
           for r in QUERIES["sql_grouping_sets"](spark, sf_dir).collect()}
    assert got == expected


def test_time_hierarchy_rollup(spark, sf_dir):
    agg = defaultdict(lambda: [0, Decimal(0)])
    for _ok, _ck, price, od in _orders(sf_dir):
        if od < date(2001, 1, 1):
            continue
        for grain, period in (("day", od), ("week", _monday(od)),
                              ("month", od.replace(day=1))):
            a = agg[(grain, period)]
            a[0] += 1
            a[1] += _dec(price, 2)
    expected = {k: (n, _r(float(s), 2)) for k, (n, s) in agg.items()}
    got = {(r.grain, r.period_start): (r.n_orders, r.revenue)
           for r in QUERIES["time_hierarchy_rollup"](spark, sf_dir).collect()}
    assert got == expected


def test_band_join_price_tiers(spark, sf_dir):
    tiers = [("budget", 0.0, 100000.0), ("standard", 100000.0, 200000.0),
             ("premium", 200000.0, 300000.0), ("luxury", 300000.0, 450000.0),
             ("ultra", 450000.0, 1e9)]
    agg = defaultdict(lambda: [0, Decimal(0)])
    total = 0
    for _ok, _ck, price, _od in _orders(sf_dir):
        total += 1
        for tier, lo, hi in tiers:
            if lo <= price < hi:
                a = agg[tier]
                a[0] += 1
                a[1] += _dec(price, 2)
    expected = {t: (n, _r(float(s), 2)) for t, (n, s) in agg.items()}
    got = {r.tier: (r.n_orders, r.revenue)
           for r in QUERIES["band_join_price_tiers"](spark, sf_dir).collect()}
    assert got == expected
    assert sum(n for n, _s in expected.values()) == total  # 1:1 bands


# ---------------------------------------------------------------------------
# JSON extraction: typed / permissive / ANSI-safe division
# ---------------------------------------------------------------------------

def test_typed_json_extraction(spark, sf_dir):
    agg = defaultdict(lambda: [0, None, 0])
    for _eid, uid, _et, _v, _ts, _us, props in _events(sf_dir):
        k = json.loads(props).get("k")
        a = agg[uid]
        a[2] += 1
        if k is not None:
            a[0] += k
            a[1] = k if a[1] is None else max(a[1], k)
    expected = {uid: tuple(a) for uid, a in agg.items()}
    got = {r.user_id: (r.sum_k, r.max_k, r.n_events)
           for r in QUERIES["typed_json_extraction"](spark, sf_dir).collect()}
    assert got == expected


def test_p2_permissive_json_cast(spark, sf_dir):
    agg = defaultdict(lambda: [0, Decimal(0)])
    for _eid, _uid, et, _v, _ts, _us, props in _events(sf_dir):
        k = json.loads(props).get("k")
        a = agg[et]
        if k is not None:
            a[0] += 1
            a[1] += _dec(float(k), 2)
    expected = {et: (n, _r(_r(float(s), 2) / n, 6))
                for et, (n, s) in agg.items()}
    got = {r.event_type: (r.n_valid, r.avg_k)
           for r in QUERIES["p2_permissive_json_cast"](spark, sf_dir).collect()}
    assert got == expected


def test_ansi_safe_arithmetic(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0, Decimal(0)])
    for _eid, _uid, et, v, _ts, _us, props in _events(sf_dir):
        k = json.loads(props).get("k")
        a = agg[et]
        a[0] += 1
        if k == 0:
            a[1] += 1
        else:
            a[2] += Decimal(repr(v / k)).quantize(
                Decimal(1).scaleb(-12), rounding=ROUND_HALF_UP)
    expected = {et: (n, z, _r(float(s), 4)) for et, (n, z, s) in agg.items()}
    got = {r.event_type: (r.n_rows, r.n_div_zero, r.sum_safe_ratio)
           for r in QUERIES["ansi_safe_arithmetic"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# lateral_explode — (doc, pos, token) fan-out
# ---------------------------------------------------------------------------

def test_lateral_explode(spark, sf_dir):
    con = _con(sf_dir, ("documents",))
    rows = con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 20").fetchall()
    con.close()
    expected = {(doc_id, pos, tok)
                for doc_id, text in rows
                for pos, tok in enumerate(text.strip().split())}
    got = {(r.doc_id, r.pos, r.token)
           for r in QUERIES["lateral_explode"](spark, sf_dir).collect()}
    assert got == expected
