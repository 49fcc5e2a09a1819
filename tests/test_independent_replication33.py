"""Thirty-third replication wave — the streaming emission contracts
recomputed from first principles (append withholding, update re-emission,
outer-join null emission, chained multi-grain windows, session windows,
stream-static enrichment, sketch state), plus VARIANT shredding, date
functions, and NULL-join semantics — from raw parquet in pure Python."""

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


def _events(sf_dir):
    con = _con(sf_dir, ("events",))
    rows = con.execute("""
        SELECT event_id, user_id, event_type, value, ts, epoch_us(ts), props
        FROM events
    """).fetchall()
    con.close()
    return rows


def _day0(ts: datetime) -> datetime:
    return datetime(ts.year, ts.month, ts.day)


# ---------------------------------------------------------------------------
# streaming_sliding_window — stream must equal the W1 batch expansion
# ---------------------------------------------------------------------------

def test_streaming_sliding_window(spark, sf_dir):
    agg = defaultdict(lambda: [0, Decimal(0)])
    for _eid, _uid, _et, v, ts, _us, _p in _events(sf_dir):
        d0 = _day0(ts)
        for ws in (d0, d0 - timedelta(days=1)):
            agg[ws][0] += 1
            agg[ws][1] += _dec(v, 2)
    expected = {ws: (n, _r(float(s), 2)) for ws, (n, s) in agg.items()}
    got = {r.window_start: (r.n_events, r.sum_value)
           for r in QUERIES["streaming_sliding_window"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# streaming_watermark_append_semantics — closed daily windows only
# ---------------------------------------------------------------------------

def test_streaming_watermark_append_semantics(spark, sf_dir):
    rows = _events(sf_dir)
    wm = max(ts for *_x, ts, _us, _p in
             [(0, 0, 0, 0, r[4], r[5], r[6]) for r in rows]) - timedelta(days=2)
    daily = Counter(_day0(ts) for _e, _u, _t, _v, ts, _us, _p in rows)
    expected = {d: n for d, n in daily.items()
                if d + timedelta(days=1) <= wm}
    got = {r.window_start: r.n_events
           for r in QUERIES["streaming_watermark_append_semantics"](spark, sf_dir).collect()}
    assert got == expected
    # the contract: the trailing open windows are withheld
    assert len(expected) < len(daily)


# ---------------------------------------------------------------------------
# streaming_chained_window_aggs — daily -> epoch-aligned weekly, closed
# ---------------------------------------------------------------------------

def test_streaming_chained_window_aggs(spark, sf_dir):
    rows = _events(sf_dir)
    wm = max(r[4] for r in rows) - timedelta(days=2)
    daily = Counter(_day0(ts) for _e, _u, _t, _v, ts, _us, _p in rows)
    weekly = defaultdict(lambda: [0, 0, 0])
    epoch = date(1970, 1, 1)
    for d, n in daily.items():
        wk_start = epoch + timedelta(days=((d.date() - epoch).days // 7) * 7)
        w = weekly[datetime(wk_start.year, wk_start.month, wk_start.day)]
        w[0] = max(w[0], n)
        w[1] += n
        w[2] += 1
    expected = {wk: tuple(v) for wk, v in weekly.items()
                if wk + timedelta(days=7) <= wm}
    got = {r.week_start: (r.max_daily_events, r.total_events, r.n_days)
           for r in QUERIES["streaming_chained_window_aggs"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# streaming_sessionization / streaming_static_enrich — stream == batch
# ---------------------------------------------------------------------------

def test_streaming_sessionization(spark, sf_dir):
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
           for r in QUERIES["streaming_sessionization"](spark, sf_dir).collect()}
    assert got == expected


def test_streaming_static_enrich(spark, sf_dir):
    con = _con(sf_dir, ("customer",))
    seg = dict(con.execute(
        "SELECT c_custkey, c_mktsegment FROM customer").fetchall())
    con.close()
    agg = defaultdict(lambda: [0, Decimal(0)])
    for _eid, uid, _et, v, _ts, _us, _p in _events(sf_dir):
        if uid in seg:
            a = agg[seg[uid]]
            a[0] += 1
            a[1] += _dec(v, 2)
    expected = {s: (n, _r(float(t), 2)) for s, (n, t) in agg.items()}
    got = {r.c_mktsegment: (r.n_events, r.sum_value)
           for r in QUERIES["streaming_static_enrich"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# streaming_update_mode_semantics — per-batch re-emission ledger
# ---------------------------------------------------------------------------

def test_streaming_update_mode_semantics(spark, sf_dir):
    even = Counter()
    total = Counter()
    for eid, _uid, et, _v, _ts, _us, _p in _events(sf_dir):
        total[et] += 1
        if eid % 2 == 0:
            even[et] += 1
    expected = {et: (2 if et in even else 1, even.get(et, total[et]),
                     total[et]) for et in total}
    got = {r.event_type: (r.n_emissions, r.first_emitted_count,
                          r.final_count)
           for r in QUERIES["streaming_update_mode_semantics"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# streaming_outer_join_null_emission — matched / null-emitted / withheld
# ---------------------------------------------------------------------------

def test_streaming_outer_join_null_emission(spark, sf_dir):
    clicks = []
    purchases = defaultdict(list)
    for _eid, uid, et, _v, ts, _us, _p in _events(sf_dir):
        if et == "click":
            clicks.append((uid, ts))
        elif et == "purchase":
            purchases[uid].append(ts)
    matched = 0
    unmatched = []
    for uid, cts in clicks:
        hits = sum(1 for pts in purchases.get(uid, ())
                   if cts <= pts <= cts + timedelta(minutes=30))
        if hits:
            matched += hits
        else:
            unmatched.append(cts)
    wm = min(max(ts for _u, ts in clicks),
             max(ts for v in purchases.values() for ts in v)) \
        - timedelta(hours=1)
    null_emitted = sum(1 for cts in unmatched
                       if cts + timedelta(minutes=30) < wm)
    withheld = len(unmatched) - null_emitted
    got = {r.category: r.n_rows
           for r in QUERIES["streaming_outer_join_null_emission"](spark, sf_dir).collect()}
    assert got == {"matched": matched, "null_emitted": null_emitted,
                   "withheld": withheld}


# ---------------------------------------------------------------------------
# streaming_approx_distinct — exact counts + pinned sketch invariants
# ---------------------------------------------------------------------------

def test_streaming_approx_distinct(spark, sf_dir):
    users = defaultdict(set)
    for _eid, uid, et, _v, _ts, _us, _p in _events(sf_dir):
        users[et].add(uid)
    expected = {et: (len(us), True, True) for et, us in users.items()}
    got = {r.event_type: (r.exact_users, r.stream_estimate_within_5pct,
                          r.stream_equals_batch_estimate)
           for r in QUERIES["streaming_approx_distinct"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# variant_json_shredding / f_date_functions / null_safe_join_semantics
# ---------------------------------------------------------------------------

def test_variant_json_shredding(spark, sf_dir):
    agg = defaultdict(lambda: [0, None, None, 0])
    for _eid, _uid, et, _v, _ts, _us, props in _events(sf_dir):
        k = json.loads(props).get("k")
        a = agg[et]
        a[0] += 1
        if k is not None:
            a[1] = k if a[1] is None else min(a[1], k)
            a[2] = k if a[2] is None else max(a[2], k)
            a[3] += k
    expected = {et: tuple(a) for et, a in agg.items()}
    got = {r.event_type: (r.n_events, r.min_k, r.max_k, r.sum_k)
           for r in QUERIES["variant_json_shredding"](spark, sf_dir).collect()}
    assert got == expected


def test_f_date_functions(spark, sf_dir):
    con = _con(sf_dir, ("orders",))
    rows = con.execute(
        "SELECT CAST(o_orderdate AS DATE) FROM orders").fetchall()
    con.close()
    agg = defaultdict(list)
    for (d,) in rows:
        agg[f"{d.year:04d}-{d.month:02d}"].append(d)
    expected = {m: (len(ds), min(ds) + timedelta(days=1),
                    max(ds).isoformat() + "T00:00:00")
                for m, ds in agg.items()}
    got = {}
    for r in QUERIES["f_date_functions"](spark, sf_dir).collect():
        nd = r.min_next_day
        if isinstance(nd, datetime):
            nd = nd.date()
        got[r.order_month] = (r.n_orders, nd, r.max_iso)
    assert got == expected


def test_null_safe_join_semantics(spark, sf_dir):
    con = _con(sf_dir, ("orders",))
    rows = con.execute("""
        SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey < 4000
    """).fetchall()
    con.close()
    keys = [None if s == "O" else s for _ok, s in rows]
    b = Counter(keys)  # group sizes per key (incl. the NULL group)
    n_eq = sum(1 for k in keys if k is not None)  # each non-null row matches
    n_ns = len(keys)  # null-safe: every row matches its group row
    got = {r.join_semantics: r.n_matched
           for r in QUERIES["null_safe_join_semantics"](spark, sf_dir).collect()}
    assert got == {"equals": n_eq, "null_safe": n_ns}
    assert n_ns - n_eq == b[None]  # the gap IS the NULL-keyed population
