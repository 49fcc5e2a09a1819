"""Thirty-first replication wave — the product-analytics ledger and the
window/text residue: W1's two-window expansion, top-k revenue, text
stats and fingerprints, token histograms, debounce, growth accounting,
rolling distinct users, id-sequence audits, funnel window sweeps,
session abandonment, DST-correct wall clocks, RANGE frames over
calendar days, and the 7-row moving average — recomputed from raw
parquet in pure Python."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict
from datetime import date, datetime, timedelta
from decimal import ROUND_HALF_UP, Decimal
from zoneinfo import ZoneInfo

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


def _monday(d: date) -> date:
    return d - timedelta(days=d.weekday())


def _events(sf_dir):
    con = _con(sf_dir, ("events",))
    rows = con.execute("""
        SELECT event_id, user_id, event_type, value, ts, epoch_us(ts)
        FROM events
    """).fetchall()
    con.close()
    return rows


def _docs(sf_dir):
    con = _con(sf_dir, ("documents",))
    rows = con.execute(
        "SELECT doc_id, text, source, n_chars FROM documents").fetchall()
    con.close()
    return rows


# ---------------------------------------------------------------------------
# w1_sliding_window — every event in exactly two [d, d+2) windows
# ---------------------------------------------------------------------------

def test_w1_sliding_window(spark, sf_dir):
    agg = defaultdict(lambda: [0, Decimal(0)])
    for _eid, _uid, _et, v, ts, _us in _events(sf_dir):
        d0 = datetime(ts.year, ts.month, ts.day)
        for ws in (d0, d0 - timedelta(days=1)):
            agg[ws][0] += 1
            agg[ws][1] += _dec(v, 2)
    expected = {ws: (n, _r(float(s), 2)) for ws, (n, s) in agg.items()}
    got = {r.window_start: (r.n_events, r.sum_value)
           for r in QUERIES["w1_sliding_window"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# topk_customers_by_revenue
# ---------------------------------------------------------------------------

def test_topk_customers_by_revenue(spark, sf_dir):
    con = _con(sf_dir, ("orders", "customer"))
    orders = con.execute(
        "SELECT o_custkey, o_totalprice FROM orders").fetchall()
    names = dict(con.execute(
        "SELECT c_custkey, c_name FROM customer").fetchall())
    con.close()
    rev = defaultdict(Decimal)
    for ck, p in orders:
        rev[ck] += _dec(p, 2)
    scored = sorted(((_r(float(s), 2), ck) for ck, s in rev.items()),
                    key=lambda t: (-t[0], t[1]))[:10]
    expected = {ck: (names[ck], r) for r, ck in scored}
    got = {r.c_custkey: (r.c_name, r.revenue)
           for r in QUERIES["topk_customers_by_revenue"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# text_stats_by_source / text_fingerprint / token_length_histogram
# ---------------------------------------------------------------------------

def test_text_stats_by_source(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for _id, text, src, n_chars in _docs(sf_dir):
        a = agg[src]
        a[0] += 1
        a[1] += len(text.strip().split())
        a[2] += len(text)
        a[3] = max(a[3], n_chars)
    expected = {src: (n, tok, chars / tok, mx)
                for src, (n, tok, chars, mx) in agg.items()}
    got = {r.source: (r.n_docs, r.total_tokens, r.chars_per_token,
                      r.max_chars)
           for r in QUERIES["text_stats_by_source"](spark, sf_dir).collect()}
    assert got == expected


def test_text_fingerprint(spark, sf_dir):
    expected = {}
    for doc_id, text, _s, _n in _docs(sf_dir):
        if doc_id < 50:
            fp = hashlib.md5(
                re.sub(r"\s+", " ", text.strip()).lower().encode()).hexdigest()
            expected[doc_id] = fp
    got = {r.doc_id: r.fp
           for r in QUERIES["text_fingerprint"](spark, sf_dir).collect()}
    assert got == expected


def test_token_length_histogram(spark, sf_dir):
    agg = defaultdict(lambda: [0, None, None])
    for _id, text, _s, _n in _docs(sf_dir):
        n = len(text.strip().split())
        b = min(n // 32, 15)
        a = agg[b]
        a[0] += 1
        a[1] = n if a[1] is None else min(a[1], n)
        a[2] = n if a[2] is None else max(a[2], n)
    expected = {b: tuple(v) for b, v in agg.items()}
    got = {r.bucket: (r.n_docs, r.min_tokens, r.max_tokens)
           for r in QUERIES["token_length_histogram"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# event_debounce — 5-minute same-(user, type) suppression
# ---------------------------------------------------------------------------

def test_event_debounce(spark, sf_dir):
    per_key = defaultdict(list)
    for eid, uid, et, _v, _ts, us in _events(sf_dir):
        per_key[(uid, et)].append((us, eid))
    expected = {}
    for key, rows in per_key.items():
        rows.sort()
        kept = sum(1 for i, (us, _e) in enumerate(rows)
                   if i == 0 or us - rows[i - 1][0] > 300_000_000)
        expected[key] = kept
    got = {(r.user_id, r.event_type): r.n_kept
           for r in QUERIES["event_debounce"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# user_growth_accounting — the four-quadrant weekly ledger
# ---------------------------------------------------------------------------

def test_user_growth_accounting(spark, sf_dir):
    active = defaultdict(set)
    for _eid, uid, _et, _v, ts, _us in _events(sf_dir):
        active[_monday(ts.date())].add(uid)
    first = {}
    for wk in sorted(active):
        for u in active[wk]:
            first.setdefault(u, wk)
    expected = {}
    for wk, users in active.items():
        prev = active.get(wk - timedelta(days=7), set())
        expected[wk] = (
            sum(1 for u in users if first[u] == wk),
            len(users & prev),
            sum(1 for u in users if u not in prev and first[u] < wk),
            len(prev - users),
        )
    got = {r.week_start: (r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
           for r in QUERIES["user_growth_accounting"](spark, sf_dir).collect()}
    assert got == expected
    # ledger identities: WAU = new + retained + resurrected;
    # dWAU = new + resurrected - churned
    for wk, (nn, nr, ns, nc) in expected.items():
        assert nn + nr + ns == len(active[wk])
        prev_wk = wk - timedelta(days=7)
        if prev_wk in active:
            assert len(active[wk]) - len(active[prev_wk]) == nn + ns - nc


# ---------------------------------------------------------------------------
# sliding_distinct_users — trailing-7-day rolling distinct
# ---------------------------------------------------------------------------

def test_sliding_distinct_users(spark, sf_dir):
    daily = defaultdict(set)
    for _eid, uid, _et, _v, ts, _us in _events(sf_dir):
        daily[ts.date()].add(uid)
    expected = {}
    for g in daily:
        users = set()
        for d, us in daily.items():
            if g - timedelta(days=6) <= d <= g:
                users |= us
        expected[g] = len(users)
    got = {r.day: r.distinct_users_7d
           for r in QUERIES["sliding_distinct_users"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# id_sequence_gap_audit
# ---------------------------------------------------------------------------

def test_id_sequence_gap_audit(spark, sf_dir):
    ids = sorted(eid for eid, *_x in _events(sf_dir))
    n_rows = len(ids)
    n_distinct = len(set(ids))
    gap_runs = sum(1 for a, b in zip(ids, ids[1:]) if b - a > 1)
    row = QUERIES["id_sequence_gap_audit"](spark, sf_dir).collect()[0]
    assert row.min_id == ids[0]
    assert row.max_id == ids[-1]
    assert row.n_rows == n_rows
    assert row.n_missing_ids == ids[-1] - ids[0] + 1 - n_distinct
    assert row.n_duplicate_ids == n_rows - n_distinct
    assert row.n_gap_runs == gap_runs
    assert row.sequence_complete is (
        ids[-1] - ids[0] + 1 == n_distinct and n_rows == n_distinct)


# ---------------------------------------------------------------------------
# funnel_window_sensitivity / session_abandonment_rate
# ---------------------------------------------------------------------------

def test_funnel_window_sensitivity(spark, sf_dir):
    v_ts = {}
    clicks = defaultdict(list)
    for _eid, uid, et, _v, _ts, us in _events(sf_dir):
        if et == "view":
            v_ts[uid] = min(v_ts.get(uid, us), us)
        elif et == "click":
            clicks[uid].append(us)
    gaps = []
    for uid, vt in v_ts.items():
        later = [c for c in clicks.get(uid, ()) if c > vt]
        if later:
            gaps.append(min(later) - vt)
    row = QUERIES["funnel_window_sensitivity"](spark, sf_dir).collect()[0]
    assert row.n_viewers == len(v_ts)
    assert row.converted_15m == sum(1 for g in gaps if g <= 900_000_000)
    assert row.converted_1h == sum(1 for g in gaps if g <= 3_600_000_000)
    assert row.converted_6h == sum(1 for g in gaps if g <= 21_600_000_000)
    assert row.converted_ever == len(gaps)
    assert (row.converted_15m <= row.converted_1h
            <= row.converted_6h <= row.converted_ever)


def _session_rows(sf_dir):
    per_user = defaultdict(list)
    for _eid, uid, et, _v, ts, us in _events(sf_dir):
        per_user[uid].append((us, ts, et))
    out = []
    for uid, rows in per_user.items():
        rows.sort()
        cur = None
        for us, ts, et in rows:
            if cur is None or us - cur[0] > 1_800_000_000:
                if cur is not None:
                    out.append(cur)
                cur = [us, ts.date(), False, False]
            cur[0] = us
            cur[2] = cur[2] or et in ("view", "click")
            cur[3] = cur[3] or et == "purchase"
        out.append(cur)
    return out


def test_session_abandonment_rate(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0, 0])  # sessions, abandoned, browsed
    for _us, day, browsed, bought in _session_rows(sf_dir):
        a = agg[day]
        a[0] += 1
        a[1] += 1 if browsed and not bought else 0
        a[2] += 1 if browsed else 0
    expected = {day: (n, ab, _r(ab / br, 6))
                for day, (n, ab, br) in agg.items()}
    got = {r.day: (r.n_sessions, r.n_abandoned, r.abandonment_rate)
           for r in QUERIES["session_abandonment_rate"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# timezone_wall_clock_histogram — IANA-correct NY hours
# ---------------------------------------------------------------------------

def test_timezone_wall_clock_histogram(spark, sf_dir):
    ny = ZoneInfo("America/New_York")
    utc = ZoneInfo("UTC")
    hours = Counter()
    for _eid, _uid, _et, _v, ts, _us in _events(sf_dir):
        h = ts.replace(tzinfo=utc).astimezone(ny).hour
        hours[h] += 1
    expected = {h: (n, 9 <= h <= 16) for h, n in hours.items()}
    got = {r.ny_hour: (r.n_events, r.business_hours)
           for r in QUERIES["timezone_wall_clock_histogram"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# range_frame_trailing_revenue / moving_avg_frame
# ---------------------------------------------------------------------------

def test_range_frame_trailing_revenue(spark, sf_dir):
    con = _con(sf_dir, ("orders",))
    rows = con.execute(
        "SELECT CAST(o_orderdate AS DATE), o_totalprice FROM orders").fetchall()
    con.close()
    daily = defaultdict(Decimal)
    for d, p in rows:
        daily[d] += _dec(p, 2)
    expected = {}
    for d, rev in daily.items():
        trailing = sum((r for dd, r in daily.items()
                        if d - timedelta(days=6) <= dd <= d), Decimal(0))
        expected[d] = (_r(float(rev), 2), _r(float(trailing), 2))
    # the query groups by the raw o_orderdate (a midnight timestamp in
    # the parquet); normalize to date for the compare
    got = {(r.day.date() if isinstance(r.day, datetime) else r.day):
           (r.day_revenue, r.trailing_7d_revenue)
           for r in QUERIES["range_frame_trailing_revenue"](spark, sf_dir).collect()}
    assert got == expected


def test_moving_avg_frame(spark, sf_dir):
    per_user = defaultdict(list)
    for eid, uid, _et, v, ts, us in _events(sf_dir):
        if uid < 20:
            per_user[uid].append((us, eid, ts, v))
    expected = []
    for uid, rows in per_user.items():
        rows.sort()
        for i in range(len(rows)):
            frame = rows[max(0, i - 6):i + 1]
            s = sum((_dec(v, 2) for _u, _e, _t, v in frame), Decimal(0))
            mov = _r(_r(float(s), 2) / len(frame), 6)
            expected.append((uid, rows[i][2], mov))
    got = [(r.user_id, r.ts, r.moving_avg)
           for r in QUERIES["moving_avg_frame"](spark, sf_dir).collect()]
    assert sorted(got) == sorted(expected)
