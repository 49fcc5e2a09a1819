"""Twenty-ninth replication wave — the last invariant-only stragglers
plus the session-interval family: gap-fill LOCF, cohort retention and
LTV triangles, SCD2 gaps-and-islands, the Markov train/test hit rate,
WoW growth on exact cents, l-diversity, line-level boilerplate removal,
exact dedup groups, bijective pseudonymization, Little's law, the
concurrency sweep, and interval-overlap joins — recomputed from raw
parquet in pure Python."""

from __future__ import annotations

import hashlib
import math
import re
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


def _events(sf_dir):
    con = _con(sf_dir, ("events",))
    rows = con.execute("""
        SELECT event_id, user_id, event_type, value, ts, epoch_us(ts)
        FROM events
    """).fetchall()
    con.close()
    return rows


def _sessions(sf_dir):
    """30-min gaps-and-islands sessions: (user, s_ts, e_ts, v_cents)."""
    per_user = defaultdict(list)
    for eid, uid, _et, v, ts, us in _events(sf_dir):
        per_user[uid].append((us, ts, v))
    sess = []
    for uid, rows in per_user.items():
        rows.sort()
        cur = None
        for us, ts, v in rows:
            if cur is None or us - cur[-1] > 1_800_000_000:
                if cur is not None:
                    sess.append(cur[:5])
                cur = [uid, ts, ts, _ri(v * 100.0), us, us]
            else:
                cur[2] = ts
                cur[3] += _ri(v * 100.0)
                cur[5] = us
            cur[-1] = us
        if cur is not None:
            sess.append(cur[:5])
    # rows: [uid, s_ts, e_ts, v_cents, s_us]; recompute e_us from e_ts
    return [(u, s, e, c, sus, int(e.timestamp() * 1_000_000))
            for u, s, e, c, sus in sess]


# ---------------------------------------------------------------------------
# timeseries_gap_fill — day spine + LOCF
# ---------------------------------------------------------------------------

def test_timeseries_gap_fill(spark, sf_dir):
    con = _con(sf_dir, ("orders",))
    rows = con.execute("""
        SELECT CAST(o_orderdate AS DATE), o_totalprice
        FROM orders WHERE o_totalprice > 450000
    """).fetchall()
    con.close()
    daily = defaultdict(lambda: [0, Decimal(0)])
    for d, p in rows:
        daily[d][0] += 1
        daily[d][1] += _dec(p, 2)
    lo, hi = min(daily), max(daily)
    expected = {}
    locf = None
    d = lo
    while d <= hi:
        if d in daily:
            n, s = daily[d]
            locf = _r(float(s) / n, 6)
            expected[d] = (n, locf, 0)
        else:
            expected[d] = (0, locf, 1)
        d += timedelta(days=1)
    got = {r.day: (r.n_orders, r.avg_price_locf, r.is_gap)
           for r in QUERIES["timeseries_gap_fill"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# cohort_retention / cohort_ltv_accumulation — weekly cohort triangles
# ---------------------------------------------------------------------------

def test_cohort_retention(spark, sf_dir):
    weeks = defaultdict(set)
    for _eid, uid, _et, _v, ts, _us in _events(sf_dir):
        weeks[uid].add(_monday(ts.date()))
    agg = Counter()
    for uid, wks in weeks.items():
        cohort = min(wks)
        for wk in wks:
            agg[(cohort, (wk - cohort).days // 7)] += 1
    got = {(r.cohort_week, r.week_offset): r.n_users
           for r in QUERIES["cohort_retention"](spark, sf_dir).collect()}
    assert got == dict(agg)


def test_cohort_ltv_accumulation(spark, sf_dir):
    first_ts = {}
    for _eid, uid, _et, _v, ts, us in _events(sf_dir):
        if uid not in first_ts or us < first_ts[uid][1]:
            first_ts[uid] = (ts, us)
    cohort = {uid: _monday(ts.date()) for uid, (ts, _us) in first_ts.items()}
    size = Counter(cohort.values())
    rev = defaultdict(Decimal)
    for _eid, uid, et, v, ts, _us in _events(sf_dir):
        cw = cohort[uid]
        age = (_monday(ts.date()) - cw).days // 7
        rev[(cw, age)] += _dec(v, 2) if et == "purchase" else Decimal(0)
    expected = {}
    for cw in size:
        cum = Decimal(0)
        for age in sorted(a for c, a in rev if c == cw):
            wk = rev[(cw, age)]
            cum += wk
            ltv = float(int(cum * 100) // size[cw]) / 100.0
            expected[(cw, age)] = (size[cw], float(wk), ltv)
    got = {(r.cohort_week, r.age_wk):
           (r.n_users, r.revenue_in_week, r.cum_ltv_per_user)
           for r in QUERIES["cohort_ltv_accumulation"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# scd2_tier_history — gaps-and-islands over daily value tiers
# ---------------------------------------------------------------------------

def test_scd2_tier_history(spark, sf_dir):
    daily = defaultdict(lambda: [Decimal(0), 0])
    for _eid, uid, _et, v, ts, _us in _events(sf_dir):
        a = daily[(uid, ts.date())]
        a[0] += _dec(v, 2)
        a[1] += 1
    tiers = {k: math.floor(_r(float(s), 2) / n / 20)
             for k, (s, n) in daily.items()}
    per_user = defaultdict(list)
    for (uid, d), t in tiers.items():
        per_user[uid].append((d, t))
    expected = set()
    for uid, rows in per_user.items():
        rows.sort()
        runs = []
        for d, t in rows:
            if runs and runs[-1][0] == t:
                runs[-1][2] = d
                runs[-1][3] += 1
            else:
                runs.append([t, d, d, 1])
            runs[-1][2] = d
        for t, vf, vt, n in runs:
            expected.add((uid, t, vf, vt, n))
    got = {(r.user_id, r.tier, r.valid_from, r.valid_to, r.n_days)
           for r in QUERIES["scd2_tier_history"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# markov_next_event_hitrate — train/test mode-prediction evaluation
# ---------------------------------------------------------------------------

def test_markov_next_event_hitrate(spark, sf_dir):
    rows = _events(sf_dir)
    m_us = (min(us for *_x, us in rows) + max(us for *_x, us in rows)) // 2
    per_user = defaultdict(list)
    for eid, uid, et, _v, _ts, us in rows:
        per_user[uid].append((us, eid, et))
    train = Counter()
    test = []
    for uid, seq in per_user.items():
        seq.sort()
        for (us, _e, et), (nus, _ne, net) in zip(seq, seq[1:]):
            if us < m_us and nus < m_us:
                train[(et, net)] += 1
            if us >= m_us:
                test.append((et, net))
    pred = {}
    for (src, dst), c in train.items():
        cur = pred.get(src)
        if cur is None or (-c, dst) < (-cur[1], cur[0]):
            pred[src] = (dst, c)
    agg = defaultdict(lambda: [0, 0])
    for src, actual in test:
        if src in pred:
            a = agg[src]
            a[0] += 1
            a[1] += 1 if actual == pred[src][0] else 0
    expected = {src: (pred[src][0], n, h, _r(h / n, 6))
                for src, (n, h) in agg.items()}
    got = {r.from_event: (r.predicted_next, r.n_transitions, r.n_hits,
                          r.hit_rate)
           for r in QUERIES["markov_next_event_hitrate"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# period_over_period_growth — WoW deltas on exact cents
# ---------------------------------------------------------------------------

def test_period_over_period_growth(spark, sf_dir):
    con = _con(sf_dir, ("orders",))
    rows = con.execute(
        "SELECT CAST(o_orderdate AS DATE), o_totalprice FROM orders").fetchall()
    con.close()
    weekly = defaultdict(lambda: [Decimal(0), 0])
    for d, p in rows:
        a = weekly[_monday(d)]
        a[0] += _dec(p, 2)
        a[1] += 1
    wks = sorted(weekly)
    expected = {}
    for i, wk in enumerate(wks):
        rev, n = weekly[wk]
        prev = weekly[wks[i - 1]][0] if i else None
        wow = (_r((float(rev) - float(prev)) / float(prev) * 100.0, 4)
               if prev is not None else None)
        tail = [weekly[w][0] for w in wks[max(0, i - 3):i + 1]]
        rolling = float(int(sum(tail, Decimal(0)) * 100) // len(tail)) / 100.0
        expected[wk] = (float(rev), n, wow, rolling)
    got = {r.week_start: (r.revenue, r.n_orders, r.wow_growth_pct,
                          r.rolling_4wk_avg)
           for r in QUERIES["period_over_period_growth"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# l_diversity_audit
# ---------------------------------------------------------------------------

def test_l_diversity_audit(spark, sf_dir):
    con = _con(sf_dir, ("customer",))
    rows = con.execute(
        "SELECT c_nationkey, c_mktsegment, c_acctbal FROM customer").fetchall()
    con.close()
    k = Counter()
    bands = defaultdict(set)
    for nk, seg, bal in rows:
        k[(nk, seg)] += 1
        bands[(nk, seg)].add(math.floor(bal / 2000.0))
    expected = {key: (k[key], len(bands[key]), k[key] >= 5,
                      len(bands[key]) >= 3) for key in k}
    got = {(r.c_nationkey, r.c_mktsegment):
           (r.k_size, r.l_distinct, r.meets_k5, r.meets_l3)
           for r in QUERIES["l_diversity_audit"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# line_dedup_boilerplate — 8-token segments, corpus-frequency filter
# ---------------------------------------------------------------------------

def test_line_dedup_boilerplate(spark, sf_dir):
    con = _con(sf_dir, ("documents",))
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    lines = []  # (doc_id, pos, segment)
    for doc_id, text in rows:
        toks = text.strip().split()
        i = 1
        stop = max(len(toks) - 7, 0) + 2
        while i < stop:
            lines.append((doc_id, i, " ".join(toks[i - 1:i + 7])))
            i += 8
    df = Counter(seg for _d, _p, seg in lines)
    per_doc = defaultdict(list)
    for doc_id, pos, seg in lines:
        per_doc[doc_id].append((pos, seg))
    expected = {}
    for doc_id, segs in per_doc.items():
        segs.sort()
        keep = [s for _p, s in segs if df[s] <= 1]
        expected[doc_id] = (len(segs),
                            sum(1 for _p, s in segs if df[s] > 1),
                            " ".join(keep))
    got = {r.doc_id: (r.n_lines, r.n_boilerplate, r.clean_text)
           for r in QUERIES["line_dedup_boilerplate"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# dedup_exact — md5 of whitespace-normalized text, injected dups
# ---------------------------------------------------------------------------

def test_dedup_exact(spark, sf_dir):
    con = _con(sf_dir, ("documents",))
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    corpus = {doc_id: text for doc_id, text in rows}
    for doc_id, text in rows:
        if doc_id % 3 == 0:
            corpus[doc_id + 1_000_000] = text
    groups = defaultdict(list)
    for doc_id, text in corpus.items():
        fp = hashlib.md5(
            re.sub(r"\s+", " ", text.strip()).lower().encode()).hexdigest()
        groups[fp].append(doc_id)
    expected = {fp: (len(ids), min(ids))
                for fp, ids in groups.items() if len(ids) > 1}
    got = {r.fp: (r.group_size, r.keep_id)
           for r in QUERIES["dedup_exact"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# pseudonymization_bijective — affine map cardinality proofs
# ---------------------------------------------------------------------------

def test_pseudonymization_bijective(spark, sf_dir):
    uids = [uid for _e, uid, *_x in _events(sf_dir)]
    per_orig = Counter(uids)
    per_pid = Counter((u * 2654435761 + 40503) % 4294967296 for u in uids)
    row = QUERIES["pseudonymization_bijective"](spark, sf_dir).collect()[0]
    assert row.n_users == len(per_orig)
    assert row.n_pseudonyms == len(per_pid)
    assert row.no_collisions is (len(per_orig) == len(per_pid))
    assert row.count_profile_preserved is (
        sorted(per_orig.values()) == sorted(per_pid.values()))


# ---------------------------------------------------------------------------
# littles_law_identity / peak_concurrency_analysis / interval_overlap_join
# ---------------------------------------------------------------------------

def test_littles_law_identity(spark, sf_dir):
    sess = _sessions(sf_dir)
    n = len(sess)
    busy = sum(e_us - s_us for _u, _s, _e, _c, s_us, e_us in sess)
    t0 = min(s_us for *_x, s_us, _e in sess)
    t1 = max(e_us for *_x, e_us in sess)
    row = QUERIES["littles_law_identity"](spark, sf_dir).collect()[0]
    assert row.n_sessions == n
    assert row.avg_concurrency_L == _r(busy / (t1 - t0), 6)
    assert row.arrival_rate_per_sec == _r(n / (t1 - t0) * 1_000_000.0, 9)
    assert row.avg_duration_sec_W == _r(busy / n / 1_000_000.0, 4)
    assert row.littles_law_holds is (
        abs(busy / (t1 - t0) - n / (t1 - t0) * (busy / n)) < 1e-9)


def test_peak_concurrency_analysis(spark, sf_dir):
    sess = _sessions(sf_dir)
    deltas = ([(s, 1, u) for u, s, _e, _c, _su, _eu in sess]
              + [(e, -1, u) for u, _s, e, _c, _su, _eu in sess])
    deltas.sort()
    running = 0
    curve = []
    for t, d, _u in deltas:
        running += d
        curve.append((t, running))
    peak = max(c for _t, c in curve)
    first_peak = min(t for t, c in curve if c == peak)
    row = QUERIES["peak_concurrency_analysis"](spark, sf_dir).collect()[0]
    assert row.n_sessions == len(sess)
    assert row.peak_concurrent == peak
    assert row.first_peak_at == first_peak


def test_interval_overlap_join(spark, sf_dir):
    sess = _sessions(sf_dir)
    promos = [
        ("week1_flash", datetime(2024, 1, 3), datetime(2024, 1, 5)),
        ("mid_month", datetime(2024, 1, 14, 12), datetime(2024, 1, 16, 12)),
        ("month_end", datetime(2024, 1, 27), datetime(2024, 1, 31)),
    ]
    agg = defaultdict(lambda: [0, set(), 0])
    for u, s, e, cents, _su, _eu in sess:
        for promo, ps, pe in promos:
            if s < pe and ps < e:
                a = agg[promo]
                a[0] += 1
                a[1].add(u)
                a[2] += cents
    expected = {p: (n, len(us), c / 100.0) for p, (n, us, c) in agg.items()}
    got = {r.promo: (r.n_overlapping_sessions, r.n_users, r.session_value)
           for r in QUERIES["interval_overlap_join"](spark, sf_dir).collect()}
    assert got == expected
