"""Twenty-third replication wave: segment percentiles, tie-keeping
top-k, semi/anti joins, chained set ops, both funnels, RFM quartiles,
audience overlap, the feature-leakage audit, and the pandas-UDAF
geometric mean — recomputed from raw parquet in pure Python."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "customer", "nation", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _r(x: float, n: int) -> float:
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def _g(x: float) -> int:
    return int(math.floor(x + 0.5))


def _q_cont(sorted_vals, q):
    pos = q * (len(sorted_vals) - 1)
    f = math.floor(pos)
    lo = sorted_vals[f]
    hi = sorted_vals[min(f + 1, len(sorted_vals) - 1)]
    return lo + (hi - lo) * (pos - f)


# ---------------------------------------------------------------------------
# percentiles_by_segment — interpolated medians/p90 per segment
# ---------------------------------------------------------------------------

def test_percentiles_by_segment(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT c.c_mktsegment, o.o_totalprice
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """).fetchall()
    con.close()
    per = defaultdict(list)
    for seg, p in rows:
        per[seg].append(float(p))
    got = {r.segment: r for r in
           QUERIES["percentiles_by_segment"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for seg, vals in per.items():
        vals.sort()
        assert abs(got[seg].median_price - _q_cont(vals, 0.5)) < 2e-4
        assert abs(got[seg].p90_price - _q_cont(vals, 0.9)) < 2e-4


# ---------------------------------------------------------------------------
# grouped_topk_with_ties — RANK semantics on exact decimal revenue
# ---------------------------------------------------------------------------

def test_grouped_topk_rank_ties(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT n.n_name, c.c_custkey, o.o_totalprice
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
    """).fetchall()
    con.close()
    rev = defaultdict(int)
    for nat, ck, p in rows:
        rev[(nat, ck)] += _g(float(p) * 100)
    per = defaultdict(list)
    for (nat, ck), cents in rev.items():
        per[nat].append((cents, ck))
    expected = {}
    for nat, members in per.items():
        members.sort(key=lambda t: -t[0])
        rnk = 0
        for i, (cents, ck) in enumerate(members, start=1):
            if i == 1 or cents != members[i - 2][0]:
                rnk = i
            if rnk > 3:
                break
            expected[(nat, ck)] = (cents / 100.0, rnk)
    got = {(r.nation, r.c_custkey): (r.revenue, r.rnk) for r in
           QUERIES["grouped_topk_with_ties"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# semi_anti_join + set_ops_custkeys
# ---------------------------------------------------------------------------

def test_semi_anti_counts(spark, sf_dir):
    con = _con(sf_dir)
    cust = con.execute(
        "SELECT c_custkey, c_mktsegment FROM customer").fetchall()
    urgent = {k for (k,) in con.execute("""
        SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """).fetchall()}
    con.close()
    agg = defaultdict(lambda: [0, 0])
    for ck, seg in cust:
        agg[seg][0 if ck in urgent else 1] += 1
    got = {r.segment: r for r in
           QUERIES["semi_anti_join"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for seg, (w, wo) in agg.items():
        assert (got[seg].n_with_urgent, got[seg].n_without_urgent) == (w, wo)


def test_set_ops_chain(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o_custkey, o_orderpriority, o_orderstatus, o_totalprice
        FROM orders""").fetchall()
    con.close()
    urgent = {ck for ck, pri, _st, _p in rows if pri == "1-URGENT"}
    high = {ck for ck, pri, _st, _p in rows if pri == "2-HIGH"}
    big_f = {ck for ck, _pri, st, p in rows
             if st == "F" and float(p) > 400000}
    expected = (urgent & high) - big_f
    got = {r.custkey for r in
           QUERIES["set_ops_custkeys"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# funnel_conversion + strict_funnel_bounded_gaps
# ---------------------------------------------------------------------------

def _user_events(sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT user_id, epoch_us(ts), event_type FROM events").fetchall()
    con.close()
    per = defaultdict(list)
    for uid, t, et in rows:
        per[uid].append((t, et))
    return per


def test_ordered_funnel(spark, sf_dir):
    per = _user_events(sf_dir)
    n_v = n_c = n_p = 0
    for _uid, evs in per.items():
        views = [t for t, et in evs if et == "view"]
        if not views:
            continue
        n_v += 1
        tv = min(views)
        clicks = [t for t, et in evs if et == "click" and t >= tv]
        if not clicks:
            continue
        n_c += 1
        tc = min(clicks)
        purchases = [t for t, et in evs if et == "purchase" and t >= tc]
        if purchases:
            n_p += 1
    got = {r.step: r.n_users for r in
           QUERIES["funnel_conversion"](spark, sf_dir).collect()}
    assert got == {"1_view": n_v, "2_click": n_c, "3_purchase": n_p}


def test_strict_funnel_gaps(spark, sf_dir):
    per = _user_events(sf_dir)
    hour = 3_600_000_000
    c_gaps, p_gaps = [], []
    n_v = 0
    for uid, evs in per.items():
        views = [t for t, et in evs if et == "view"]
        if not views:
            continue
        n_v += 1
        tv = min(views)
        clicks = [t for t, et in evs
                  if et == "click" and tv < t <= tv + hour]
        if not clicks:
            continue
        tc = min(clicks)
        c_gaps.append((tc - tv, uid))
        purchases = [t for t, et in evs
                     if et == "purchase" and tc < t <= tc + hour]
        if purchases:
            p_gaps.append((min(purchases) - tc, uid))

    def low_median(pairs):
        if not pairs:  # a stage no user reached has a NULL median
            return None
        pairs.sort()
        return pairs[(len(pairs) + 1) // 2 - 1][0] / 1e6

    got = {r.stage: r for r in
           QUERIES["strict_funnel_bounded_gaps"](spark, sf_dir).collect()}
    assert got["viewed"].n_users == n_v
    assert got["viewed"].median_gap_seconds is None
    assert got["clicked_within_1h"].n_users == len(c_gaps)
    assert got["clicked_within_1h"].median_gap_seconds == low_median(c_gaps)
    assert got["purchased_within_1h_of_click"].n_users == len(p_gaps)
    assert got["purchased_within_1h_of_click"].median_gap_seconds \
        == low_median(p_gaps)


# ---------------------------------------------------------------------------
# rfm_segmentation — NTILE quartiles and label rollup
# ---------------------------------------------------------------------------

def test_rfm_quartile_segments(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o_custkey, CAST(o_orderdate AS DATE), o_totalprice FROM orders
    """).fetchall()
    con.close()
    end_day = max(d for _ck, d, _p in rows)
    per = defaultdict(lambda: [None, 0, 0])
    for ck, d, p in rows:
        a = per[ck]
        a[0] = d if a[0] is None else max(a[0], d)
        a[1] += 1
        a[2] += _g(float(p) * 100)

    def ntile(order):
        # SQL NTILE(4): the first n%4 tiles get the extra row — NOT the
        # even i*4//n split (which puts remainders at alternating tiles)
        n = len(order)
        base, extra = divmod(n, 4)
        out = {}
        i = 0
        for tile in range(1, 5):
            size = base + (1 if tile <= extra else 0)
            for ck in order[i:i + size]:
                out[ck] = tile
            i += size
        return out

    cks = list(per)
    r_score = ntile(sorted(cks, key=lambda ck: (-(end_day - per[ck][0]).days,
                                                ck)))
    f_score = ntile(sorted(cks, key=lambda ck: (per[ck][1], ck)))
    m_score = ntile(sorted(cks, key=lambda ck: (per[ck][2], ck)))
    agg = defaultdict(lambda: [0, 0, 0, 0])
    for ck in cks:
        r, f, m = r_score[ck], f_score[ck], m_score[ck]
        if r == 4 and f == 4:
            seg = "champion"
        elif r >= 3 and f >= 3:
            seg = "loyal"
        elif r <= 1 and f >= 3:
            seg = "at_risk"
        elif r <= 1 and f <= 1:
            seg = "lost"
        else:
            seg = "regular"
        a = agg[seg]
        a[0] += 1
        a[1] += r
        a[2] += f
        a[3] += m
    got = {r.segment: r for r in
           QUERIES["rfm_segmentation"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for seg, (n, sr, sf_, sm) in agg.items():
        r = got[seg]
        assert r.n_customers == n
        assert r.avg_r == _r(sr / n, 4)
        assert r.avg_f == _r(sf_ / n, 4)
        assert r.avg_m == _r(sm / n, 4)


# ---------------------------------------------------------------------------
# audience_overlap_matrix — exact pairwise Jaccard
# ---------------------------------------------------------------------------

def test_audience_overlap(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT DISTINCT event_type, user_id FROM events").fetchall()
    con.close()
    users = defaultdict(set)
    for et, uid in rows:
        users[et].add(uid)
    types = sorted(users)
    got = {(r.type_a, r.type_b): r for r in
           QUERIES["audience_overlap_matrix"](spark, sf_dir).collect()}
    expected_keys = {(a, b) for i, a in enumerate(types)
                     for b in types[i + 1:]}
    assert set(got) == expected_keys
    for a, b in expected_keys:
        inter = len(users[a] & users[b])
        r = got[(a, b)]
        assert (r.users_a, r.users_b, r.users_both) \
            == (len(users[a]), len(users[b]), inter)
        assert r.jaccard == _r(inter / (len(users[a]) + len(users[b])
                                        - inter), 6)
        assert r.hll_estimate_within_20pct is True


# ---------------------------------------------------------------------------
# feature_leakage_audit — point-in-time vs final feature values
# ---------------------------------------------------------------------------

def test_feature_leakage(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT user_id, CAST(ts AS DATE), event_type, event_id, value
        FROM events""").fetchall()
    con.close()
    daily = defaultdict(int)
    for uid, d, _et, _eid, v in rows:
        daily[(uid, d)] += _g(float(v) * 100)
    cum = defaultdict(dict)
    for uid in {u for u, _d in daily}:
        run = 0
        for d in sorted(d2 for u2, d2 in daily if u2 == uid):
            run += daily[(uid, d)]
            cum[uid][d] = run
    final = {uid: max(c.items())[1] for uid, c in cum.items()}
    n_rows = n_leaky = leaked_cents = 0
    for uid, d, et, _eid, _v in rows:
        if et != "purchase":
            continue
        pit = max(v for d2, v in cum[uid].items() if d2 <= d)
        n_rows += 1
        if pit != final[uid]:
            n_leaky += 1
        leaked_cents += final[uid] - pit
    [r] = QUERIES["feature_leakage_audit"](spark, sf_dir).collect()
    assert r.n_feature_rows == n_rows
    assert r.n_leaky_rows == n_leaky
    assert r.leak_rate == _r(n_leaky / n_rows, 6)
    assert r.avg_future_info_leaked == _r(leaked_cents / 100.0 / n_rows, 2)


# ---------------------------------------------------------------------------
# pandas_udaf_geomean — exp(mean(log)) per priority
# ---------------------------------------------------------------------------

def test_pandas_udaf_geomean(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o_orderpriority, o_totalprice FROM orders
        WHERE o_totalprice > 0""").fetchall()
    con.close()
    per = defaultdict(list)
    for pri, p in rows:
        per[pri].append(math.log(float(p)))
    got = {r.o_orderpriority: r for r in
           QUERIES["pandas_udaf_geomean"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for pri, logs in per.items():
        gm = math.exp(math.fsum(logs) / len(logs))
        r = got[pri]
        assert r.n_orders == len(logs)
        assert abs(r.geomean_price - gm) < 2e-4, pri
