"""Twenty-first replication wave — the streaming/storage semantics tier:
stateful key counts, exactly-once dedup under double delivery,
sessionization islands, SCD1 merge audits, SCD2 point-in-time joins,
snapshot-diff CDC, CDC log apply with tombstones, and incremental
aggregate maintenance — each recomputed from raw parquet in pure
Python. The streaming queries' outputs are batch-equivalent by design
(that IS their contract); the replication recomputes that batch truth
independently."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import date
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "customer", "events"):
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
# streaming_stateful_key_counts — commutative state == batch GROUP BY
# ---------------------------------------------------------------------------

def test_stateful_key_counts(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("SELECT user_id, event_id FROM events").fetchall()
    con.close()
    per = defaultdict(lambda: [0, None])
    for uid, eid in rows:
        a = per[uid]
        a[0] += 1
        a[1] = eid if a[1] is None else min(a[1], eid)
    got = {r.user_id: r for r in
           QUERIES["streaming_stateful_key_counts"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for uid, (n, mn) in per.items():
        assert (got[uid].n_events, got[uid].min_id) == (n, mn)


# ---------------------------------------------------------------------------
# streaming_dedup_exactly_once — double delivery collapses to one
# ---------------------------------------------------------------------------

def test_exactly_once_dedup(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT event_type, event_id FROM events").fetchall()
    con.close()
    per = defaultdict(set)
    n = Counter()
    for et, eid in rows:
        per[et].add(eid)
        n[et] += 1
    got = {r.event_type: r for r in
           QUERIES["streaming_dedup_exactly_once"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for et in per:
        r = got[et]
        # the stream saw every event TWICE; exactly-once means the
        # single-copy batch counts survive
        assert r.n_events == n[et]
        assert r.n_unique == len(per[et])
        assert r.n_events == r.n_unique


# ---------------------------------------------------------------------------
# sessionization — 30-minute gaps-and-islands
# ---------------------------------------------------------------------------

def test_sessionization_islands(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT user_id, epoch_us(ts), value FROM events").fetchall()
    con.close()
    per = defaultdict(list)
    for uid, t, v in rows:
        per[uid].append((t, float(v)))
    gap = 30 * 60 * 1_000_000
    expected = Counter()
    for uid, evs in per.items():
        evs.sort()
        start, cnt, cents = None, 0, 0
        prev = None
        for t, v in evs:
            if prev is None or t - prev > gap:
                if start is not None:
                    expected[(uid, start, cnt, _r(cents / 100.0, 2))] += 1
                start, cnt, cents = t, 0, 0
            cnt += 1
            cents += _g(v * 100)
            prev = t
        expected[(uid, start, cnt, _r(cents / 100.0, 2))] += 1
    from datetime import timezone

    got = Counter()
    for r in QUERIES["sessionization"](spark, sf_dir).collect():
        us = int(r.session_start.replace(tzinfo=timezone.utc).timestamp()
                 * 1_000_000)
        got[(r.user_id, us, r.n_events, r.session_value)] += 1
    assert got == expected


# ---------------------------------------------------------------------------
# scd1_merge_upsert — MERGE audit rows
# ---------------------------------------------------------------------------

def test_scd1_merge_audit(spark, sf_dir):
    con = _con(sf_dir)
    cust = dict(con.execute(
        "SELECT c_custkey, c_mktsegment FROM customer").fetchall())
    con.close()
    changes = [(k, "PROMO") for k in cust if k % 10 == 0] + \
              [(k + 1000000, "NEWCUST") for k in cust if k < 50]
    expected = {}
    for k, new_seg in changes:
        old = cust.get(k)
        if old is None:
            expected[k] = (None, new_seg, "insert")
        elif old != new_seg:
            expected[k] = (old, new_seg, "update")
    got = {r.c_custkey: (r.old_segment, r.new_segment, r.action) for r in
           QUERIES["scd1_merge_upsert"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# scd2_point_in_time_join — tier history + PIT revenue rollup
# ---------------------------------------------------------------------------

def test_scd2_pit_revenue(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT user_id, CAST(ts AS DATE), event_type, value FROM events
    """).fetchall()
    con.close()
    day_cents = defaultdict(lambda: [0, 0])
    for uid, d, _et, v in rows:
        a = day_cents[(uid, d)]
        a[0] += _g(float(v) * 100)
        a[1] += 1
    tiers = {}
    for (uid, d), (cents, n) in day_cents.items():
        tiers.setdefault(uid, []).append(
            (d, int(math.floor(_r(cents / 100.0, 2) / n / 20))))
    dim = []
    for uid, days in tiers.items():
        days.sort()
        start = None
        for i, (d, tier) in enumerate(days):
            if start is None or tier != days[i - 1][1]:
                if start is not None:
                    dim.append((uid, days[start][1],
                                days[start][0], days[i - 1][0]))
                start = i
        dim.append((uid, days[start][1], days[start][0], days[-1][0]))
    agg = defaultdict(lambda: [0, set(), 0])
    for uid, d, et, v in rows:
        if et != "purchase":
            continue
        for du, tier, vf, vt in dim:
            if du == uid and vf <= d <= vt:
                a = agg[tier]
                a[0] += 1
                a[1].add(uid)
                a[2] += _g(float(v) * 100)
    got = {r.tier: r for r in
           QUERIES["scd2_point_in_time_join"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for tier, (n, users, cents) in agg.items():
        r = got[tier]
        assert r.n_purchases == n
        assert r.n_users == len(users)
        assert r.revenue == _r(cents / 100.0, 2)


# ---------------------------------------------------------------------------
# snapshot_diff_cdc — added/removed/changed/unchanged classes
# ---------------------------------------------------------------------------

def test_snapshot_diff_classes(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o_orderkey, CAST(o_orderdate AS DATE), o_totalprice FROM orders
        WHERE o_orderdate < DATE '1997-07-01'""").fetchall()
    con.close()
    snap_a = {ok: float(tp) for ok, od, tp in rows if od < date(1997, 1, 1)}
    snap_b = {}
    for ok, _od, tp in rows:
        if ok % 13 == 3:
            continue
        snap_b[ok] = _r(float(tp) * 1.1, 2) if ok % 7 == 0 else float(tp)
    classes = defaultdict(list)
    for ok in set(snap_a) | set(snap_b):
        if ok not in snap_a:
            cls = "added"
        elif ok not in snap_b:
            cls = "removed"
        elif snap_a[ok] != snap_b[ok]:
            cls = "changed"
        else:
            cls = "unchanged"
        classes[cls].append(ok)
    got = {r.change_class: r for r in
           QUERIES["snapshot_diff_cdc"](spark, sf_dir).collect()}
    assert set(got) == set(classes)
    for cls, keys in classes.items():
        r = got[cls]
        assert r.n_rows == len(keys)
        assert (r.min_key, r.max_key) == (min(keys), max(keys))


# ---------------------------------------------------------------------------
# cdc_log_apply — latest-op-wins with tombstones
# ---------------------------------------------------------------------------

def test_cdc_latest_op_wins(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT user_id, epoch_us(ts), event_id, event_type, value FROM events
        WHERE event_type IN ('view', 'click', 'purchase')""").fetchall()
    con.close()
    latest = {}
    for uid, t, eid, et, v in rows:
        key = (t, eid)
        if uid not in latest or key > latest[uid][0]:
            op = "delete" if et == "purchase" else "upsert"
            latest[uid] = (key, op, float(v))
    n_live = sum(1 for _k, op, _v in latest.values() if op == "upsert")
    n_del = len(latest) - n_live
    cents = sum(_g(v * 100) for _k, op, v in latest.values() if op == "upsert")
    [r] = QUERIES["cdc_log_apply"](spark, sf_dir).collect()
    assert r.n_live_rows == n_live
    assert r.n_deleted_rows == n_del
    assert r.live_value_total == _r(cents / 100.0, 2)


# ---------------------------------------------------------------------------
# incremental_agg_maintenance — monoid merge == full recompute
# ---------------------------------------------------------------------------

def test_incremental_merge_parity(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o_orderpriority, CAST(o_orderdate AS DATE), o_totalprice
        FROM orders""").fetchall()
    con.close()
    full = defaultdict(lambda: [0, 0, None])
    for pri, od, tp in rows:
        a = full[pri]
        a[0] += 1
        a[1] += _g(float(tp) * 100)
        a[2] = od if a[2] is None else max(a[2], od)
    got = {r.o_orderpriority: r for r in
           QUERIES["incremental_agg_maintenance"](spark, sf_dir).collect()}
    assert set(got) == set(full)
    for pri, (n, cents, last) in full.items():
        r = got[pri]
        assert r.n_orders == n
        assert r.total_revenue == _r(cents / 100.0, 2)
        assert r.last_order_day == last
        assert r.matches_full_recompute is True
