"""Twenty-eighth replication wave — the rest of the risk-ranked top:
observe-during-write metrics, role-playing date dims, schema-evolution
merge reads, XML shredding round-trip, zone maps, Z-order Morton keys,
salted-join parity, label-centroid separability on the micro grid,
temperature domain mixing, LATERAL decorrelation, SQL-registered UDF,
approx-distinct tolerance, and the LSH self-recovery pipeline — every
expectation recomputed from raw parquet in pure Python/numpy."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import date
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


def _orders(sf_dir):
    con = _con(sf_dir, ("orders",))
    rows = con.execute("""
        SELECT o_orderkey, o_custkey, o_totalprice,
               CAST(o_orderdate AS DATE), o_orderpriority, o_orderstatus
        FROM orders
    """).fetchall()
    con.close()
    return rows


# ---------------------------------------------------------------------------
# observed_write_metrics — observe-during-write control totals
# ---------------------------------------------------------------------------

def test_observed_write_metrics(spark, sf_dir):
    rows = _orders(sf_dir)
    total = sum((_dec(p, 2) for _k, _c, p, *_x in rows), Decimal(0))
    row = QUERIES["observed_write_metrics"](spark, sf_dir).collect()[0]
    assert row.n_rows == len(rows)
    assert row.total_revenue == _r(float(total), 2)
    assert row.max_order_day == max(r[3] for r in rows)
    assert row.observed_equals_recomputed is True


# ---------------------------------------------------------------------------
# role_playing_date_dims — order-month x first-ship-month matrix
# ---------------------------------------------------------------------------

def test_role_playing_date_dims(spark, sf_dir):
    con = _con(sf_dir, ("lineitem",))
    li = con.execute("""
        SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE))
        FROM lineitem GROUP BY l_orderkey
    """).fetchall()
    con.close()
    first_ship = dict(li)
    agg = defaultdict(lambda: [0, Decimal(0)])
    for ok, _c, price, od, *_x in _orders(sf_dir):
        if od < date(2001, 1, 1) or ok not in first_ship:
            continue
        fs = first_ship[ok]
        k = (od.replace(day=1), fs.replace(day=1))
        agg[k][0] += 1
        agg[k][1] += _dec(price, 2)
    expected = {k: (n, _r(float(s), 2)) for k, (n, s) in agg.items()}
    got = {(r.order_month, r.ship_month): (r.n_orders, r.revenue)
           for r in QUERIES["role_playing_date_dims"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# schema_evolution_merge_read — NULL-backfilled new column semantics
# ---------------------------------------------------------------------------

def test_schema_evolution_merge_read(spark, sf_dir):
    agg = defaultdict(lambda: [0, Decimal(0)])
    for ok, _c, price, _od, _pr, status in _orders(sf_dir):
        key = status if ok % 2 == 1 else "<missing>"
        agg[key][0] += 1
        agg[key][1] += _dec(price, 2)
    expected = {k: (n, _r(float(s), 2)) for k, (n, s) in agg.items()}
    got = {r.status: (r.n_rows, r.total)
           for r in QUERIES["schema_evolution_merge_read"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# xml_ingest_shredding — typed round-trip through from_xml
# ---------------------------------------------------------------------------

def test_xml_ingest_shredding(spark, sf_dir):
    con = _con(sf_dir, ("events",))
    rows = con.execute("""
        SELECT event_id, event_type, value FROM events WHERE event_id < 1000
    """).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0, 0])
    for eid, et, v in rows:
        cents = math.floor(v * 100 + 0.5)
        xml = (f"<event><id>{eid}</id><type>{et}</type>"
               f"<value>{cents}</value></event>")
        a = agg[et]
        a[0] += 1
        a[1] += cents
        a[2] = max(a[2], len(xml))
    expected = {k: tuple(v) for k, v in agg.items()}
    got = {r.event_type: (r.n_rows, r.total_cents, r.max_xml_len)
           for r in QUERIES["xml_ingest_shredding"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# zone_map_pruning — per-month min/max stats + skip-test booleans
# ---------------------------------------------------------------------------

def test_zone_map_pruning(spark, sf_dir):
    con = _con(sf_dir, ("lineitem",))
    rows = con.execute("""
        SELECT l_orderkey, CAST(l_shipdate AS DATE) FROM lineitem
    """).fetchall()
    con.close()
    zones = defaultdict(lambda: [None, None, None, None, 0])
    for ok, sd in rows:
        z = zones[f"{sd.year:04d}-{sd.month:02d}"]
        z[0] = ok if z[0] is None else min(z[0], ok)
        z[1] = ok if z[1] is None else max(z[1], ok)
        z[2] = sd if z[2] is None else min(z[2], sd)
        z[3] = sd if z[3] is None else max(z[3], sd)
        z[4] += 1
    expected = {
        zone: (lo, hi, n,
               dhi >= date(1996, 1, 1) and dlo <= date(1996, 6, 30),
               hi >= 3000 and lo <= 6000)
        for zone, (lo, hi, dlo, dhi, n) in zones.items()
    }
    got = {r.zone: (r.okey_min, r.okey_max, r.n_rows,
                    r.scanned_by_date, r.scanned_by_orderkey)
           for r in QUERIES["zone_map_pruning"](spark, sf_dir).collect()}
    assert got == expected
    # the layout claim: the date predicate prunes some zones (the
    # orderkey-side claim is sf0.1-specific — at sf0.001 the key range
    # never reaches the 3000..6000 predicate — so it isn't pinned here)
    assert any(not v[3] for v in expected.values())


# ---------------------------------------------------------------------------
# zorder_layout_key — rank-space bucketing + Morton interleave
# ---------------------------------------------------------------------------

def test_zorder_layout_key(spark, sf_dir):
    rows = _orders(sf_dir)
    alo = min(r[1] for r in rows)
    ahi = max(r[1] for r in rows)
    blo = min(r[2] for r in rows)
    bhi = max(r[2] for r in rows)
    expected = {}
    for ok, ck, price, *_x in rows:
        za = 0 if ahi - alo <= 0 else min(
            math.floor((ck - alo) * 256.0 / (ahi - alo + 1)), 255)
        zb = 0 if bhi - blo <= 0 else min(
            math.floor((price - blo) * 256.0 / (bhi - blo + 1)), 255)
        z = 0
        for i in range(8):
            z |= ((za >> i) & 1) << (2 * i)
            z |= ((zb >> i) & 1) << (2 * i + 1)
        expected[ok] = z
    got = {r.o_orderkey: r.z_key
           for r in QUERIES["zorder_layout_key"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# skew_salted_join_agg — salted join must equal the plain join
# ---------------------------------------------------------------------------

def test_skew_salted_join_agg(spark, sf_dir):
    con = _con(sf_dir, ("events", "customer"))
    rows = con.execute("""
        SELECT c.c_mktsegment, e.event_type, e.value
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, Decimal(0)])
    for seg, et, v in rows:
        a = agg[(seg, et)]
        a[0] += 1
        a[1] += _dec(v, 9)
    expected = {k: (n, _r(float(s), 4)) for k, (n, s) in agg.items()}
    got = {(r.c_mktsegment, r.event_type): (r.n_events, r.total_value)
           for r in QUERIES["skew_salted_join_agg"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# label_centroid_distances — micro-grid centroid cosine matrix
# ---------------------------------------------------------------------------

def test_label_centroid_distances(spark, sf_dir):
    con = _con(sf_dir, ("embeddings",))
    rows = con.execute(
        "SELECT label, embedding FROM embeddings").fetchall()
    con.close()
    sums = defaultdict(lambda: [0] * 64)
    ns = Counter()
    for lab, v in rows:
        ns[lab] += 1
        s = sums[lab]
        for d in range(64):
            s[d] += _ri(float(v[d]) * 1000000.0)
    cent = {lab: [_ri(s[d] / ns[lab]) for d in range(64)]
            for lab, s in sums.items()}
    expected = {}
    labs = sorted(cent)
    for i, la in enumerate(labs):
        for lb in labs[i + 1:]:
            a, b = cent[la], cent[lb]
            dot = sum(x * y for x, y in zip(a, b))
            na2 = sum(x * x for x in a)
            nb2 = sum(y * y for y in b)
            cos = _ri(dot / (math.sqrt(na2) * math.sqrt(nb2)) * 1000000.0) / 1000000.0
            expected[(la, lb)] = cos
    got = {(r.label_a, r.label_b): r.centroid_cosine
           for r in QUERIES["label_centroid_distances"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# curation_domain_mix_temperature — sqrt-weight targets, Knuth-hash draw
# ---------------------------------------------------------------------------

def test_curation_domain_mix_temperature(spark, sf_dir):
    con = _con(sf_dir, ("documents",))
    rows = con.execute(
        "SELECT doc_id, source, n_chars FROM documents").fetchall()
    con.close()
    by_src = defaultdict(list)
    for doc_id, src, n_chars in rows:
        by_src[src].append((doc_id, n_chars))
    w = {src: _dec(math.sqrt(len(docs)), 9) for src, docs in by_src.items()}
    denom = sum(w.values(), Decimal(0))
    expected = {}
    for src, docs in by_src.items():
        t_s = math.floor(200 * (float(w[src]) / float(denom)))
        order = sorted(docs, key=lambda dc: (
            ((dc[0] * 2654435761) % 4294967296) % 1000000, dc[0]))
        sel = order[:t_s]
        expected[src] = (len(docs), t_s, len(sel), sum(c for _d, c in sel))
    got = {r.source: (r.n_available, r.n_target, r.n_selected,
                      r.selected_chars)
           for r in QUERIES["curation_domain_mix_temperature"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# lateral_correlated_topk / sql_registered_udf / approx_count_distinct
# ---------------------------------------------------------------------------

def test_lateral_correlated_topk(spark, sf_dir):
    con = _con(sf_dir, ("customer",))
    seg = dict(con.execute(
        "SELECT c_custkey, c_mktsegment FROM customer WHERE c_custkey < 300"
    ).fetchall())
    con.close()
    best = {}
    for ok, ck, price, *_x in _orders(sf_dir):
        if ck in seg:
            cur = best.get(ck)
            if cur is None or (-price, ok) < (-cur[1], cur[0]):
                best[ck] = (ok, price)
    expected = {ck: (seg[ck], ok, _r(p, 2)) for ck, (ok, p) in best.items()}
    got = {r.c_custkey: (r.c_mktsegment, r.top_orderkey, r.top_price)
           for r in QUERIES["lateral_correlated_topk"](spark, sf_dir).collect()}
    assert got == expected


def test_sql_registered_udf(spark, sf_dir):
    hist = Counter(pr.split("-")[0].lower() for *_x, pr, _s in
                   [(0, 0, 0, 0, r[4], r[5]) for r in _orders(sf_dir)])
    got = {r.pclass: r.n_orders
           for r in QUERIES["sql_registered_udf"](spark, sf_dir).collect()}
    assert got == dict(hist)


def test_approx_count_distinct_orders(spark, sf_dir):
    users = defaultdict(set)
    for _ok, ck, _p, _od, pr, _s in _orders(sf_dir):
        users[pr].add(ck)
    expected = {pr: (len(cks), True) for pr, cks in users.items()}
    got = {r.priority: (r.exact_distinct, r.approx_within_tol)
           for r in QUERIES["approx_count_distinct_orders"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# ann_lsh_self_recovery — the k=1 SRP pipeline from first principles
# ---------------------------------------------------------------------------

def test_ann_lsh_self_recovery(spark, sf_dir):
    import numpy as np

    con = _con(sf_dir, ("embeddings",))
    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    con.close()
    vecs = {vid: np.asarray(v, dtype=np.float32) for vid, v in rows}
    ids = sorted(vecs)
    V = np.stack([vecs[i] for i in ids])
    planes = [np.random.default_rng(42 + t).standard_normal((8, 64))
              for t in range(4)]
    weights = 1 << np.arange(8, dtype=np.int64)
    B = [((V @ m.T) >= 0).astype(np.int64) @ weights for m in planes]
    buckets = {vid: tuple(int(B[t][row]) for t in range(4))
               for row, vid in enumerate(ids)}

    def ltr_dot(a, b):
        s = float(a[0]) * float(b[0])
        for x, y in zip(a[1:], b[1:]):
            s = s + float(x) * float(y)
        return s

    norms = {vid: math.sqrt(ltr_dot(v, v)) for vid, v in vecs.items()}
    expected = {}
    for q in range(5):
        cand = [vid for vid in ids
                if any(buckets[vid][t] == buckets[q][t] for t in range(4))]
        scored = sorted(
            ((ltr_dot(vecs[c], vecs[q]) / (norms[c] * norms[q]), c)
             for c in cand), key=lambda sc: (-sc[0], sc[1]))
        top_cos, top_id = scored[0]
        expected[q] = (top_id, _r(top_cos, 6))
    got = {r.query_id: (r.vec_id, r.cos_sim)
           for r in QUERIES["ann_lsh_self_recovery"](spark, sf_dir).collect()}
    assert got == expected
    # the invariant the query exists for: top-1 is the query itself
    for q, (top_id, cos) in expected.items():
        assert top_id == q and cos == 1.0
