"""Twenty-sixth replication wave — the round-6 judge's risk-ranked top:
the SRP-LSH ANN pipeline re-derived end to end (planes, buckets,
candidates, cosine top-k) in numpy/pure Python, the full SimHash
blocking funnel from a from-scratch XXH64, TPC-H Q1/Q6/Q13/Q14 on the
exact decimal grid, the A1 aggregate quirks, GROUP BY ALL, map-typed
surface JSON, hive-partition pruning counts, degree-oriented triangle
counting, and the Gini/Pareto activity report — every expectation
recomputed from raw parquet with no shared algebra."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import date
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES

# ---------------------------------------------------------------------------
# Pure-python XXH64 (reference algorithm; wave 18 verified this exact
# code bit-equal to Spark's xxhash64 seed-42 — restated here so the wave
# stays self-contained).
# ---------------------------------------------------------------------------

_M = (1 << 64) - 1
_P1, _P2, _P3, _P4, _P5 = (11400714785074694791, 14029467366897019727,
                           1609587929392839161, 9650029242287828579,
                           2870177450012600261)


def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v = [(seed + _P1 + _P2) & _M, (seed + _P2) & _M, seed & _M,
             (seed - _P1) & _M]
        while i <= n - 32:
            for j in range(4):
                lane = int.from_bytes(data[i + 8 * j:i + 8 * j + 8], "little")
                v[j] = (_rotl((v[j] + lane * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v[0], 1) + _rotl(v[1], 7) + _rotl(v[2], 12)
             + _rotl(v[3], 18)) & _M
        for j in range(4):
            h ^= (_rotl((v[j] * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        k = int.from_bytes(data[i:i + 8], "little")
        h ^= (_rotl((k * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _con(sf_dir, tables=("lineitem", "orders", "customer", "part",
                         "events", "documents", "embeddings")):
    con = duckdb.connect()
    for t in tables:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _r(x, n: int) -> float:
    """Spark F.round / double→DECIMAL cast: HALF_UP on the shortest
    decimal repr (BigDecimal.valueOf)."""
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def _dec(x, n: int) -> Decimal:
    return Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP)


def _ri(x) -> int:
    """Spark ROUND(double) to 0 dp as an int."""
    return int(Decimal(repr(float(x))).quantize(
        Decimal(1), rounding=ROUND_HALF_UP))


# ---------------------------------------------------------------------------
# ann_lsh_topk — the full SRP pipeline replayed in numpy/pure python
# ---------------------------------------------------------------------------

def test_ann_lsh_topk_full_pipeline(spark, sf_dir):
    import numpy as np

    con = _con(sf_dir, ("embeddings",))
    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    con.close()
    vecs = {vid: np.asarray(v, dtype=np.float32) for vid, v in rows}
    for vid in range(5):
        vecs[vid + 1_000_000] = (vecs[vid].astype(np.float64) * 2.0
                                 ).astype(np.float32)
    ids = sorted(vecs)
    V = np.stack([vecs[i] for i in ids])  # float32, same dtype the UDF stacks

    # deterministic Gaussian planes: same public construction the
    # operator documents (default_rng(seed + t)), re-instantiated here
    planes = [np.random.default_rng(42 + t).standard_normal((8, 64))
              for t in range(4)]
    weights = 1 << np.arange(8, dtype=np.int64)
    buckets = {}  # id -> tuple of 4 bucket ids
    B = [((V @ m.T) >= 0).astype(np.int64) @ weights for m in planes]
    for row, vid in enumerate(ids):
        buckets[vid] = tuple(int(B[t][row]) for t in range(4))

    def ltr_dot(a, b):
        s = float(a[0]) * float(b[0])
        for x, y in zip(a[1:], b[1:]):
            s = s + float(x) * float(y)
        return s

    norms = {vid: math.sqrt(ltr_dot(v, v)) for vid, v in vecs.items()}

    expected_topk = {}
    for q in range(5):
        cand = {vid for vid in ids
                for t in range(4) if buckets[vid][t] == buckets[q][t]}
        scored = [(ltr_dot(vecs[c], vecs[q]) / (norms[c] * norms[q]), c)
                  for c in cand]
        scored.sort(key=lambda sc: (-sc[0], sc[1]))
        expected_topk[q] = [(c, _r(s, 6)) for s, c in scored[:10]]

    from quantum_rag_data_pipeline_spark.operators import similarity as sim_ops
    from quantum_rag_data_pipeline_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    e = load_table(spark, "embeddings", sf_dir)
    planted = e.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform("embedding",
                    lambda x: (x * F.lit(2.0)).cast("float")).alias("embedding"),
    )
    corpus = e.select("vec_id", "embedding").unionByName(planted)
    qdf = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = defaultdict(list)
    out = sim_ops.lsh_bucket_topk(corpus, qdf, dim=64, k=10,
                                  n_planes=8, n_tables=4).collect()
    for row in out:
        got[row.query_id].append((row.vec_id, row.cos_sim))
    # operator emits an unordered top-k SET; compare as sets, and the
    # ordered prefix property via the score multiset
    for q in range(5):
        assert sorted(got[q]) == sorted(expected_topk[q]), q
        # the structural claims the registered query distills:
        members = {c for c, _s in expected_topk[q]}
        assert q in members and q + 1_000_000 in members, q

    # and the registered query's aggregated output matches the derivation
    qrows = {r.query_id: r for r in QUERIES["ann_lsh_topk"](spark, sf_dir).collect()}
    for q in range(5):
        members = {c for c, _s in expected_topk[q]}
        assert qrows[q].self_in_topk == (q in members)
        assert qrows[q].planted_in_topk == (q + 1_000_000 in members)
        assert qrows[q].planted_id == q + 1_000_000


# ---------------------------------------------------------------------------
# dedup_simhash — codes from xxh64 votes, 8-block pigeonhole funnel,
# hamming <= 6 pairs, injected-pair projection
# ---------------------------------------------------------------------------

def test_dedup_simhash_full_funnel(spark, sf_dir):
    con = _con(sf_dir, ("documents",))
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    corpus = {doc_id: text for doc_id, text in rows}
    for doc_id, text in rows:
        if doc_id % 3 == 0:
            corpus[doc_id + 1_000_000] = text

    codes = {}
    for doc_id, text in corpus.items():
        toks = text.strip().split()
        if not toks:
            continue  # explode drops token-less docs
        votes = [0] * 64
        for w in toks:
            h = xxh64(w.encode())
            for bit in range(64):
                votes[bit] += 1 if (h >> bit) & 1 else -1
        codes[doc_id] = sum(1 << bit for bit in range(64) if votes[bit] > 0)

    # 8 chunks of 8 bits; candidates share any (chunk_idx, value)
    buckets = defaultdict(set)
    for doc_id, code in codes.items():
        for i in range(8):
            buckets[(i, (code >> (8 * i)) & 0xFF)].add(doc_id)
    cand = {(a, b) for docs in buckets.values()
            for a in docs for b in docs if a < b}
    expected = {}
    for a, b in cand:
        ham = bin(codes[a] ^ codes[b]).count("1")
        if ham <= 6 and b - a == 1_000_000:
            expected[(a, b)] = ham

    got = {(r.id_a, r.id_b): r.hamming
           for r in QUERIES["dedup_simhash"](spark, sf_dir).collect()}
    assert got == expected
    # the pigeonhole theorem the query rests on: every injected pair
    # with a code must actually be in expected at hamming 0
    for doc_id, text in rows:
        if doc_id % 3 == 0 and text.strip().split():
            assert expected[(doc_id, doc_id + 1_000_000)] == 0


# ---------------------------------------------------------------------------
# TPC-H Q1 / Q6 / Q13 / Q14 on the exact integer-percent grid
# ---------------------------------------------------------------------------

def _lineitem(sf_dir):
    con = _con(sf_dir, ("lineitem",))
    rows = con.execute("""
        SELECT l_returnflag, l_linestatus, l_quantity, l_extendedprice,
               l_discount, l_tax, CAST(l_shipdate AS DATE), l_partkey,
               l_orderkey
        FROM lineitem
    """).fetchall()
    con.close()
    return rows


def test_tpch_q1_pricing_summary(spark, sf_dir):
    agg = defaultdict(lambda: [Decimal(0), Decimal(0), Decimal(0),
                               Decimal(0), 0, 0])
    for rf, ls, qty, price, disc, tax, ship, _pk, _ok in _lineitem(sf_dir):
        if ship > date(2001, 6, 1):
            continue
        a = agg[(rf, ls)]
        dp = _dec(price, 2)
        disc_pct = _ri(100 - 100 * disc)
        tax_pct = _ri(100 + 100 * tax)
        a[0] += _dec(qty, 2)
        a[1] += dp
        a[2] += dp * disc_pct
        a[3] += dp * disc_pct * tax_pct
        a[4] += _ri(100 * disc)
        a[5] += 1
    expected = {
        k: (_r(float(a[0]), 2), _r(float(a[1]), 2),
            _r(float(a[2]) / 100.0, 2), _r(float(a[3]) / 10000.0, 2),
            _r(float(a[0]) / a[5], 4), _r(float(a[4]) / a[5] / 100.0, 4),
            a[5])
        for k, a in agg.items()
    }
    got = {(r.l_returnflag, r.l_linestatus):
           (r.sum_qty, r.sum_base_price, r.sum_disc_price, r.sum_charge,
            r.avg_qty, r.avg_disc, r.count_order)
           for r in QUERIES["tpch_q1_pricing_summary"](spark, sf_dir).collect()}
    assert got == expected


def test_tpch_q6_forecast_revenue(spark, sf_dir):
    s = Decimal(0)
    n = 0
    for _rf, _ls, qty, price, disc, _tax, ship, _pk, _ok in _lineitem(sf_dir):
        if (date(1996, 1, 1) <= ship < date(1997, 1, 1)
                and 0.05 <= disc <= 0.07 and qty < 24):
            s += _dec(price, 2) * _ri(100 * disc)
            n += 1
    row = QUERIES["tpch_q6_forecast_revenue"](spark, sf_dir).collect()[0]
    assert row.revenue == _r(float(s) / 100.0, 2)
    assert row.n_lines == n


def test_tpch_q13_customer_distribution(spark, sf_dir):
    con = _con(sf_dir, ("customer", "orders"))
    custs = [r[0] for r in con.execute("SELECT c_custkey FROM customer").fetchall()]
    orders = con.execute(
        "SELECT o_custkey FROM orders WHERE o_orderpriority <> '1-URGENT'"
    ).fetchall()
    con.close()
    per_cust = Counter(ck for (ck,) in orders)
    hist = Counter(per_cust.get(c, 0) for c in custs)
    got = {r.c_count: r.custdist
           for r in QUERIES["tpch_q13_customer_distribution"](spark, sf_dir).collect()}
    assert got == dict(hist)


def test_tpch_q14_promo_effect(spark, sf_dir):
    con = _con(sf_dir, ("part",))
    ptype = dict(con.execute("SELECT p_partkey, p_type FROM part").fetchall())
    con.close()
    tot = Decimal(0)
    promo = Decimal(0)
    for _rf, _ls, _qty, price, disc, _tax, ship, pk, _ok in _lineitem(sf_dir):
        if not (date(1996, 9, 1) <= ship < date(1996, 10, 1)):
            continue
        rev = _dec(price, 2) * _ri(100 - 100 * disc)
        tot += rev
        if ptype[pk].startswith("PROMO"):
            promo += rev
    row = QUERIES["tpch_q14_promo_effect"](spark, sf_dir).collect()[0]
    assert row.promo_revenue_pct == _r(100.0 * float(promo) / float(tot), 6)
    assert row.total_revenue == _r(float(tot) / 100.0, 2)


# ---------------------------------------------------------------------------
# A1 aggregate quirks + GROUP BY ALL + unpivot
# ---------------------------------------------------------------------------

def test_a1_metric_catalog(spark, sf_dir):
    li = _lineitem(sf_dir)
    sum_qty = sum((_dec(q, 2) for *_x, q in
                   [(0, r[2]) for r in li]), Decimal(0))
    sum_price = sum((_dec(r[3], 2) for r in li), Decimal(0))
    sum_disc = sum((_dec(r[4], 2) for r in li), Decimal(0))
    n = len(li)
    row = QUERIES["a1_metric_catalog"](spark, sf_dir).collect()[0]
    assert row.avg_qty == _r(_r(float(sum_qty), 2) / n, 6)
    assert row.max_price == max(r[3] for r in li)
    assert row.sum_discount == _r(float(sum_disc), 2)
    assert row.avg_price == _r(_r(float(sum_price), 2) / n, 6)


def test_a1_empty_agg_zero(spark, sf_dir):
    li = _lineitem(sf_dir)
    assert not [r for r in li if r[2] < 0]  # the filter admits no rows
    row = QUERIES["a1_empty_agg_zero"](spark, sf_dir).collect()[0]
    assert (row.sum_qty, row.avg_qty, row.max_qty) == (0.0, 0.0, 0.0)


def test_group_by_all_surface(spark, sf_dir):
    agg = defaultdict(lambda: [0, Decimal(0)])
    for rf, ls, qty, _p, _d, _t, ship, _pk, _ok in _lineitem(sf_dir):
        if ship < date(1998, 9, 1):
            a = agg[(rf, ls)]
            a[0] += 1
            a[1] += _dec(qty, 2)
    expected = {k: (a[0], _r(float(a[1]), 2)) for k, a in agg.items()}
    got = {(r.l_returnflag, r.l_linestatus): (r.n_lines, r.sum_qty)
           for r in QUERIES["group_by_all_surface"](spark, sf_dir).collect()}
    assert got == expected


def test_unpivot_melt(spark, sf_dir):
    sums = defaultdict(lambda: [Decimal(0), 0])
    for rf, ls, qty, *_rest in _lineitem(sf_dir):
        if ls in ("O", "F"):
            a = sums[(rf, ls)]
            a[0] += _dec(qty, 2)
            a[1] += 1
    expected = {(rf, f"qty_{ls}"): _r(_r(float(s), 2) / n, 6)
                for (rf, ls), (s, n) in sums.items() if n}
    got = {(r.l_returnflag, r.linestatus): r.avg_qty
           for r in QUERIES["unpivot_melt"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# map_functions_surface — the JSON boundary strings from plain counts
# ---------------------------------------------------------------------------

def test_map_functions_surface(spark, sf_dir):
    con = _con(sf_dir, ("events",))
    rows = con.execute("SELECT user_id, event_type FROM events").fetchall()
    con.close()
    counts = defaultdict(Counter)
    for uid, et in rows:
        counts[uid][et] += 1
    expected = {}
    for uid, c in counts.items():
        items = sorted(c.items())
        expected[uid] = (
            "{" + ",".join(f'"{k}":{v}' for k, v in items) + "}",
            "{" + ",".join(f'"{k}":{v}' for k, v in items if v >= 3) + "}",
            len(items),
            max(c.values()),
        )
    got = {r.user_id: (r.type_counts_json, r.frequent_json, r.n_keys,
                       r.max_count)
           for r in QUERIES["map_functions_surface"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# partition_pruning_measurement — day counts from raw timestamps
# ---------------------------------------------------------------------------

def test_partition_pruning_measurement(spark, sf_dir):
    con = _con(sf_dir, ("events",))
    days = [d for (d,) in con.execute(
        "SELECT CAST(ts AS DATE) FROM events").fetchall()]
    con.close()
    lo, hi = date(2024, 1, 10), date(2024, 1, 19)
    in_range = [d for d in days if lo <= d <= hi]
    row = QUERIES["partition_pruning_measurement"](spark, sf_dir).collect()[0]
    assert row.n_days_total == len(set(days))
    assert row.n_days_scanned == len(set(in_range))
    assert row.rows_scanned == len(in_range)
    assert row.partition_filter_pushed is True


# ---------------------------------------------------------------------------
# triangle_count — co-purchase graph + adjacency-intersection triangles
# ---------------------------------------------------------------------------

def test_triangle_count(spark, sf_dir):
    li = _lineitem(sf_dir)
    orders_of = defaultdict(set)
    for *_x, pk, ok in [(0, r[7], r[8]) for r in li]:
        orders_of[pk].add(ok)
    keep = {pk for pk, oks in orders_of.items() if len(oks) >= 8}
    baskets = defaultdict(set)
    for *_x, pk, ok in [(0, r[7], r[8]) for r in li]:
        if pk in keep:
            baskets[ok].add(pk)
    co = Counter()
    for items in baskets.values():
        items = sorted(items)
        for i, u in enumerate(items):
            for v in items[i + 1:]:
                co[(u, v)] += 1
    edges = {p for p, c in co.items() if c >= 2}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    n_tri = sum(len(adj[u] & adj[v]) for u, v in edges) // 3
    row = QUERIES["triangle_count"](spark, sf_dir).collect()[0]
    assert row.n_triangles == n_tri


# ---------------------------------------------------------------------------
# user_activity_pareto — Gini + top-share from first principles
# ---------------------------------------------------------------------------

def test_user_activity_pareto(spark, sf_dir):
    con = _con(sf_dir, ("events",))
    rows = con.execute("SELECT user_id FROM events").fetchall()
    con.close()
    cnt = Counter(uid for (uid,) in rows)
    ranked = sorted(cnt.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ranked)
    s0 = sum(c for _u, c in ranked)
    s1 = sum((i + 1) * c for i, (_u, c) in enumerate(ranked))
    top1 = sum(c for i, (_u, c) in enumerate(ranked)
               if i + 1 > n - math.ceil(0.01 * n))
    top10 = sum(c for i, (_u, c) in enumerate(ranked)
                if i + 1 > n - math.ceil(0.10 * n))
    row = QUERIES["user_activity_pareto"](spark, sf_dir).collect()[0]
    assert row.n_users == n
    assert row.gini == _r(2.0 * s1 / (n * s0) - (n + 1.0) / n, 6)
    assert row.share_top1pct == _r(top1 / s0, 6)
    assert row.share_top10pct == _r(top10 / s0, 6)
