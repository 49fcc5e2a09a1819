"""Fourteenth replication wave — the vector/LSH family: the int-SRP
DBSCAN pipeline end-to-end (buckets from the Knuth hash, candidate
pairs, sequential-dot cosine, core/border/noise), IVF routing and
search, one k-means round, the V-optimal two-cut argmin, Wald's SPRT
integer ladder, and link-prediction scores — recomputed from raw
parquet in pure Python. Dot products accumulate LEFT-TO-RIGHT (plain
loops, not numpy pairwise sums) to walk the same IEEE lattice as the
engine's unrolled dot.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "events", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _r(x: float, n: int) -> float:
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def _rd(x: float, n: int) -> Decimal:
    return Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP)


def _vectors(sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    con.close()
    return {vid: [float(x) for x in vec] for vid, vec in rows}


def _dot(a, b):
    """Sequential left-to-right accumulation — the engine's unrolled
    dot's exact order."""
    s = 0.0
    for x, y in zip(a, b):
        s = s + x * y
    return s


def _cos(a, b):
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


# ---------------------------------------------------------------------------
# dbscan_core_border_noise — the full int-SRP bucket pipeline
# ---------------------------------------------------------------------------

def test_dbscan_int_srp_pipeline(spark, sf_dir):
    vecs = _vectors(sf_dir)
    n = len(vecs)
    P = 6 + max(0, int(math.floor(math.log2(max(n / 2000, 1.0)))))
    T, DIM, EPS, MINPTS = 8, 64, 0.30, 4

    def buckets(v):
        q = [int(math.floor(x * 1_000_000 + 0.5)) for x in v]
        out = []
        for t in range(T):
            b = 0
            for p in range(P):
                proj = 0
                for d in range(DIM):
                    idx = d + DIM * (p + P * t)
                    sign = 1 if (idx * 2654435761) % 4294967296 >= 2147483648 else -1
                    proj += sign * q[d]
                if proj >= 0:
                    b |= 1 << p
            out.append((t, b))
        return out

    table = defaultdict(list)
    for vid, v in vecs.items():
        for tb in buckets(v):
            table[tb].append(vid)
    cand = set()
    for ids in table.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                cand.add((a, b))
    eps_nbrs = defaultdict(set)
    for a, b in cand:
        if _cos(vecs[a], vecs[b]) >= EPS:
            eps_nbrs[a].add(b)
            eps_nbrs[b].add(a)
    core = {x for x in vecs if 1 + len(eps_nbrs[x]) >= MINPTS}
    border = {x for x in vecs if x not in core
              and any(y in core for y in eps_nbrs[x])}
    [r] = QUERIES["dbscan_core_border_noise"](spark, sf_dir).collect()
    assert r.n_points == n
    assert r.n_core == len(core)
    assert r.n_border == len(border)
    assert r.n_noise == n - len(core) - len(border)
    assert r.n_cand_pairs == 2 * len(cand)  # engine counts directed


# ---------------------------------------------------------------------------
# ivf_centroid_assign + kmeans_one_step — E-step argmax, M-step grid mean
# ---------------------------------------------------------------------------

def test_ivf_centroid_assign_argmax(spark, sf_dir):
    vecs = _vectors(sf_dir)
    cents = {cid: vecs[cid] for cid in vecs if cid < 8}
    got = {r.vec_id: r for r in
           QUERIES["ivf_centroid_assign"](spark, sf_dir).collect()}
    assert set(got) == set(vecs)
    for vid, v in vecs.items():
        best = min(((-_cos(v, cv), cid) for cid, cv in cents.items()))
        r = got[vid]
        assert r.centroid_id == best[1], vid
        assert r.cos_sim == _r(-best[0], 6)


def test_kmeans_one_step_grid_means(spark, sf_dir):
    vecs = _vectors(sf_dir)
    cents = {cid: vecs[cid] for cid in vecs if cid < 8}
    assign = {}
    for vid, v in vecs.items():
        assign[vid] = min(((-_cos(v, cv), cid) for cid, cv in cents.items()))[1]
    members = defaultdict(list)
    for vid, cid in assign.items():
        members[cid].append(vid)
    got = {(r.centroid_id, r.d): r for r in
           QUERIES["kmeans_one_step"](spark, sf_dir).collect()}
    assert len(got) == 64 * len(members)
    for cid, vids in members.items():
        for d in range(64):
            s = sum(_rd(vecs[vid][d], 9) for vid in vids)
            r = got[(cid, d)]
            assert r.n_assigned == len(vids)
            assert r.m == _r(float(s) / len(vids), 6), (cid, d)


# ---------------------------------------------------------------------------
# ivf_topk_search — nprobe routing + in-list exact search
# ---------------------------------------------------------------------------

def test_ivf_topk_routing_and_search(spark, sf_dir):
    vecs = _vectors(sf_dir)
    cents = {cid: vecs[cid] for cid in vecs if cid < 32}
    assign = {}
    for vid, v in vecs.items():
        assign[vid] = min(((-_cos(v, cv), cid) for cid, cv in cents.items()))[1]
    lists = defaultdict(list)
    for vid, cid in assign.items():
        lists[cid].append(vid)
    expected = {}
    for qid in (0, 1, 2, 3, 4):
        qv = vecs[qid]
        probes = sorted(((-_cos(qv, cv), cid) for cid, cv in cents.items()))[:4]
        scored = [(-_cos(qv, vecs[vid]), vid)
                  for _negc, cid in probes for vid in lists[cid]]
        scored.sort()
        expected[qid] = [(vid, _r(-negc, 6)) for negc, vid in scored[:10]]
    got = defaultdict(list)
    for r in QUERIES["ivf_topk_search"](spark, sf_dir).collect():
        got[r.query_id].append((r.vec_id, r.cos_sim))
    assert set(got) == set(expected)
    for qid in expected:
        assert got[qid] == expected[qid], qid


# ---------------------------------------------------------------------------
# v_optimal_histogram_3buckets — exhaustive two-cut argmin on exact ints
# ---------------------------------------------------------------------------

def test_v_optimal_two_cut_argmin(spark, sf_dir):
    con = _con(sf_dir)
    days_raw = con.execute("SELECT CAST(ts AS DATE) FROM events").fetchall()
    con.close()
    counts = Counter(d for (d,) in days_raw)
    days = sorted(counts)
    ys = [counts[d] for d in days]
    n = len(ys)
    c1 = [0] * (n + 1)
    c2 = [0] * (n + 1)
    for i, y in enumerate(ys, start=1):
        c1[i] = c1[i - 1] + y
        c2[i] = c2[i - 1] + y * y
    best = None
    for i1 in range(1, n - 1):
        for i2 in range(i1 + 1, n):
            s1a, s2a = c1[i1], c2[i1]
            s1b, s2b = c1[i2] - c1[i1], c2[i2] - c2[i1]
            s1c, s2c = c1[n] - c1[i2], c2[n] - c2[i2]
            g = ((i2 - i1) * (n - i2) * (i1 * s2a - s1a * s1a)
                 + i1 * (n - i2) * ((i2 - i1) * s2b - s1b * s1b)
                 + i1 * (i2 - i1) * ((n - i2) * s2c - s1c * s1c))
            sse = float(g) / (i1 * (i2 - i1) * (n - i2))
            key = (sse, days[i1 - 1], days[i2 - 1])
            if best is None or key < best[0]:
                best = (key, i1, i2, s1a, s1b, s1c)
    (_sse, cut1, cut2), i1, i2, s1a, s1b, s1c = best
    [r] = QUERIES["v_optimal_histogram_3buckets"](spark, sf_dir).collect()
    assert (r.bucket1_end, r.bucket2_end) == (cut1, cut2)
    assert (r.n_b1, r.n_b2, r.n_b3) == (i1, i2 - i1, n - i2)
    assert r.mean_b1 == _r(s1a / i1, 4)
    assert r.mean_b2 == _r(s1b / (i2 - i1), 4)
    assert r.mean_b3 == _r(s1c / (n - i2), 4)


# ---------------------------------------------------------------------------
# sprt_sequential_test — micro-nat integer ladder
# ---------------------------------------------------------------------------

def test_sprt_integer_ladder(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT CAST(ts AS DATE), event_type FROM events").fetchall()
    con.close()
    daily = defaultdict(lambda: [0, 0])
    for d, et in rows:
        daily[d][1] += 1
        if et == "purchase":
            daily[d][0] += 1
    C1, C0, A = 200671, -50010, 2944439
    assert C1 == round(math.log(0.22 / 0.18) * 1e6)   # the literals ARE
    assert C0 == round(math.log(0.78 / 0.82) * 1e6)   # the design rates
    assert A == round(math.log(19) * 1e6)
    got = {r.day: r for r in
           QUERIES["sprt_sequential_test"](spark, sf_dir).collect()}
    assert set(got) == set(daily)
    llr = 0
    for d in sorted(daily):
        x, nn = daily[d]
        llr += x * C1 + (nn - x) * C0
        r = got[d]
        assert (r.purchases, r.trials) == (x, nn)
        assert r.cum_llr == _r(llr / 1e6, 4)
        assert r.decision == ("accept_h1" if llr >= A
                              else "accept_h0" if llr <= -A else "continue")


# ---------------------------------------------------------------------------
# link_prediction_scores — CN / Jaccard / Adamic-Adar over wedges
# ---------------------------------------------------------------------------

def test_link_prediction_three_scores(spark, sf_dir):
    con = _con(sf_dir)
    pairs = con.execute("""
        WITH sup AS (
          SELECT l_partkey FROM lineitem
          GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) >= 8
        ),
        items AS (
          SELECT DISTINCT l.l_orderkey, l.l_partkey
          FROM lineitem l JOIN sup USING (l_partkey)
        )
        SELECT a.l_partkey, b.l_partkey
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """).fetchall()
    con.close()
    edges = set(pairs)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    expected = {}
    nodes = sorted(adj)
    for s in nodes:
        for t in nodes:
            if s >= t or (s, t) in edges:
                continue
            common = adj[s] & adj[t]
            if len(common) < 2:
                continue
            aa = sum((_rd(1.0 / math.log(len(adj[via])), 6) for via in common),
                     Decimal(0))
            expected[(s, t)] = (
                len(common),
                _r(len(common) / (len(adj[s]) + len(adj[t]) - len(common)), 6),
                _r(float(aa), 6),
            )
    got = {(r.node_a, r.node_b): (r.common_neighbors, r.jaccard, r.adamic_adar)
           for r in QUERIES["link_prediction_scores"](spark, sf_dir).collect()}
    assert got == expected
