"""Nineteenth replication wave — the sketch/compression family: KMV
cardinality order statistics, the count-min sketch with its
no-undercount guarantee, product-quantization ADC ranking, int8 scalar
quantization recall, Matryoshka truncation recall, and the recursive
ancestor closure — recomputed from raw parquet in pure Python."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "customer", "documents", "embeddings"):
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
    return {vid: [float(x) for x in v] for vid, v in rows}


# ---------------------------------------------------------------------------
# kmv_distinct_sketch — k-minimum-values order statistics
# ---------------------------------------------------------------------------

def test_kmv_order_statistics(spark, sf_dir):
    con = _con(sf_dir)
    keys = sorted({k for (k,) in con.execute(
        "SELECT DISTINCT o_orderkey FROM orders").fetchall()})
    con.close()
    hv = sorted((k * 2654435761 + 40503) % 4294967296 for k in keys)
    hk = hv[63]
    est = 63.0 * 4294967296.0 / hk
    [r] = QUERIES["kmv_distinct_sketch"](spark, sf_dir).collect()
    assert r.k == 64
    assert r.exact_distinct == len(keys)
    assert r.kmv_estimate == _r(est, 2)
    assert r.within_loose_bound == (abs(est - len(keys)) / len(keys) <= 0.5)


# ---------------------------------------------------------------------------
# cms_heavy_hitters — depth-4 x width-512 count-min with md5 buckets
# ---------------------------------------------------------------------------

def test_cms_counters_and_guarantee(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("SELECT lower(text) FROM documents").fetchall()
    con.close()
    tc = Counter()
    for (text,) in rows:
        tc.update(text.strip().split())

    def bucket(j, term):
        return int(hashlib.md5(f"|{j}|{term}".encode())
                   .hexdigest()[:8], 16) % 512

    sketch = defaultdict(int)
    for term, c in tc.items():
        for j in range(4):
            sketch[(j, bucket(j, term))] += c
    top = sorted(tc.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = {r.term: r for r in
           QUERIES["cms_heavy_hitters"](spark, sf_dir).collect()}
    assert set(got) == {t for t, _c in top}
    for term, c in top:
        est = min(sketch[(j, bucket(j, term))] for j in range(4))
        r = got[term]
        assert r.true_cnt == c
        assert r.cms_est == est
        assert r.no_undercount == (est >= c) == True  # noqa: E712 — CMS law


# ---------------------------------------------------------------------------
# pq_ann_topk — codes, LUT, and decimal ADC ranking
# ---------------------------------------------------------------------------

def test_pq_adc_ranking(spark, sf_dir):
    vecs = _vectors(sf_dir)
    M, K, DSUB = 8, 16, 8

    def sub(v, m):
        return v[m * DSUB:(m + 1) * DSUB]

    def d2(a, b):
        s = 0.0
        for x, y in zip(a, b):
            s = s + (x - y) * (x - y)
        return s

    cents = {k: vecs[k] for k in range(K)}
    codes = {}
    for vid, v in vecs.items():
        codes[vid] = [min(((d2(sub(v, m), sub(cents[k], m)), k)
                           for k in range(K)))[1] for m in range(M)]
    expected = {}
    for qid in range(5):
        lut = {(m, k): d2(sub(vecs[qid], m), sub(cents[k], m))
               for m in range(M) for k in range(K)}
        scored = []
        for vid, cs in codes.items():
            dist = sum((_rd(lut[(m, cs[m])], 12) for m in range(M)),
                       Decimal(0))
            scored.append((dist, vid))
        scored.sort()
        expected[qid] = [(vid, _r(float(d), 6)) for d, vid in scored[:10]]
    got = defaultdict(list)
    for r in QUERIES["pq_ann_topk"](spark, sf_dir).collect():
        got[r.query_id].append((r.vec_id, r.adc_dist))
    for qid in expected:
        assert sorted(got[qid]) == sorted(expected[qid]), qid


# ---------------------------------------------------------------------------
# sq_int8_recall — per-dim linear quantization, top-10 overlap
# ---------------------------------------------------------------------------

def test_sq_int8_overlap(spark, sf_dir):
    vecs = _vectors(sf_dir)
    dim = 64
    lo = [min(v[d] for v in vecs.values()) for d in range(dim)]
    hi = [max(v[d] for v in vecs.values()) for d in range(dim)]

    def code(v, d):
        span = hi[d] - lo[d]
        if span <= 0:
            return 0
        return min(int(math.floor((v - lo[d]) * 255.0 / span + 0.5)), 255)

    dq = {vid: [lo[d] + code(v[d], d) * (hi[d] - lo[d]) / 255.0
                for d in range(dim)] for vid, v in vecs.items()}

    def topk(qv, corpus):
        scored = []
        for vid, v in corpus.items():
            dot = sum((_rd(qv[d] * v[d], 18) for d in range(dim)), Decimal(0))
            scored.append((-dot, vid))
        scored.sort()
        return [vid for _negd, vid in scored[:10]]

    got = {r.query_id: r for r in
           QUERIES["sq_int8_recall"](spark, sf_dir).collect()}
    assert set(got) == set(range(5))
    for qid in range(5):
        exact = topk(vecs[qid], vecs)
        sq = topk(vecs[qid], dq)
        r = got[qid]
        assert r.k == 10
        assert r.n_overlap == len(set(exact) & set(sq))


# ---------------------------------------------------------------------------
# mrl_truncation_recall — prefix-dim rankings vs full-dim
# ---------------------------------------------------------------------------

def test_mrl_prefix_recall(spark, sf_dir):
    vecs = _vectors(sf_dir)

    def topk(qid, dims):
        scored = []
        for vid, v in vecs.items():
            dot = sum((_rd(vecs[qid][d] * v[d], 18) for d in range(dims)),
                      Decimal(0))
            scored.append((-dot, vid))
        scored.sort()
        return {vid for _negd, vid in scored[:10]}

    got = {r.query_id: r for r in
           QUERIES["mrl_truncation_recall"](spark, sf_dir).collect()}
    assert set(got) == set(range(5))
    for qid in range(5):
        full = topk(qid, 64)
        r = got[qid]
        assert r.k == 10
        assert r.n_overlap_16 == len(full & topk(qid, 16))
        assert r.n_overlap_32 == len(full & topk(qid, 32))


# ---------------------------------------------------------------------------
# recursive_cte_ancestors — the decimal-trie closure
# ---------------------------------------------------------------------------

def test_recursive_ancestor_closure(spark, sf_dir):
    con = _con(sf_dir)
    keys = [k for (k,) in con.execute(
        "SELECT c_custkey FROM customer WHERE c_custkey > 0").fetchall()]
    con.close()
    expected = set()
    for ck in keys:
        anc = ck // 10
        depth = 1
        expected.add((ck, anc, depth))
        while anc > 0:
            anc //= 10
            depth += 1
            expected.add((ck, anc, depth))
    got = {(r.c_custkey, r.ancestor, r.depth) for r in
           QUERIES["recursive_cte_ancestors"](spark, sf_dir).collect()}
    assert got == expected
