"""Eighteenth replication wave — the hash-based dedup family joins the
program: a PURE-PYTHON XXH64 (verified bit-equal to Spark's xxhash64
seed-42) re-derives every SimHash code; MinHash-LSH's exact rescore is
replayed as 5-gram shingle Jaccard; plus apriori pairs, brute-force and
filtered vector search, embedding near-dups, bigram PMI, bounded
Bellman-Ford, label propagation, and RAG context assembly."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES

# ---------------------------------------------------------------------------
# Pure-python XXH64 (the reference algorithm, not a wrapper) — verified
# against Spark's xxhash64(col, seed=42) below.
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


def _signed(x: int) -> int:
    return x - (1 << 64) if x >= (1 << 63) else x


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _r(x: float, n: int) -> float:
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def _dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s = s + x * y
    return s


def _cos(a, b):
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


def _vectors(sf_dir, with_label=False):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT vec_id, label, embedding FROM embeddings ORDER BY vec_id"
    ).fetchall()
    con.close()
    if with_label:
        return {vid: (lab, [float(x) for x in v]) for vid, lab, v in rows}
    return {vid: [float(x) for x in v] for vid, _lab, v in rows}


# ---------------------------------------------------------------------------
# xxh64 parity with Spark, then simhash codes from first principles
# ---------------------------------------------------------------------------

def test_xxh64_matches_spark(spark):
    from pyspark.sql import functions as F

    samples = ["", "a", "hello", "tok123",
               "the quick brown fox jumps over the lazy dog again and again"]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    for row in df.select("s", F.xxhash64("s").alias("h")).collect():
        assert _signed(xxh64(row.s.encode())) == row.h, repr(row.s)


def test_simhash_codes_from_xxh64(spark, sf_dir):
    from quantum_rag_data_pipeline_spark.operators import dedup as dedup_ops
    from quantum_rag_data_pipeline_spark.sources.registry import load_table

    con = _con(sf_dir)
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    expected = {}
    for doc_id, text in rows:
        toks = text.strip().split()
        if not toks:
            continue
        votes = [0] * 64
        for w in toks:
            h = xxh64(w.encode())  # unsigned; bit k of the signed value
            for bit in range(64):
                votes[bit] += 1 if (h >> bit) & 1 else -1
        code = sum(1 << bit for bit in range(64) if votes[bit] > 0)
        expected[doc_id] = _signed(code)
    d = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    got = {r.doc_id: r.sh for r in dedup_ops.simhash64_df(d).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# dedup_minhash_lsh — exact 5-gram shingle Jaccard pair set
# ---------------------------------------------------------------------------

def test_minhash_exact_pairs_jaccard(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    sh = {}
    for doc_id, text in rows:
        toks = text.strip().split()
        if len(toks) >= 5:
            sh[doc_id] = {" ".join(toks[i:i + 5])
                          for i in range(len(toks) - 4)}
        else:
            sh[doc_id] = {" ".join(toks)}
    inv = defaultdict(set)
    for doc, ss in sh.items():
        for s in ss:
            inv[s].add(doc)
    cand = {(a, b) for docs in inv.values()
            for a in docs for b in docs if a < b}
    expected = {}
    for a, b in cand:
        inter = len(sh[a] & sh[b])
        j = inter / (len(sh[a]) + len(sh[b]) - inter)
        if j >= 0.35:
            expected[(a, b)] = _r(j, 6)
    got = {(r.id_a, r.id_b): r.jaccard for r in
           QUERIES["dedup_minhash_lsh"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# copurchase_pairs_apriori — basket pair counts at support >= 3
# ---------------------------------------------------------------------------

def test_apriori_pair_counts(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        WITH sup AS (
          SELECT l_partkey FROM lineitem
          GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) >= 8
        )
        SELECT DISTINCT l.l_orderkey, l.l_partkey
        FROM lineitem l JOIN sup USING (l_partkey)
    """).fetchall()
    con.close()
    baskets = defaultdict(set)
    for ok, pk in rows:
        baskets[ok].add(pk)
    pair = Counter()
    for ms in baskets.values():
        s = sorted(ms)
        for i, x in enumerate(s):
            for y in s[i + 1:]:
                pair[(x, y)] += 1
    expected = {k: c for k, c in pair.items() if c >= 3}
    got = {(r.part_a, r.part_b): r.n_orders for r in
           QUERIES["copurchase_pairs_apriori"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# ann_brute_force_topk + embedding_near_dup + filtered_vector_search
# ---------------------------------------------------------------------------

def test_brute_force_topk(spark, sf_dir):
    vecs = _vectors(sf_dir)
    expected = {}
    for qid in range(5):
        scored = sorted((-_cos(vecs[vid], vecs[qid]), vid) for vid in vecs)
        expected[qid] = [(vid, _r(-negc, 6)) for negc, vid in scored[:10]]
    got = defaultdict(list)
    rows = QUERIES["ann_brute_force_topk"](spark, sf_dir).collect()
    for qid in expected:
        mine = sorted(((r.vec_id, r.cos_sim) for r in rows
                       if r.query_id == qid),
                      key=lambda t: (-t[1], t[0]))
        assert mine == sorted(expected[qid], key=lambda t: (-t[1], t[0])), qid


def test_embedding_near_dup_pairs(spark, sf_dir):
    vecs = _vectors(sf_dir)
    ids = sorted(vecs)
    expected = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            c = _cos(vecs[a], vecs[b])
            if c >= 0.4:
                expected[(a, b)] = _r(c, 6)
    got = {(r.id_a, r.id_b): r.cos_sim for r in
           QUERIES["embedding_near_dup"](spark, sf_dir).collect()}
    assert got == expected


def test_filtered_vector_search(spark, sf_dir):
    vecs = _vectors(sf_dir, with_label=True)
    corpus = {vid: v for vid, (lab, v) in vecs.items()
              if lab in (2, 3, 5) and vid >= 5}
    expected = {}
    for qid in range(5):
        qv = vecs[qid][1]
        scored = sorted((-_r(_cos(qv, v), 6), vid) for vid, v in corpus.items())
        expected[qid] = [(vid, vecs[vid][0], -negc)
                         for negc, vid in scored[:5]]
    got = defaultdict(list)
    for r in sorted(QUERIES["filtered_vector_search"](spark, sf_dir).collect(),
                    key=lambda r: (r.query_id, -r.cosine, r.vec_id)):
        got[r.query_id].append((r.vec_id, r.label, r.cosine))
    assert dict(got) == expected


# ---------------------------------------------------------------------------
# bigram_pmi_keyphrases — collocations on the micro-nat grid
# ---------------------------------------------------------------------------

def test_bigram_pmi_top20(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT text FROM documents WHERE lang = 'en'").fetchall()
    con.close()
    uni = Counter()
    bi = Counter()
    for (text,) in rows:
        toks = text.strip().split()
        uni.update(toks)
        # the oracle's position fan-out stops at 199 (range(1,200)) —
        # mirror that truncation for docs longer than 200 tokens
        for i in range(min(len(toks) - 1, 199)):
            bi[(toks[i], toks[i + 1])] += 1
    n = sum(uni.values())
    scored = []
    for (w1, w2), cb in bi.items():
        if cb < 5:
            continue
        pmi6 = round(math.log(cb * n / (uni[w1] * uni[w2])) * 1e6)
        scored.append((-pmi6, w1, w2, cb))
    scored.sort()
    got = QUERIES["bigram_pmi_keyphrases"](spark, sf_dir).collect()
    assert len(got) == min(20, len(scored))
    for r, (negp, w1, w2, cb) in zip(got, scored[:20]):
        assert (r.w1, r.w2, r.n_occurrences) == (w1, w2, cb)
        assert r.pmi == -negp / 1e6


# ---------------------------------------------------------------------------
# bellman_ford_bounded — two integer relaxation rounds
# ---------------------------------------------------------------------------

def test_bellman_ford_two_rounds(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        WITH sup AS (
          SELECT l_partkey FROM lineitem
          GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) >= 8
        ),
        items AS (
          SELECT DISTINCT l.l_orderkey, l.l_partkey
          FROM lineitem l JOIN sup USING (l_partkey)
        )
        SELECT a.l_partkey, b.l_partkey, COUNT(*)
        FROM items a JOIN items b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
    """).fetchall()
    con.close()
    wadj = defaultdict(list)
    for u, v, co in rows:
        w = 1000000 // co
        wadj[v].append((u, w))
        wadj[u].append((v, w))
    nodes = set(wadj)
    src = min(nodes)
    dist = {src: 0}
    for _ in range(2):
        nxt = dict(dist)
        for node in nodes:
            best = dist.get(node)
            for nbr, w in wadj[node]:
                if nbr in dist:
                    cand = dist[nbr] + w
                    if best is None or cand < best:
                        best = cand
            if best is not None:
                nxt[node] = best
        dist = nxt
    ranked = sorted(dist.items(), key=lambda kv: (kv[1], kv[0]))[:20]
    got = QUERIES["bellman_ford_bounded"](spark, sf_dir).collect()
    assert [(r.node, r.dist_micro, r.rk) for r in got] \
        == [(node, d, rk + 1) for rk, (node, d) in enumerate(ranked)]


# ---------------------------------------------------------------------------
# label_propagation_communities — tie-free integer modal composite
# ---------------------------------------------------------------------------

def test_lpa_modal_composite(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
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
    adj = defaultdict(list)
    for u, v in rows:
        adj[u].append(v)
        adj[v].append(u)
    lbl = {x: x for x in adj}
    for _ in range(2):
        votes = defaultdict(Counter)
        for s in adj:
            for t in adj[s]:
                votes[t][lbl[s]] += 1
        lbl = {node: 9999999 - (max(c * 10000000 + (9999999 - la)
                                    for la, c in cnt.items()) % 10000000)
               for node, cnt in votes.items()}
    sizes = Counter(lbl.values())
    top = sorted(sizes.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = QUERIES["label_propagation_communities"](spark, sf_dir).collect()
    assert [(r.community, r.n_members) for r in got] == top


# ---------------------------------------------------------------------------
# rag_context_assembly — retrieve, rank, pack under a token budget
# ---------------------------------------------------------------------------

def test_rag_context_budget_packing(spark, sf_dir):
    con = _con(sf_dir)
    docs = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    ntok = {doc_id: len(text.strip().split()) for doc_id, text in docs}
    vecs = _vectors(sf_dir)
    expected = []
    for qid in range(5):
        ranked = sorted((-_cos(vecs[vid], vecs[qid]), vid)
                        for vid in vecs if vid in ntok)
        cum = 0
        for rnk0, (negc, vid) in enumerate(ranked[:10]):
            cum += ntok[vid]
            if cum > 192:
                break
            expected.append((qid, vid, rnk0 + 1, ntok[vid], cum,
                             _r(-negc, 6)))
    got = sorted(
        ((r.query_id, r.doc_id, r.rnk, r.ntok, r.cum_tokens, r.cos_sim)
         for r in QUERIES["rag_context_assembly"](spark, sf_dir).collect()))
    assert got == sorted(expected)
