"""Twenty-second replication wave — the dedup family end to end: 4-gram
Jaccard pairs with the max_df guard, shingle containment,
edit-distance verification (pure-Python Levenshtein DP), keep-longest
canonicals, the full pairs→components→delete-list pipeline, perceptual-
hash image twins, MAD length outliers, and the embedding norm audit —
recomputed from raw parquet in pure Python."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _r(x: float, n: int) -> float:
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def _docs(sf_dir):
    con = _con(sf_dir)
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    return rows


def _shingles(tk, n):
    if len(tk) >= n:
        return {" ".join(tk[i:i + n]) for i in range(len(tk) - n + 1)}
    return {" ".join(tk)}


def _guarded_pairs(docs, n, max_df):
    """(per-doc shingle sets after the max_df cut, intersection counts)."""
    sh = {doc_id: _shingles(text.strip().split(), n)
          for doc_id, text in docs}
    df = defaultdict(int)
    for ss in sh.values():
        for s in ss:
            df[s] += 1
    kept = {doc: {s for s in ss if df[s] <= max_df} for doc, ss in sh.items()}
    inv = defaultdict(set)
    for doc, ss in kept.items():
        for s in ss:
            inv[s].add(doc)
    inter = defaultdict(int)
    for docs_ in inv.values():
        ds = sorted(docs_)
        for i, a in enumerate(ds):
            for b in ds[i + 1:]:
                inter[(a, b)] += 1
    return kept, inter


# ---------------------------------------------------------------------------
# dedup_ngram_jaccard + dedup_shingle_containment (5-grams, max_df=64)
# ---------------------------------------------------------------------------

def test_ngram_jaccard_pairs(spark, sf_dir):
    kept, inter = _guarded_pairs(_docs(sf_dir), 5, 64)
    expected = {}
    for (a, b), i in inter.items():
        j = i / (len(kept[a]) + len(kept[b]) - i)
        if j >= 0.35:
            expected[(a, b)] = _r(j, 6)
    got = {(r.id_a, r.id_b): r.jaccard for r in
           QUERIES["dedup_ngram_jaccard"](spark, sf_dir).collect()}
    assert got == expected


def test_shingle_containment_pairs(spark, sf_dir):
    kept, inter = _guarded_pairs(_docs(sf_dir), 5, 64)
    expected = {}
    for (a, b), i in inter.items():
        c = i / min(len(kept[a]), len(kept[b]))
        if c >= 0.8:
            expected[(a, b)] = _r(c, 6)
    got = {(r.id_a, r.id_b): r.containment for r in
           QUERIES["dedup_shingle_containment"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# dedup_edit_distance — 3-gram candidates, Levenshtein DP rescore
# ---------------------------------------------------------------------------

def test_edit_distance_verification(spark, sf_dir):
    docs = _docs(sf_dir)
    texts = dict(docs)
    sh = {doc_id: _shingles(text.strip().split(), 3)
          for doc_id, text in docs}
    inv = defaultdict(set)
    for doc, ss in sh.items():
        for s in ss:
            inv[s].add(doc)

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    cand = {(a, b) for ds in inv.values()
            for a in ds for b in ds if a < b}
    expected = {}
    for a, b in cand:
        i = len(sh[a] & sh[b])
        if i / (len(sh[a]) + len(sh[b]) - i) < 0.4:
            continue
        d = lev(texts[a], texts[b])
        if d <= 64:
            expected[(a, b)] = d
    got = {(r.id_a, r.id_b): r.edit_dist for r in
           QUERIES["dedup_edit_distance"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# dedup_keep_longest_canonical — 10-token prefix fingerprint clusters
# ---------------------------------------------------------------------------

def test_keep_longest_canonical(spark, sf_dir):
    docs = _docs(sf_dir)
    base = list(docs)
    for doc_id, text in docs:
        if doc_id % 5 == 0:
            base.append((doc_id + 2000000,
                         " ".join(text.strip().split()[:15])))
    clusters = defaultdict(list)
    for doc_id, text in base:
        f = hashlib.md5(" ".join(text.strip().split()[:10]).encode()) \
            .hexdigest()
        clusters[f].append((-len(text), doc_id, len(text)))
    expected = {}
    for members in clusters.values():
        if len(members) <= 1:
            continue
        members.sort()
        _negl, keeper, chars = members[0]
        expected[keeper] = (len(members), chars)
    got = {r.keeper_id: (r.cluster_size, r.keeper_chars) for r in
           QUERIES["dedup_keep_longest_canonical"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# dedup_pipeline_canonical — pairs → components → delete-list
# ---------------------------------------------------------------------------

def test_pipeline_delete_list(spark, sf_dir):
    kept, inter = _guarded_pairs(_docs(sf_dir), 5, 64)
    edges = [(a, b) for (a, b), i in inter.items()
             if i / (len(kept[a]) + len(kept[b]) - i) >= 0.35]
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        for x in (a, b):
            parent.setdefault(x, x)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {x: find(x) for x in parent if find(x) != x}
    got = {r.doc_id: r.canonical_id for r in
           QUERIES["dedup_pipeline_canonical"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# image_phash_near_dup — synthetic pixels, average-hash, block LSH
# ---------------------------------------------------------------------------

def test_phash_twin_recovery(spark, sf_dir):
    con = _con(sf_dir)
    ids = [d for (d,) in con.execute(
        "SELECT doc_id FROM documents WHERE doc_id % 3 = 0").fetchall()]
    con.close()
    pop = [(mid, False) for mid in ids] + [(mid + 1000000, True)
                                           for mid in ids]

    def pixels(mid, twin):
        px = []
        for j in range(64):
            v = ((mid % 1000000) * (2654435761 + j * 81006)) \
                % 4294967296 // 256 % 256
            if twin and j == 17:
                v += 8
            if twin and j == 41:
                v -= 8
            px.append(v)
        return px

    blocks = {}
    for mid, twin in pop:
        px = pixels(mid, twin)
        s = sum(px)
        bits = [1 if px[j] * 64 > s else 0 for j in range(64)]
        blocks[mid] = [sum(bits[blk * 16 + k] << k for k in range(16))
                       for blk in range(4)]
    buckets = defaultdict(set)
    for mid, bvs in blocks.items():
        for blk, bv in enumerate(bvs):
            buckets[(blk, bv)].add(mid)
    cands = {(a, b) for ms in buckets.values()
             for a in ms for b in ms if a < b}
    expected = {}
    for a, b in cands:
        ham = sum(bin(x ^ y).count("1")
                  for x, y in zip(blocks[a], blocks[b]))
        if ham <= 2:
            expected[(a, b)] = (ham, b == a + 1000000)
    got = {(r.id_a, r.id_b): (r.hamming, r.is_injected_twin) for r in
           QUERIES["image_phash_near_dup"](spark, sf_dir).collect()}
    assert got == expected
    # every injected twin must be recovered (nudges flip <= 2 bits)
    assert all((mid, mid + 1000000) in got for mid in ids)


# ---------------------------------------------------------------------------
# length_outlier_mad — interpolated median + MAD per language
# ---------------------------------------------------------------------------

def test_length_outlier_mad(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("SELECT lang, n_chars FROM documents").fetchall()
    con.close()
    per = defaultdict(list)
    for lang, nc in rows:
        per[lang].append(nc)

    def med_cont(vals):
        vals = sorted(vals)
        pos = (len(vals) - 1) / 2
        f = math.floor(pos)
        lo, hi = vals[f], vals[min(f + 1, len(vals) - 1)]
        return lo + (hi - lo) * (pos - f)

    got = {r.lang: r for r in
           QUERIES["length_outlier_mad"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for lang, vals in per.items():
        med = med_cont(vals)
        mad = med_cont([abs(v - med) for v in vals])
        n_out = sum(1 for v in vals if abs(v - med) > 3 * 1.4826 * mad)
        r = got[lang]
        assert r.n_docs == len(vals)
        assert r.n_outliers == n_out
        assert r.med_chars == _r(med, 6)
        assert r.mad_chars == _r(mad, 6)


# ---------------------------------------------------------------------------
# embedding_norm_audit — per-label norm distribution
# ---------------------------------------------------------------------------

def test_embedding_norm_audit(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT label, embedding FROM embeddings").fetchall()
    con.close()
    per = defaultdict(list)
    for lab, v in rows:
        s = 0.0
        for x in v:
            fx = float(x)
            s = s + fx * fx
        per[lab].append(math.sqrt(s))
    got = {r.label: r for r in
           QUERIES["embedding_norm_audit"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for lab, norms in per.items():
        r = got[lab]
        assert r.n_vecs == len(norms)
        assert r.n_zero == sum(1 for n in norms if n == 0)
        assert r.n_unit == sum(1 for n in norms if abs(n - 1.0) <= 0.01)
        assert r.min_norm == _r(min(norms), 6)
        assert r.max_norm == _r(max(norms), 6)
        avg = float(sum((Decimal(repr(n)).quantize(
            Decimal(1).scaleb(-12), rounding=ROUND_HALF_UP)
            for n in norms), Decimal(0))) / len(norms)
        assert r.avg_norm == _r(avg, 6)
