"""Fifteenth replication wave: association rules, BFS levels, hash-based
negative sampling, segment uplift, suffix stemming, SemDeDup pruning,
Gopher quality gates, and the quantile-transform scaler — recomputed
from raw parquet in pure Python (DuckDB fetches raw rows only)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "documents", "embeddings"):
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


def _items(sf_dir):
    """The support-filtered distinct (order, part) basket table."""
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
    return rows


# ---------------------------------------------------------------------------
# association_rules_lift — confidence/lift on the micro grid
# ---------------------------------------------------------------------------

def test_association_rules_confidence_lift(spark, sf_dir):
    items = _items(sf_dir)
    baskets = defaultdict(set)
    for ok, pk in items:
        baskets[ok].add(pk)
    isup = Counter(pk for _ok, pk in items)
    n_baskets = len(baskets)
    pair = Counter()
    for members in baskets.values():
        ms = sorted(members)
        for i, x in enumerate(ms):
            for y in ms[i + 1:]:
                pair[(x, y)] += 1
                pair[(y, x)] += 1
    expected = {}
    for (x, y), sxy in pair.items():
        if sxy < 3 or sxy / isup[x] < 0.10:
            continue
        conf = round(sxy / isup[x] * 1e6) / 1e6
        lift = round(sxy * n_baskets / (isup[x] * isup[y]) * 1e6) / 1e6
        expected[(x, y)] = (sxy, conf, lift)
    got = {(r.antecedent, r.consequent):
           (r.support_count, r.confidence, r.lift)
           for r in QUERIES["association_rules_lift"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# bfs_levels_copurchase — frontier expansion in pure Python
# ---------------------------------------------------------------------------

def test_bfs_levels_pure_python(spark, sf_dir):
    items = _items(sf_dir)
    baskets = defaultdict(set)
    for ok, pk in items:
        baskets[ok].add(pk)
    pair = Counter()
    for members in baskets.values():
        ms = sorted(members)
        for i, x in enumerate(ms):
            for y in ms[i + 1:]:
                pair[(x, y)] += 1
    adj = defaultdict(set)
    for (u, v), c in pair.items():
        if c >= 2:
            adj[u].add(v)
            adj[v].add(u)
    nodes = set(adj)
    src = min(nodes)
    levels = {0: {src}}
    visited = {src}
    frontier = {src}
    for lvl in (1, 2, 3):
        nxt = {y for x in frontier for y in adj[x]} - visited
        levels[lvl] = nxt
        visited |= nxt
        frontier = nxt
    got = {r.level: r.n_nodes for r in
           QUERIES["bfs_levels_copurchase"](spark, sf_dir).collect()}
    for lvl in (0, 1, 2, 3):
        assert got[lvl] == len(levels[lvl]), lvl
    assert got[-1] == len(nodes - visited)


# ---------------------------------------------------------------------------
# negative_sampling_implicit — deterministic hash draws + anti-join
# ---------------------------------------------------------------------------

def test_negative_sampling_acceptance(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT DISTINCT l_orderkey % 100, l_partkey
        FROM lineitem WHERE l_partkey < 500
    """).fetchall()
    con.close()
    pos = set(rows)
    catalog = sorted({item for _u, item in pos})
    ni = len(catalog)
    n_drawn = 3 * len(pos)
    n_clean = 0
    for u, item in pos:
        for k in range(3):
            idx = ((u * 1000003 + item * 31 + k) * 2654435761
                   % 4294967296) % ni
            if (u, catalog[idx]) not in pos:
                n_clean += 1
    [r] = QUERIES["negative_sampling_implicit"](spark, sf_dir).collect()
    assert r.n_positives == len(pos)
    assert r.n_drawn == n_drawn
    assert r.n_clean_negatives == n_clean
    assert r.acceptance_rate == _r(n_clean / n_drawn, 6)


# ---------------------------------------------------------------------------
# segment_uplift_report — hash-split A/A rates per segment
# ---------------------------------------------------------------------------

def test_segment_uplift_hash_split(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT c.c_mktsegment, o.o_custkey, o.o_totalprice
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    """).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0, 0, 0])  # nt, nc, conv_t, conv_c
    for seg, ck, price in rows:
        treated = ((ck * 2654435761 + 283521) % 4294967296) % 2
        conv = 1 if float(price) > 250000 else 0
        a = agg[seg]
        if treated:
            a[0] += 1
            a[2] += conv
        else:
            a[1] += 1
            a[3] += conv
    got = {r.segment: r for r in
           QUERIES["segment_uplift_report"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for seg, (nt, nc, ct, cc) in agg.items():
        r = got[seg]
        assert (r.n_treated, r.n_control) == (nt, nc)
        assert r.rate_treated == _r(ct / nt, 6)
        assert r.rate_control == _r(cc / nc, 6)
        assert r.uplift == _r(ct / nt - cc / nc, 6)


# ---------------------------------------------------------------------------
# stemming_vocab_reduction — Porter-lite suffix rules
# ---------------------------------------------------------------------------

def test_stemming_suffix_rules(spark, sf_dir):
    con = _con(sf_dir)
    texts = [t for (t,) in con.execute(
        "SELECT text FROM documents WHERE lang = 'en'").fetchall()]
    con.close()

    def stem(w):
        if len(w) > 5 and w.endswith("ing"):
            return w[:-3]
        if len(w) > 4 and w.endswith("ed"):
            return w[:-2]
        if len(w) > 3 and w.endswith("es"):
            return w[:-2]
        if len(w) > 3 and w.endswith("s") and not w.endswith("ss"):
            return w[:-1]
        return w

    toks = [w for t in texts for w in t.strip().split()]
    stems = [stem(w) for w in toks]
    [r] = QUERIES["stemming_vocab_reduction"](spark, sf_dir).collect()
    assert r.n_tokens == len(toks)
    assert r.vocab_raw == len(set(toks))
    assert r.vocab_stemmed == len(set(stems))
    assert r.vocab_reduction == _r(1.0 - len(set(stems)) / len(set(toks)), 6)
    assert r.n_tokens_changed == sum(1 for w, s in zip(toks, stems) if w != s)


# ---------------------------------------------------------------------------
# semdedup_prune — cluster route + in-cluster near-dup scan
# ---------------------------------------------------------------------------

def test_semdedup_cluster_prune(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    con.close()
    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    k = max(8, len(vecs) // 250)
    cents = {cid: vecs[cid] for cid in vecs if cid < k}
    assign = {}
    for vid, v in vecs.items():
        assign[vid] = min(((-_cos(v, cv), cid) for cid, cv in cents.items()))[1]
    members = defaultdict(list)
    for vid, cid in assign.items():
        members[cid].append(vid)
    removed = set()
    for cid, vids in members.items():
        vids.sort()
        for i, x in enumerate(vids):
            for y in vids[i + 1:]:
                if _cos(vecs[x], vecs[y]) >= 0.4:
                    removed.add(y)
    got = {r.centroid_id: r for r in
           QUERIES["semdedup_prune"](spark, sf_dir).collect()}
    assert set(got) == set(members)
    for cid, vids in members.items():
        r = got[cid]
        n_rm = sum(1 for v in vids if v in removed)
        assert r.n_members == len(vids)
        assert r.n_removed == n_rm
        assert r.n_kept == len(vids) - n_rm


# ---------------------------------------------------------------------------
# curation_gopher_rules — four quality gates per source
# ---------------------------------------------------------------------------

def test_gopher_gate_counts(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("SELECT source, text FROM documents").fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0, 0, 0, 0, 0, 0])
    for src, text in rows:
        toks = text.strip().split()
        ntok = len(toks)
        mwl = sum(len(t) for t in toks) / ntok
        topr = max(Counter(toks).values()) / ntok
        r1 = 30 <= ntok <= 5000
        r2 = 3.0 <= mwl <= 4.8
        r3 = topr <= 0.15
        r4 = "the" in toks
        a = agg[src]
        a[0] += 1
        if r1 and r2 and r3 and r4:
            a[1] += 1
            a[6] += ntok
        a[2] += 0 if r1 else 1
        a[3] += 0 if r2 else 1
        a[4] += 0 if r3 else 1
        a[5] += 0 if r4 else 1
    got = {r.source: r for r in
           QUERIES["curation_gopher_rules"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for src, (n, npass, fl, fw, fr, fs, kept) in agg.items():
        r = got[src]
        assert (r.n_docs, r.n_pass) == (n, npass)
        assert (r.fail_len, r.fail_wlen, r.fail_rep, r.fail_stop) \
            == (fl, fw, fr, fs)
        assert r.kept_tokens == kept


# ---------------------------------------------------------------------------
# quantile_transform_scaler — rank/(n+1) uniformization at decile grain
# ---------------------------------------------------------------------------

def test_quantile_transform_deciles(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT o_totalprice, o_orderkey FROM orders").fetchall()
    con.close()
    rows.sort()
    n = len(rows)
    per = defaultdict(list)
    for rk0, (price, _ok) in enumerate(rows):
        rk = rk0 + 1
        qv = rk / (n + 1)
        per[int(math.floor(qv * 10))].append((qv, float(price)))
    got = {r.decile: r for r in
           QUERIES["quantile_transform_scaler"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for d, pts in per.items():
        r = got[d]
        assert r.n_rows == len(pts)
        assert r.min_q == _r(min(q for q, _ in pts), 6)
        assert r.max_q == _r(max(q for q, _ in pts), 6)
        assert r.min_price == _r(min(p for _, p in pts), 2)
        assert r.max_price == _r(max(p for _, p in pts), 2)
