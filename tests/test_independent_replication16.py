"""Sixteenth replication wave: linear multi-touch attribution,
rank-aligned cohort matching, exact-median sketch bounds, posting-list
stats, MaxSim late-interaction retrieval, the MMR greedy reranker,
sparse TF-IDF cosine pairs, the 2-D Pareto skyline, and the Day-N
retention curve — recomputed from raw parquet in pure Python."""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from datetime import timedelta
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "customer", "events", "documents", "embeddings"):
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


def _dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s = s + x * y
    return s


def _cos(a, b):
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


def _g(x: float) -> int:
    return int(math.floor(x + 0.5))


# ---------------------------------------------------------------------------
# multi_touch_attribution — 30-minute touch windows, grid-restored totals
# ---------------------------------------------------------------------------

def test_multi_touch_linear_attribution(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT event_id, user_id, epoch_us(ts), event_type, value
        FROM events WHERE event_type IN ('purchase', 'click')
    """).fetchall()
    con.close()
    clicks = defaultdict(list)
    for _eid, uid, t, et, _v in rows:
        if et == "click":
            clicks[uid].append(t)
    per_user = defaultdict(lambda: [0, Decimal(0)])
    win = 30 * 60 * 1_000_000
    for _eid, uid, t, et, v in rows:
        if et != "purchase":
            continue
        n = sum(1 for ct in clicks.get(uid, ())
                if ct <= t and ct > t - win)
        if n == 0:
            continue
        a = per_user[uid]
        a[0] += 1
        a[1] += _rd(float(v) / n, 9) * n
    got = {r.user_id: r for r in
           QUERIES["multi_touch_attribution"](spark, sf_dir).collect()}
    assert set(got) == set(per_user)
    for uid, (np_, val) in per_user.items():
        r = got[uid]
        assert r.n_attributed_purchases == np_
        assert r.attributed_value == _r(float(val), 4)


# ---------------------------------------------------------------------------
# matched_cohort_rank_pairing — quantile-aligned matching gaps
# ---------------------------------------------------------------------------

def test_matched_cohort_rank_alignment(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT user_id, COUNT(*) FROM events GROUP BY user_id").fetchall()
    con.close()
    arms = {1: [], 0: []}
    for uid, n in rows:
        arms[((uid * 2654435761 + 283521) % 4294967296) % 2].append((n, uid))
    a = sorted(arms[1])
    b = sorted(arms[0])
    na, nb = len(a), len(b)
    gaps = []
    for rk0, (n_ev, _uid) in enumerate(a):
        rk = rk0 + 1
        brk = min(nb, max(1, (rk * nb + na // 2) // na))
        gaps.append(abs(n_ev - b[brk - 1][0]))
    [r] = QUERIES["matched_cohort_rank_pairing"](spark, sf_dir).collect()
    assert r.n_pairs == na
    assert r.total_activity_gap == sum(gaps)
    assert r.avg_activity_gap == _r(sum(gaps) / na, 4)
    assert r.worst_pair_gap == max(gaps)


# ---------------------------------------------------------------------------
# quantile_sketch_bounds — exact medians; sketch bound pinned TRUE
# ---------------------------------------------------------------------------

def test_quantile_sketch_exact_median(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT c_mktsegment, c_acctbal, c_custkey FROM customer").fetchall()
    con.close()
    per = defaultdict(list)
    for seg, bal, ck in rows:
        per[seg].append((float(bal), ck))
    got = {r.c_mktsegment: r for r in
           QUERIES["quantile_sketch_bounds"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for seg, vals in per.items():
        vals.sort()
        n = len(vals)
        r = got[seg]
        assert r.n_rows == n
        assert r.exact_median == vals[math.ceil(n / 2.0) - 1][0]
        assert r.sketch_within_rank_bound is True


# ---------------------------------------------------------------------------
# inverted_index — posting-list stats
# ---------------------------------------------------------------------------

def test_inverted_index_postings(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("SELECT doc_id, text FROM documents").fetchall()
    con.close()
    df = defaultdict(set)
    tf = Counter()
    first = {}
    for doc_id, text in rows:
        for w in text.strip().split():
            df[w].add(doc_id)
            tf[w] += 1
            if w not in first or doc_id < first[w]:
                first[w] = doc_id
    got = {r.term: r for r in
           QUERIES["inverted_index"](spark, sf_dir).collect()}
    assert set(got) == set(df)
    for term in df:
        r = got[term]
        assert (r.df, r.total_tf, r.first_doc) \
            == (len(df[term]), tf[term], first[term])


# ---------------------------------------------------------------------------
# multivector_maxsim_retrieval — round-then-max late interaction
# ---------------------------------------------------------------------------

def test_maxsim_pooled_topk(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT vec_id, label, embedding FROM embeddings").fetchall()
    con.close()
    vecs = {vid: ([float(x) for x in v], lab) for vid, lab, v in
            ((vid, lab, v) for vid, lab, v in rows)}
    queries = {vid: v for vid, (v, _l) in vecs.items() if vid < 8}
    corpus = {vid: (v, lab) for vid, (v, lab) in vecs.items() if vid >= 8}
    expected = {}
    for qid, qv in queries.items():
        pooled = defaultdict(lambda: [-2.0, 0])
        for _vid, (v, lab) in corpus.items():
            c = _r(_cos(qv, v), 6)
            p = pooled[lab]
            p[0] = max(p[0], c)
            p[1] += 1
        top = sorted(pooled.items(), key=lambda kv: (-kv[1][0], kv[0]))[:3]
        expected[qid] = [(lab, ms, nv) for lab, (ms, nv) in top]
    got = defaultdict(list)
    for r in QUERIES["multivector_maxsim_retrieval"](spark, sf_dir).collect():
        got[r.query_id].append((r.label, r.maxsim, r.n_vectors))
    assert dict(got) == expected


# ---------------------------------------------------------------------------
# mmr_diversified_rerank — the greedy loop, replayed
# ---------------------------------------------------------------------------

def test_mmr_greedy_selection(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    con.close()
    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    qv = vecs[0]
    rel = {vid: _cos(v, qv) for vid, v in vecs.items() if vid != 0}
    pool = sorted(rel, key=lambda k: (-rel[k], k))[:12]
    picked = [pool[0]]
    steps = [(1, pool[0], rel[pool[0]], 0.7 * rel[pool[0]])]
    for step in range(2, 6):
        best = None
        for cid in pool:
            if cid in picked:
                continue
            max_sim = max(_cos(vecs[cid], vecs[s]) for s in picked)
            mmr = 0.7 * rel[cid] - 0.3 * max_sim
            key = (-mmr, cid)
            if best is None or key < best[0]:
                best = (key, cid, mmr)
        _k, cid, mmr = best
        picked.append(cid)
        steps.append((step, cid, rel[cid], mmr))
    got = sorted(QUERIES["mmr_diversified_rerank"](spark, sf_dir).collect(),
                 key=lambda r: r.step)
    assert [(r.step, r.vec_id) for r in got] \
        == [(s, vid) for s, vid, _r_, _m in steps]
    for r, (_s, _vid, rl, mm) in zip(got, steps):
        assert r.relevance == _r(rl, 6)
        assert r.mmr_score == _r(mm, 6)


# ---------------------------------------------------------------------------
# tfidf_cosine_pairs — inverted-index self-join on the decimal grid
# ---------------------------------------------------------------------------

def test_tfidf_pairs_grid_cosine(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT doc_id, text FROM documents WHERE doc_id < 250").fetchall()
    con.close()
    tf = defaultdict(Counter)
    for doc_id, text in rows:
        for w in text.strip().split():
            tf[doc_id][w] += 1
    df = Counter()
    for terms in tf.values():
        for w in terms:
            df[w] += 1
    n_docs = float(len(tf))
    w = {doc: {t: _r(c * math.log(n_docs / df[t]), 6)
               for t, c in terms.items() if 2 <= df[t] <= 100}
         for doc, terms in tf.items()}
    nrm2 = {doc: float(sum((_rd(x * x, 6) for x in ws.values()), Decimal(0)))
            for doc, ws in w.items() if ws}
    expected = {}
    docs = sorted(nrm2)
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            shared = set(w[a]) & set(w[b])
            if not shared:
                continue
            dot = float(sum((_rd(w[a][t] * w[b][t], 6) for t in sorted(shared)),
                            Decimal(0)))
            cos = dot / math.sqrt(nrm2[a]) / math.sqrt(nrm2[b])
            if cos >= 0.15:
                expected[(a, b)] = _r(cos, 6)
    got = {(r.doc_a, r.doc_b): r.cosine for r in
           QUERIES["tfidf_cosine_pairs"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# pareto_skyline_2d — dominance sweep on exact integer axes
# ---------------------------------------------------------------------------

def test_pareto_skyline_sweep(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o_orderkey, o_totalprice,
               datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)),
               CAST(o_orderdate AS DATE)
        FROM orders""").fetchall()
    con.close()
    pts = [(_g(float(p) * 100), ed, ok, od) for ok, p, ed, od in rows]
    pts.sort(key=lambda t: (-t[0], t[2]))
    sky = []
    best_ed = None
    prev_price = None
    pending = []
    for pc, ed, ok, od in pts:
        if prev_price is not None and pc != prev_price:
            for e in pending:
                best_ed = e if best_ed is None else max(best_ed, e)
            pending = []
        if best_ed is None or ed > best_ed:
            sky.append((pc, ok, od))
        pending.append(ed)
        prev_price = pc
    got = QUERIES["pareto_skyline_2d"](spark, sf_dir).collect()
    assert len(got) == min(25, len(sky))
    for r, (pc, ok, od) in zip(got, sky[:25]):
        assert r.o_orderkey == ok
        assert r.price == pc / 100.0
        assert r.order_day == od
        assert r.skyline_size == len(sky)


# ---------------------------------------------------------------------------
# dn_retention_curve — eligibility-corrected D1/D7/D14
# ---------------------------------------------------------------------------

def test_dn_retention_eligibility(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT DISTINCT user_id, CAST(ts AS DATE) FROM events").fetchall()
    con.close()
    days = defaultdict(set)
    for uid, d in rows:
        days[uid].add(d)
    end_day = max(d for ds in days.values() for d in ds)
    n_users = len(days)
    elig = {k: 0 for k in (1, 7, 14)}
    ret = {k: 0 for k in (1, 7, 14)}
    for uid, ds in days.items():
        d0 = min(ds)
        for k in (1, 7, 14):
            if d0 + timedelta(days=k) <= end_day:
                elig[k] += 1
                if d0 + timedelta(days=k) in ds:
                    ret[k] += 1
    [r] = QUERIES["dn_retention_curve"](spark, sf_dir).collect()
    assert r.n_users == n_users
    assert r.d1_retention == _r(ret[1] / elig[1], 6)
    assert r.d7_retention == _r(ret[7] / elig[7], 6)
    assert r.d14_retention == _r(ret[14] / elig[14], 6)
