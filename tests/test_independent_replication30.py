"""Thirtieth replication wave — layout effectiveness and the text/
curation monitoring layer: Z-order pruning measured against a linear
layout, BPE merge scans and token budgets, the stopword lang-ID
confusion matrix, rendezvous-hash minimal movement, global id
assignment, DAU/MAU, Markov transitions, bag-of-words and per-source
dedup rates, the cross-source contamination matrix, eval-set
decontamination, and the bigram repetition filter — recomputed from raw
parquet in pure Python."""

from __future__ import annotations

import hashlib
import math
import re
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


def _docs(sf_dir):
    con = _con(sf_dir, ("documents",))
    rows = con.execute(
        "SELECT doc_id, text, lang, source FROM documents").fetchall()
    con.close()
    return rows


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


# ---------------------------------------------------------------------------
# zorder_pruning_effectiveness — two layouts, one 2-D range predicate
# ---------------------------------------------------------------------------

def test_zorder_pruning_effectiveness(spark, sf_dir):
    con = _con(sf_dir, ("orders",))
    rows = con.execute(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders").fetchall()
    con.close()
    alo = min(r[1] for r in rows)
    ahi = max(r[1] for r in rows)
    blo = min(r[2] for r in rows)
    bhi = max(r[2] for r in rows)
    clo, chi = alo + 0.45 * (ahi - alo), alo + 0.55 * (ahi - alo)
    plo, phi = blo + 0.45 * (bhi - blo), blo + 0.55 * (bhi - blo)
    zones = defaultdict(lambda: [None, None, None, None, 0])
    for ok, ck, price in rows:
        za = 0 if ahi - alo <= 0 else min(
            math.floor((ck - alo) * 256.0 / (ahi - alo + 1)), 255)
        zb = 0 if bhi - blo <= 0 else min(
            math.floor((price - blo) * 256.0 / (bhi - blo + 1)), 255)
        zkey = 0
        for i in range(8):
            zkey |= ((za >> i) & 1) << (2 * i)
            zkey |= ((zb >> i) & 1) << (2 * i + 1)
        for layout, zone in (("linear", math.floor(ok / 1000.0)),
                             ("zorder", math.floor(zkey / 4096.0))):
            z = zones[(layout, zone)]
            z[0] = ck if z[0] is None else min(z[0], ck)
            z[1] = ck if z[1] is None else max(z[1], ck)
            z[2] = price if z[2] is None else min(z[2], price)
            z[3] = price if z[3] is None else max(z[3], price)
            z[4] += 1
    expected = defaultdict(lambda: [0, 0, 0])
    for (layout, _zone), (cmin, cmax, pmin, pmax, n) in zones.items():
        e = expected[layout]
        e[0] += 1
        if cmax >= clo and cmin <= chi and pmax >= plo and pmin <= phi:
            e[1] += 1
            e[2] += n
    expected = {k: tuple(v) for k, v in expected.items()}
    got = {r.layout: (r.n_zones, r.zones_scanned, r.rows_scanned)
           for r in QUERIES["zorder_pruning_effectiveness"](spark, sf_dir).collect()}
    assert got == expected
    # the layout claim: z-order scans fewer rows for the 2-D rectangle
    assert expected["zorder"][2] < expected["linear"][2]


# ---------------------------------------------------------------------------
# bpe_merge_candidates / bpe_token_budget
# ---------------------------------------------------------------------------

def test_bpe_merge_candidates(spark, sf_dir):
    wc = Counter()
    for _id, text, _l, _s in _docs(sf_dir):
        for w in text.strip().lower().split():
            wc[w] += 1
    pairs = Counter()
    for w, c in wc.items():
        if len(w) >= 2:
            for i in range(len(w) - 1):
                pairs[w[i:i + 2]] += c
    top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = [(r.pair, r.pair_count)
           for r in QUERIES["bpe_merge_candidates"](spark, sf_dir).collect()]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == top


def test_bpe_token_budget(spark, sf_dir):
    splitter = re.compile(r"[\s\.,;:!\?'\"()\[\]{}\-]+")
    agg = defaultdict(lambda: [0, 0])
    for _id, text, _l, src in _docs(sf_dir):
        toks = [t for t in splitter.split(text) if t]
        agg[src][0] += len(toks)
        agg[src][1] += len(text)
    expected = {k: tuple(v) for k, v in agg.items()}
    got = {r.source: (r.total_bpe_tokens, r.total_chars)
           for r in QUERIES["bpe_token_budget"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# text_quality_metrics / text_lang_id_confusion / text_repetition_filter
# ---------------------------------------------------------------------------

def test_text_quality_metrics(spark, sf_dir):
    expected = {}
    for doc_id, text, _l, _s in _docs(sf_dir):
        if doc_id >= 100:
            continue
        toks = text.strip().split()
        n = len(toks)
        expected[doc_id] = (len(text), n, _r(len(text) / n, 6),
                            _r(len(set(toks)) / n, 6))
    got = {r.doc_id: (r.q_n_chars, r.q_n_tokens, r.q_chars_per_token,
                      r.q_distinct_ratio)
           for r in QUERIES["text_quality_metrics"](spark, sf_dir).collect()}
    assert got == expected


_STOPS = [
    ("de", {"der", "die", "das", "und", "ist", "von", "den", "ein", "eine", "mit"}),
    ("en", {"the", "a", "of", "and", "to", "in", "is", "that", "it", "for"}),
    ("es", {"el", "la", "de", "que", "y", "en", "un", "una", "por", "los"}),
    ("fr", {"le", "la", "de", "et", "les", "des", "un", "une", "du", "est"}),
    ("zh", {"的", "是", "在", "了", "和", "有", "我", "他", "这", "不"}),
]


def test_text_lang_id_confusion(spark, sf_dir):
    agg = Counter()
    for _id, text, lang, _s in _docs(sf_dir):
        toks = {t.lower() for t in text.strip().split() if t}
        scores = [(code, len(toks & stop)) for code, stop in _STOPS]
        best = max(s for _c, s in scores)
        # zero stopword hits -> 'und' (the operator's honest answer)
        detected = ("und" if best == 0
                    else next(c for c, s in scores if s == best))
        agg[(lang, detected)] += 1
    got = {(r.lang, r.detected): r.n_docs
           for r in QUERIES["text_lang_id_confusion"](spark, sf_dir).collect()}
    assert got == dict(agg)


def test_text_repetition_filter(spark, sf_dir):
    expected = {}
    for doc_id, text, _l, _s in _docs(sf_dir):
        toks = text.strip().split()
        if len(toks) < 2:
            continue
        big = Counter(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        top = max(big.values())
        ratio = top / (len(toks) - 1)
        expected[doc_id] = (top, _r(ratio, 6), ratio <= 0.2)
    got = {r.doc_id: (r.top_bigram_count, r.top_bigram_ratio, r.keep)
           for r in QUERIES["text_repetition_filter"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# rendezvous_hashing_stability — HRW minimal movement
# ---------------------------------------------------------------------------

def test_rendezvous_hashing_stability(spark, sf_dir):
    doc_ids = [d for d, *_x in _docs(sf_dir)]

    def key(doc_id, s):
        return ((doc_id * 8 + s) * 2654435761 % 4294967296) * 8 + s

    before = {d: max(range(8), key=lambda s: key(d, s)) for d in doc_ids}
    after = {d: max((s for s in range(8) if s != 3), key=lambda s: key(d, s))
             for d in doc_ids}
    stable = all(before[d] == after[d] for d in doc_ids if before[d] != 3)
    expected = {}
    for s in range(8):
        expected[s] = (
            sum(1 for d in doc_ids if before[d] == s),
            sum(1 for d in doc_ids if after[d] == s),
            sum(1 for d in doc_ids if before[d] == 3 and after[d] == s),
            stable,
        )
    got = {r.shard: (r.n_before, r.n_after, r.n_inherited,
                     r.only_removed_shard_moved)
           for r in QUERIES["rendezvous_hashing_stability"](spark, sf_dir).collect()}
    assert got == expected
    assert stable is True  # the HRW theorem the query exists to pin


# ---------------------------------------------------------------------------
# global_id_assignment — two-level construction == naive global order
# ---------------------------------------------------------------------------

def test_global_id_assignment(spark, sf_dir):
    rows = sorted((src, doc_id) for doc_id, _t, _l, src in _docs(sf_dir))
    expected = {(doc_id, src): i for i, (src, doc_id) in enumerate(rows)}
    got = {(r.doc_id, r.source): r.global_id
           for r in QUERIES["global_id_assignment"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# dau_mau_stickiness / markov_transition_matrix
# ---------------------------------------------------------------------------

def _events(sf_dir):
    con = _con(sf_dir, ("events",))
    rows = con.execute("""
        SELECT event_id, user_id, event_type, ts, epoch_us(ts) FROM events
    """).fetchall()
    con.close()
    return rows


def test_dau_mau_stickiness(spark, sf_dir):
    dau = defaultdict(set)
    mau = defaultdict(set)
    for _eid, uid, _et, ts, _us in _events(sf_dir):
        m = date(ts.year, ts.month, 1)
        dau[(m, ts.date())].add(uid)
        mau[m].add(uid)
    expected = {}
    for m, users in mau.items():
        days = [len(v) for (mm, _d), v in dau.items() if mm == m]
        avg = sum(days) / len(days)
        expected[m] = (len(days), _r(avg, 4), len(users),
                       _r(avg / len(users), 6))
    got = {r.month: (r.n_days, r.avg_dau, r.mau, r.stickiness)
           for r in QUERIES["dau_mau_stickiness"](spark, sf_dir).collect()}
    assert got == expected


def test_markov_transition_matrix(spark, sf_dir):
    per_user = defaultdict(list)
    for eid, uid, et, _ts, us in _events(sf_dir):
        per_user[uid].append((us, eid, et))
    pairs = Counter()
    for uid, seq in per_user.items():
        seq.sort()
        for (_u1, _e1, a), (_u2, _e2, b) in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    tot = Counter()
    for (a, _b), n in pairs.items():
        tot[a] += n
    expected = {(a, b): (n, _r(n / tot[a], 6)) for (a, b), n in pairs.items()}
    got = {(r.prev_type, r.next_type): (r.n_transitions, r.p_transition)
           for r in QUERIES["markov_transition_matrix"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# dedup_bag_of_words / dedup_rate_by_source
# ---------------------------------------------------------------------------

def test_dedup_bag_of_words(spark, sf_dir):
    groups = defaultdict(lambda: [0, set()])
    for _id, text, _l, _s in _docs(sf_dir):
        toks = text.strip().split()
        bow = _md5(" ".join(sorted(toks)))
        exact = _md5(" ".join(toks))
        groups[bow][0] += 1
        groups[bow][1].add(exact)
    n_groups = len(groups)
    n_docs = sum(g[0] for g in groups.values())
    n_bow_dups = sum(g[0] - 1 for g in groups.values() if g[0] > 1)
    n_perm = sum(len(g[1]) - 1 for g in groups.values() if len(g[1]) > 1)
    row = QUERIES["dedup_bag_of_words"](spark, sf_dir).collect()[0]
    assert (row.n_bow_groups, row.n_docs, row.n_bow_duplicates,
            row.n_order_permuted_variants) == (n_groups, n_docs,
                                               n_bow_dups, n_perm)


def test_dedup_rate_by_source(spark, sf_dir):
    agg = defaultdict(lambda: [0, set()])
    for _id, text, _l, src in _docs(sf_dir):
        fp = _md5(re.sub(r"\s+", " ", text.strip()).lower())
        agg[src][0] += 1
        agg[src][1].add(fp)
    expected = {src: (n, len(u), _r(1.0 - len(u) / n, 6))
                for src, (n, u) in agg.items()}
    got = {r.source: (r.n_docs, r.n_unique, r.dup_rate)
           for r in QUERIES["dedup_rate_by_source"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# cross_source_contamination / decontaminate_against_eval
# ---------------------------------------------------------------------------

def test_cross_source_contamination(spark, sf_dir):
    doc_shingles = {}
    src_of = {}
    for doc_id, text, _l, src in _docs(sf_dir):
        toks = text.strip().split()
        if len(toks) >= 5:
            sh = {" ".join(toks[i:i + 5]) for i in range(len(toks) - 4)}
        else:
            sh = {" ".join(toks)}
        doc_shingles[doc_id] = sh
        src_of[doc_id] = src
    df = Counter(s for sh in doc_shingles.values() for s in sh)
    src_sh = defaultdict(set)
    for doc_id, sh in doc_shingles.items():
        for s in sh:
            if df[s] <= 64:
                src_sh[src_of[doc_id]].add(s)
    srcs = sorted(src_sh)
    expected = {}
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            shared = len(src_sh[a] & src_sh[b])
            if shared:
                expected[(a, b)] = shared
    got = {(r.src_a, r.src_b): r.shared_shingles
           for r in QUERIES["cross_source_contamination"](spark, sf_dir).collect()}
    assert got == expected


def test_decontaminate_against_eval(spark, sf_dir):
    sh = {}
    bucket = {}
    for doc_id, text, _l, _s in _docs(sf_dir):
        toks = text.strip().split()
        bucket[doc_id] = ((doc_id * 2654435761 + 13 * 40503)
                          % 4294967296) % 97
        if len(toks) >= 4:
            sh[doc_id] = {" ".join(toks[i:i + 4])
                          for i in range(len(toks) - 3)}
    evals = {d for d, b in bucket.items() if b == 0 and d in sh}
    trains = {d for d, b in bucket.items() if b != 0 and d in sh}
    expected = {}
    for e in evals:
        for t in trains:
            shared = len(sh[t] & sh[e])
            if shared >= 1:
                expected[(t, e)] = shared
    got = {(r.train_id, r.eval_id): r.n_shared
           for r in QUERIES["decontaminate_against_eval"](spark, sf_dir).collect()}
    assert got == expected
