"""Thirty-fourth replication wave — the curation/governance layer:
hash splits, token packing, PII scrubbing, Efraimidis-Spirakis weighted
draws, k-anonymity, RAG chunking, incremental-ingest dedup, cluster-size
histograms, the dbt-style expectation suite, positional phrase search,
trigram paths, linear interpolation, tokenizer fertility, and the
shadow-model decision diff — recomputed from raw parquet in pure
Python."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from datetime import date, timedelta
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES

KNUTH = 2654435761
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+"
PHONE_RE = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"


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


def _docs(sf_dir):
    con = _con(sf_dir, ("documents",))
    rows = con.execute(
        "SELECT doc_id, text, lang, source, n_chars FROM documents").fetchall()
    con.close()
    return rows


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _fp(text: str) -> str:
    return _md5(re.sub(r"\s+", " ", text.strip()).lower())


# ---------------------------------------------------------------------------
# curation_train_split / curation_token_packing / curation_pii_scrub
# ---------------------------------------------------------------------------

def test_curation_train_split(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0])
    for doc_id, _t, _l, src, n_chars in _docs(sf_dir):
        b = (doc_id * KNUTH) % 4294967296 % 100
        split = "train" if b < 80 else "val" if b < 90 else "test"
        a = agg[(src, split)]
        a[0] += 1
        a[1] += n_chars
    expected = {k: tuple(v) for k, v in agg.items()}
    got = {(r.source, r.split): (r.n_docs, r.total_chars)
           for r in QUERIES["curation_train_split"](spark, sf_dir).collect()}
    assert got == expected


def test_curation_token_packing(spark, sf_dir):
    per_src = defaultdict(list)
    for doc_id, text, _l, src, _n in _docs(sf_dir):
        per_src[src].append((doc_id, len(text.strip().split())))
    agg = defaultdict(lambda: [0, 0])
    for src, rows in per_src.items():
        rows.sort()
        cum = 0
        for _doc_id, ntok in rows:
            b = math.floor(cum / 512.0)
            a = agg[(src, b)]
            a[0] += 1
            a[1] += ntok
            cum += ntok
    expected = {k: tuple(v) for k, v in agg.items()}
    got = {(r.source, r.bin): (r.n_docs, r.bin_tokens)
           for r in QUERIES["curation_token_packing"](spark, sf_dir).collect()}
    assert got == expected


def test_curation_pii_scrub(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0, 0])
    for doc_id, text, _l, src, _n in _docs(sf_dir):
        h = (doc_id * KNUTH + 7 * 40503) % 4294967296
        if h % 5 in (0, 1):
            t = f"{text} contact user{h % 997}@example.com now"
        elif h % 5 == 2:
            t = f"{text} call 555-867-5309 today"
        else:
            t = text
        a = agg[src]
        a[0] += len(re.findall(EMAIL_RE, t))
        a[1] += len(re.findall(PHONE_RE, t))
        a[2] += len(re.sub(PHONE_RE, "<PHONE>",
                           re.sub(EMAIL_RE, "<EMAIL>", t)))
    expected = {k: tuple(v) for k, v in agg.items()}
    got = {r.source: (r.n_emails, r.n_phones, r.clean_chars)
           for r in QUERIES["curation_pii_scrub"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# curation_weighted_sample — Efraimidis-Spirakis deterministic draw
# ---------------------------------------------------------------------------

def test_curation_weighted_sample(spark, sf_dir):
    keyed = []
    for doc_id, _t, _l, src, n_chars in _docs(sf_dir):
        if n_chars <= 0:
            continue
        u = ((doc_id * KNUTH) % 4294967296 % 1000000 + 0.5) / 1000000.0
        k = u ** (1.0 / (n_chars / 100.0))
        keyed.append((k, doc_id, src, n_chars))
    top = sorted(keyed, key=lambda t: (-t[0], t[1]))[:50]
    expected = {doc_id: (src, n) for _k, doc_id, src, n in top}
    got = {r.doc_id: (r.source, r.n_chars)
           for r in QUERIES["curation_weighted_sample"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# k_anonymity_audit / dedup_cluster_size_histogram / incremental dedup
# ---------------------------------------------------------------------------

def test_k_anonymity_audit(spark, sf_dir):
    g = Counter((lang, src) for _d, _t, lang, src, _n in _docs(sf_dir))
    row = QUERIES["k_anonymity_audit"](spark, sf_dir).collect()[0]
    assert row.n_groups == len(g)
    assert row.min_group_size == min(g.values())
    assert row.groups_below_k5 == sum(1 for v in g.values() if v < 5)
    assert row.rows_below_k5 == sum(v for v in g.values() if v < 5)


def test_dedup_cluster_size_histogram(spark, sf_dir):
    fps = []
    for doc_id, text, _l, _s, _n in _docs(sf_dir):
        fps.append(_fp(text))
        if doc_id % 3 == 0:
            fps.append(_fp(text))
    sizes = Counter(Counter(fps).values())
    expected = {sz: (n, sz * n, (sz - 1) * n) for sz, n in sizes.items()}
    got = {r.cluster_size: (r.n_clusters, r.n_docs, r.n_removable)
           for r in QUERIES["dedup_cluster_size_histogram"](spark, sf_dir).collect()}
    assert got == expected
    assert any(sz >= 2 for sz in expected)  # injected dups guarantee it


def test_incremental_ingest_dedup(spark, sf_dir):
    hist = set()
    batch = []
    for doc_id, text, _l, src, _n in _docs(sf_dir):
        b = (doc_id * KNUTH) % 4294967296 % 100
        fp = _fp(text)
        if b < 80:
            hist.add(fp)
        else:
            batch.append((doc_id, src, fp))
    best = {}
    for doc_id, src, fp in batch:
        if fp in hist:
            continue
        if fp not in best or doc_id < best[fp][0]:
            best[fp] = (doc_id, src)
    expected = {fp: v for fp, v in best.items()}
    got = {r.fp: (r.doc_id, r.source)
           for r in QUERIES["incremental_ingest_dedup"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# data_expectations_report — the five-expectation suite
# ---------------------------------------------------------------------------

def test_data_expectations_report(spark, sf_dir):
    con = _con(sf_dir, ("orders", "customer"))
    orders = con.execute("""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
    """).fetchall()
    custs = {r[0] for r in con.execute(
        "SELECT c_custkey FROM customer").fetchall()}
    con.close()
    keys = [ok for ok, *_x in orders]
    nn = sum(1 for k in keys if k is None)
    uq = len(keys) - len(set(keys))
    av = sum(1 for _ok, _ck, s, _p in orders if s not in ("O", "F", "P"))
    pos = sum(1 for *_x, p in orders if p <= 0)
    fk = sum(1 for _ok, ck, _s, _p in orders if ck not in custs)
    expected = {
        "orders.o_orderkey.not_null": (nn, nn == 0),
        "orders.o_orderkey.unique": (uq, uq == 0),
        "orders.o_orderstatus.accepted_values": (av, av == 0),
        "orders.o_totalprice.positive": (pos, pos == 0),
        "orders.o_custkey.relationship_customer": (fk, fk == 0),
    }
    got = {r.expectation: (r.n_violations, r.passed)
           for r in QUERIES["data_expectations_report"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# rag_chunk_documents / phrase_search_positional / action_trigram_paths
# ---------------------------------------------------------------------------

def test_rag_chunk_documents(spark, sf_dir):
    expected = {}
    for doc_id, text, _l, _s, _n in _docs(sf_dir):
        toks = text.strip().split()
        if not toks:
            continue
        for st in range(0, len(toks), 24):
            expected[(doc_id, st // 24)] = (
                " ".join(toks[st:st + 32]), min(32, len(toks) - st))
    got = {(r.doc_id, r.chunk_id): (r.chunk, r.chunk_ntok)
           for r in QUERIES["rag_chunk_documents"](spark, sf_dir).collect()}
    assert got == expected


def test_phrase_search_positional(spark, sf_dir):
    expected = {}
    for doc_id, text, _l, _s, _n in _docs(sf_dir):
        toks = [t.lower() for t in text.strip().split()]
        hits = [i + 1 for i, (a, b) in enumerate(zip(toks, toks[1:]))
                if a == "table" and b == "hash"]
        if hits:
            expected[doc_id] = (len(hits), min(hits))
    got = {r.doc_id: (r.n_hits, r.first_pos)
           for r in QUERIES["phrase_search_positional"](spark, sf_dir).collect()}
    assert got == expected


def test_action_trigram_paths(spark, sf_dir):
    con = _con(sf_dir, ("events",))
    rows = con.execute("""
        SELECT user_id, event_type, epoch_us(ts), event_id FROM events
    """).fetchall()
    con.close()
    per_user = defaultdict(list)
    for uid, et, us, eid in rows:
        per_user[uid].append((us, eid, et))
    occ = Counter()
    users = defaultdict(set)
    for uid, seq in per_user.items():
        seq.sort()
        types = [et for _us, _eid, et in seq]
        for a, b, c in zip(types, types[1:], types[2:]):
            path = f"{a}>{b}>{c}"
            occ[path] += 1
            users[path].add(uid)
    ranked = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:15]
    expected = {p: (n, len(users[p])) for p, n in ranked}
    got = {r.path: (r.n_occurrences, r.n_users)
           for r in QUERIES["action_trigram_paths"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# timeseries_interpolate_linear
# ---------------------------------------------------------------------------

def test_timeseries_interpolate_linear(spark, sf_dir):
    con = _con(sf_dir, ("orders",))
    rows = con.execute(
        "SELECT CAST(o_orderdate AS DATE), o_totalprice FROM orders").fetchall()
    con.close()
    anchor0 = date(1995, 1, 1)
    daily = defaultdict(Decimal)
    for d, p in rows:
        if (d - anchor0).days % 3 == 0:
            daily[d] += _dec(p, 2)
    totals = {d: _r(float(s), 2) for d, s in daily.items()}
    lo, hi = min(totals), max(totals)
    days = [lo + timedelta(days=i) for i in range((hi - lo).days + 1)]
    anchors = sorted(totals)
    expected = {}
    for d in days:
        if d in totals:
            expected[d] = (_r(totals[d], 4), False)
            continue
        prev = max((a for a in anchors if a < d), default=None)
        nxt = min((a for a in anchors if a > d), default=None)
        if prev is None:
            v = totals[nxt]
        elif nxt is None:
            v = totals[prev]
        else:
            v = totals[prev] + (totals[nxt] - totals[prev]) \
                * (d - prev).days / (nxt - prev).days
        expected[d] = (_r(v, 4), True)
    from datetime import datetime

    got = {(r.day.date() if isinstance(r.day, datetime) else r.day):
           (r.value_interp, r.was_gap)
           for r in QUERIES["timeseries_interpolate_linear"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# tokenizer_fertility_by_lang / shadow_model_compare
# ---------------------------------------------------------------------------

def test_tokenizer_fertility_by_lang(spark, sf_dir):
    splitter = re.compile(r"[\s\.,;:!\?'\"()\[\]{}\-]+")
    agg = defaultdict(lambda: [0, 0, 0])
    for _d, text, lang, _s, _n in _docs(sf_dir):
        a = agg[lang]
        a[0] += len([t for t in splitter.split(text) if t])
        a[1] += len(text.strip().split())
        a[2] += len(text)
    expected = {lang: (bpe, ws, _r(bpe / ws, 6), _r(ch / bpe, 6))
                for lang, (bpe, ws, ch) in agg.items()}
    got = {r.lang: (r.bpe_tokens, r.ws_tokens, r.fertility,
                    r.chars_per_token)
           for r in QUERIES["tokenizer_fertility_by_lang"](spark, sf_dir).collect()}
    assert got == expected


def test_shadow_model_compare(spark, sf_dir):
    n = ko = kn = nd = nk = flips = 0
    for _d, text, _l, _s, n_chars in _docs(sf_dir):
        x1 = _r(n_chars / 1000.0, 6)
        x2 = _r((len(text) - len(text.replace(" ", ""))) / n_chars, 6)
        z_old = _r(-0.2 + 0.5 * x1 + 1.0 * x2, 6)
        z_new = _r(-0.4 + 0.3 * x1 + 1.6 * x2, 6)
        keep_old, keep_new = z_old > 0, z_new > 0
        n += 1
        ko += keep_old
        kn += keep_new
        nd += keep_old and not keep_new
        nk += keep_new and not keep_old
        flips += keep_old != keep_new
    row = QUERIES["shadow_model_compare"](spark, sf_dir).collect()[0]
    assert (row.n_docs, row.kept_old, row.kept_new, row.newly_dropped,
            row.newly_kept) == (n, ko, kn, nd, nk)
    assert row.decision_flip_rate == _r(flips / n, 6)
