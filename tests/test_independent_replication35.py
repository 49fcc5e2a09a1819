"""Thirty-fifth replication wave — closing the corpus: IGNORE NULLS
windows, multi-match regex, shifted window origins, compaction bins,
the bloom filter bit-for-bit, format/CSV/JSONL round-trips, file
provenance, collation grouping, join-strategy parity, the array surface,
the linear quality scorer, the synthetic multimodal plumbing, bucketed
joins, and dynamic partition overwrite — recomputed from raw parquet in
pure Python."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter, defaultdict
from datetime import timedelta
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES

KNUTH = 2654435761


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


def _docs(sf_dir):
    con = _con(sf_dir, ("documents",))
    rows = con.execute(
        "SELECT doc_id, text, source, n_chars FROM documents").fetchall()
    con.close()
    return rows


def _events(sf_dir):
    con = _con(sf_dir, ("events",))
    rows = con.execute("""
        SELECT event_id, user_id, event_type, value, ts, epoch_us(ts)
        FROM events
    """).fetchall()
    con.close()
    return rows


# ---------------------------------------------------------------------------
# window_ignore_nulls_matrix / window_origin_offset_semantics
# ---------------------------------------------------------------------------

def test_window_ignore_nulls_matrix(spark, sf_dir):
    per_user = defaultdict(list)
    for eid, uid, et, v, _ts, us in _events(sf_dir):
        if uid < 40:
            per_user[uid].append((us, eid, None if et == "view" else v))
    expected = {}
    for uid, rows in per_user.items():
        rows.sort()
        nn = [v for _us, _e, v in rows if v is not None]
        expected[uid] = (
            _r(nn[0], 2) if nn else None,
            _r(nn[-1], 2) if nn else None,
            _r(nn[1], 2) if len(nn) >= 2 else None,
        )
    got = {r.user_id: (r.first_non_null, r.last_non_null, r.second_non_null)
           for r in QUERIES["window_ignore_nulls_matrix"](spark, sf_dir).collect()}
    assert got == expected


def test_window_origin_offset_semantics(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0])
    for _eid, _uid, _et, v, ts, _us in _events(sf_dir):
        shifted = ts - timedelta(hours=6)
        ws = shifted.replace(hour=0, minute=0, second=0, microsecond=0) \
            + timedelta(hours=6)
        a = agg[ws]
        a[0] += 1
        a[1] += _ri(v * 100.0)
    expected = {ws: tuple(a) for ws, a in agg.items()}
    got = {r.win_start: (r.n_events, r.value_cents)
           for r in QUERIES["window_origin_offset_semantics"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# regexp_extract_all_surface
# ---------------------------------------------------------------------------

def test_regexp_extract_all_surface(spark, sf_dir):
    doubled_re = re.compile(r"\b[a-z]*(?:ss|tt|ll|ee|oo|rr)[a-z]*\b")
    st_re = re.compile(r"\b[st][a-z]+\b")
    expected = {}
    for doc_id, text, _s, _n in _docs(sf_dir):
        if doc_id >= 200:
            continue
        doubled = doubled_re.findall(text)
        st_words = st_re.findall(text)
        if doubled or st_words:
            expected[doc_id] = (len(doubled),
                                ",".join(sorted(set(doubled))),
                                len(st_words))
    got = {r.doc_id: (r.n_doubled, r.doubled_sorted, r.n_st_words)
           for r in QUERIES["regexp_extract_all_surface"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# compaction_bin_packing / bloom_filter_membership
# ---------------------------------------------------------------------------

def test_compaction_bin_packing(spark, sf_dir):
    files = defaultdict(int)
    for doc_id, text, src, _n in _docs(sf_dir):
        files[(src, doc_id % 8)] += len(text)
    per_src = defaultdict(list)
    for (src, fid), sz in files.items():
        per_src[src].append((fid, sz))
    rows = {}
    bins = defaultdict(lambda: [0, 0])
    for src, fs in per_src.items():
        fs.sort()
        cum = 0
        for fid, sz in fs:
            b = math.floor(cum / 2500.0)
            rows[(src, fid)] = (sz, b)
            bins[(src, b)][0] += sz
            bins[(src, b)][1] += 1
            cum += sz
    expected = {(src, fid): (sz, b, bins[(src, b)][0], bins[(src, b)][1])
                for (src, fid), (sz, b) in rows.items()}
    got = {(r.source, r.file_id): (r.size_bytes, r.bin_id, r.bin_bytes,
                                   r.bin_files)
           for r in QUERIES["compaction_bin_packing"](spark, sf_dir).collect()}
    assert got == expected


def test_bloom_filter_membership(spark, sf_dir):
    build, probe = set(), set()
    for _d, text, src, _n in _docs(sf_dir):
        vocab = {t for t in text.strip().lower().split() if t}
        if int(src[3:]) < 10:
            build |= vocab
        else:
            probe |= vocab

    def pos(j, term):
        return int(hashlib.md5(f"|{j}|{term}".encode()).hexdigest()[:8],
                   16) % 2048

    bits = {pos(j, t) for t in build for j in range(3)}
    n_maybe = n_members = 0
    no_fn = True
    for t in probe:
        k_hits = sum(1 for j in range(3) if pos(j, t) in bits)
        member = t in build
        n_maybe += k_hits == 3
        n_members += member
        if member and k_hits != 3:
            no_fn = False
    row = QUERIES["bloom_filter_membership"](spark, sf_dir).collect()[0]
    assert (row.m, row.k) == (2048, 3)
    assert row.n_keys == len(build)
    assert row.n_set_bits == len(bits)
    assert row.n_probes == len(probe)
    assert row.n_maybe == n_maybe
    assert row.n_members == n_members
    assert row.no_false_negatives is no_fn
    assert no_fn is True  # the structural bloom guarantee


# ---------------------------------------------------------------------------
# csv_ingest_typed / jsonl_ingest_scan / format_matrix_roundtrip
# ---------------------------------------------------------------------------

def test_csv_ingest_typed(spark, sf_dir):
    con = _con(sf_dir, ("orders",))
    rows = con.execute("""
        SELECT o_orderstatus, o_totalprice FROM orders WHERE o_orderkey < 5000
    """).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, Decimal(0)])
    for s, p in rows:
        agg[s][0] += 1
        agg[s][1] += _dec(p, 2)
    expected = {s: (n, _r(float(t), 2), 2) for s, (n, t) in agg.items()}
    got = {r.o_orderstatus: (r.n_good, r.total, r.n_corrupt)
           for r in QUERIES["csv_ingest_typed"](spark, sf_dir).collect()}
    assert got == expected


def test_jsonl_ingest_scan(spark, sf_dir):
    import json as _json

    con = _con(sf_dir, ("events",))
    rows = con.execute("""
        SELECT event_type, value, props FROM events WHERE event_id < 2000
    """).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0, None])
    for et, v, props in rows:
        k = _json.loads(props).get("k")
        a = agg[et]
        a[0] += 1
        a[1] += math.floor(v * 100 + 0.5)
        if k is not None:
            a[2] = k if a[2] is None else max(a[2], k)
    expected = {et: tuple(a) for et, a in agg.items()}
    got = {r.event_type: (r.n_rows, r.value_cents, r.max_k)
           for r in QUERIES["jsonl_ingest_scan"](spark, sf_dir).collect()}
    assert got == expected


def test_format_matrix_roundtrip(spark, sf_dir):
    base = [(doc_id, n) for doc_id, _t, _s, n in _docs(sf_dir)
            if doc_id < 300]
    n_rows = len(base)
    id_sum = sum(d for d, _n in base)
    expected = {
        "orc": (n_rows, id_sum, sum(n for _d, n in base)),
        "text": (n_rows, id_sum, sum(len(f"{d}|{n}") for d, n in base)),
    }
    got = {r.format: (r.n_rows, r.id_checksum, r.payload_metric)
           for r in QUERIES["format_matrix_roundtrip"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# file_provenance_audit / dynamic_partition_overwrite
# ---------------------------------------------------------------------------

def test_file_provenance_audit(spark, sf_dir):
    daily = Counter(ts.date() for _e, _u, _t, _v, ts, _us in _events(sf_dir))
    expected = {d: (n, 1, True) for d, n in daily.items()}
    got = {r.day: (r.n_rows, r.n_files, r.file_path_matches_partition)
           for r in QUERIES["file_provenance_audit"](spark, sf_dir).collect()}
    assert got == expected


def test_dynamic_partition_overwrite(spark, sf_dir):
    rows = _events(sf_dir)
    days = [ts.date() for _e, _u, _t, _v, ts, _us in rows]
    target = min(days)
    rows_target = sum(1 for eid, _u, _t, _v, ts, _us in rows
                      if ts.date() == target and eid % 2 == 0)
    rows_other = sum(1 for d in days if d != target)
    row = QUERIES["dynamic_partition_overwrite"](spark, sf_dir).collect()[0]
    assert row.n_days == len(set(days))
    assert row.rows_target_day == rows_target
    assert row.rows_other_days == rows_other
    assert row.untouched_partitions_preserved is True


# ---------------------------------------------------------------------------
# collation_aware_grouping / join_strategy_parity / array surface
# ---------------------------------------------------------------------------

def test_collation_aware_grouping(spark, sf_dir):
    variants = defaultdict(set)
    counts = Counter()
    for eid, _uid, et, _v, _ts, _us in _events(sf_dir):
        x = et.upper() if eid % 2 == 0 else et
        counts[x.lower()] += 1
        variants[x.lower()].add(x)
    expected = {k: (n, len(variants[k])) for k, n in counts.items()}
    got = {r.event_type_ci: (r.n_rows, r.n_case_variants)
           for r in QUERIES["collation_aware_grouping"](spark, sf_dir).collect()}
    assert got == expected


def test_join_strategy_parity(spark, sf_dir):
    con = _con(sf_dir, ("orders", "customer"))
    n = con.execute("""
        SELECT COUNT(*) FROM orders o JOIN customer c
        ON o.o_custkey = c.c_custkey WHERE c.c_mktsegment = 'BUILDING'
    """).fetchone()[0]
    con.close()
    got = {r.strategy: r.n_rows
           for r in QUERIES["join_strategy_parity"](spark, sf_dir).collect()}
    assert got == {"broadcast": n, "merge": n, "shuffle_hash": n}


def test_array_functions_surface(spark, sf_dir):
    types = defaultdict(set)
    n_events = Counter()
    for _eid, uid, et, _v, _ts, _us in _events(sf_dir):
        types[uid].add(et)
        n_events[uid] += 1
    funnel = {"click", "purchase", "view"}
    expected = {}
    for uid, ts_ in types.items():
        if uid >= 200:
            continue
        srt = sorted(ts_)
        expected[uid] = (
            ",".join(srt), len(srt),
            ",".join(sorted(ts_ & funnel)),
            sum(1 for t in ts_ if "c" in t),
            n_events[uid],
        )
    got = {r.user_id: (r.distinct_types, r.n_types, r.funnel_types,
                       r.n_with_c, r.n_events)
           for r in QUERIES["array_functions_surface"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# quality_logreg_score — the linear quality filter, bit-deterministic
# ---------------------------------------------------------------------------

def test_quality_logreg_score(spark, sf_dir):
    buckets = defaultdict(lambda: [0, Decimal(0)])
    for _d, text, _s, _n in _docs(sf_dir):
        tk = text.strip().split()
        if not tk:
            continue
        ntok = len(tk)
        mwl = float(sum(len(t) for t in tk)) / ntok
        ttr = float(len(set(tk))) / ntok
        stop = float(sum(1 for t in tk if t == "the")) / ntok
        logit = -2.0 + 0.5 * mwl + 1.5 * ttr + 0.01 * ntok + 2.0 * stop
        b = math.floor(logit * 4)
        buckets[b][0] += 1
        buckets[b][1] += Decimal(repr(logit)).quantize(
            Decimal(1).scaleb(-12), rounding=ROUND_HALF_UP)
    expected = {b: (n, _r(float(s) / n, 6)) for b, (n, s) in buckets.items()}
    got = {r.score_bucket: (r.n_docs, r.avg_logit)
           for r in QUERIES["quality_logreg_score"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# multimodal plumbing — synthetic media metadata (the codec stays a stub)
# ---------------------------------------------------------------------------

def _media(sf_dir):
    out = []
    for doc_id, *_x in _docs(sf_dir):
        kind = ("image", "audio", "video")[doc_id % 3]
        w = 16 + (doc_id * KNUTH + 40503) % 4294967296 % 241
        h = 16 + (doc_id * KNUTH + 81006) % 4294967296 % 241
        blen = 256 + (doc_id * KNUTH + 162012) % 4294967296 % 1792
        out.append((doc_id, kind, w, h, blen))
    return out


def test_multimodal_features(spark, sf_dir):
    agg = defaultdict(lambda: [0, 0, 0, set()])
    for _mid, kind, w, h, blen in _media(sf_dir):
        a = agg[kind]
        a[0] += 1
        a[1] += 16 + blen
        a[2] = max(a[2], w)
        a[3].add(w * 1000 + h)
    expected = {k: (a[0], a[1], a[2], len(a[3])) for k, a in agg.items()}
    got = {r.kind: (r.n_media, r.total_bytes, r.max_width, r.n_distinct_dims)
           for r in QUERIES["multimodal_features"](spark, sf_dir).collect()}
    assert got == expected


def test_multimodal_resize_and_frames(spark, sf_dir):
    expected = {}
    for mid, kind, w, h, blen in _media(sf_dir):
        if kind == "image":
            s = min(1.0, 64.0 / max(w, h))
            metric = max(max(1, math.floor(w * s)), max(1, math.floor(h * s)))
            expected[("image_resized", mid)] = metric
        elif kind == "video":
            expected[("video_frames", mid)] = (((blen + 63) // 64) + 7) // 8
    got = {(r.stage, r.media_id): r.metric
           for r in QUERIES["multimodal_resize_and_frames"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# bucketed_join_no_shuffle — bucketing changes the plan, never the answer
# ---------------------------------------------------------------------------

def test_bucketed_join_no_shuffle(spark, sf_dir):
    con = _con(sf_dir, ("orders", "customer"))
    rows = con.execute("""
        SELECT c.c_mktsegment, o.o_totalprice FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
    """).fetchall()
    con.close()
    agg = defaultdict(lambda: [0, Decimal(0)])
    for seg, p in rows:
        agg[seg][0] += 1
        agg[seg][1] += _dec(p, 2)
    expected = {s: (n, _r(float(t), 2), True) for s, (n, t) in agg.items()}
    got = {r.c_mktsegment: (r.n_orders, r.revenue, r.join_is_shuffle_free)
           for r in QUERIES["bucketed_join_no_shuffle"](spark, sf_dir).collect()}
    assert got == expected


def test_python_udtf_word_chunks(spark, sf_dir):
    """The UDTF's 8-token/stride-4 generator, replayed in pure Python."""
    expected = {}
    for doc_id, text, _s, _n in _docs(sf_dir):
        if doc_id >= 100:
            continue
        toks = [t for t in text.split() if t]
        for j, i in enumerate(range(0, len(toks), 4)):
            window = toks[i:i + 8]
            expected[(doc_id, j)] = (" ".join(window), len(window))
    got = {(r.doc_id, r.pos): (r.chunk, r.n_tokens)
           for r in QUERIES["python_udtf_word_chunks"](spark, sf_dir).collect()}
    assert got == expected
