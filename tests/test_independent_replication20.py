"""Twentieth replication wave — the curation funnel end-to-end, CUBE and
pivot semantics, NULL three-valued logic, pipe-syntax rollup,
referential integrity, the Arrow-UDF digital root, storage-encoding
planning, and incremental-kNN batch parity — recomputed from raw
parquet in pure Python."""

from __future__ import annotations

import hashlib
import math
from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

import duckdb

from quantum_rag_data_pipeline_spark.queries import QUERIES


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("orders", "lineitem", "customer", "nation", "documents",
              "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _r(x: float, n: int) -> float:
    return float(Decimal(repr(float(x))).quantize(
        Decimal(1).scaleb(-n), rounding=ROUND_HALF_UP))


def _g(x: float) -> int:
    return int(math.floor(x + 0.5))


def _dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s = s + x * y
    return s


def _cos(a, b):
    return _dot(a, b) / (math.sqrt(_dot(a, a)) * math.sqrt(_dot(b, b)))


# ---------------------------------------------------------------------------
# curation_funnel_report — five stages, recomputed end to end
# ---------------------------------------------------------------------------

def test_curation_funnel_stages(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT doc_id, lang, text FROM documents").fetchall()
    con.close()
    docs = []
    for doc_id, lang, text in rows:
        tk = text.strip().split()
        fp = hashlib.md5(" ".join(text.strip().split()).lower().encode()) \
            .hexdigest()
        b = ((doc_id * 2654435761 + 13 * 40503) % 4294967296) % 97
        docs.append((doc_id, lang, tk, fp, b))

    def shingles(tk):
        return {" ".join(tk[i:i + 4]) for i in range(len(tk) - 3)} \
            if len(tk) >= 4 else set()

    s2 = [d for d in docs if d[1] == "en"]
    s3 = []
    for d in s2:
        tk = d[2]
        mwl = sum(len(t) for t in tk) / len(tk)
        topr = max(Counter(tk).values()) / len(tk)
        if (30 <= len(tk) <= 5000 and 3.0 <= mwl <= 4.8
                and topr <= 0.15 and "the" in tk):
            s3.append(d)
    seen = set()
    s4 = []
    for d in sorted(s3, key=lambda d: d[0]):
        if d[3] not in seen:
            seen.add(d[3])
            s4.append(d)
    ev_sh = set()
    for d in docs:
        if d[4] == 0:
            ev_sh |= shingles(d[2])
    s5 = [d for d in s4 if d[4] != 0 and not (shingles(d[2]) & ev_sh)]
    stages = [(1, "raw", docs), (2, "lang_en", s2), (3, "quality", s3),
              (4, "dedup", s4), (5, "decontaminated", s5)]
    got = {r.stage_no: r for r in
           QUERIES["curation_funnel_report"](spark, sf_dir).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    for no, name, ds in stages:
        r = got[no]
        assert r.stage == name
        assert r.n_docs == len(ds)
        assert r.n_tokens == sum(len(d[2]) for d in ds)


# ---------------------------------------------------------------------------
# cube_flag_status / distinct_counts / j1_pivot / pipe_syntax_rollup
# ---------------------------------------------------------------------------

def test_cube_grouping_sets(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem").fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0])
    for fl, st, q in rows:
        qc = _g(float(q) * 100)
        for key in ((fl, st), (fl, None), (None, st), (None, None)):
            agg[key][0] += 1
            agg[key][1] += qc
    got = {(r.l_returnflag, r.l_linestatus): r for r in
           QUERIES["cube_flag_status"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for key, (n, qc) in agg.items():
        assert got[key].n_rows == n
        assert got[key].sum_qty == _r(qc / 100.0, 2)


def test_distinct_counts(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT l_returnflag, l_partkey, l_suppkey FROM lineitem").fetchall()
    con.close()
    per = defaultdict(lambda: [set(), set(), 0])
    for fl, pk, sk in rows:
        a = per[fl]
        a[0].add(pk)
        a[1].add(sk)
        a[2] += 1
    got = {r.l_returnflag: r for r in
           QUERIES["distinct_counts"](spark, sf_dir).collect()}
    assert set(got) == set(per)
    for fl, (parts, supps, n) in per.items():
        r = got[fl]
        assert (r.n_parts, r.n_supps, r.n_rows) == (len(parts), len(supps), n)


def test_j1_pivot_exact_avg(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT l_returnflag, l_linestatus, l_quantity FROM lineitem").fetchall()
    con.close()
    cells = defaultdict(lambda: [0, 0])
    for fl, st, q in rows:
        c = cells[(fl, st)]
        c[0] += _g(float(q) * 100)
        c[1] += 1
    got = {r.l_returnflag: r for r in
           QUERIES["j1_pivot"](spark, sf_dir).collect()}
    for fl in {k[0] for k in cells}:
        r = got[fl]
        for st, col in (("O", "qty_O"), ("F", "qty_F")):
            qc, n = cells.get((fl, st), (0, 0))
            if n == 0:
                assert getattr(r, col) is None
            else:
                assert getattr(r, col) == _r(_r(qc / 100.0, 2) / n, 6)


def test_pipe_syntax_same_rollup(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT l_returnflag, l_quantity FROM lineitem
        WHERE l_shipdate >= DATE '1996-01-01'""").fetchall()
    con.close()
    agg = defaultdict(lambda: [0, 0])
    for fl, q in rows:
        agg[fl][0] += _g(float(q) * 100)
        agg[fl][1] += 1
    got = {r.l_returnflag: r for r in
           QUERIES["pipe_syntax_rollup"](spark, sf_dir).collect()}
    assert set(got) == set(agg)
    for fl, (qc, n) in agg.items():
        assert got[fl].sum_qty == _r(qc / 100.0, 2)
        assert got[fl].n_rows == n


# ---------------------------------------------------------------------------
# null_semantics_matrix — the NULL contract, row by row
# ---------------------------------------------------------------------------

def test_null_semantics(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute("""
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey < 8000""").fetchall()
    con.close()
    t = [(ok, None if st == "O" else st,
          None if st == "O" else _g(float(tp) * 100))
         for ok, st, tp in rows]
    n_star = len(t)
    n_col = sum(1 for _ok, st, _v in t if st is not None)
    n_dist = len({st for _ok, st, _v in t if st is not None})
    sv = sum(v for _ok, _st, v in t if v is not None)
    nv = sum(1 for _ok, _st, v in t if v is not None)
    idf = sum(1 for _ok, st, _v in t if st != "F")  # NULL is distinct from 'F'
    unknowns = sum(1 for _ok, st, _v in t if st is None)
    first = min(t, key=lambda row: (row[1] is not None, row[1] or "", row[0]))
    [r] = QUERIES["null_semantics_matrix"](spark, sf_dir).collect()
    assert r.count_star == n_star
    assert r.count_col == n_col
    assert r.count_distinct_col == n_dist
    assert r.sum_skips_nulls == _r(sv / 100.0, 2)
    assert r.avg_skips_nulls == _r(sv / 100.0 / nv, 2)
    assert r.is_distinct_from_matches == idf
    assert r.three_valued_unknowns == unknowns
    assert r.asc_nulls_first_leads_null == (first[1] is None)


# ---------------------------------------------------------------------------
# referential_integrity_audit — three FK orphan counts
# ---------------------------------------------------------------------------

def test_referential_integrity(spark, sf_dir):
    con = _con(sf_dir)
    li = [k for (k,) in con.execute(
        "SELECT l_orderkey FROM lineitem").fetchall()]
    o = con.execute("SELECT o_orderkey, o_custkey FROM orders").fetchall()
    c = con.execute("SELECT c_custkey, c_nationkey FROM customer").fetchall()
    n = {k for (k,) in con.execute(
        "SELECT n_nationkey FROM nation").fetchall()}
    con.close()
    okeys = {ok for ok, _ck in o}
    ckeys = {ck for ck, _nk in c}
    expected = {
        "lineitem->orders": (sum(1 for k in li if k not in okeys), len(li)),
        "orders->customer": (sum(1 for _ok, ck in o if ck not in ckeys),
                             len(o)),
        "customer->nation": (sum(1 for _ck, nk in c if nk not in n), len(c)),
    }
    got = {r.relationship: (r.n_orphans, r.n_rows) for r in
           QUERIES["referential_integrity_audit"](spark, sf_dir).collect()}
    assert got == expected


# ---------------------------------------------------------------------------
# arrow_python_udf_digital_root — closed form per residue class
# ---------------------------------------------------------------------------

def test_digital_root_closed_form(spark, sf_dir):
    con = _con(sf_dir)
    keys = [k for (k,) in con.execute(
        "SELECT o_orderkey FROM orders").fetchall()]
    con.close()

    def droot(n):
        while n >= 10:
            n = sum(int(ch) for ch in str(n))
        return n

    # SQL % is TRUNCATED (sign follows the dividend), not Python's
    # floored: for the corpus's o_orderkey = 0 row the closed form is
    # 1 + (-1 % 9) = 0 in SQL — which droot(0) = 0 happens to match,
    # so engine, UDF, and oracle all agree. Python's (0-1) % 9 = 8
    # would NOT; replicate the SQL modulo explicitly.
    per = Counter(droot(k) for k in keys)
    closed = Counter(1 + int(math.fmod(k - 1, 9)) for k in keys)
    assert per == closed  # the number-theoretic identity itself
    got = {r.digital_root: r for r in
           QUERIES["arrow_python_udf_digital_root"](spark, sf_dir).collect()}
    assert {k: r.n_orders for k, r in got.items()} == dict(per)
    assert all(r.udf_matches_closed_form for r in got.values())


# ---------------------------------------------------------------------------
# column_encoding_planner — dictionary-encoding stats
# ---------------------------------------------------------------------------

def test_column_encoding_stats(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT lang, source, text FROM documents").fetchall()
    con.close()
    n = len(rows)
    got = {r.col: r for r in
           QUERIES["column_encoding_planner"](spark, sf_dir).collect()}
    for i, col in enumerate(("lang", "source", "text")):
        vals = [row[i] for row in rows]
        nd = len(set(vals))
        r = got[col]
        assert r.n_distinct == nd
        assert r.distinct_ratio == _r(nd / n, 6)
        assert r.avg_len == _r(sum(len(v) for v in vals) / n, 2)
        assert r.recommend_dictionary == (nd / n <= 0.1)


# ---------------------------------------------------------------------------
# knn_graph_incremental_parity — the full batch answer
# ---------------------------------------------------------------------------

def test_knn_incremental_equals_batch(spark, sf_dir):
    con = _con(sf_dir)
    rows = con.execute(
        "SELECT vec_id, embedding FROM embeddings ORDER BY vec_id").fetchall()
    con.close()
    vecs = {vid: [float(x) for x in v] for vid, v in rows}
    expected = {}
    for src, v in vecs.items():
        scored = sorted((-_cos(v, w), dst) for dst, w in vecs.items()
                        if dst != src)
        for rk, (negc, dst) in enumerate(scored[:5]):
            expected[(src, dst)] = (_r(-negc, 6), rk + 1, src % 5 == 0)
    got = {(r.src, r.dst): (r.cos_sim, r.rnk, r.src_is_new) for r in
           QUERIES["knn_graph_incremental_parity"](spark, sf_dir).collect()}
    assert got == expected
