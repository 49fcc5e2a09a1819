"""Ninth replication wave: graph mixing (assortativity, brand
modularity), stratified treatment effect, quantile normalization,
multinomial naive Bayes, and Dirichlet query likelihood."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import duckdb
import numpy as np

from quantum_rag_data_pipeline_spark.queries import QUERIES

_EDGES_SQL = """
    WITH sup AS (
      SELECT l_partkey FROM lineitem
      GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) >= 8
    ),
    items AS (
      SELECT DISTINCT l.l_orderkey, l.l_partkey
      FROM lineitem l JOIN sup USING (l_partkey)
    )
    SELECT a.l_partkey AS u, b.l_partkey AS v
    FROM items a JOIN items b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2 HAVING COUNT(*) >= 2
"""


def _con(sf_dir):
    con = duckdb.connect()
    for t in ("lineitem", "part", "events", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def test_assortativity_pearson_over_directed_edges(spark, sf_dir):
    con = _con(sf_dir)
    pairs = con.execute(_EDGES_SQL).fetchall()
    con.close()
    deg = Counter()
    for u, v in pairs:
        deg[u] += 1
        deg[v] += 1
    xs, ys = [], []
    for u, v in pairs:  # both directions, as the query's `both_` does
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    r_num = np.corrcoef(xs, ys)[0, 1]
    r = QUERIES["degree_assortativity"](spark, sf_dir).first()
    assert r.n_directed_edges == 2 * len(pairs)
    assert abs(r.mean_neighbor_degree - np.mean(ys)) < 1e-3
    assert abs(r.assortativity_r - r_num) < 1e-4


def test_modularity_q_sums_to_newman_formula(spark, sf_dir):
    con = _con(sf_dir)
    pairs = con.execute(_EDGES_SQL).fetchall()
    brand = dict(con.execute("SELECT p_partkey, p_brand FROM part").fetchall())
    con.close()
    m = len(pairs)
    deg = Counter()
    for u, v in pairs:
        deg[u] += 1
        deg[v] += 1
    within = Counter()
    dsum = Counter()
    for u, v in pairs:
        if brand[u] == brand[v]:
            within[brand[u]] += 1
    for node, d in deg.items():
        dsum[brand[node]] += d
    got = {r.brand: r for r in
           QUERIES["modularity_by_brand"](spark, sf_dir).collect()}
    q_total = 0.0
    for b in got:
        expect = within.get(b, 0) / m - (dsum.get(b, 0) / (2 * m)) ** 2
        r = got[b]
        assert r.edges_within == within.get(b, 0)
        assert r.degree_sum == dsum.get(b, 0)
        assert abs(r.q_contribution - expect) < 1e-5
        q_total += expect
    assert -1.0 <= q_total <= 1.0


def test_stratified_ate_standardization(spark, sf_dir):
    con = _con(sf_dir)
    users = con.execute("""
        SELECT user_id,
               MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS treated,
               COUNT(*) AS n_events,
               SUM(CASE WHEN event_type = 'purchase'
                        THEN CAST(value AS DECIMAL(30,2)) ELSE 0 END) AS y
        FROM events GROUP BY user_id ORDER BY n_events, user_id
    """).fetchall()
    con.close()
    k = len(users)
    sizes = [(k + 2) // 3, (k + 1) // 3, k // 3]  # ntile(3)
    strata = defaultdict(list)
    idx = 0
    for s_no, sz in enumerate(sizes, start=1):
        for _ in range(sz):
            strata[s_no].append(users[idx])
            idx += 1
    got = {r.stratum: r for r in
           QUERIES["stratified_treatment_effect"](spark, sf_dir).collect()}
    assert set(got) == set(strata)
    N = k
    for s_no, rows in strata.items():
        n = len(rows)
        t_rows = [r for r in rows if r[1] == 1]
        c_rows = [r for r in rows if r[1] == 0]
        r = got[s_no]
        assert r.n == n
        assert abs(r.propensity - len(t_rows) / n) < 1e-6
        if not t_rows or not c_rows:
            # degenerate overlap (p in {0,1}) — the query must surface
            # NULLs rather than fabricate a contribution (the audit the
            # docstring promises); at sf0.001 every user signed up, so
            # this branch IS the exercised one there
            assert r.ate_contribution is None
            continue
        mt = float(sum(r_[3] for r_ in t_rows)) / len(t_rows)
        mc = float(sum(r_[3] for r_ in c_rows)) / len(c_rows)
        assert abs(r.mean_y_treated - mt) < 1e-2
        assert abs(r.mean_y_control - mc) < 1e-2
        assert abs(r.ate_contribution - n / N * (mt - mc)) < 1e-2


def test_quantile_normalization_common_marginal(spark, sf_dir):
    con = _con(sf_dir)
    daily = con.execute("""
        SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    """).fetchall()
    con.close()
    by_type = defaultdict(list)
    for et, d, c in daily:
        by_type[et].append((c, d))
    ref = defaultdict(lambda: [0, 0])
    for et, vals in by_type.items():
        for rnk, (c, d) in enumerate(sorted(vals), start=1):
            ref[rnk][0] += c
            ref[rnk][1] += 1
    ref_mean = {rnk: s / k for rnk, (s, k) in ref.items()}
    got = QUERIES["quantile_normalization"](spark, sf_dir).collect()
    assert got
    per_type_norm = defaultdict(list)
    for r in got:
        per_type_norm[r.event_type].append(round(r.normalized, 6))
    # the point of the operator: every type's normalized marginal over
    # its FULL rank range is the same multiset of reference means
    full = [round(v, 6) for rnk, v in ref_mean.items()]
    for et, vals in per_type_norm.items():
        expect = sorted(full[:len(vals)]) if len(vals) < len(full) else sorted(full)
        assert sorted(vals) == expect, et
    # and each row's normalized value is the reference mean at its rank
    for et, vals in by_type.items():
        rank_of = {d: rnk for rnk, (c, d) in enumerate(sorted(vals), start=1)}
        for r in got:
            if r.event_type == et:
                assert abs(r.normalized - ref_mean[rank_of[r.day]]) < 1e-3


def test_naive_bayes_confusion_matrix(spark, sf_dir):
    con = _con(sf_dir)
    docs = con.execute("""
        SELECT doc_id, lang,
               list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS tk
        FROM documents
    """).fetchall()
    con.close()
    train = [(d, l, tk) for d, l, tk in docs if d % 2 == 0]
    test = [(d, l, tk) for d, l, tk in docs if d % 2 == 1]
    cws = defaultdict(Counter)
    n_docs_lang = Counter()
    for _, l, tk in train:
        n_docs_lang[l] += 1
        for t in tk:
            cws[l][t] += 1
    vocab = {t for c in cws.values() for t in c}
    V = len(vocab)
    n_train = len(train)
    langs = sorted(n_docs_lang)
    tot = {l: sum(cws[l].values()) for l in langs}
    confusion = Counter()
    for _, true_l, tk in test:
        best = None
        for l in langs:
            score = round(math.log(n_docs_lang[l] / n_train) * 1e6)
            for t in tk:
                if t in vocab:
                    score += round(math.log((cws[l][t] + 1) / (tot[l] + V)) * 1e6)
            if best is None or score > best[0] or (score == best[0] and l < best[1]):
                best = (score, l)
        confusion[(true_l, best[1])] += 1
    got = {(r.true_lang, r.pred_lang): r.n_docs for r in
           QUERIES["naive_bayes_lang_classifier"](spark, sf_dir).collect()}
    assert got == dict(confusion)


def test_query_likelihood_dirichlet_scores(spark, sf_dir):
    con = _con(sf_dir)
    docs = con.execute("""
        SELECT doc_id,
               list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'), t -> t <> '') AS tk
        FROM documents
    """).fetchall()
    con.close()
    TERMS = ("spark", "vector", "stream")
    dl = {d: len(tk) for d, tk in docs}
    N = sum(dl.values())
    cf = Counter()
    tfm = defaultdict(Counter)
    for d, tk in docs:
        for t in tk:
            if t in TERMS:
                cf[t] += 1
                tfm[d][t] += 1
    mu = 2000
    score = {}
    for d in dl:
        s = 0
        for t in TERMS:
            c = tfm[d].get(t, 0)
            s += round(math.log((c * N + mu * cf[t]) / (N * (dl[d] + mu))) * 1e6)
        score[d] = s / 1e6
    expected = dict(sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:20])
    got = QUERIES["query_likelihood_dirichlet"](spark, sf_dir).collect()
    assert len(got) == 20
    # the output score is rounded to 4dp, so compare the top-20 SET and
    # per-doc values rather than an order that rounding can tie-break
    # differently (docs 38/184 differ only in the 5th decimal)
    assert {r.doc_id for r in got} == set(expected)
    for r in got:
        assert abs(r.ql_log_score - expected[r.doc_id]) < 1e-4
