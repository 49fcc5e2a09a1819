"""Seventh replication wave — IR scoring formulas: BM25 (full Robertson
idf + length normalization), nDCG@10 with label-availability IDCG,
TF-IDF top terms, RRF fusion arithmetic, unigram LM scoring, and DSIR
log-likelihood-ratio weights."""

from __future__ import annotations

import math

import duckdb
import numpy as np

from quantum_rag_data_pipeline_spark.queries import QUERIES

TERMS = ("spark", "vector", "stream")


def _docs(sf_dir):
    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT doc_id, source,
               list_filter(regexp_split_to_array(trim(lower(text)), '\\s+'),
                           t -> t <> '') AS tk
        FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id
    """).fetchall()
    con.close()
    return rows


def _bm25_scores(sf_dir):
    docs = _docs(sf_dir)
    n_docs = len(docs)
    avgdl = sum(len(tk) for _, _, tk in docs) / n_docs
    tf = {}
    for doc_id, _, tk in docs:
        for t in tk:
            if t in TERMS:
                tf[(doc_id, t)] = tf.get((doc_id, t), 0) + 1
    df = {}
    for (_, t) in tf:
        df[t] = df.get(t, 0) + 1
    k1, b = 1.2, 0.75
    dl = {doc_id: len(tk) for doc_id, _, tk in docs}
    scores = {}
    for (doc_id, t), f in tf.items():
        idf = math.log(1 + (n_docs - df[t] + 0.5) / (df[t] + 0.5))
        s = idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dl[doc_id] / avgdl))
        scores[doc_id] = scores.get(doc_id, 0.0) + s
    return scores


def test_bm25_topk_matches_direct_formula(spark, sf_dir):
    scores = _bm25_scores(sf_dir)
    expected = sorted(scores.items(), key=lambda kv: (-round(kv[1], 4), kv[0]))[:20]
    got = QUERIES["bm25_keyword_search"](spark, sf_dir).collect()
    assert len(got) == min(20, len(expected))
    for g, (doc_id, s) in zip(got, expected):
        assert g.doc_id == doc_id
        assert abs(g.bm25 - s) < 1e-3


def test_ndcg_matches_direct_computation(spark, sf_dir):
    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT vec_id, CAST(embedding AS DOUBLE[]), label
        FROM read_parquet('{sf_dir}/embeddings.parquet') ORDER BY vec_id
    """).fetchall()
    con.close()
    ids = np.array([r[0] for r in rows])
    V = np.array([r[1] for r in rows])
    labels = np.array([r[2] for r in rows])
    nrm = np.linalg.norm(V, axis=1)
    label_counts = {int(l): int((labels == l).sum()) for l in set(labels)}
    got = {r.query_id: r for r in
           QUERIES["retrieval_eval_ndcg"](spark, sf_dir).collect()}
    for qi in range(20):
        cos = (V @ V[qi]) / (nrm * nrm[qi])
        order = sorted(range(len(ids)),
                       key=lambda j: (-cos[j], ids[j]))
        order = [j for j in order if ids[j] != ids[qi]][:10]
        rel = [labels[j] == labels[qi] for j in order]
        n_rel = sum(rel)
        rr = next((1 / (r + 1) for r, hit in enumerate(rel) if hit), 0.0)
        dcg = sum(1 / math.log2(r + 2) for r, hit in enumerate(rel) if hit)
        avail = min(label_counts[int(labels[qi])] - 1, 10)
        idcg = sum(1 / math.log2(i + 1) for i in range(1, avail + 1))
        r = got[ids[qi]]
        assert r.n_rel == n_rel, qi
        assert abs(r.rr - rr) < 1e-4
        assert abs(r.ndcg10 - dcg / idcg) < 1e-4
        assert 0.0 <= r.ndcg10 <= 1.0 + 1e-9


def test_tfidf_top3_matches_direct(spark, sf_dir):
    # tokens() in the query does NOT lowercase — tokenize without lower
    con = duckdb.connect()
    docs = con.execute(f"""
        SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                   t -> t <> '') AS tk
        FROM read_parquet('{sf_dir}/documents.parquet') ORDER BY doc_id
    """).fetchall()
    con.close()
    n_docs = len(docs)
    tf, df = {}, {}
    for doc_id, tk in docs:
        seen = set()
        for t in tk:
            tf[(doc_id, t)] = tf.get((doc_id, t), 0) + 1
            seen.add(t)
        for t in seen:
            df[t] = df.get(t, 0) + 1
    got = {}
    for r in QUERIES["tfidf_top_terms"](spark, sf_dir).collect():
        got.setdefault(r.doc_id, []).append((r.term, r.tfidf))
    assert got and all(len(v) <= 3 for v in got.values())
    for doc_id, terms in got.items():
        scores = {t: round(c * math.log(n_docs / df[t]), 6)
                  for (d, t), c in tf.items() if d == doc_id}
        expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        got_sorted = sorted(terms, key=lambda kv: (-kv[1], kv[0]))
        assert [t for t, _ in got_sorted] == [t for t, _ in expected]
        for (t, s), (_, es) in zip(got_sorted, expected):
            assert abs(s - es) < 1e-5


def test_rrf_fusion_arithmetic(spark, sf_dir):
    """RRF = Σ 1/(60+rank) over lists a doc appears in; verify every
    output score is reconstructible from the two retrievers' ranks."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from quantum_rag_data_pipeline_spark.operators import similarity as sim_ops
    from quantum_rag_data_pipeline_spark.sources.registry import load_table

    e = load_table(spark, "embeddings", sf_dir)
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding")
    dense = {(r.query_id, r.doc_id): r.rnk for r in
             sim_ops.brute_force_topk(e, q, k=20, dim=64).select(
                 "query_id", F.col("vec_id").alias("doc_id"),
                 F.row_number().over(
                     Window.partitionBy("query_id")
                     .orderBy(F.col("cos_sim").desc(), F.col("vec_id"))
                 ).alias("rnk")).collect()}
    sparse = {r.doc_id: i + 1 for i, r in enumerate(
        QUERIES["bm25_keyword_search"](spark, sf_dir).collect())}
    got = QUERIES["hybrid_rrf_fusion"](spark, sf_dir).collect()
    assert got
    for r in got:
        expect = 0.0
        if (r.query_id, r.doc_id) in dense:
            expect += 1 / (60 + dense[(r.query_id, r.doc_id)])
        if r.doc_id in sparse:
            expect += 1 / (60 + sparse[r.doc_id])
        assert expect > 0
        assert abs(r.rrf - expect) < 1e-6


def test_unigram_logprob_bottom_docs(spark, sf_dir):
    docs = _docs(sf_dir)
    cnt, n = {}, 0
    for _, _, tk in docs:
        for t in tk:
            cnt[t] = cnt.get(t, 0) + 1
            n += 1
    avg = {}
    for doc_id, _, tk in docs:
        lp = sum(round(math.log(cnt[t] / n), 6) for t in tk)
        avg[doc_id] = round(lp / len(tk), 6) if tk else 0.0
    expected = sorted(avg.items(), key=lambda kv: (kv[1], kv[0]))[:25]
    got = QUERIES["unigram_logprob_quality"](spark, sf_dir).collect()
    assert len(got) == 25
    for g, (doc_id, s) in zip(
            sorted(got, key=lambda g: (g.avg_logp, g.doc_id)), expected):
        assert g.doc_id == doc_id
        assert abs(g.avg_logp - s) < 2e-6


def test_dsir_weights_match_llr(spark, sf_dir):
    docs = _docs(sf_dir)
    raw_cnt, tgt_cnt = {}, {}
    raw_tot = tgt_tot = 0
    for _, source, tk in docs:
        for t in tk:
            raw_cnt[t] = raw_cnt.get(t, 0) + 1
            raw_tot += 1
            if source == "src0":
                tgt_cnt[t] = tgt_cnt.get(t, 0) + 1
                tgt_tot += 1
    lam = {t: round(math.log(((tgt_cnt.get(t, 0) + 0.5) / tgt_tot)
                             / ((raw_cnt[t] + 0.5) / raw_tot)), 6)
           for t in raw_cnt}
    got = QUERIES["dsir_importance_weights"](spark, sf_dir).collect()
    assert len(got) == 30
    score = {}
    for doc_id, _, tk in docs:
        score[doc_id] = round(sum(lam[t] for t in tk), 6)
    expected = sorted(score.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    got_sorted = sorted(got, key=lambda r: (-r.dsir_score, r.doc_id))
    for r, (doc_id, s) in zip(got_sorted, expected):
        assert r.doc_id == doc_id
        assert abs(r.dsir_score - s) < 1e-4
