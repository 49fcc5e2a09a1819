"""Unit tests for the wave-2/3 analytics queries: funnel ordering
semantics, cohort-retention arithmetic, SCD2 island collapse, BM25
ranking, IVF routing, LOCF gap fill, and HLL mergeability — each on a
small constructed frame where the expected answer is computable by hand
(the sf-corpus correctness is covered by the DuckDB oracle gate)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from quantum_rag_data_pipeline_spark import queries as Q
from quantum_rag_data_pipeline_spark.operators import similarity as sim_ops


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, value double"
    )


def test_funnel_requires_temporal_order(spark, sf_dir, tmp_path):
    """A purchase BEFORE the first click must not count as converted."""
    t0 = dt.datetime(2024, 1, 1, 10, 0, 0)

    def at(m):
        return t0 + dt.timedelta(minutes=m)

    rows = [
        # user 1: view -> click -> purchase (full funnel)
        (1, "view", at(0), 1.0), (1, "click", at(5), 1.0), (1, "purchase", at(9), 1.0),
        # user 2: purchase happens BEFORE any click -> stops at click step
        (2, "view", at(0), 1.0), (2, "purchase", at(1), 1.0), (2, "click", at(2), 1.0),
        # user 3: click with NO prior view -> stops at view step... no view at all
        (3, "click", at(0), 1.0), (3, "purchase", at(1), 1.0),
    ]
    ev = _events(spark, rows)
    p = str(tmp_path / "funnel")
    ev.write.parquet(p + "/events.parquet")
    out = {
        r["step"]: r["n_users"]
        for r in Q.QUERIES["funnel_conversion"](spark, p).collect()
    }
    assert out == {"1_view": 2, "2_click": 2, "3_purchase": 1}


def test_scd2_islands_collapse(spark, tmp_path):
    """Consecutive same-tier days collapse; a tier revisit opens a NEW row
    (type-2 history, not type-1 overwrite)."""
    rows = []
    # user 7: tier 0 (days 1-2), tier 2 (day 3), tier 0 again (day 4)
    for day, v in [(1, 5.0), (2, 15.0), (3, 55.0), (4, 5.0)]:
        rows.append((7, "view", dt.datetime(2024, 1, day, 12, 0, 0), v))
    ev = _events(spark, rows)
    p = str(tmp_path / "scd2")
    ev.write.parquet(p + "/events.parquet")
    out = sorted(
        (r["tier"], str(r["valid_from"]), str(r["valid_to"]), r["n_days"])
        for r in Q.QUERIES["scd2_tier_history"](spark, p).collect()
    )
    assert out == [
        (0, "2024-01-01", "2024-01-02", 2),
        (0, "2024-01-04", "2024-01-04", 1),
        (2, "2024-01-03", "2024-01-03", 1),
    ]


def test_cohort_retention_offsets(spark, tmp_path):
    """User active in cohort week and 2 weeks later -> offsets {0, 2}."""
    rows = [
        (1, "view", dt.datetime(2024, 1, 1, 9, 0, 0), 1.0),   # Mon wk0
        (1, "view", dt.datetime(2024, 1, 17, 9, 0, 0), 1.0),  # Wed wk2
        (2, "view", dt.datetime(2024, 1, 10, 9, 0, 0), 1.0),  # Wed wk1
    ]
    ev = _events(spark, rows)
    p = str(tmp_path / "cohort")
    ev.write.parquet(p + "/events.parquet")
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["n_users"]
        for r in Q.QUERIES["cohort_retention"](spark, p).collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_bm25_ranks_term_stuffed_doc_first(spark, tmp_path):
    """A doc that is mostly query terms outranks one with a single hit,
    and docs with no query terms never appear."""
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark vector stream", "en", "s", 30),
            (2, "the quick brown fox jumps over the lazy dog spark", "en", "s", 50),
            (3, "no relevant terms here at all", "en", "s", 29),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p = str(tmp_path / "bm25")
    docs.write.parquet(p + "/documents.parquet")
    rows = Q.QUERIES["bm25_keyword_search"](spark, p).collect()
    ids = [r["doc_id"] for r in rows]
    assert ids[0] == 1 and 3 not in ids
    assert all(r["bm25"] > 0 for r in rows)


def test_hll_mergeability_invariants(spark, sf_dir):
    rows = Q.QUERIES["hll_sketch_mergeability"](spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(r["merge_consistent"] and r["err_within_5pct"] for r in rows)


def test_timeseries_gap_fill_locf(spark, sf_dir):
    out = Q.QUERIES["timeseries_gap_fill"](spark, sf_dir).orderBy("day").collect()
    # dense spine: consecutive days, no holes
    days = [r["day"] for r in out]
    assert all((b - a).days == 1 for a, b in zip(days, days[1:]))
    # every gap row carries the previous observed value (LOCF)
    prev = None
    for r in out:
        if r["is_gap"] == 1:
            assert r["n_orders"] == 0 and r["avg_price_locf"] == prev
        else:
            prev = r["avg_price_locf"]


def test_ivf_topk_contains_self_and_respects_k(spark, sf_dir):
    out = Q.QUERIES["ivf_topk_search"](spark, sf_dir).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert len(rows) <= 10
        # query vectors come FROM the corpus, so unless routing pruned its
        # own list (it cannot: a vector's nearest centroid is always probed
        # first), rank-1 is the vector itself at cos ~ 1.0
        best = max(rows, key=lambda r: (r["cos_sim"], -r["vec_id"]))
        assert best["vec_id"] == qid and abs(best["cos_sim"] - 1.0) < 1e-6


def test_ivf_topk_matches_exact_within_probed_lists(spark, sf_dir):
    """IVF with nprobe == n_centroids degenerates to EXACT brute-force
    top-k — the correctness anchor for the routing machinery."""
    e = Q._t(spark, sf_dir, "embeddings")
    cents = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    ivf_all = sim_ops.ivf_topk(e, q, cents, dim=64, k=5, nprobe=8)
    exact = sim_ops.brute_force_topk(
        e, q, dim=64, k=5, corpus_id="vec_id", query_id="query_id"
    )
    got = {(r["query_id"], r["vec_id"]) for r in ivf_all.collect()}
    want = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    assert got == want


def test_line_dedup_removes_injected_boilerplate(spark, tmp_path):
    """A segment pasted into 3 docs is boilerplate (df>1) and must vanish
    from every clean_text; unique segments survive verbatim."""
    boiler = "all rights reserved contact us terms of"  # 8 tokens... 7+1
    boiler = "all rights reserved contact us terms of service"
    docs = spark.createDataFrame(
        [
            (1, boiler + " alpha beta gamma delta epsilon zeta eta theta", "en", "s", 0),
            (2, boiler + " one two three four five six seven eight", "en", "s", 0),
            (3, boiler + " red green blue cyan magenta yellow black white", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p = str(tmp_path / "ld")
    docs.write.parquet(p + "/documents.parquet")
    from quantum_rag_data_pipeline_spark import queries as Q

    out = {r["doc_id"]: r for r in Q.QUERIES["line_dedup_boilerplate"](spark, p).collect()}
    for i in (1, 2, 3):
        assert out[i]["n_lines"] == 2 and out[i]["n_boilerplate"] == 1
        assert "rights" not in out[i]["clean_text"]
    assert out[1]["clean_text"] == "alpha beta gamma delta epsilon zeta eta theta"


def test_hybrid_rrf_scores_and_membership(spark, sf_dir):
    """RRF scores must equal 1/(60+r_dense) + 1/(60+r_sparse) with ranks
    reconstructable from the two underlying retrievers."""
    from quantum_rag_data_pipeline_spark import queries as Q

    rows = Q.QUERIES["hybrid_rrf_fusion"](spark, sf_dir).collect()
    assert rows and all(r["rrf"] > 0 for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r["rrf"])
    for qid, scores in by_q.items():
        assert len(scores) <= 10
        # every score is a sum of at most two reciprocal-rank terms
        for s in scores:
            assert s <= round(1 / 61 + 1 / 61, 9) + 1e-12


def test_hard_negative_margin_semantics(spark, sf_dir):
    """Margins must equal best_positive - hardest_negative, and both
    cosines must be valid (<= 1 + eps)."""
    rows = Q.QUERIES["hard_negative_mining"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["best_positive"] <= 1.000001
        assert r["hardest_negative"] <= 1.000001
        assert abs(r["margin"] - round(r["best_positive"] - r["hardest_negative"], 6)) <= 2e-6


def test_cluster_purity_bounds(spark, sf_dir):
    """Purity in (0, 1]; majority count <= member count; every corpus
    vector lands in exactly one cluster."""
    rows = Q.QUERIES["cluster_purity_eval"](spark, sf_dir).collect()
    assert rows
    total = sum(r["n_members"] for r in rows)
    n_vecs = Q._t(spark, sf_dir, "embeddings").count()
    assert total == n_vecs
    for r in rows:
        assert 0 < r["purity"] <= 1.0
        assert r["n_majority"] <= r["n_members"]


def test_semdedup_removes_injected_duplicate(spark):
    """An exact duplicate of a cluster member (same vector, higher id)
    must be pruned; singletons and well-separated members survive."""
    from quantum_rag_data_pipeline_spark.operators import similarity as sim_ops

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),   # centroid 0
        (1, [0.0, 1.0, 0.0, 0.0]),   # centroid 1
        (10, [0.9, 0.1, 0.0, 0.0]),  # cluster 0 member
        (11, [0.9, 0.1, 0.0, 0.0]),  # exact dup of 10 → removed
        (12, [0.0, 0.8, 0.6, 0.0]),  # cluster 1, far from 1 → kept
    ]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    cents = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    out = {
        r["vec_id"]: r["removed"]
        for r in sim_ops.semdedup_prune(df, cents, dim=4, threshold=0.999).collect()
    }
    assert out[11] is True          # dup of lower-id 10
    assert out[10] is False         # representative kept
    assert out[12] is False         # below threshold vs everything in cluster
    assert out[0] is False and out[1] is False  # lowest-id representatives


def test_cms_never_undercounts_and_small_sketch_is_exact(spark):
    """CMS guarantee: min-of-rows estimate ≥ true count always; with far
    fewer keys than cells the estimate is exactly the true count."""
    from quantum_rag_data_pipeline_spark.operators import curation as cur_ops

    data = [("alpha",)] * 7 + [("beta",)] * 3 + [("gamma",)] * 1
    tc = (
        spark.createDataFrame(data, ["term"])
        .groupBy("term").agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    depth, width = 4, 512
    js = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j")
    bucket = lambda: cur_ops.md5_bucket(
        F.concat(F.col("j").cast("string"), F.lit("|"), F.col("term")), width
    )
    sketch = (
        tc.select("term", "true_cnt", js).withColumn("b", bucket())
        .groupBy("j", "b").agg(F.sum("true_cnt").alias("counter"))
    )
    est = (
        tc.select("term", "true_cnt", js).withColumn("b", bucket())
        .join(sketch, ["j", "b"])
        .groupBy("term")
        .agg(F.first("true_cnt").alias("t"), F.min("counter").alias("e"))
        .collect()
    )
    assert len(est) == 3
    for r in est:
        assert r["e"] >= r["t"]
        assert r["e"] == r["t"]  # 3 keys, 512 cells, 4 rows: no collisions


def test_bpe_pair_counts_hand_checked(spark):
    """'abab' ×2 + 'ab' ×1 → pairs: ab=(3·2)… verified by hand:
    abab yields ab,ba,ab per occurrence; word-frequency weighting."""
    docs = spark.createDataFrame(
        [(1, "abab ab abab"), (2, "ab")], ["doc_id", "text"]
    )
    from quantum_rag_data_pipeline_spark.operators import text as text_ops

    words = docs.select(F.explode(text_ops.tokens(F.lower(F.col("text")))).alias("w"))
    wc = words.groupBy("w").agg(F.count(F.lit(1)).alias("wcnt")).filter(F.length("w") >= 2)
    pairs = wc.select(
        "wcnt",
        F.explode(F.sequence(F.lit(1), F.length("w") - 1)).alias("i"),
        "w",
    ).select(F.col("w").substr(F.col("i"), F.lit(2)).alias("pair"), "wcnt")
    got = {
        r["pair"]: r["pair_count"]
        for r in pairs.groupBy("pair")
        .agg(F.sum("wcnt").alias("pair_count"))
        .collect()
    }
    # vocab: abab (freq 2) → ab,ba,ab ; ab (freq 2) → ab
    assert got == {"ab": 2 * 2 + 2 * 1, "ba": 2 * 1}


def test_pagerank_sums_to_one_and_ranks_hub(spark):
    """Rank mass is conserved (Σpr = 1 within grid tolerance) and the
    star-center of a 4-star outranks its leaves."""
    from quantum_rag_data_pipeline_spark.operators import graph as graph_ops

    star = [(0, 1), (0, 2), (0, 3), (0, 4)]
    edges = spark.createDataFrame(star, ["u", "v"])
    pr = {r["node"]: r["pr"] for r in graph_ops.pagerank(edges, n_iter=3).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    assert pr[0] > pr[1] == pr[2] == pr[3] == pr[4]


def test_dsir_prefers_target_vocabulary(spark):
    """Docs made of target-domain-only terms score above docs of
    off-domain terms under the likelihood-ratio weights."""
    from quantum_rag_data_pipeline_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(1, "alpha alpha beta", "src0"), (2, "alpha beta", "src0"),
         (3, "gamma delta", "srcX"), (4, "alpha beta", "srcX")],
        ["doc_id", "text", "source"],
    )
    tok = docs.select(
        "doc_id", "source",
        F.explode(text_ops.tokens(F.lower(F.col("text")))).alias("term"),
    )
    is_tgt = (F.col("source") == "src0").cast("int")
    tot = tok.agg(
        F.sum(is_tgt).cast("double").alias("tgt_tot"),
        F.count(F.lit(1)).cast("double").alias("raw_tot"),
    )
    vocab = tok.groupBy("term").agg(
        F.count(F.lit(1)).alias("raw_cnt"), F.sum(is_tgt).alias("tgt_cnt")
    )
    lam = F.round(
        F.log(((F.col("tgt_cnt") + 0.5) / F.col("tgt_tot"))
              / ((F.col("raw_cnt") + 0.5) / F.col("raw_tot"))), 6
    ).cast("decimal(24,6)")
    w = vocab.crossJoin(F.broadcast(tot)).select("term", lam.alias("lam"))
    scores = {
        r["doc_id"]: float(r["s"])
        for r in tok.join(w, "term").groupBy("doc_id")
        .agg(F.sum("lam").alias("s")).collect()
    }
    # doc 4 shares doc 2's tokens exactly → identical score; off-domain
    # doc 3 (gamma/delta never in target) must rank strictly last.
    assert scores[3] < min(scores[1], scores[2], scores[4])
    assert scores[2] == scores[4]


def test_corr_matrix_exact_on_known_data(spark):
    """corr(x, 2x) = 1, corr(x, -x) = -1, corr(x, const) undefined→NaN."""
    import math
    data = [(float(i), 2.0 * i, -1.0 * i, 5.0) for i in range(1, 9)]
    df = spark.createDataFrame(data, ["x", "y2", "yneg", "yc"])
    dec = "decimal(38,6)"
    def corr_of(ycol):
        s = df.agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.round("x", 4).cast(dec)).cast("double").alias("sx"),
            F.sum(F.round(ycol, 4).cast(dec)).cast("double").alias("sy"),
            F.sum(F.round(F.col("x") * F.col(ycol), 6).cast(dec)).cast("double").alias("sxy"),
            F.sum(F.round(F.col("x") * F.col("x"), 6).cast(dec)).cast("double").alias("sxx"),
            F.sum(F.round(F.col(ycol) * F.col(ycol), 6).cast(dec)).cast("double").alias("syy"),
        ).collect()[0]
        num = s["n"] * s["sxy"] - s["sx"] * s["sy"]
        den = math.sqrt(s["n"] * s["sxx"] - s["sx"] ** 2) * math.sqrt(s["n"] * s["syy"] - s["sy"] ** 2) if (s["n"] * s["sxx"] - s["sx"] ** 2) > 0 and (s["n"] * s["syy"] - s["sy"] ** 2) > 0 else float("nan")
        return num / den if den == den and den != 0 else float("nan")
    assert abs(corr_of("y2") - 1.0) < 1e-9
    assert abs(corr_of("yneg") + 1.0) < 1e-9
    assert math.isnan(corr_of("yc"))


def test_unigram_logprob_ranks_rare_text_lower(spark):
    """A doc of corpus-rare tokens must average a lower log-prob than a
    doc of corpus-common tokens."""
    from quantum_rag_data_pipeline_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(1, "the the the and and"), (2, "zyx qwv"), (3, "the and")],
        ["doc_id", "text"],
    )
    tok = docs.select(
        "doc_id", F.explode(text_ops.tokens(F.lower(F.col("text")))).alias("term")
    )
    tot = tok.agg(F.count(F.lit(1)).cast("double").alias("n"))
    vocab = tok.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
    logp = F.round(F.log(F.col("cnt").cast("double") / F.col("n")), 6).cast("decimal(24,6)")
    w = vocab.crossJoin(F.broadcast(tot)).select("term", logp.alias("logp"))
    avg = {
        r["doc_id"]: float(r["a"])
        for r in tok.join(w, "term").groupBy("doc_id")
        .agg((F.sum("logp").cast("double") / F.count(F.lit(1))).alias("a"))
        .collect()
    }
    assert avg[2] < avg[3] <= avg[1] or avg[2] < avg[1]  # rare-token doc is worst
    assert min(avg, key=avg.get) == 2


def test_ndcg_perfect_retrieval_is_one(spark, sf_dir):
    """Self-consistency on real data: every nDCG and RR lies in [0, 1],
    and n_rel ≤ 10; a query whose top hit shares its label has rr = 1."""
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    rows = QUERIES["retrieval_eval_ndcg"](spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 0.0 <= r["rr"] <= 1.0
        assert 0.0 <= r["ndcg10"] <= 1.0 + 1e-9
        assert 0 <= r["n_rel"] <= 10


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc fully quoted inside a long one: containment 1.0 even
    though Jaccard is small — the pair the symmetric metric misses."""
    from quantum_rag_data_pipeline_spark.operators import dedup as dedup_ops

    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, quote), (2, filler + " " + quote)], ["doc_id", "text"]
    )
    idx = dedup_ops.shingle_index(docs, n=5, max_df=64)
    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    a = idx.select(F.col("doc_id").alias("id_a"), "shingle")
    b = idx.select(F.col("doc_id").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle").filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
    ).collect()
    szs = {r["doc_id"]: r["sz"] for r in sizes.collect()}
    assert len(inter) == 1
    r = inter[0]
    containment = r["inter"] / min(szs[1], szs[2])
    jaccard = r["inter"] / (szs[1] + szs[2] - r["inter"])
    assert containment == 1.0
    assert jaccard < 0.3
