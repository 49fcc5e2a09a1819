"""Corpus segment: Holt smoothing, MMR, naive Bayes, HITS, query likelihood, trend tests, graph mixing, moments.

Queries 271-288 of the registration order. The monolithic queries.py
was split in round 5 into contiguous registration-order slices; this
file's internal order plus the package __init__'s import sequence
preserve the order that tools/verify_ledger.py audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quantum_rag_data_pipeline_spark.operators import graph as graph_ops
from quantum_rag_data_pipeline_spark.operators import similarity as sim_ops
from quantum_rag_data_pipeline_spark.operators import text as text_ops
from quantum_rag_data_pipeline_spark.queries._registry import _t, query
from quantum_rag_data_pipeline_spark.queries.curation_clustering import _BM25_TERMS



# ---------------------------------------------------------------------------
# Brown's double exponential smoothing — level+trend forecast, window-only
# ---------------------------------------------------------------------------

# Truncated geometric kernel (alpha=0.3, 12 taps; tail mass 0.7^12 < 1.4%),
# literal constants shared by both engines — same rationale as _EWMA_W.
_SES_W = [0.3 * 0.7 ** j for j in range(12)]
_SES_RAT = 0.3 / 0.7  # alpha/(1-alpha), inlined as one double literal


def _ses_unroll(col: str) -> str:
    """SQL for the truncated, presence-normalized smoothing of `col`
    (lag-unroll over the day-ordered series — no recursion)."""
    num = " + ".join(
        f"COALESCE({w!r} * l{j}_{col}, 0.0)" if j else f"{w!r} * {col}"
        for j, w in enumerate(_SES_W)
    )
    den = " + ".join(
        f"CASE WHEN l{j}_{col} IS NULL THEN 0.0 ELSE {w!r} END" if j else f"{w!r}"
        for j, w in enumerate(_SES_W)
    )
    return f"({num}) / ({den})"


@query(
    "holt_brown_double_smoothing",
    oracle=f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS DOUBLE) AS y
      FROM events GROUP BY 1
    ),
    lag1 AS (
      SELECT day, y,
             {" ".join(f"LAG(y, {j}) OVER (ORDER BY day) AS l{j}_y," for j in range(1, 12))}
             ROW_NUMBER() OVER (ORDER BY day) AS rn,
             COUNT(*) OVER () AS n
      FROM daily
    ),
    s1t AS (SELECT day, rn, n, {_ses_unroll("y")} AS s1 FROM lag1),
    lag2 AS (
      SELECT day, rn, n, s1,
             {" ".join(f"LAG(s1, {j}) OVER (ORDER BY day) AS l{j}_s1," for j in range(1, 12))}
             1 AS _pad
      FROM s1t
    ),
    s2t AS (SELECT day, rn, n, s1, {_ses_unroll("s1")} AS s2 FROM lag2)
    SELECT day AS last_day,
           ROUND(s1, 6) AS s1, ROUND(s2, 6) AS s2,
           ROUND(2.0 * s1 - s2, 6) AS level,
           ROUND({_SES_RAT!r} * (s1 - s2), 6) AS trend,
           ROUND((2.0 * s1 - s2) + 1.0 * ({_SES_RAT!r} * (s1 - s2)), 6) AS forecast_h1,
           ROUND((2.0 * s1 - s2) + 7.0 * ({_SES_RAT!r} * (s1 - s2)), 6) AS forecast_h7
    FROM s2t WHERE rn = n
    """,
)
def holt_brown_double_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BROWN'S DOUBLE EXPONENTIAL SMOOTHING over the daily event-count
    series — the classic level+trend forecaster (S1 = smoothed series,
    S2 = smoothed S1; level = 2S1-S2, trend = α/(1-α)·(S1-S2), h-step
    forecast = level + h·trend). The sequential recurrence is recast
    as TWO truncated-kernel window passes (12 taps, presence-
    normalized — the `ewma_event_smoothing` trick squared), so Spark
    runs it as two ordered windows over the ~30-row DAILY ROLLUP, not
    an iteration, and not over the raw fact table — the single-
    partition window is bounded by calendar days, independent of
    corpus scale. Kernel weights and α/(1-α) are shared double
    literals; y is an exact integer count, so both engines replay the
    identical IEEE arithmetic. Output: the final day's S1/S2, level,
    trend, and the 1-day / 7-day-ahead forecasts — the capacity
    number a planner reads tomorrow morning."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("y")
    )
    w = Window.orderBy("day")

    def smooth(col: str):
        lags = [F.col(col)] + [F.lag(col, j).over(w) for j in range(1, 12)]
        num = F.lit(_SES_W[0]) * lags[0]
        den = F.lit(_SES_W[0])
        for j in range(1, 12):
            num = num + F.coalesce(F.lit(_SES_W[j]) * lags[j], F.lit(0.0))
            den = den + F.when(lags[j].isNull(), F.lit(0.0)).otherwise(F.lit(_SES_W[j]))
        return num / den

    s1t = daily.select(
        "day", "y",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
        smooth("y").alias("s1"),
    )
    s2t = s1t.select("day", "rn", "n", "s1", smooth("s1").alias("s2"))
    level = 2.0 * F.col("s1") - F.col("s2")
    trend = F.lit(_SES_RAT) * (F.col("s1") - F.col("s2"))
    return s2t.filter(F.col("rn") == F.col("n")).select(
        F.col("day").alias("last_day"),
        F.round("s1", 6).alias("s1"),
        F.round("s2", 6).alias("s2"),
        F.round(level, 6).alias("level"),
        F.round(trend, 6).alias("trend"),
        F.round(level + 1.0 * trend, 6).alias("forecast_h1"),
        F.round(level + 7.0 * trend, 6).alias("forecast_h7"),
    )


# ---------------------------------------------------------------------------
# MMR diversified reranking — greedy maximal marginal relevance, unrolled
# ---------------------------------------------------------------------------

_MMR_COS = (
    "list_dot_product({a}, {b}) / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b})))"
)


def _mmr_oracle(k: int = 5) -> str:
    head = f"""
    WITH qv AS (
      SELECT CAST(embedding AS DOUBLE[]) AS vec FROM embeddings WHERE vec_id = 0
    ),
    cand AS (
      SELECT vec_id, vec, rel FROM (
        SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS vec,
               {_MMR_COS.format(a="CAST(e.embedding AS DOUBLE[])", b="q.vec")} AS rel
        FROM embeddings e CROSS JOIN qv q WHERE e.vec_id <> 0
      ) ORDER BY rel DESC, vec_id LIMIT 12
    ),
    pair AS (
      SELECT a.vec_id AS ia, b.vec_id AS ib,
             {_MMR_COS.format(a="a.vec", b="b.vec")} AS cos
      FROM cand a JOIN cand b ON a.vec_id <> b.vec_id
    ),
    s1 AS (SELECT vec_id, rel, 0.7 * rel AS mmr
           FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
    sel1 AS (SELECT vec_id FROM s1)"""
    steps = []
    for i in range(2, k + 1):
        steps.append(f""",
    st{i} AS (
      SELECT c.vec_id, c.rel, 0.7 * c.rel - 0.3 * MAX(p.cos) AS mmr
      FROM cand c JOIN pair p ON p.ia = c.vec_id
                             AND p.ib IN (SELECT vec_id FROM sel{i - 1})
      WHERE c.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
      GROUP BY c.vec_id, c.rel
    ),
    s{i} AS (SELECT vec_id, rel, mmr FROM st{i} ORDER BY mmr DESC, vec_id LIMIT 1),
    sel{i} AS (SELECT vec_id FROM sel{i - 1} UNION ALL SELECT vec_id FROM s{i})""")
    union = "\n      UNION ALL ".join(
        f"SELECT {i} AS step, vec_id, rel, mmr FROM s{i}" for i in range(1, k + 1)
    )
    return (
        head + "".join(steps)
        + f"""
    SELECT CAST(step AS BIGINT) AS step, vec_id,
           ROUND(rel, 6) AS relevance, ROUND(mmr, 6) AS mmr_score
    FROM ({union})
    """
    )


@query("mmr_diversified_rerank", oracle=_mmr_oracle())
def mmr_diversified_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE (Carbonell & Goldstein 1998) — the
    diversity reranker RAG context builders run after ANN retrieval:
    greedily pick argmax of λ·rel(d,q) - (1-λ)·max_{s∈S} sim(d,s),
    λ=0.7, so each next document is relevant to the query but NOT
    redundant with what's already selected (the failure mode
    `rag_context_assembly` inherits when top-k returns five copies of
    the same paragraph). Greedy selection is inherently sequential in
    k but NOT in the data: the candidate pool is a top-12 TakeOrdered
    over the corpus-wide relevance scan (distributed, per-partition
    heaps), the 12x12 sim matrix is one tiny self-join, and the 5
    unrolled selection steps run over pool-sized frames — the oracle
    unrolls the identical greedy loop in SQL. All scores are IEEE
    double compositions of sequential dots (bit-identical across
    engines, cf. `knn_graph_mutual`). Output: the 5 picks in
    selection order with relevance and MMR score — watch redundant
    near-duplicates of pick 1 fall below diverse picks."""
    # Plan-build economics (measured round 8, quiet VM): the vector
    # columns are named FIRST so cosine(..., dim=64) hits
    # similarity.dot's memoized one-round-trip F.expr fast path — the
    # unroll keeps the identical left-to-right accumulation, so scores
    # stay bit-equal to the oracle, and the 2000-row relevance scan
    # runs whole-stage-codegen'd instead of through the aggregate fold.
    # The per-step localCheckpoint(eager=False) calls are LOAD-BEARING
    # despite costing a catalyst pass each: step i's plan embeds step
    # i-1's subtree twice (sel_ids in two join operands), so without
    # the truncation the final tree grows 2^k subtrees and one big
    # compile at the action costs more than the five small ones
    # (measured: build 1.0 s + exec 1.0 s uncheckpointed vs
    # 1.3 s + 0.05 s checkpointed).
    e = _t(spark, sf_dir, "embeddings")
    vec = F.col("embedding").cast("array<double>")
    qv = e.filter(F.col("vec_id") == 0).select(vec.alias("qvec"))
    cand = (
        e.filter(F.col("vec_id") != 0)
        .select("vec_id", vec.alias("vec"))
        .crossJoin(F.broadcast(qv))
        .select(
            "vec_id",
            "vec",
            sim_ops.cosine(F.col("vec"), F.col("qvec"), 64).alias("rel"),
        )
        .orderBy(F.desc("rel"), "vec_id")
        .limit(12)
        .localCheckpoint(eager=False)
    )
    c2 = cand.select(
        F.col("vec_id").alias("ib"), F.col("vec").alias("vec_b")
    )
    pair = (
        cand.join(F.broadcast(c2), F.col("vec_id") != F.col("ib"))
        .select(
            F.col("vec_id").alias("ia"), "ib",
            sim_ops.cosine(F.col("vec"), F.col("vec_b"), 64).alias("cos"),
        )
        .localCheckpoint(eager=False)
    )
    picked = (
        cand.orderBy(F.desc("rel"), "vec_id").limit(1)
        .select(F.lit(1).alias("step"), "vec_id", "rel", (0.7 * F.col("rel")).alias("mmr"))
    )
    # The five selection-step compiles run over <=132-row checkpointed
    # inputs — AQE's adaptive wrapping is pure per-compile overhead
    # there (measured: ~0.45 s of driver time across the loop), while
    # the corpus-wide candidate scan ABOVE keeps AQE (that is the part
    # that is big at scale). Same scoped set-then-restore discipline as
    # streaming/daily_stream.drain_available_now: conf back in a
    # finally, so a caller's session never observes the change.
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        for i in range(2, 6):
            sel_ids = picked.select("vec_id")
            scored = (
                cand.join(sel_ids.withColumnRenamed("vec_id", "_s"), F.col("vec_id") == F.col("_s"), "left_anti")
                .join(pair, F.col("vec_id") == F.col("ia"))
                .join(
                    F.broadcast(sel_ids.withColumnRenamed("vec_id", "_sel")),
                    F.col("ib") == F.col("_sel"),
                )
                .groupBy("vec_id", "rel")
                .agg(F.max("cos").alias("max_sim"))
                .select(
                    "vec_id", "rel",
                    (0.7 * F.col("rel") - 0.3 * F.col("max_sim")).alias("mmr"),
                )
            )
            nxt = scored.orderBy(F.desc("mmr"), "vec_id").limit(1).select(
                F.lit(i).alias("step"), "vec_id", "rel", "mmr"
            )
            picked = picked.unionByName(nxt).localCheckpoint(eager=False)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
    return picked.select(
        F.col("step").cast("bigint").alias("step"), "vec_id",
        F.round("rel", 6).alias("relevance"),
        F.round("mmr", 6).alias("mmr_score"),
    )


# ---------------------------------------------------------------------------
# Multinomial naive Bayes language classifier (train/test split, integer
# micro-nat log-weights so scoring is order-free and replay-exact)
# ---------------------------------------------------------------------------

@query(
    "naive_bayes_lang_classifier",
    oracle="""
    WITH train AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 0),
    test  AS (SELECT doc_id, lang, text FROM documents WHERE doc_id % 2 = 1),
    ttr AS (
      SELECT lang, unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                      t -> t <> '')) AS term
      FROM train
    ),
    cws AS (SELECT lang, term, CAST(COUNT(*) AS BIGINT) AS c FROM ttr GROUP BY lang, term),
    ns  AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n_s FROM cws GROUP BY lang),
    vocab AS (SELECT DISTINCT term FROM cws),
    vsize AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
    prior AS (
      SELECT lang, CAST(ROUND(ln(CAST(COUNT(*) AS DOUBLE)
                                  / (SELECT COUNT(*) FROM train)) * 1000000.0)
                        AS BIGINT) AS prior6
      FROM train GROUP BY lang
    ),
    grid AS (
      SELECT v.term, s.lang,
             CAST(ROUND(ln(CAST(COALESCE(c.c, 0) + 1 AS DOUBLE)
                           / (s.n_s + (SELECT v FROM vsize))) * 1000000.0)
                  AS BIGINT) AS w6
      FROM vocab v CROSS JOIN ns s
      LEFT JOIN cws c ON c.term = v.term AND c.lang = s.lang
    ),
    tte AS (
      SELECT doc_id, lang AS true_lang,
             unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                t -> t <> '')) AS term
      FROM test
    ),
    dterm AS (SELECT doc_id, true_lang, term, CAST(COUNT(*) AS BIGINT) AS c
              FROM tte GROUP BY doc_id, true_lang, term),
    scores AS (
      SELECT d.doc_id, d.true_lang, g.lang,
             p.prior6 + CAST(SUM(d.c * g.w6) AS BIGINT) AS score6
      FROM dterm d JOIN grid g ON g.term = d.term
      JOIN prior p ON p.lang = g.lang
      GROUP BY d.doc_id, d.true_lang, g.lang, p.prior6
    ),
    pred AS (
      SELECT doc_id, true_lang, lang AS pred_lang
      FROM scores
      QUALIFY ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY score6 DESC, lang ASC) = 1
    )
    SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY true_lang, pred_lang
    """,
)
def naive_bayes_lang_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTINOMIAL NAIVE BAYES trained on the even-id half of the
    corpus and scored on the odd half — the generative counterpart to
    the heuristic `text_lang_id_confusion`: log P(lang) + Σ c_w·log
    P(w|lang) with add-1 smoothing over the train vocabulary (OOV test
    tokens ignored, the standard multinomial convention). Every log
    weight feeds ln() a RATIO OF EXACT INTEGERS and lands on the
    integer MICRO-NAT grid, so the per-doc score is a sum of int64
    products — order-free, replay-exact, and the argmax is a clean
    integer comparison with a lexicographic tiebreak. Shapes are the
    scalable ones: token explode → (lang, term) counts; the smoothing
    grid is vocab x |langs| (dictionary-sized, broadcast); scoring is
    one join from doc-term counts to the grid and a partial-agg sum —
    the same postings-join shape as `bm25_keyword_search`. Output:
    the test confusion matrix — the table that says which languages
    the bag-of-words model actually separates."""
    d = _t(spark, sf_dir, "documents")
    train = d.filter(F.col("doc_id") % 2 == 0)
    test = d.filter(F.col("doc_id") % 2 == 1)
    ttr = train.select("lang", F.explode(text_ops.tokens("text")).alias("term"))
    cws = ttr.groupBy("lang", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).cache()
    ns = cws.groupBy("lang").agg(F.sum("c").cast("bigint").alias("n_s"))
    vocab = cws.select("term").distinct()
    vsize = vocab.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    n_train = train.agg(F.count(F.lit(1)).alias("n_train"))
    prior = (
        train.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs_s"))
        .crossJoin(F.broadcast(n_train))
        .select(
            "lang",
            F.round(
                F.log(F.col("n_docs_s").cast("double") / F.col("n_train")) * 1000000.0
            ).cast("bigint").alias("prior6"),
        )
    )
    grid = (
        vocab.crossJoin(F.broadcast(ns))
        .crossJoin(F.broadcast(vsize))
        .join(cws.withColumnRenamed("c", "_c"), ["term", "lang"], "left")
        .select(
            "term", "lang",
            F.round(
                F.log(
                    (F.coalesce(F.col("_c"), F.lit(0)) + 1).cast("double")
                    / (F.col("n_s") + F.col("v"))
                ) * 1000000.0
            ).cast("bigint").alias("w6"),
        )
    )
    tte = test.select(
        "doc_id", F.col("lang").alias("true_lang"),
        F.explode(text_ops.tokens("text")).alias("term"),
    )
    dterm = tte.groupBy("doc_id", "true_lang", "term").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )
    scores = (
        dterm.join(grid.withColumnRenamed("lang", "s_lang"), "term")
        .groupBy("doc_id", "true_lang", "s_lang")
        .agg(F.sum(F.col("c") * F.col("w6")).cast("bigint").alias("like6"))
        .join(F.broadcast(prior.withColumnRenamed("lang", "s_lang")), "s_lang")
        .select(
            "doc_id", "true_lang", "s_lang",
            (F.col("prior6") + F.col("like6")).alias("score6"),
        )
    )
    from pyspark.sql.window import Window

    pred = (
        scores.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("score6"), F.asc("s_lang"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("true_lang", F.col("s_lang").alias("pred_lang"))
    )
    return pred.groupBy("true_lang", "pred_lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


# ---------------------------------------------------------------------------
# HITS hubs & authorities on the customer→part purchase digraph
# ---------------------------------------------------------------------------

@query(
    "hits_hubs_authorities",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o.o_custkey AS hub, l.l_partkey AS auth
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      WHERE l.l_partkey % 7 = 0
    ),
    a1r AS (
      SELECT auth, CAST(COUNT(*) AS DOUBLE) AS a_raw FROM edges GROUP BY auth
    ),
    a1n AS (SELECT CAST(SUM(CAST(a_raw AS DECIMAL(28,6))) AS DOUBLE) AS s FROM a1r),
    a1 AS (SELECT auth, CAST(ROUND(a_raw / (SELECT s FROM a1n), 12)
                             AS DECIMAL(28,12)) AS a FROM a1r),
    h1r AS (
      SELECT e.hub, SUM(a1.a) AS h_raw
      FROM edges e JOIN a1 ON a1.auth = e.auth GROUP BY e.hub
    ),
    h1n AS (SELECT CAST(SUM(h_raw) AS DOUBLE) AS s FROM h1r),
    h1 AS (SELECT hub, CAST(ROUND(CAST(h_raw AS DOUBLE) / (SELECT s FROM h1n), 12)
                            AS DECIMAL(28,12)) AS h FROM h1r),
    a2r AS (
      SELECT e.auth, SUM(h1.h) AS a_raw
      FROM edges e JOIN h1 ON h1.hub = e.hub GROUP BY e.auth
    ),
    a2n AS (SELECT CAST(SUM(a_raw) AS DOUBLE) AS s FROM a2r),
    a2 AS (SELECT auth, ROUND(CAST(a_raw AS DOUBLE) / (SELECT s FROM a2n), 12) AS a
           FROM a2r)
    SELECT auth AS part_key, ROUND(a * 1000.0, 9) AS authority_permille
    FROM a2
    QUALIFY ROW_NUMBER() OVER (ORDER BY a DESC, auth ASC) <= 15
    """,
)
def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg's hubs & authorities) on the bipartite
    customer→part purchase digraph — customers are hubs, parts are
    authorities, and unlike `pagerank_copurchase`'s single undirected
    score the mutual recursion ranks the two SIDES of the graph
    separately (good hubs buy authoritative parts; authoritative
    parts are bought by good hubs). Two power iterations with
    sum-normalization, every intermediate snapped to the DECIMAL
    12-dp grid before the next aggregation (the pagerank decimal-grid
    trick) so partial-agg sums are order-free and both engines walk
    the identical lattice. Each iteration is one edge-table join +
    partial-agg — the O(|E|) shape that scales; no dense matrix
    materializes. Output: top-15 authority parts (per-mille scores) —
    the 'canonical items' list a recommender seeds from.

    Round-10 restructure (the mmr checkpoint-compile fix's analog): the
    lazy ``localCheckpoint`` on edges forced a second full catalyst
    compile of the edge subtree (~0.45 s driver time; Dataset.checkpoint
    goes through queryExecution.toRdd even when lazy) — dropped, because
    the edges subtree's DISTINCT exchange is plan-identical across all
    three consumers and Spark's ReuseExchange unifies them in one DAG.
    The per-node score tables (a1, h1) get explicit broadcast hints:
    they are O(V) against O(|E|) edge joins (<=3 k auth / <=15 k hub
    rows vs the edge table), the same V<<E shape a power-law bipartite
    graph keeps at scale; for a node table past broadcast reach, delete
    the two hints and the joins fall back to the co-partitioned shuffle
    plans AQE picks anyway. Quiet min-of-3: 1.96 -> 1.57 s, output
    bit-identical."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_partkey") % 7 == 0)
    from pyspark.sql.window import Window

    edges = (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .select(F.col("o_custkey").alias("hub"), F.col("l_partkey").alias("auth"))
        .distinct()
    )
    a1r = edges.groupBy("auth").agg(F.count(F.lit(1)).cast("double").alias("a_raw"))
    a1s = a1r.agg(
        F.sum(F.col("a_raw").cast("decimal(28,6)")).cast("double").alias("s")
    )
    a1 = a1r.crossJoin(F.broadcast(a1s)).select(
        "auth",
        F.round(F.col("a_raw") / F.col("s"), 12).cast("decimal(28,12)").alias("a"),
    )
    h1r = edges.join(F.broadcast(a1), "auth").groupBy("hub").agg(F.sum("a").alias("h_raw"))
    h1s = h1r.agg(F.sum("h_raw").cast("double").alias("s"))
    h1 = h1r.crossJoin(F.broadcast(h1s)).select(
        "hub",
        F.round(F.col("h_raw").cast("double") / F.col("s"), 12)
        .cast("decimal(28,12)").alias("h"),
    )
    a2r = edges.join(F.broadcast(h1), "hub").groupBy("auth").agg(F.sum("h").alias("a_raw"))
    a2s = a2r.agg(F.sum("a_raw").cast("double").alias("s"))
    a2 = a2r.crossJoin(F.broadcast(a2s)).select(
        "auth", F.round(F.col("a_raw").cast("double") / F.col("s"), 12).alias("a")
    )
    top = a2.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.desc("a"), F.asc("auth")))
    ).filter(F.col("rn") <= 15)
    return top.select(
        F.col("auth").alias("part_key"),
        F.round(F.col("a") * 1000.0, 9).alias("authority_permille"),
    )


# ---------------------------------------------------------------------------
# Query-likelihood retrieval with Dirichlet smoothing (the LM alternative
# to BM25, same postings shapes, integer-ratio logs)
# ---------------------------------------------------------------------------

@query(
    "query_likelihood_dirichlet",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS tok
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(len(tok) AS BIGINT) AS dl FROM toks),
    n AS (SELECT CAST(SUM(dl) AS BIGINT) AS n_tokens FROM dl),
    tf AS (
      SELECT doc_id, lower(t.term) AS term, CAST(COUNT(*) AS BIGINT) AS c
      FROM toks, unnest(tok) AS t(term)
      WHERE lower(t.term) IN {tuple(_BM25_TERMS)}
      GROUP BY doc_id, lower(t.term)
    ),
    cf AS (SELECT term, CAST(SUM(c) AS BIGINT) AS cf FROM tf GROUP BY term),
    scored AS (
      SELECT d.doc_id,
             CAST(ROUND(ln(CAST(COALESCE(tf.c, 0) * n.n_tokens + 2000 * cf.cf AS DOUBLE)
                           / CAST(n.n_tokens * (d.dl + 2000) AS DOUBLE))
                        * 1000000.0) AS BIGINT) AS t6
      FROM dl d CROSS JOIN cf
      CROSS JOIN n
      LEFT JOIN tf ON tf.doc_id = d.doc_id AND tf.term = cf.term
    ),
    per_doc AS (
      SELECT doc_id, CAST(SUM(t6) AS BIGINT) AS score6 FROM scored GROUP BY doc_id
    )
    SELECT doc_id, ROUND(CAST(score6 AS DOUBLE) / 1000000.0, 4) AS ql_log_score
    FROM per_doc
    QUALIFY ROW_NUMBER() OVER (ORDER BY score6 DESC, doc_id) <= 20
    """,
)
def query_likelihood_dirichlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUERY-LIKELIHOOD retrieval with DIRICHLET SMOOTHING (Zhai &
    Lafferty 2001), the language-model alternative to
    `bm25_keyword_search` over the same 3-term query: score(d) =
    Σ_w ln( (c_wd + μ·P(w|C)) / (|d| + μ) ), μ=2000 — rewritten as
    the INT64 ratio (c_wd·N + μ·cf_w) / (N·(|d|+μ)) so ln() sees the
    identical double in both engines, per-term micro-nats round to
    integers, and per-doc sums are order-free. Unlike BM25, every
    document scores every query term (the collection model gives
    absent terms smoothing mass — that's the point of LM retrieval),
    so the plan is dl x cf (docs x 3 terms) with a LEFT join to the
    postings — still linear in corpus size, broadcast dictionary.
    Output: top-20 docs by log-likelihood."""
    d = _t(spark, sf_dir, "documents")
    from pyspark.sql.window import Window

    dl = d.select("doc_id", F.size(text_ops.tokens("text")).cast("bigint").alias("dl"))
    dl = dl.cache()
    n = dl.agg(F.sum("dl").cast("bigint").alias("n_tokens"))
    # inline explode — see bm25_keyword_search: an attribute input makes
    # InferFiltersFromGenerate substitute the tokenization into pushed
    # size>0/isnotnull filters, 3-4 evaluations per row.
    tf = (
        d.select("doc_id", F.explode(text_ops.tokens("text")).alias("term"))
        .select("doc_id", F.lower("term").alias("term"))
        .filter(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .cache()
    )
    cf = tf.groupBy("term").agg(F.sum("c").cast("bigint").alias("cf"))
    scored = (
        dl.crossJoin(F.broadcast(cf))
        .crossJoin(F.broadcast(n))
        .join(tf, ["doc_id", "term"], "left")
        .select(
            "doc_id",
            F.round(
                F.log(
                    (F.coalesce(F.col("c"), F.lit(0)) * F.col("n_tokens")
                     + 2000 * F.col("cf")).cast("double")
                    / (F.col("n_tokens") * (F.col("dl") + 2000)).cast("double")
                ) * 1000000.0
            ).cast("bigint").alias("t6"),
        )
    )
    per_doc = scored.groupBy("doc_id").agg(F.sum("t6").cast("bigint").alias("score6"))
    return (
        per_doc.withColumn(
            "rn", F.row_number().over(Window.orderBy(F.desc("score6"), F.asc("doc_id")))
        )
        .filter(F.col("rn") <= 20)
        .select("doc_id", F.round(F.col("score6").cast("double") / 1000000.0, 4).alias("ql_log_score"))
    )


# ---------------------------------------------------------------------------
# Rocchio relevance feedback — refined query vector + re-retrieval
# ---------------------------------------------------------------------------

@query(
    "rocchio_relevance_feedback",
    oracle="""
    WITH q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS vec,
             label AS qlabel
      FROM embeddings WHERE vec_id = 0
    ),
    qd AS (
      SELECT d.d AS dim, q.vec[d.d + 1] AS qx, q.qlabel
      FROM q CROSS JOIN (SELECT unnest(range(0, 64)) AS d) d
    ),
    rel AS (
      SELECT d.d AS dim,
             CAST(SUM(CAST(ROUND(CAST(e.embedding[d.d + 1] AS DOUBLE), 9)
                           AS DECIMAL(20,9))) AS DOUBLE) AS sx,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings e CROSS JOIN (SELECT unnest(range(0, 64)) AS d) d
      WHERE e.vec_id <> 0 AND e.label = (SELECT qlabel FROM q)
      GROUP BY d.d
    ),
    non AS (
      SELECT d.d AS dim,
             CAST(SUM(CAST(ROUND(CAST(e.embedding[d.d + 1] AS DOUBLE), 9)
                           AS DECIMAL(20,9))) AS DOUBLE) AS sx,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM embeddings e CROSS JOIN (SELECT unnest(range(0, 64)) AS d) d
      WHERE e.vec_id <> 0 AND e.label <> (SELECT qlabel FROM q)
      GROUP BY d.d
    ),
    qprime AS (
      SELECT qd.dim,
             ROUND(1.0 * qd.qx + 0.75 * (rel.sx / rel.n)
                   - 0.15 * (non.sx / non.n), 9) AS qp
      FROM qd JOIN rel ON rel.dim = qd.dim JOIN non ON non.dim = qd.dim
    ),
    scored AS (
      SELECT e.vec_id, e.label,
             CAST(SUM(CAST(ROUND(CAST(e.embedding[p.dim + 1] AS DOUBLE) * p.qp, 9)
                           AS DECIMAL(20,9))) AS DOUBLE) AS dot
      FROM embeddings e CROSS JOIN qprime p
      WHERE e.vec_id <> 0
      GROUP BY e.vec_id, e.label
    )
    SELECT vec_id, label, ROUND(dot, 6) AS rocchio_dot,
           (label = (SELECT qlabel FROM q)) AS same_label
    FROM scored
    QUALIFY ROW_NUMBER() OVER (ORDER BY ROUND(dot, 6) DESC, vec_id) <= 10
    """,
)
def rocchio_relevance_feedback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROCCHIO RELEVANCE FEEDBACK (α=1, β=0.75, γ=0.15): the refined
    query vector q' = α·q + β·centroid(relevant) - γ·centroid(
    non-relevant) — the classical pseudo-feedback loop dense
    retrievers still mirror (HyDE, PRF-fusion); relevance is played
    by the query's own label. Means use the `kmeans_one_step` DECIMAL
    grid (round-to-1e-9 then exact decimal sums) so the centroids are
    order-free; q' lands on the 9-dp grid; re-retrieval scores every
    corpus vector by DOT with per-dim products snapped to the same
    grid before the exact decimal per-doc sum. Everything is explode
    + partial-agg: the q' table is 64 broadcast rows, corpus vectors
    stream through once — no pairwise matrix. Output: top-10 after
    feedback with a same-label flag (watch precision@10 beat the raw
    query's — that's the β pull toward the relevant centroid)."""
    e = _t(spark, sf_dir, "embeddings")
    from pyspark.sql.window import Window

    dimtab = spark.range(64).select(F.col("id").cast("int").alias("dim"))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("embedding").cast("array<double>").alias("vec"),
        F.col("label").alias("qlabel"),
    )
    qd = q.crossJoin(F.broadcast(dimtab)).select(
        "dim", F.element_at("vec", F.col("dim") + 1).alias("qx"), "qlabel"
    )
    rest = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q.select("qlabel")))
    expl = rest.select(
        "vec_id", "label", "qlabel",
        F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"),
    )
    rel = (
        expl.filter(F.col("label") == F.col("qlabel"))
        .groupBy("dim")
        .agg(
            F.sum(F.round("x", 9).cast("decimal(20,9)")).cast("double").alias("sx"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    non = (
        expl.filter(F.col("label") != F.col("qlabel"))
        .groupBy("dim")
        .agg(
            F.sum(F.round("x", 9).cast("decimal(20,9)")).cast("double").alias("sx"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )
    qprime = (
        qd.join(rel.select("dim", F.col("sx").alias("rsx"), F.col("n").alias("rn_")), "dim")
        .join(non.select("dim", F.col("sx").alias("nsx"), F.col("n").alias("nn_")), "dim")
        .select(
            "dim",
            F.round(
                1.0 * F.col("qx")
                + 0.75 * (F.col("rsx") / F.col("rn_"))
                - 0.15 * (F.col("nsx") / F.col("nn_")),
                9,
            ).alias("qp"),
        )
        .cache()
    )
    scored = (
        e.filter(F.col("vec_id") != 0)
        .select("vec_id", "label",
                F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"))
        .join(F.broadcast(qprime), "dim")
        .groupBy("vec_id", "label")
        .agg(
            F.sum(F.round(F.col("x") * F.col("qp"), 9).cast("decimal(20,9)"))
            .cast("double").alias("dot")
        )
    )
    out = scored.crossJoin(F.broadcast(q.select("qlabel"))).select(
        "vec_id", "label",
        F.round("dot", 6).alias("rocchio_dot"),
        (F.col("label") == F.col("qlabel")).alias("same_label"),
    )
    return (
        out.withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(F.desc("rocchio_dot"), F.asc("vec_id"))
            ),
        )
        .filter(F.col("rn") <= 10)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Fano factor / burstiness of the event arrival process, per event type
# ---------------------------------------------------------------------------

@query(
    "burstiness_fano_factor",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hr,
             CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    span AS (
      SELECT CAST(date_diff('hour', MIN(date_trunc('hour', ts)),
                            MAX(date_trunc('hour', ts))) + 1 AS BIGINT) AS n_hours
      FROM events
    ),
    stats AS (
      SELECT event_type,
             CAST(SUM(c) AS BIGINT) AS s1,
             CAST(SUM(c * c) AS BIGINT) AS s2,
             CAST(COUNT(*) AS BIGINT) AS n_nonzero
      FROM hourly GROUP BY event_type
    )
    SELECT s.event_type, t.n_hours, s.n_nonzero,
           ROUND(CAST(s.s1 AS DOUBLE) / t.n_hours, 6) AS mean_per_hour,
           ROUND(CAST(s.s2 AS DOUBLE) / t.n_hours
                 - (CAST(s.s1 AS DOUBLE) / t.n_hours)
                   * (CAST(s.s1 AS DOUBLE) / t.n_hours), 6) AS var_per_hour,
           ROUND((CAST(s.s2 AS DOUBLE) / t.n_hours
                  - (CAST(s.s1 AS DOUBLE) / t.n_hours)
                    * (CAST(s.s1 AS DOUBLE) / t.n_hours))
                 / (CAST(s.s1 AS DOUBLE) / t.n_hours), 6) AS fano_factor,
           ROUND((SQRT(CAST(s.s2 AS DOUBLE) / t.n_hours
                       - (CAST(s.s1 AS DOUBLE) / t.n_hours)
                         * (CAST(s.s1 AS DOUBLE) / t.n_hours))
                  - CAST(s.s1 AS DOUBLE) / t.n_hours)
                 / (SQRT(CAST(s.s2 AS DOUBLE) / t.n_hours
                         - (CAST(s.s1 AS DOUBLE) / t.n_hours)
                           * (CAST(s.s1 AS DOUBLE) / t.n_hours))
                    + CAST(s.s1 AS DOUBLE) / t.n_hours), 6) AS burstiness_b
    FROM stats s CROSS JOIN span t
    """,
)
def burstiness_fano_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FANO FACTOR (variance-to-mean of hourly arrival counts) and the
    Goh-Barabási BURSTINESS index B = (σ-μ)/(σ+μ) per event type — the
    dispersion diagnostics that tell a capacity planner whether
    traffic is Poisson (F≈1, provision for the mean) or bursty (F≫1,
    provision for the spikes; cf. `peak_concurrency_analysis` for the
    actual peak). Zero-count hours COUNT: moments use the full
    min-to-max hour span as the denominator (n_hours is a scalar, so
    empty bins never materialize — no calendar explode). Sufficient
    statistics Σc and Σc² stay exact int64 through the shuffle
    (partial-aggregable); doubles appear only in the final five
    expressions. One pass over the fact table, |types| output rows."""
    ev = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    span = ev.agg(
        (
            (
                F.unix_timestamp(F.date_trunc("hour", F.max("ts")))
                - F.unix_timestamp(F.date_trunc("hour", F.min("ts")))
            ) / 3600 + 1
        ).cast("bigint").alias("n_hours")
    )
    stats = hourly.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("s1"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("s2"),
        F.count(F.lit(1)).cast("bigint").alias("n_nonzero"),
    )
    j = stats.crossJoin(F.broadcast(span))
    mean = F.col("s1").cast("double") / F.col("n_hours")
    var = F.col("s2").cast("double") / F.col("n_hours") - mean * mean
    sd = F.sqrt(var)
    return j.select(
        "event_type", "n_hours", "n_nonzero",
        F.round(mean, 6).alias("mean_per_hour"),
        F.round(var, 6).alias("var_per_hour"),
        F.round(var / mean, 6).alias("fano_factor"),
        F.round((sd - mean) / (sd + mean), 6).alias("burstiness_b"),
    )


# ---------------------------------------------------------------------------
# Period-over-period growth — WoW deltas on an exact weekly revenue rollup
# ---------------------------------------------------------------------------

@query(
    "period_over_period_growth",
    oracle="""
    WITH weekly AS (
      SELECT date_trunc('week', o_orderdate) AS wk,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DECIMAL(30,2)) AS rev,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM orders GROUP BY 1
    ),
    lagged AS (
      SELECT wk, rev, n_orders,
             LAG(rev) OVER (ORDER BY wk) AS prev_rev,
             CAST(SUM(rev) OVER (ORDER BY wk ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                  AS DECIMAL(30,2)) AS rev_4wk,
             CAST(COUNT(*) OVER (ORDER BY wk ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_4wk
      FROM weekly
    )
    SELECT CAST(wk AS DATE) AS week_start,
           CAST(rev AS DOUBLE) AS revenue,
           n_orders,
           ROUND((CAST(rev AS DOUBLE) - CAST(prev_rev AS DOUBLE))
                 / CAST(prev_rev AS DOUBLE) * 100.0, 4) AS wow_growth_pct,
           CAST(CAST(rev_4wk * 100 AS BIGINT) // n_4wk AS DOUBLE) / 100.0
             AS rolling_4wk_avg
    FROM lagged
    """,
)
def period_over_period_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WEEK-OVER-WEEK GROWTH — the most-asked dashboard question,
    done hash-gate-exact: weekly revenue accumulates in DECIMAL(30,2)
    (order-free exact sums; raw double SUM would flake under
    repartition), the WoW delta and the trailing 4-week mean are LAG
    / ROWS-frame windows over the ~13-row weekly rollup (tiny,
    bounded by calendar — single partition is fine THERE, never on
    the fact table), and doubles appear only in the final ratio.
    NULL growth on the first week is the honest answer, not 0; the
    trailing average floors to exact CENTS (integer division) because
    a 2-dp ROUND of a quotient of exact cents lands on true .5 ties
    where HALF_UP and HALF_EVEN engines disagree.
    Output: one row per week — revenue, order count, WoW %, trailing
    average."""
    o = _t(spark, sf_dir, "orders")
    from pyspark.sql.window import Window

    weekly = o.groupBy(F.date_trunc("week", "o_orderdate").alias("wk")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(30,2)"))
        .cast("decimal(30,2)").alias("rev"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
    )
    w = Window.orderBy("wk")
    w4 = w.rowsBetween(-3, 0)
    lagged = weekly.select(
        "wk", "rev", "n_orders",
        F.lag("rev").over(w).alias("prev_rev"),
        F.sum("rev").over(w4).cast("decimal(30,2)").alias("rev_4wk"),
        F.count(F.lit(1)).over(w4).cast("bigint").alias("n_4wk"),
    )
    return lagged.select(
        F.col("wk").cast("date").alias("week_start"),
        F.col("rev").cast("double").alias("revenue"),
        "n_orders",
        F.round(
            (F.col("rev").cast("double") - F.col("prev_rev").cast("double"))
            / F.col("prev_rev").cast("double") * 100.0, 4
        ).alias("wow_growth_pct"),
        (
            F.expr("(CAST(rev_4wk * 100 AS BIGINT) div n_4wk)").cast("double") / 100.0
        ).alias("rolling_4wk_avg"),
    )


# ---------------------------------------------------------------------------
# Mann-Kendall trend test + Theil-Sen robust slope on the daily series
# ---------------------------------------------------------------------------

@query(
    "mann_kendall_theil_sen",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
             CAST(COUNT(*) OVER () AS BIGINT) AS n
      FROM daily
    ),
    pairs AS (
      SELECT a.i AS i, b.i AS j, a.y AS yi, b.y AS yj, a.n,
             CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn,
             CAST(b.y - a.y AS DOUBLE) / (b.i - a.i) AS slope
      FROM idx a JOIN idx b ON b.i > a.i
    ),
    s_stat AS (
      SELECT CAST(SUM(sgn) AS BIGINT) AS s, MAX(n) AS n,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pairs
    ),
    ties AS (
      SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tie_term
      FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY y HAVING COUNT(*) > 1)
    ),
    ranked AS (
      SELECT slope, ROW_NUMBER() OVER (ORDER BY slope, i, j) AS rn,
             COUNT(*) OVER () AS np
      FROM pairs
    ),
    med AS (
      SELECT CAST(SUM(CAST(ROUND(slope, 9) AS DECIMAL(20,9))) AS DOUBLE)
               / COUNT(*) AS theil_sen_slope
      FROM ranked WHERE rn IN ((np + 1) // 2, (np + 2) // 2)
    )
    SELECT s.n AS n_days, s.n_pairs, s.s AS mk_s,
           ROUND((s.n * (s.n - 1) * (2 * s.n + 5) - t.tie_term) / 18.0, 4) AS var_s,
           ROUND(CASE WHEN s.s > 0 THEN (s.s - 1)
                      WHEN s.s < 0 THEN (s.s + 1)
                      ELSE 0 END
                 / SQRT((s.n * (s.n - 1) * (2 * s.n + 5) - t.tie_term) / 18.0), 6)
             AS mk_z,
           ROUND(m.theil_sen_slope, 6) AS theil_sen_slope
    FROM s_stat s CROSS JOIN ties t CROSS JOIN med m
    """,
)
def mann_kendall_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANN-KENDALL trend test + THEIL-SEN slope on the daily event
    count series — the nonparametric pair that replaces OLS
    (`group_trend_ols`) when outliers or non-normality would wreck a
    least-squares fit: S = Σ sign(y_j - y_i) over all day pairs (pure
    integer, tie-corrected variance, continuity-corrected Z) and the
    robust slope = MEDIAN of all pairwise slopes — a single wild day
    moves OLS arbitrarily but shifts one of 435 slopes. The pair
    self-join is over the ~30-row DAILY ROLLUP (435 pairs), never the
    fact table — the O(n²) lives in calendar space, bounded at any
    corpus scale. Slopes are ratios of exact int64s (identical
    doubles both engines); the median is positional (row_number
    selection, decimal-grid average of the two middles). Output: one
    row — n, S, Var(S), Z, slope/day."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    ).cache()
    idx = daily.select(
        "y",
        F.row_number().over(Window.orderBy("day")).cast("bigint").alias("i"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).cast("bigint").alias("n"),
    )
    b = idx.select(
        F.col("i").alias("j"), F.col("y").alias("yj"), F.col("n").alias("_n2")
    )
    pairs = idx.join(b, F.col("j") > F.col("i")).select(
        "i", "j", "n",
        F.when(F.col("yj") > F.col("y"), 1)
        .when(F.col("yj") < F.col("y"), -1).otherwise(0).alias("sgn"),
        ((F.col("yj") - F.col("y")).cast("double") / (F.col("j") - F.col("i"))).alias("slope"),
    ).cache()
    s_stat = pairs.agg(
        F.sum("sgn").cast("bigint").alias("s"),
        F.max("n").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    ties = (
        daily.groupBy("y").agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            ).cast("bigint").alias("tie_term")
        )
    )
    ranked = pairs.select(
        "slope",
        F.row_number().over(Window.orderBy("slope", "i", "j")).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        ).alias("np"),
    )
    med = ranked.filter(
        (F.col("rn") == F.floor((F.col("np") + 1) / 2))
        | (F.col("rn") == F.floor((F.col("np") + 2) / 2))
    ).agg(
        (
            F.sum(F.round("slope", 9).cast("decimal(20,9)")).cast("double")
            / F.count(F.lit(1))
        ).alias("theil_sen_slope")
    )
    j = s_stat.crossJoin(F.broadcast(ties)).crossJoin(F.broadcast(med))
    var_s = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    ) / 18.0
    z_num = (
        F.when(F.col("s") > 0, F.col("s") - 1)
        .when(F.col("s") < 0, F.col("s") + 1)
        .otherwise(0)
    )
    return j.select(
        F.col("n").alias("n_days"), "n_pairs", F.col("s").alias("mk_s"),
        F.round(var_s, 4).alias("var_s"),
        F.round(z_num / F.sqrt(var_s), 6).alias("mk_z"),
        F.round("theil_sen_slope", 6).alias("theil_sen_slope"),
    )


# ---------------------------------------------------------------------------
# Blocked Kendall's tau-b — concordance between price and balance
# ---------------------------------------------------------------------------

@query(
    "kendall_tau_blocked",
    oracle="""
    WITH j AS (
      SELECT c.c_mktsegment AS seg, date_trunc('month', o.o_orderdate) AS mo,
             o.o_orderkey AS k, o.o_totalprice AS x, c.c_acctbal AS y
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ),
    pairs AS (
      SELECT a.seg,
             CASE WHEN (a.x < b.x AND a.y < b.y) OR (a.x > b.x AND a.y > b.y)
                  THEN 1 ELSE 0 END AS conc,
             CASE WHEN (a.x < b.x AND a.y > b.y) OR (a.x > b.x AND a.y < b.y)
                  THEN 1 ELSE 0 END AS disc,
             CASE WHEN a.x = b.x AND a.y <> b.y THEN 1 ELSE 0 END AS tx,
             CASE WHEN a.y = b.y AND a.x <> b.x THEN 1 ELSE 0 END AS ty
      FROM j a JOIN j b ON a.seg = b.seg AND a.mo = b.mo AND a.k < b.k
    ),
    agg AS (
      SELECT seg,
             CAST(SUM(conc) AS BIGINT) AS c,
             CAST(SUM(disc) AS BIGINT) AS d,
             CAST(SUM(tx) AS BIGINT) AS tx,
             CAST(SUM(ty) AS BIGINT) AS ty,
             CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM pairs GROUP BY seg
    )
    SELECT seg, c AS concordant, d AS discordant, n_pairs,
           ROUND((c - d) / SQRT(CAST(c + d + tx AS DOUBLE) * (c + d + ty)), 6)
             AS kendall_tau_b
    FROM agg
    """,
)
def kendall_tau_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL'S TAU-B between order price and customer balance,
    BLOCKED by (segment, order month) — concordance counting is
    inherently O(n²), so the scale move is the same one
    `record_linkage_fellegi_sunter` makes: restrict pairs to blocks
    (month x segment keeps blocks a few hundred rows) and aggregate
    the concordant/discordant/tie counts across blocks per segment —
    the blocked estimator statisticians call 'pooled tau'. Everything
    until the final ratio is INTEGER counting (C, D, tie corrections
    tx/ty), so the result is exact under any partitioning; the block
    self-join is an equi-join on (seg, month), a plain shuffle-hash
    join whose cost is Σ block², not (Σ block)². Complements
    `spearman_rank_correlation` (rank-linear) with the
    pair-concordance view of the same monotone question."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    # Explicit block-key repartition at the session's shuffle width
    # (round 15, guide §2.5 — compute-heavy stage starved by bytes-based
    # coalescing): the (seg, mo) pair join's input is only ~3.5 MB of
    # shuffle, so AQE's parallelism-first coalescer folded the
    # pair-EXPLOSION stage (Σ block² comparisons ≈ 27M pairs at sf0.1,
    # 4.2 s of CPU) onto 3 tasks. The join needs this exact
    # hashpartitioning anyway (the explicit repartition replaces the
    # planner's ENSURE_REQUIREMENTS exchange, it does not add one), and
    # a user-specified partition count is exempt from AQE coalescing, so
    # the quadratic work stays spread across the cluster width. A/B:
    # tools/r15/ab_kendall_width.py.
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    j = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"]).select(
        F.col("c_mktsegment").alias("seg"),
        F.date_trunc("month", "o_orderdate").alias("mo"),
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("x"),
        F.col("c_acctbal").alias("y"),
    ).repartition(n_part, "seg", "mo")
    b = j.select(
        F.col("seg").alias("seg2"), F.col("mo").alias("mo2"),
        F.col("k").alias("k2"), F.col("x").alias("x2"), F.col("y").alias("y2"),
    )
    pairs = j.join(
        b,
        (F.col("seg") == F.col("seg2"))
        & (F.col("mo") == F.col("mo2"))
        & (F.col("k") < F.col("k2")),
    ).select(
        "seg",
        F.when(
            ((F.col("x") < F.col("x2")) & (F.col("y") < F.col("y2")))
            | ((F.col("x") > F.col("x2")) & (F.col("y") > F.col("y2"))), 1
        ).otherwise(0).alias("conc"),
        F.when(
            ((F.col("x") < F.col("x2")) & (F.col("y") > F.col("y2")))
            | ((F.col("x") > F.col("x2")) & (F.col("y") < F.col("y2"))), 1
        ).otherwise(0).alias("disc"),
        F.when((F.col("x") == F.col("x2")) & (F.col("y") != F.col("y2")), 1)
        .otherwise(0).alias("tx"),
        F.when((F.col("y") == F.col("y2")) & (F.col("x") != F.col("x2")), 1)
        .otherwise(0).alias("ty"),
    )
    agg = pairs.groupBy("seg").agg(
        F.sum("conc").cast("bigint").alias("c"),
        F.sum("disc").cast("bigint").alias("d"),
        F.sum("tx").cast("bigint").alias("tx"),
        F.sum("ty").cast("bigint").alias("ty"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    tau = (F.col("c") - F.col("d")) / F.sqrt(
        (F.col("c") + F.col("d") + F.col("tx")).cast("double")
        * (F.col("c") + F.col("d") + F.col("ty"))
    )
    return agg.select(
        "seg", F.col("c").alias("concordant"), F.col("d").alias("discordant"),
        "n_pairs", F.round(tau, 6).alias("kendall_tau_b"),
    )


# ---------------------------------------------------------------------------
# Stratified treatment-effect estimation (propensity strata + exact means)
# ---------------------------------------------------------------------------

@query(
    "stratified_treatment_effect",
    oracle="""
    WITH users AS (
      SELECT user_id,
             CAST(MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT)
               AS treated,
             CAST(SUM(CASE WHEN event_type = 'purchase'
                           THEN CAST(value AS DECIMAL(30,2)) END) AS DECIMAL(30,2))
               AS y,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id
    ),
    strata AS (
      SELECT treated, COALESCE(y, CAST(0 AS DECIMAL(30,2))) AS y,
             NTILE(3) OVER (ORDER BY n_events, user_id) AS stratum
      FROM users
    ),
    per AS (
      SELECT stratum,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(treated) AS BIGINT) AS n_treated,
             CAST(SUM(CASE WHEN treated = 1 THEN y END) AS DECIMAL(30,2)) AS sy_t,
             CAST(SUM(CASE WHEN treated = 0 THEN y END) AS DECIMAL(30,2)) AS sy_c
      FROM strata GROUP BY stratum
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_all FROM per)
    SELECT p.stratum, p.n, p.n_treated,
           ROUND(CAST(p.n_treated AS DOUBLE) / p.n, 6) AS propensity,
           ROUND(CAST(p.sy_t AS DOUBLE) / p.n_treated, 6) AS mean_y_treated,
           ROUND(CAST(p.sy_c AS DOUBLE) / (p.n - p.n_treated), 6) AS mean_y_control,
           ROUND((CAST(p.sy_t AS DOUBLE) / p.n_treated
                  - CAST(p.sy_c AS DOUBLE) / (p.n - p.n_treated))
                 * p.n / t.n_all, 6) AS ate_contribution
    FROM per p CROSS JOIN tot t
    """,
)
def stratified_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED TREATMENT-EFFECT estimation — the observational-
    causal workhorse when randomization isn't available (the
    `segment_uplift_report` assumes an experiment; this does NOT):
    treatment = user ever signed up, outcome = purchase revenue,
    and the comparison is blocked into ACTIVITY TERTILES (ntile over
    per-user event count — scale-free, unlike absolute thresholds)
    because activity confounds both — within a stratum
    the treated/control comparison is apples-to-apples, and the ATE
    is the n_s/N-weighted sum of within-stratum differences
    (standardization / g-formula on one covariate). Per-stratum
    propensity n_T/n is exactly what a propensity model would fit on
    this covariate — reported so overlap can be audited (no stratum
    with p∈{0,1} may contribute). Outcome sums ride DECIMAL(30,2)
    (value has 2 dp — exact), counts are int64, doubles only in the
    final ratios. One groupBy(user) + one groupBy(stratum): two
    shuffles of (key, decimal) pairs at any scale. Output: per-
    stratum n, propensity, treated/control means, ATE contribution
    (sum them = the estimate)."""
    ev = _t(spark, sf_dir, "events")
    users = ev.groupBy("user_id").agg(
        F.max(F.when(F.col("event_type") == "signup", 1).otherwise(0))
        .cast("bigint").alias("treated"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.col("value").cast("decimal(30,2)"),
            )
        ).cast("decimal(30,2)").alias("y"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    from pyspark.sql.window import Window

    strata = users.select(
        "treated",
        F.coalesce(F.col("y"), F.lit(0).cast("decimal(30,2)")).alias("y"),
        F.ntile(3).over(Window.orderBy("n_events", "user_id")).alias("stratum"),
    )
    per = strata.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("treated").cast("bigint").alias("n_treated"),
        F.sum(F.when(F.col("treated") == 1, F.col("y"))).cast("decimal(30,2)").alias("sy_t"),
        F.sum(F.when(F.col("treated") == 0, F.col("y"))).cast("decimal(30,2)").alias("sy_c"),
    )
    tot = per.agg(F.sum("n").cast("bigint").alias("n_all"))
    j = per.crossJoin(F.broadcast(tot))
    mt = F.col("sy_t").cast("double") / F.col("n_treated")
    mc = F.col("sy_c").cast("double") / (F.col("n") - F.col("n_treated"))
    return j.select(
        "stratum", "n", "n_treated",
        F.round(F.col("n_treated").cast("double") / F.col("n"), 6).alias("propensity"),
        F.round(mt, 6).alias("mean_y_treated"),
        F.round(mc, 6).alias("mean_y_control"),
        F.round((mt - mc) * F.col("n") / F.col("n_all"), 6).alias("ate_contribution"),
    )


# ---------------------------------------------------------------------------
# Quantile normalization across event-type daily series
# ---------------------------------------------------------------------------

@query(
    "quantile_normalization",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    ranked AS (
      SELECT event_type, day, c,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c, day) AS rnk
      FROM daily
    ),
    ref AS (
      SELECT rnk,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS k
      FROM ranked GROUP BY rnk
    )
    SELECT r.event_type, r.day, r.c AS raw_count,
           ROUND(CAST(f.s AS DOUBLE) / f.k, 6) AS normalized
    FROM ranked r JOIN ref f ON f.rnk = r.rnk
    """,
)
def quantile_normalization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE NORMALIZATION (the microarray/RNA-seq classic, equally
    at home normalizing per-tenant load curves): force every event
    type's daily-count distribution onto a COMMON reference
    distribution by replacing each value with the cross-type MEAN of
    the values at its rank — after this, all five series have
    identical marginals and only the day-to-rank mapping (the
    'shape') differs. Ranks are per-type windows over the ~30-row
    daily rollup (partitioned — bounded by calendar); the reference
    distribution is one rank-keyed aggregate of exact int64 counts;
    the map-back is a broadcast join on rank. Deterministic ties:
    (count, day) ordering pins the permutation. Output: every
    (type, day) with its raw and normalized count."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    ranked = daily.select(
        "event_type", "day", "c",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy("c", "day")
        ).alias("rnk"),
    ).cache()
    ref = ranked.groupBy("rnk").agg(
        F.sum("c").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    return (
        ranked.join(F.broadcast(ref), "rnk")
        .select(
            "event_type", "day",
            F.col("c").alias("raw_count"),
            F.round(F.col("s").cast("double") / F.col("k"), 6).alias("normalized"),
        )
    )


# ---------------------------------------------------------------------------
# Degree assortativity of the co-purchase graph (integer sufficient stats)
# ---------------------------------------------------------------------------

_COPURCHASE_EDGES_SQL = """
    sup AS (
      SELECT l_partkey FROM lineitem
      GROUP BY l_partkey HAVING COUNT(DISTINCT l_orderkey) >= 8
    ),
    items AS (
      SELECT DISTINCT l.l_orderkey, l.l_partkey
      FROM lineitem l JOIN sup USING (l_partkey)
    ),
    edges AS (
      SELECT a.l_partkey AS u, b.l_partkey AS v
      FROM items a JOIN items b ON a.l_orderkey = b.l_orderkey
      WHERE a.l_partkey < b.l_partkey
      GROUP BY u, v HAVING COUNT(*) >= 2
    ),
    both_ AS (SELECT u AS s, v AS t FROM edges
              UNION ALL SELECT v AS s, u AS t FROM edges),
    deg AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS d FROM both_ GROUP BY s)
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str):
    """The `pagerank_copurchase` graph (support>=8, co-count>=2) as
    (edges u<v, directed both_, integer deg) DataFrames. Edges come from
    the session-wide materialized artifact (operators/graph.py:
    copurchase_edges) — built once per (session, testdata), a parquet
    scan on every later call; each caller's oracle still re-derives the
    graph from lineitem, keeping the artifact independently gated."""
    edges = graph_ops.copurchase_edges(spark, sf_dir)
    both = edges.select(F.col("u").alias("s"), F.col("v").alias("t")).unionAll(
        edges.select(F.col("v").alias("s"), F.col("u").alias("t"))
    )
    deg = both.groupBy("s").agg(F.count(F.lit(1)).cast("bigint").alias("d"))
    return edges, both, deg


@query(
    "degree_assortativity",
    oracle=f"""
    WITH {_COPURCHASE_EDGES_SQL},
    xy AS (
      SELECT du.d AS x, dv.d AS y
      FROM both_ e JOIN deg du ON du.s = e.s JOIN deg dv ON dv.s = e.t
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM xy
    )
    SELECT m AS n_directed_edges,
           ROUND(CAST(sx AS DOUBLE) / m, 6) AS mean_neighbor_degree,
           ROUND((CAST(m AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / SQRT((CAST(m AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                        * (CAST(m AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)), 6)
             AS assortativity_r
    FROM s
    """,
)
def degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DEGREE ASSORTATIVITY (Newman's r) of the co-purchase graph —
    the Pearson correlation of endpoint degrees over every directed
    edge: r>0 means hubs link to hubs (social-network-like), r<0
    means hubs link to leaves (the disassortative signature of
    purchase and biological graphs) — it predicts how the graph
    shatters under hub removal and whether degree-targeted sampling
    biases reach. Uses the `pagerank_copurchase` edge set; the whole
    statistic is FIVE INT64 SUFFICIENT SUMS (Σx, Σy, Σxy, Σx², Σy²
    over edge-endpoint degrees), partial-aggregable in one pass over
    the degree-joined edge list — exact under any partitioning,
    doubles only in the closing Pearson ratio. Joins are edge⋈degree
    equi-joins (degree table is node-sized, broadcastable)."""
    edges, both, deg = _copurchase_edges(spark, sf_dir)
    xy = (
        both.join(F.broadcast(deg.select(F.col("s"), F.col("d").alias("x"))), "s")
        .join(
            F.broadcast(
                deg.select(F.col("s").alias("t"), F.col("d").alias("y"))
            ), "t",
        )
        .select("x", "y")
    )
    s = xy.agg(
        F.count(F.lit(1)).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    md = F.col("m").cast("double")
    num = md * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    den = F.sqrt(
        (md * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (md * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return s.select(
        F.col("m").alias("n_directed_edges"),
        F.round(F.col("sx").cast("double") / F.col("m"), 6).alias("mean_neighbor_degree"),
        F.round(num / den, 6).alias("assortativity_r"),
    )


# ---------------------------------------------------------------------------
# Modularity of the brand partition on the co-purchase graph
# ---------------------------------------------------------------------------

@query(
    "modularity_by_brand",
    oracle=f"""
    WITH {_COPURCHASE_EDGES_SQL},
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m_edges FROM edges),
    comm AS (SELECT p_partkey, p_brand FROM part),
    within AS (
      SELECT cu.p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS m_c
      FROM edges e
      JOIN comm cu ON cu.p_partkey = e.u
      JOIN comm cv ON cv.p_partkey = e.v
      WHERE cu.p_brand = cv.p_brand
      GROUP BY cu.p_brand
    ),
    degsum AS (
      SELECT c.p_brand AS brand, CAST(SUM(d.d) AS BIGINT) AS d_c
      FROM deg d JOIN comm c ON c.p_partkey = d.s
      GROUP BY c.p_brand
    )
    SELECT ds.brand,
           COALESCE(w.m_c, 0) AS edges_within,
           ds.d_c AS degree_sum,
           ROUND(CAST(COALESCE(w.m_c, 0) AS DOUBLE) / mm.m_edges
                 - (CAST(ds.d_c AS DOUBLE) / (2 * mm.m_edges))
                   * (CAST(ds.d_c AS DOUBLE) / (2 * mm.m_edges)), 6)
             AS q_contribution
    FROM degsum ds
    LEFT JOIN within w ON w.brand = ds.brand
    CROSS JOIN m mm
    """,
)
def modularity_by_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEWMAN MODULARITY Q of the BRAND partition on the co-purchase
    graph — 'do parts of the same brand co-sell more than a random
    graph with these degrees predicts?': Q = Σ_c [m_c/M -
    (D_c/2M)²], each community's within-edge share minus its
    degree-expected share. This is the quantity community detection
    (`label_propagation_communities`) MAXIMIZES — evaluating it on a
    metadata partition instead tells you whether the attribute
    explains the graph (Q≈0 here is a finding: brand doesn't drive
    co-purchase). All inputs are integer counts (within-community
    edges via two broadcast hash joins to the part dimension, degree
    sums per community); one ratio at the end. Output: per-brand
    within-edges, degree sum, and Q contribution (sum = Q)."""
    edges, both, deg = _copurchase_edges(spark, sf_dir)
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    m = edges.agg(F.count(F.lit(1)).cast("bigint").alias("m_edges"))
    within = (
        edges.join(F.broadcast(p.select(F.col("p_partkey").alias("u"),
                                        F.col("p_brand").alias("bu"))), "u")
        .join(F.broadcast(p.select(F.col("p_partkey").alias("v"),
                                   F.col("p_brand").alias("bv"))), "v")
        .filter(F.col("bu") == F.col("bv"))
        .groupBy(F.col("bu").alias("brand"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("m_c"))
    )
    degsum = (
        deg.join(F.broadcast(p.select(F.col("p_partkey").alias("s"), "p_brand")), "s")
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(F.sum("d").cast("bigint").alias("d_c"))
    )
    j = (
        degsum.join(within, "brand", "left")
        .crossJoin(F.broadcast(m))
    )
    share = F.coalesce(F.col("m_c"), F.lit(0)).cast("double") / F.col("m_edges")
    expect = (F.col("d_c").cast("double") / (2 * F.col("m_edges")))
    return j.select(
        "brand",
        F.coalesce(F.col("m_c"), F.lit(0)).alias("edges_within"),
        F.col("d_c").alias("degree_sum"),
        F.round(share - expect * expect, 6).alias("q_contribution"),
    )


# ---------------------------------------------------------------------------
# Autocorrelation function (lags 1..7) with exact integer sufficient stats
# ---------------------------------------------------------------------------

@query(
    "autocorrelation_function",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    g AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s,
             CAST(SUM(y * y) AS BIGINT) AS ss
      FROM daily
    ),
    lagged AS (
      SELECT y,
             LAG(y, 1) OVER w AS l1, LAG(y, 2) OVER w AS l2,
             LAG(y, 3) OVER w AS l3, LAG(y, 4) OVER w AS l4,
             LAG(y, 5) OVER w AS l5, LAG(y, 6) OVER w AS l6,
             LAG(y, 7) OVER w AS l7
      FROM daily WINDOW w AS (ORDER BY day)
    ),
    pairs AS (
      SELECT k.k, l.y AS yt,
             CASE k.k WHEN 1 THEN l1 WHEN 2 THEN l2 WHEN 3 THEN l3
                      WHEN 4 THEN l4 WHEN 5 THEN l5 WHEN 6 THEN l6
                      ELSE l7 END AS ylag
      FROM lagged l CROSS JOIN (SELECT unnest(range(1, 8)) AS k) k
    ),
    perk AS (
      SELECT k,
             CAST(COUNT(ylag) AS BIGINT) AS n_pairs,
             CAST(SUM(yt * ylag) AS BIGINT) AS sxy,
             CAST(SUM(CASE WHEN ylag IS NOT NULL THEN yt END) AS BIGINT) AS sa,
             CAST(SUM(CASE WHEN ylag IS NOT NULL THEN ylag END) AS BIGINT) AS sb
      FROM pairs GROUP BY k
    )
    SELECT CAST(p.k AS BIGINT) AS lag_k, p.n_pairs,
           ROUND((CAST(g.n AS DOUBLE) * g.n * p.sxy
                  - CAST(g.n AS DOUBLE) * g.s * (p.sa + p.sb)
                  + CAST(p.n_pairs AS DOUBLE) * g.s * g.s)
                 / (CAST(g.n AS DOUBLE) * (CAST(g.n AS DOUBLE) * g.ss
                                           - CAST(g.s AS DOUBLE) * g.s)), 6)
             AS acf
    FROM perk p CROSS JOIN g
    """,
)
def autocorrelation_function(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE AUTOCORRELATION of the daily event counts at lags 1-7 —
    the diagnostic that decides whether yesterday predicts today
    (AR structure) and exposes weekly seasonality as a spike at lag
    7 (the model-selection input `weekday_seasonality_decomposition`
    acts on). The textbook Σ(y_t-ȳ)(y_{t-k}-ȳ)/Σ(y-ȳ)² is rewritten
    with the global mean MULTIPLIED OUT: n²Σy_t·y_{t-k} -
    nS(A_k+B_k) + (n-k)S² over n(nΣy²-S²) — every term an EXACT
    INT64 sufficient statistic (lag products, partial sums per lag),
    so partial aggregation is exact and the only double is the final
    ratio. The 7 lags come from one window pass over the ~30-row
    daily rollup unpivoted to (k, y_t, y_{t-k}) pairs. Output: lag,
    pair count, ACF — read lag-7 vs lag-1 for weekly memory."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    ).cache()
    g = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("ss"),
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        "y", *[F.lag("y", k).over(w).alias(f"l{k}") for k in range(1, 8)]
    )
    pairs = lagged.select(
        F.expr(
            "stack(7, "
            + ", ".join(f"{k}, l{k}" for k in range(1, 8))
            + ") as (k, ylag)"
        ),
        F.col("y").alias("yt"),
    )
    perk = pairs.groupBy("k").agg(
        F.count("ylag").cast("bigint").alias("n_pairs"),
        F.sum(F.col("yt") * F.col("ylag")).cast("bigint").alias("sxy"),
        F.sum(F.when(F.col("ylag").isNotNull(), F.col("yt"))).cast("bigint").alias("sa"),
        F.sum(F.when(F.col("ylag").isNotNull(), F.col("ylag"))).cast("bigint").alias("sb"),
    )
    j = perk.crossJoin(F.broadcast(g))
    nd = F.col("n").cast("double")
    num = (
        nd * F.col("n") * F.col("sxy")
        - nd * F.col("s") * (F.col("sa") + F.col("sb"))
        + F.col("n_pairs").cast("double") * F.col("s") * F.col("s")
    )
    den = nd * (nd * F.col("ss") - F.col("s").cast("double") * F.col("s"))
    return j.select(
        F.col("k").cast("bigint").alias("lag_k"), "n_pairs",
        F.round(num / den, 6).alias("acf"),
    )


# ---------------------------------------------------------------------------
# Nelson-Aalen cumulative hazard for time-to-first-purchase
# ---------------------------------------------------------------------------

@query(
    "nelson_aalen_hazard",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             CAST(MIN(ts) AS DATE) AS first_day,
             CAST(MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS DATE)
               AS purch_day
      FROM events GROUP BY user_id
    ),
    horizon AS (SELECT MAX(CAST(ts AS DATE)) AS last_day FROM events),
    dur AS (
      SELECT CASE WHEN p.purch_day IS NOT NULL
                  THEN date_diff('day', p.first_day, p.purch_day)
                  ELSE date_diff('day', p.first_day, h.last_day) END AS t,
             (p.purch_day IS NOT NULL) AS observed
      FROM per_user p CROSS JOIN horizon h
    ),
    n_total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM dur),
    evt AS (
      SELECT t,
             CAST(SUM(CASE WHEN observed THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM dur GROUP BY t
    ),
    risk AS (
      SELECT t, d,
             nt.n - COALESCE(SUM(leaving) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS n_risk
      FROM evt CROSS JOIN n_total nt
    ),
    haz AS (
      SELECT t, d, CAST(n_risk AS BIGINT) AS n_risk,
             CAST(ROUND(CAST(d AS DOUBLE) / n_risk, 12) AS DECIMAL(28,12)) AS h_inc
      FROM risk WHERE d > 0
    )
    SELECT CAST(t AS BIGINT) AS day_t, d AS n_events, n_risk,
           ROUND(CAST(h_inc AS DOUBLE), 6) AS hazard_increment,
           ROUND(CAST(SUM(h_inc) OVER (ORDER BY t) AS DOUBLE), 6)
             AS cumulative_hazard
    FROM haz
    """,
)
def nelson_aalen_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NELSON-AALEN cumulative hazard for time-to-first-purchase —
    the estimator survival analysis reaches for when the HAZARD (the
    instantaneous conversion rate among those still at risk) is the
    object of interest rather than `kaplan_meier_survival`'s survival
    curve: H(t) = Σ_{t_i≤t} d_i/n_i, with users who never purchase
    CENSORED at the observation horizon (dropping them would bias
    conversion optimistically — the classic funnel-analytics error).
    Risk sets come from one cumulative window over the day-indexed
    event table (integer counts); each increment d/n is a ratio of
    exact int64s snapped to the DECIMAL 12-dp grid so the running
    H(t) is an exact, order-free decimal sum. Duration table is
    user-sized, the ladder is ~30 rows. Output: each event day with
    d, n-at-risk, increment, and H(t)."""
    ev = _t(spark, sf_dir, "events")
    from pyspark.sql.window import Window

    per_user = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("first_day"),
        F.min(
            F.when(F.col("event_type") == "purchase", F.to_date("ts"))
        ).alias("purch_day"),
    )
    horizon = ev.agg(F.max(F.to_date("ts")).alias("last_day"))
    dur = per_user.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("purch_day").isNotNull(),
            F.datediff("purch_day", "first_day"),
        ).otherwise(F.datediff("last_day", "first_day")).alias("t"),
        F.col("purch_day").isNotNull().alias("observed"),
    )
    n_total = dur.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    evt = dur.groupBy("t").agg(
        F.sum(F.when(F.col("observed"), 1).otherwise(0)).cast("bigint").alias("d"),
        F.count(F.lit(1)).cast("bigint").alias("leaving"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = evt.crossJoin(F.broadcast(n_total)).select(
        "t", "d",
        (F.col("n") - F.coalesce(F.sum("leaving").over(w), F.lit(0))).alias("n_risk"),
    )
    haz = risk.filter(F.col("d") > 0).select(
        "t", "d", F.col("n_risk").cast("bigint").alias("n_risk"),
        F.round(F.col("d").cast("double") / F.col("n_risk"), 12)
        .cast("decimal(28,12)").alias("h_inc"),
    )
    wc = Window.orderBy("t")
    return haz.select(
        F.col("t").cast("bigint").alias("day_t"),
        F.col("d").alias("n_events"), "n_risk",
        F.round(F.col("h_inc").cast("double"), 6).alias("hazard_increment"),
        F.round(F.sum("h_inc").over(wc).cast("double"), 6).alias("cumulative_hazard"),
    )


# ---------------------------------------------------------------------------
# Gini coefficient of customer revenue per segment (exact integer cents)
# ---------------------------------------------------------------------------

@query(
    "gini_coefficient_revenue",
    oracle="""
    WITH rev AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey AS cust,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS cents
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
      GROUP BY 1, 2
    ),
    ranked AS (
      SELECT seg, cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents, cust)
                  AS BIGINT) AS i
      FROM rev
    ),
    agg AS (
      SELECT seg,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS total,
             CAST(SUM(i * cents) AS DECIMAL(38,0)) AS weighted
      FROM ranked GROUP BY seg
    )
    SELECT seg, n,
           ROUND(CAST(total AS DOUBLE) / 100.0, 2) AS total_revenue,
           ROUND(2.0 * CAST(weighted AS DOUBLE) / (CAST(n AS DOUBLE) * total)
                 - (CAST(n AS DOUBLE) + 1.0) / n, 6) AS gini
    FROM agg
    """,
)
def gini_coefficient_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GINI COEFFICIENT of per-customer revenue within each market
    segment — the inequality number behind `user_activity_pareto`'s
    top-share view, computed by the exact rank formula G = 2Σi·xᵢ/
    (nΣx) - (n+1)/n on ASCENDING-sorted revenues: 0 = everyone
    spends alike, →1 = one whale funds the segment; the single
    number a marketplace tracks to see concentration risk drift.
    Revenue rides EXACT INTEGER CENTS end to end (the weighted sum
    Σi·xᵢ grows past int64 at scale, so it accumulates in
    DECIMAL(38,0) — still exact, still order-free); ranks are
    PER-SEGMENT windows (partitioned — the fact table never sees a
    global sort); doubles appear in the two final ratios only.
    Ties broken by custkey for a pinned permutation."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    from pyspark.sql.window import Window

    rev = (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy(
            F.col("c_mktsegment").alias("seg"), F.col("o_custkey").alias("cust")
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint"))
            .cast("bigint").alias("cents")
        )
    )
    ranked = rev.select(
        "seg", "cents",
        F.row_number().over(
            Window.partitionBy("seg").orderBy("cents", "cust")
        ).cast("bigint").alias("i"),
    )
    agg = ranked.groupBy("seg").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("total"),
        F.sum((F.col("i") * F.col("cents")).cast("decimal(38,0)"))
        .cast("decimal(38,0)").alias("weighted"),
    )
    nd = F.col("n").cast("double")
    return agg.select(
        "seg", "n",
        F.round(F.col("total").cast("double") / 100.0, 2).alias("total_revenue"),
        F.round(
            2.0 * F.col("weighted").cast("double") / (nd * F.col("total"))
            - (nd + 1.0) / F.col("n"), 6
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# Higher moments — skewness and kurtosis via decimal-grid power sums
# ---------------------------------------------------------------------------

@query(
    "higher_moments_skew_kurtosis",
    oracle="""
    WITH z AS (
      SELECT o_orderpriority AS grp, o_totalprice * 0.001 AS z
      FROM orders
    ),
    pows AS (
      SELECT grp, z,
             z * z AS z2,
             (z * z) * z AS z3,
             ((z * z) * z) * z AS z4
      FROM z
    ),
    s AS (
      SELECT grp,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(z, 9) AS DECIMAL(20,9))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(ROUND(z2, 9) AS DECIMAL(20,9))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(ROUND(z3, 9) AS DECIMAL(20,9))) AS DOUBLE) AS s3,
             CAST(SUM(CAST(ROUND(z4, 9) AS DECIMAL(20,9))) AS DOUBLE) AS s4
      FROM pows GROUP BY grp
    ),
    mom AS (
      SELECT grp, n,
             s1 / n AS mu,
             s2 / n - (s1 / n) * (s1 / n) AS m2,
             s3 / n - 3.0 * (s1 / n) * (s2 / n)
                    + 2.0 * (s1 / n) * (s1 / n) * (s1 / n) AS m3,
             s4 / n - 4.0 * (s1 / n) * (s3 / n)
                    + 6.0 * (s1 / n) * (s1 / n) * (s2 / n)
                    - 3.0 * (s1 / n) * (s1 / n) * (s1 / n) * (s1 / n) AS m4
      FROM s
    )
    SELECT grp, n,
           ROUND(mu * 1000.0, 4) AS mean_price,
           ROUND(SQRT(m2) * 1000.0, 4) AS sd_price,
           ROUND(m3 / (SQRT(m2) * SQRT(m2) * SQRT(m2)), 6) AS skewness,
           ROUND(m4 / (m2 * m2) - 3.0, 6) AS excess_kurtosis
    FROM mom
    """,
)
def higher_moments_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKEWNESS AND EXCESS KURTOSIS of order price per priority class
    — the two moments past variance that decide whether mean±sd
    thinking applies at all (right-skew says median != mean for SLA
    math; heavy tails say `winsorized_robust_stats` before any
    z-score). Skew/kurtosis are SCALE-INVARIANT, so prices shrink by
    1000 first — that puts z⁴ in a range where the 1e-9 grid is
    meaningful, then all four power sums ride the `kmeans_one_step`
    DECIMAL recipe (round-to-9dp → exact decimal sums → order-free
    under any partitioning; one partial-agg pass, 4 numbers per
    group). Central moments come from raw sums by the standard
    binomial expansion in FIXED expression order (IEEE-identical
    across engines), including the notorious cancellation — which is
    fine, because both engines cancel identically. Output: per
    priority n, mean, sd (rescaled back), g1, g2."""
    o = _t(spark, sf_dir, "orders")
    z = F.col("o_totalprice") * 0.001
    z2 = z * z
    z3 = z2 * z
    z4 = z3 * z

    def gsum(c, name):
        return F.sum(F.round(c, 9).cast("decimal(20,9)")).cast("double").alias(name)

    s = o.select(F.col("o_orderpriority").alias("grp"),
                 z.alias("z"), z2.alias("z2"), z3.alias("z3"), z4.alias("z4")).groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        gsum(F.col("z"), "s1"), gsum(F.col("z2"), "s2"),
        gsum(F.col("z3"), "s3"), gsum(F.col("z4"), "s4"),
    )
    n = F.col("n")
    mu = F.col("s1") / n
    m2 = F.col("s2") / n - mu * mu
    m3 = F.col("s3") / n - 3.0 * mu * (F.col("s2") / n) + 2.0 * mu * mu * mu
    m4 = (
        F.col("s4") / n
        - 4.0 * mu * (F.col("s3") / n)
        + 6.0 * mu * mu * (F.col("s2") / n)
        - 3.0 * mu * mu * mu * mu
    )
    sd = F.sqrt(m2)
    return s.select(
        "grp", "n",
        F.round(mu * 1000.0, 4).alias("mean_price"),
        F.round(sd * 1000.0, 4).alias("sd_price"),
        F.round(m3 / (sd * sd * sd), 6).alias("skewness"),
        F.round(m4 / (m2 * m2) - 3.0, 6).alias("excess_kurtosis"),
    )
