"""Corpus segment: reference surface — aggregates, projections, joins, windows, text, dedup + ANN baselines, SQL constructs.

Queries 1-50 of the registration order. The monolithic queries.py
was split in round 5 into contiguous registration-order slices; this
file's internal order plus the package __init__'s import sequence
preserve the order that tools/verify_ledger.py audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quantum_rag_data_pipeline_spark.operators import aggregates as agg_ops
from quantum_rag_data_pipeline_spark.operators import dedup as dedup_ops
from quantum_rag_data_pipeline_spark.operators import joins as join_ops
from quantum_rag_data_pipeline_spark.operators import projection as proj_ops
from quantum_rag_data_pipeline_spark.operators import similarity as sim_ops
from quantum_rag_data_pipeline_spark.operators import text as text_ops
from quantum_rag_data_pipeline_spark.operators import windows as win_ops
from quantum_rag_data_pipeline_spark.paths import landing_root
from quantum_rag_data_pipeline_spark.queries._registry import _t, query



# ---------------------------------------------------------------------------
# A1/A2 — configurable metric catalog (reference src/main.py:69-93,101-205)
# ---------------------------------------------------------------------------

@query(
    "a1_metric_catalog",
    oracle="""
    SELECT
      ROUND(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE), 2) / COUNT(l_quantity), 6) AS avg_qty,
      MAX(l_extendedprice) AS max_price,
      ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(30,2))) AS DOUBLE), 2) AS sum_discount,
      ROUND(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE), 2) / COUNT(l_extendedprice), 6) AS avg_price
    FROM lineitem
    """,
)
def a1_metric_catalog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global hash aggregate, no grouping keys — one pass over the fact
    table, partial+final agg; the reference loops per (field, method)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        agg_ops.metric_agg("l_quantity", "average", "avg_qty"),
        agg_ops.metric_agg("l_extendedprice", "max", "max_price"),
        agg_ops.metric_agg("l_discount", "sum", "sum_discount"),
        agg_ops.metric_agg("l_extendedprice", "average", "avg_price"),
    )


@query(
    "a1_empty_agg_zero",
    oracle="""
    SELECT
      COALESCE(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE), 2), 0.0) AS sum_qty,
      COALESCE(ROUND(ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE), 2) / COUNT(l_quantity), 6), 0.0) AS avg_qty,
      COALESCE(MAX(l_quantity), 0.0) AS max_qty
    FROM lineitem WHERE l_quantity < 0
    """,
)
def a1_empty_agg_zero(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 quirk: the reference yields 0.0 (not NULL) when a requested field
    has zero parseable values (src/main.py:90-91)."""
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") < 0)
    out = li.agg(
        agg_ops.metric_agg("l_quantity", "sum", "sum_qty"),
        agg_ops.metric_agg("l_quantity", "average", "avg_qty"),
        agg_ops.metric_agg("l_quantity", "max", "max_qty"),
    )
    return out.select(*[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in out.columns])


# ---------------------------------------------------------------------------
# P2 — permissive cast + bad-cell drop (reference src/main.py:74-79), over
# the JSON props column of events (P11/P13 flattening analog for JSON).
# ---------------------------------------------------------------------------

@query(
    "p2_permissive_json_cast",
    oracle="""
    SELECT event_type,
           COUNT(k_val) AS n_valid,
           ROUND(ROUND(CAST(SUM(CAST(k_val AS DECIMAL(30,2))) AS DOUBLE), 2) / COUNT(k_val), 6) AS avg_k
    FROM (
      SELECT event_type, TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_val
      FROM events
    ) GROUP BY event_type
    """,
)
def p2_permissive_json_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    k = proj_ops.permissive_double(proj_ops.json_field("props", "$.k"))
    return (
        ev.select("event_type", k.alias("k_val"))
        .groupBy("event_type")
        .agg(
            F.count("k_val").alias("n_valid"),
            (F.round(F.round(F.sum(F.col("k_val").cast("decimal(30,2)")).cast("double"), 2) / F.count("k_val"), 6)).alias("avg_k"),
        )
    )


# ---------------------------------------------------------------------------
# W1 — sliding temporal window 2 days / 1 day (reference src/main.py:288-369)
# ---------------------------------------------------------------------------

@query(
    "w1_sliding_window",
    oracle="""
    SELECT ws AS window_start,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE), 2) AS sum_value
    FROM (
      SELECT unnest([date_trunc('day', ts), date_trunc('day', ts) - INTERVAL 1 DAY]) AS ws, value
      FROM events
    ) GROUP BY ws
    """,
)
def w1_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event belongs to exactly two [d, d+2) windows: starts
    trunc(ts) and trunc(ts)-1d — the oracle materializes that expansion."""
    ev = _t(spark, sf_dir, "events")
    out = win_ops.sliding_window_agg(
        ev,
        "ts",
        [
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,2)")).cast("double"), 2).alias("sum_value"),
        ],
        "2 days",
        "1 day",
    )
    return out.select("window_start", "n_events", "sum_value")


# ---------------------------------------------------------------------------
# J2 — equi join + group (reference sentence_builder.py:12-29 ERCOT⋈weather)
# ---------------------------------------------------------------------------

@query(
    "j2_join_agg",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,2))) AS DOUBLE), 2) AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def j2_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double"), 2).alias("total_price"),
        )
    )


@query(
    "star_join_revenue",
    oracle="""
    SELECT r.r_name AS region, n.n_name AS nation,
           COUNT(*) AS n_lineitems,
           ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(3,2)))) AS DOUBLE), 4) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
)
def star_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join: fact⋈fact shuffled on the key, all dimension sides
    broadcast — at 100 TB only lineitem⋈orders shuffles."""
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice", "l_discount")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    rev = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.round(F.sum(rev).cast("double"), 4).alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# J1 — long→wide pivot (reference weather.py:94-97 N-way outer merge)
# ---------------------------------------------------------------------------

@query(
    "j1_pivot",
    oracle="""
    SELECT l_returnflag,
           ROUND(ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(30,2)) END) AS DOUBLE), 2)
             / COUNT(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 6) AS qty_O,
           ROUND(ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(30,2)) END) AS DOUBLE), 2)
             / COUNT(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 6) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def j1_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with EXPLICIT values — avoids the extra distinct() discovery
    job over the fact table at scale."""
    li = _t(spark, sf_dir, "lineitem")
    exact_avg = (F.round(F.round(F.sum(F.col("l_quantity").cast("decimal(30,2)")).cast("double"), 2)
                 / F.count("l_quantity"), 6))
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(exact_avg)
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


# ---------------------------------------------------------------------------
# A3 — horizontal skipna mean (reference weather.py:111), over a pivot of
# events by type per day: the weather city×hour wide-table analog.
# ---------------------------------------------------------------------------

@query(
    "a3_pivot_rowmean",
    oracle="""
    WITH wide AS (
      SELECT date_trunc('day', ts) AS day,
             ROUND(ROUND(CAST(SUM(CASE WHEN event_type='click'    THEN CAST(value AS DECIMAL(30,2)) END) AS DOUBLE), 2)
               / COUNT(CASE WHEN event_type='click'    THEN value END), 6) AS v_click,
             ROUND(ROUND(CAST(SUM(CASE WHEN event_type='purchase' THEN CAST(value AS DECIMAL(30,2)) END) AS DOUBLE), 2)
               / COUNT(CASE WHEN event_type='purchase' THEN value END), 6) AS v_purchase,
             ROUND(ROUND(CAST(SUM(CASE WHEN event_type='signup'   THEN CAST(value AS DECIMAL(30,2)) END) AS DOUBLE), 2)
               / COUNT(CASE WHEN event_type='signup'   THEN value END), 6) AS v_signup
      FROM events GROUP BY 1
    )
    SELECT day, v_click, v_purchase, v_signup,
           CASE WHEN (v_click IS NOT NULL OR v_purchase IS NOT NULL OR v_signup IS NOT NULL)
                THEN (COALESCE(v_click,0)+COALESCE(v_purchase,0)+COALESCE(v_signup,0))
                     / ((v_click IS NOT NULL)::INT + (v_purchase IS NOT NULL)::INT + (v_signup IS NOT NULL)::INT)
           END AS row_mean
    FROM wide
    """,
)
def a3_pivot_rowmean(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    exact_avg = (F.round(F.round(F.sum(F.col("value").cast("decimal(30,2)")).cast("double"), 2) / F.count("value"), 6))
    wide = (
        ev.withColumn("day", F.date_trunc("day", F.col("ts")))
        .groupBy("day")
        .pivot("event_type", ["click", "purchase", "signup"])
        .agg(exact_avg)
        .withColumnsRenamed({"click": "v_click", "purchase": "v_purchase", "signup": "v_signup"})
    )
    return wide.select(
        "day", "v_click", "v_purchase", "v_signup",
        agg_ops.horizontal_skipna_mean(["v_click", "v_purchase", "v_signup"], "row_mean"),
    )


# ---------------------------------------------------------------------------
# A5 — first-per-group (reference meteostat_weather.py:46-50)
# ---------------------------------------------------------------------------

@query(
    "a5_first_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey AS first_orderkey, o_totalprice AS first_totalprice
    FROM (
      SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
      FROM orders
    ) WHERE rn = 1
    """,
)
def a5_first_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    first = agg_ops.first_per_group(
        o, ["o_custkey"], [F.col("o_orderdate").asc(), F.col("o_orderkey").asc()]
    )
    return first.select(
        F.col("o_custkey").alias("c_custkey"),
        F.col("o_orderkey").alias("first_orderkey"),
        F.col("o_totalprice").alias("first_totalprice"),
    )


# ---------------------------------------------------------------------------
# top-k (north-star helper + [absent] ranking ops)
# ---------------------------------------------------------------------------

@query(
    "topk_customers_by_revenue",
    oracle="""
    SELECT c_custkey, c_name,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE), 2) AS revenue
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 10
    """,
)
def topk_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TakeOrderedAndProject: per-partition k-row heaps, only k rows per
    partition cross to the driver-side merge — no global sort at scale."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    rev = (
        o.groupBy("o_custkey")
        .agg(F.round(F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double"), 2).alias("revenue"))
        .join(F.broadcast(c), F.col("o_custkey") == c.c_custkey)
        .select("c_custkey", "c_name", "revenue")
    )
    return win_ops.top_k(rev, [F.col("revenue").desc(), F.col("c_custkey").asc()], 10)


# ---------------------------------------------------------------------------
# [absent] builtins the gate exercises: distinct, rollup, set ops
# ---------------------------------------------------------------------------

@query(
    "distinct_counts",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "rollup_region_nation",
    oracle="""
    SELECT r_name AS region, n_name AS nation, COUNT(*) AS n_customers
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .rollup(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "set_ops_custkeys",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F' AND o_totalprice > 400000
    """,
)
def set_ops_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(F.col("o_custkey").alias("custkey"))
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select(F.col("o_custkey").alias("custkey"))
    big_f = o.filter((F.col("o_orderstatus") == "F") & (F.col("o_totalprice") > 400000)).select(
        F.col("o_custkey").alias("custkey")
    )
    return urgent.intersect(high).subtract(big_f)


# ---------------------------------------------------------------------------
# F1-F10 scalar function surface; P5/P6 unit conversion & rounding
# ---------------------------------------------------------------------------

@query(
    "f_date_functions",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m') AS order_month,
           COUNT(*) AS n_orders,
           MIN(CAST(o_orderdate AS DATE) + INTERVAL 1 DAY) AS min_next_day,
           MAX(CAST(CAST(o_orderdate AS DATE) AS VARCHAR) || 'T00:00:00') AS max_iso
    FROM orders GROUP BY 1
    """,
)
def f_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F8: strptime/strftime, timedelta arithmetic, ISO concat."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("order_month"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.date_add(F.to_date("o_orderdate"), 1)).cast("timestamp").alias("min_next_day"),
            F.max(F.concat(F.to_date("o_orderdate").cast("string"), F.lit("T00:00:00"))).alias("max_iso"),
        )
    )


@query(
    "p5_p6_unit_conversion",
    oracle="""
    SELECT event_type,
           ROUND(ROUND(ROUND(CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE), 2) / COUNT(value), 6), 2) AS avg_c,
           ROUND((ROUND(ROUND(CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE), 2) / COUNT(value), 6)) * 9 / 5 + 32, 2) AS avg_f
    FROM events GROUP BY event_type
    """,
)
def p5_p6_unit_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    avg_c = F.round(F.round(F.sum(F.col("value").cast("decimal(30,2)")).cast("double"), 2) / F.count("value"), 6)
    return ev.groupBy("event_type").agg(
        proj_ops.round_fixed(avg_c, 2).alias("avg_c"),
        proj_ops.round_fixed(proj_ops.celsius_to_fahrenheit(avg_c), 2).alias("avg_f"),
    )


# ---------------------------------------------------------------------------
# U2 — deterministic text serialization ("semantic sentence" analog)
# ---------------------------------------------------------------------------

@query(
    "u2_sentence_serialization",
    oracle="""
    SELECT region,
           'ISO: ' || region
           || ' / Orders: ' || CAST(n_orders AS VARCHAR)
           || ' / Revenue: ' || CAST(CAST(ROUND(revenue, 0) AS BIGINT) AS VARCHAR) || ' USD'
           || ' / Avg price: ' || CAST(CAST(ROUND(avg_price, 2) AS DECIMAL(18,2)) AS VARCHAR) || ' USD'
           AS sentence
    FROM (
      SELECT r_name AS region, COUNT(*) AS n_orders,
             ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE), 2) AS revenue,
             ROUND(ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE), 2) / COUNT(*), 6) AS avg_price
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name
    )
    """,
)
def u2_sentence_serialization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 11-line semantic-sentence template (reference
    sentence_builder.py:71-98) as a pure column expression — stays
    optimizable, exactly testable. Numeric rendering goes through
    ROUND+CAST (identical in Spark and DuckDB) rather than printf-style
    formatting, whose half-even vs half-up rules differ between runtimes."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double"), 2).alias("revenue"),
            F.round(
                F.round(F.sum(F.col("o_totalprice").cast("decimal(30,2)")).cast("double"), 2)
                / F.count(F.lit(1)), 6
            ).alias("avg_price"),
        )
    )
    sentence = F.concat(
        F.lit("ISO: "), F.col("region"),
        F.lit(" / Orders: "), F.col("n_orders").cast("string"),
        F.lit(" / Revenue: "), F.round("revenue", 0).cast("bigint").cast("string"), F.lit(" USD"),
        F.lit(" / Avg price: "), F.round("avg_price", 2).cast("decimal(18,2)").cast("string"), F.lit(" USD"),
    )
    return base.select("region", sentence.alias("sentence"))


# ---------------------------------------------------------------------------
# North star: text analysis
# ---------------------------------------------------------------------------

@query(
    "text_stats_by_source",
    oracle="""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> ''))) AS BIGINT) AS total_tokens,
           CAST(SUM(length(text)) AS DOUBLE)
             / SUM(len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> ''))) AS chars_per_token,
           MAX(n_chars) AS max_chars
    FROM documents GROUP BY source
    """,
)
def text_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + corpus stats. Ratios are computed from exact
    integer sums (never averaged doubles) so the oracle matches bitwise."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("source", F.length("text").alias("len"), text_ops.token_count("text").alias("ntok"),
                 F.col("n_chars"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ntok").alias("total_tokens"),
            (F.sum("len").cast("double") / F.sum("ntok")).alias("chars_per_token"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp, doc_id
    FROM documents WHERE doc_id < 50
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(text_ops.fingerprint("text").alias("fp"), "doc_id")


# ---------------------------------------------------------------------------
# North star: deduplication
# ---------------------------------------------------------------------------

@query(
    "dedup_exact",
    oracle="""
    WITH unioned AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 3 = 0
    ),
    fp AS (
      SELECT md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp, doc_id
      FROM unioned
    )
    SELECT fp, COUNT(*) AS group_size, MIN(doc_id) AS keep_id
    FROM fp GROUP BY fp HAVING COUNT(*) > 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a corpus with injected duplicates (documents ∪ a
    shifted-id copy of every 3rd doc — derived purely from the table)."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") % 3 == 0).select((F.col("doc_id") + 1000000).alias("doc_id"), "text")
    return dedup_ops.exact_dup_groups(d.unionByName(dup))


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS toks
      FROM documents
    ),
    raw_shingles AS (
      SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 5
        THEN [array_to_string(toks[i:i+4], ' ') FOR i IN range(1, len(toks) - 3)]
        ELSE [array_to_string(toks, ' ')] END)) AS shingle
      FROM toks
    ),
    -- frequent-shingle cut (max_df=64): mirrors the operator's guard
    -- against boilerplate shingles exploding the candidate join
    shingles AS (
      SELECT r.doc_id, r.shingle FROM raw_shingles r
      JOIN (SELECT shingle FROM raw_shingles GROUP BY shingle HAVING COUNT(*) <= 64) k
        USING (shingle)
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM shingles a JOIN shingles b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.35
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-5-gram Jaccard near-dup pairs; candidates via
    inverted-index self-join (only docs sharing a shingle ever meet).
    ``max_df=64`` drops boilerplate shingles BEFORE the self-join — the
    guard that keeps candidate generation linear-ish on real corpora
    (one 'all rights reserved' shingle is otherwise O(df²) pairs)."""
    d = _t(spark, sf_dir, "documents")
    return dedup_ops.ngram_jaccard_pairs(d, n=5, threshold=0.35, max_df=64)


@query(
    "dedup_minhash_lsh",
    oracle="""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS toks
      FROM documents
    ),
    shingles AS (
      SELECT doc_id, unnest(list_distinct(CASE WHEN len(toks) >= 5
        THEN [array_to_string(toks[i:i+4], ' ') FOR i IN range(1, len(toks) - 3)]
        ELSE [array_to_string(toks, ' ')] END)) AS shingle
      FROM toks
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM shingles GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS inter
      FROM shingles a JOIN shingles b USING (shingle)
      WHERE a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b,
           ROUND(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= 0.35
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidates (1-row bands, miss prob ≤ 0.65^64 ≈ 1e-12
    per qualifying pair) + exact shingle-Jaccard rescore — produces the
    exact near-dup answer the LSH way, so the oracle is the same plain
    SQL as the inverted-index query. The S-curve banded variant
    (minhash_lsh_pairs) remains the est-only scale path, pytest-covered."""
    d = _t(spark, sf_dir, "documents")
    return dedup_ops.minhash_lsh_exact_pairs(d, num_hashes=64, n=5, threshold=0.35)


@query(
    "dedup_simhash",
    oracle="""
    SELECT doc_id AS id_a, doc_id + 1000000 AS id_b, CAST(0 AS INT) AS hamming
    FROM documents
    WHERE doc_id % 3 = 0
      AND len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')) > 0
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash + chunk blocking over a corpus with INJECTED exact dups
    (every 3rd doc copied at doc_id+1e6, as in dedup_exact). Identical
    text → identical 64-bit simhash → hamming 0, and blocks(8) >
    max_hamming(6) makes the pigeonhole blocking guarantee structural —
    so the query MUST recover exactly the injected pairs, which is a
    plain-SQL-provable invariant the driver gate checks. Natural
    near-dup pairs (the approximate part) stay pytest-covered.
    Docs with zero tokens have no simhash row (explode drops them);
    the oracle mirrors that with the token-count guard."""
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 1000000).alias("doc_id"), "text"
    )
    pairs = dedup_ops.simhash_pairs(d.unionByName(dup), max_hamming=6, blocks=8)
    return pairs.filter(F.col("id_b") - F.col("id_a") == 1000000).select(
        "id_a", "id_b", "hamming"
    )


# ---------------------------------------------------------------------------
# North star: similarity search
# ---------------------------------------------------------------------------

_COS_ORACLE = """
    WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qvec
               FROM embeddings WHERE vec_id < 5),
    c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cvec FROM embeddings),
    scored AS (
      SELECT q.query_id, c.vec_id,
             list_dot_product(c.cvec, q.qvec)
               / (sqrt(list_dot_product(c.cvec, c.cvec))
                  * sqrt(list_dot_product(q.qvec, q.qvec))) AS cos
      FROM c CROSS JOIN q
    ),
    ranked AS (
      SELECT query_id, vec_id, cos,
             ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rn
      FROM scored
    )
    SELECT query_id, vec_id, ROUND(cos, 6) AS cos_sim FROM ranked WHERE rn <= 10
"""


@query("ann_brute_force_topk", oracle=_COS_ORACLE)
def ann_brute_force_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    return sim_ops.brute_force_topk(e, q, k=10, dim=64)


@query(
    "embedding_near_dup",
    oracle="""
    WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS vec FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_dot_product(a.vec, b.vec)
             / (sqrt(list_dot_product(a.vec, a.vec))
                * sqrt(list_dot_product(b.vec, b.vec))), 6) AS cos_sim
    FROM v a JOIN v b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.vec, b.vec)
             / (sqrt(list_dot_product(a.vec, a.vec))
                * sqrt(list_dot_product(b.vec, b.vec))) >= 0.4
    """,
)
def embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _t(spark, sf_dir, "embeddings")
    return sim_ops.embedding_near_dup_pairs_fast(e, dim=64, threshold=0.4)


@query(
    "ann_lsh_topk",
    oracle="""
    SELECT vec_id AS query_id,
           CAST(vec_id + 1000000 AS BIGINT) AS planted_id,
           TRUE AS self_in_topk,
           TRUE AS planted_in_topk
    FROM embeddings WHERE vec_id < 5 ORDER BY query_id
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SRP-LSH ANN with a driver-checkable STRUCTURAL contract. The raw
    top-k list depends on the seeded hyperplanes (no SQL twin), so the
    query instead proves the property LSH exists for — known-item
    retrieval of high-similarity neighbors — as a theorem: each query
    vector v (drawn from the corpus) gets a planted copy 2·v at
    vec_id+1e6. Cosine and SRP signatures (sign(w·v)) are both invariant
    to positive scaling, so the copy collides with v in EVERY hash table
    and scores cos 1.0 — both self and the planted copy MUST appear in
    the LSH top-10 (corpus max cross-pair cosine ≈ 0.51). The DuckDB
    oracle states the full expected result in plain SQL. Empirical
    recall on non-planted neighbors is pytest-covered by
    test_srp_ann_recall_floor_and_table_knob (round 5 — the earlier
    attribution to the MinHash recall test was wrong): top-10 recall on
    this weakly-similar corpus is ~0.2-0.25 by SRP's S-curve, the
    n_tables knob measurably buys recall, and the high-similarity
    regime is exact. Replaces the rows-only status this query carried
    since round 2."""
    e = _t(spark, sf_dir, "embeddings")
    planted = e.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 1000000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(2.0)).cast("float")).alias("embedding"),
    )
    corpus = e.select("vec_id", "embedding").unionByName(planted)
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    topk = sim_ops.lsh_bucket_topk(corpus, q, dim=64, k=10, n_planes=8, n_tables=4)
    return (
        topk.groupBy("query_id")
        .agg(
            F.max(F.when(F.col("vec_id") == F.col("query_id"), True)).alias("self_hit"),
            F.max(F.when(F.col("vec_id") == F.col("query_id") + 1000000, True)).alias("planted_hit"),
        )
        .select(
            "query_id",
            (F.col("query_id") + 1000000).cast("bigint").alias("planted_id"),
            F.coalesce("self_hit", F.lit(False)).alias("self_in_topk"),
            F.coalesce("planted_hit", F.lit(False)).alias("planted_in_topk"),
        )
        .orderBy("query_id")
    )


@query(
    "ann_lsh_self_recovery",
    oracle="""
    SELECT vec_id AS query_id, vec_id, CAST(1.0 AS DOUBLE) AS cos_sim
    FROM embeddings WHERE vec_id < 5
    """,
)
def ann_lsh_self_recovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable LSH invariant: a query vector drawn FROM the
    corpus hashes into its own bucket in every table, so top-1 must be
    itself at cos 1.0 (the corpus has no duplicate vectors — max
    cross-pair cosine ≈ 0.51). Runs the full bucket → candidate →
    score → top-k pipeline end-to-end with k=1."""
    e = _t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    return sim_ops.lsh_bucket_topk(e, q, dim=64, k=1, n_planes=8, n_tables=4)


# ---------------------------------------------------------------------------
# [absent] ranking / analytic window functions
# ---------------------------------------------------------------------------

@query(
    "rank_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER w AS rn,
           RANK() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC) AS price_rank,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def rank_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking + analytic functions over one shuffle on the partition key."""
    from pyspark.sql.window import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wr = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    return o.select(
        "o_custkey", "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(wr).alias("price_rank"),
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
    )


@query(
    "cube_flag_status",
    oracle="""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n_rows,
           ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE), 2) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(30,2)")).cast("double"), 2).alias("sum_qty"),
    )


@query(
    "semi_anti_join",
    oracle="""
    SELECT c_mktsegment AS segment,
           COUNT(CASE WHEN has_urgent THEN 1 END) AS n_with_urgent,
           COUNT(CASE WHEN NOT has_urgent THEN 1 END) AS n_without_urgent
    FROM (
      SELECT c.c_custkey, c.c_mktsegment,
             EXISTS (SELECT 1 FROM orders o
                     WHERE o.o_custkey = c.c_custkey
                       AND o.o_orderpriority = '1-URGENT') AS has_urgent
      FROM customer c
    ) GROUP BY c_mktsegment
    """,
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """left_semi + left_anti — Spark's dedicated join types (no row
    duplication, right side reduced to existence bits)."""
    c = _t(spark, sf_dir, "customer")
    urgent = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT") \
        .select("o_custkey")
    with_u = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_semi") \
        .groupBy(F.col("c_mktsegment").alias("segment")).agg(F.count(F.lit(1)).alias("n_with_urgent"))
    without_u = c.join(urgent, c.c_custkey == urgent.o_custkey, "left_anti") \
        .groupBy(F.col("c_mktsegment").alias("segment")).agg(F.count(F.lit(1)).alias("n_without_urgent"))
    return with_u.join(without_u, "segment", "full_outer").select(
        "segment",
        F.coalesce("n_with_urgent", F.lit(0)).alias("n_with_urgent"),
        F.coalesce("n_without_urgent", F.lit(0)).alias("n_without_urgent"),
    )


# ---------------------------------------------------------------------------
# As-of + range joins (time-series ops the reference lacks; north-star)
# ---------------------------------------------------------------------------

@query(
    "asof_click_attribution",
    oracle="""
    WITH u AS (
      SELECT user_id, ts, NULL::TIMESTAMP AS click_ts, 1 AS is_purchase
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT user_id, ts, ts AS click_ts, 0 AS is_purchase
      FROM events WHERE event_type = 'click'
    ),
    w AS (
      SELECT user_id, ts, is_purchase,
             MAX(click_ts) OVER (PARTITION BY user_id ORDER BY ts, is_purchase
                                 ROWS UNBOUNDED PRECEDING) AS click_ts_matched
      FROM u
    )
    SELECT user_id,
           COUNT(*) AS n_purchases,
           COUNT(click_ts_matched) AS n_attributed,
           CAST(SUM(epoch_us(ts) - epoch_us(click_ts_matched)) AS BIGINT) AS total_gap_us
    FROM w WHERE is_purchase = 1
    GROUP BY user_id
    """,
)
def asof_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest preceding
    click (classic attribution). Gap sums are integer microseconds —
    exact, so the distributed result hash-matches the oracle."""
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts")
    matched = join_ops.asof_join(
        purchases, clicks.select("user_id", F.col("ts").alias("click_ts")),
        key="user_id", left_ts="ts", right_ts="click_ts", payload_cols=["click_ts"],
    )
    gap_us = F.unix_micros("ts") - F.unix_micros("click_ts_matched")
    return matched.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.count("click_ts_matched").alias("n_attributed"),
        F.sum(gap_us).alias("total_gap_us"),
    )


@query(
    "range_join_clicks_before_purchase",
    oracle="""
    SELECT p.event_id, COUNT(c.event_id) AS n_clicks_prev_hour
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR
     AND c.ts < p.ts
    GROUP BY p.event_id
    """,
)
def range_join_clicks_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"), "user_id", F.col("ts").alias("c_ts")
    )
    joined = purchases.alias("_l").join(
        clicks.alias("_r"),
        (F.col("_l.user_id") == F.col("_r.user_id"))
        & (F.col("_r.c_ts") >= F.col("_l.ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("_r.c_ts") < F.col("_l.ts")),
        "left",
    )
    return joined.groupBy(F.col("_l.event_id").alias("event_id")).agg(
        F.count("_r.c_event_id").alias("n_clicks_prev_hour")
    )


@query(
    "sessionization",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 30 MINUTE OR
                       LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    islands AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start, COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE), 2) AS session_value
    FROM islands GROUP BY user_id, session_no
    """,
)
def sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min inactivity gap) via Spark's native
    session_window — the same gaps-and-islands computation the oracle
    spells out with window functions."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(30,2)")).cast("double"), 2).alias("session_value"),
            F.min("ts").alias("session_start"),
        )
        .select("user_id", "session_start", "n_events", "session_value")
    )


# ---------------------------------------------------------------------------
# North star: text analysis (continued)
# ---------------------------------------------------------------------------

_LANG_CASE = """
      CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_zh) = 0 THEN 'und'
           WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
           WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
           WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
           WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
           ELSE 'zh' END
"""


@query(
    "text_lang_id_confusion",
    oracle=f"""
    WITH toks AS (
      SELECT lang,
             list_distinct(list_transform(
               list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> ''),
               t -> lower(t))) AS tok
      FROM documents
    ),
    scored AS (
      SELECT lang,
             len(list_intersect(tok, ['der','die','das','und','ist','von','den','ein','eine','mit'])) AS s_de,
             len(list_intersect(tok, ['the','a','of','and','to','in','is','that','it','for'])) AS s_en,
             len(list_intersect(tok, ['el','la','de','que','y','en','un','una','por','los'])) AS s_es,
             len(list_intersect(tok, ['le','la','de','et','les','des','un','une','du','est'])) AS s_fr,
             len(list_intersect(tok, ['的','是','在','了','和','有','我','他','这','不'])) AS s_zh
      FROM toks
    )
    SELECT lang, {_LANG_CASE} AS detected, COUNT(*) AS n_docs
    FROM scored GROUP BY 1, 2
    """,
)
def text_lang_id_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic vs the labeled lang column (confusion matrix).
    The oracle replicates the same stopword-overlap argmax, tie-broken
    toward the lexicographically smallest code."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("lang", text_ops.lang_id("text").alias("detected"))
        .groupBy("lang", "detected")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@query(
    "text_quality_metrics",
    oracle="""
    SELECT doc_id,
           length(text) AS q_n_chars,
           len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')) AS q_n_tokens,
           ROUND(CAST(length(text) AS DOUBLE)
             / len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')), 6) AS q_chars_per_token,
           ROUND(CAST(len(list_distinct(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> ''))) AS DOUBLE)
             / len(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')), 6) AS q_distinct_ratio
    FROM documents WHERE doc_id < 100
    """,
)
def text_quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    # two-step projection: four derived columns reference the token array
    # / count, and inlining the tokenize expression evaluated it 4x per
    # row (catalyst CSE stops at lambdas).
    n_tok = F.size("_tk")
    return d.select(
        "doc_id", "text", text_ops.tokens("text").alias("_tk")
    ).select(
        "doc_id",
        F.length("text").alias("q_n_chars"),
        n_tok.alias("q_n_tokens"),
        F.round(F.length("text").cast("double") / n_tok, 6).alias("q_chars_per_token"),
        F.round(F.size(F.array_distinct("_tk")).cast("double") / n_tok, 6).alias("q_distinct_ratio"),
    )


@query(
    "bpe_token_budget",
    oracle="""
    SELECT source,
           CAST(SUM(len(list_filter(regexp_split_to_array(text, '[\\s\\.,;:!\\?''"()\\[\\]{}\\-]+'), t -> t <> ''))) AS BIGINT) AS total_bpe_tokens,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars
    FROM documents GROUP BY source
    """,
)
def bpe_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget estimation per source with the BPE-ish regex splitter."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy("source").agg(
        F.sum(text_ops.bpe_ish_token_count("text")).alias("total_bpe_tokens"),
        F.sum(F.length("text")).alias("total_chars"),
    )


@query(
    "percentiles_by_segment",
    oracle="""
    SELECT c_mktsegment AS segment,
           ROUND(quantile_cont(o_totalprice, 0.5), 4) AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 4) AS p90_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
)
def percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` = SQL
    percentile_cont = DuckDB quantile_cont)."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("median_price"),
            F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90_price"),
        )
    )


# ---------------------------------------------------------------------------
# Streaming variant (SURVEY.md §2.7): same computation as w1_sliding_window
# but through Structured Streaming — and checked against the SAME oracle.
# ---------------------------------------------------------------------------

@query(
    "streaming_sliding_window",
    oracle="""
    SELECT ws AS window_start,
           COUNT(*) AS n_events,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(30,2))) AS DOUBLE), 2) AS sum_value
    FROM (
      SELECT unnest([date_trunc('day', ts), date_trunc('day', ts) - INTERVAL 1 DAY]) AS ws, value
      FROM events
    ) GROUP BY ws
    """,
)
def streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured Streaming (availableNow drain of the parquet source,
    watermarked sliding window, complete-mode memory sink) must agree
    with the batch plan — verified by the same DuckDB oracle as W1."""
    from pyspark.sql.types import LongType, StructField, StructType

    from quantum_rag_data_pipeline_spark.streaming.daily_stream import (
        drain_available_now,
        sliding_window_stream,
    )

    import os

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    batch_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    nanos = isinstance(batch_schema["ts"].dataType, LongType)
    # the file stream source wants a landing DIRECTORY (as in production);
    # stage the single test file into one via symlink.
    landing = f"{landing_root()}/{os.path.basename(os.path.normpath(sf_dir))}/events"
    os.makedirs(landing, exist_ok=True)
    link = f"{landing}/events.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    agg = sliding_window_stream(
        spark,
        landing,
        batch_schema,
        ts_from_nanos_col="ts" if nanos else None,
    )
    return drain_available_now(agg, "stream_w1", sink="blocks")  # bounded: day windows


# ---------------------------------------------------------------------------
# North star: multimodal columns (binary payload + mapInPandas stages).
# Payload header fields + body length use SQL-portable integer hashing
# (multimodal._field), so the oracle rebuilds the expected headers in
# plain arithmetic and the whole synth → binary → parse → agg roundtrip
# is driver-checked. Body CONTENT stays opaque (sha256+numpy) — the
# checksum column is pytest-covered instead.
# ---------------------------------------------------------------------------

# shared oracle fragment: the expected header fields per media row,
# mirroring multimodal._field (Knuth multiplicative hash) and the
# image/audio/video kind cycle of synth_media_table.
_MEDIA_ORACLE_CTE = """
    WITH m AS (
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             16 + ((doc_id * 2654435761 + 40503) % 4294967296) % 241 AS width,
             16 + ((doc_id * 2654435761 + 81006) % 4294967296) % 241 AS height,
             256 + ((doc_id * 2654435761 + 162012) % 4294967296) % 1792 AS body_len
      FROM documents
    )
"""


@query(
    "multimodal_features",
    oracle=_MEDIA_ORACLE_CTE + """
    SELECT kind,
           COUNT(*) AS n_media,
           CAST(SUM(16 + body_len) AS BIGINT) AS total_bytes,
           CAST(MAX(width) AS INT) AS max_width,
           COUNT(DISTINCT width * 1000 + height) AS n_distinct_dims
    FROM m GROUP BY kind
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quantum_rag_data_pipeline_spark.operators.multimodal import (
        extract_features,
        synth_media_table,
    )

    docs = _t(spark, sf_dir, "documents")
    feats = extract_features(synth_media_table(docs))
    return feats.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.sum("n_bytes").alias("total_bytes"),
        F.max("width").alias("max_width"),
        F.countDistinct(F.col("width") * 1000 + F.col("height")).alias("n_distinct_dims"),
    )


@query(
    "multimodal_resize_and_frames",
    oracle=_MEDIA_ORACLE_CTE + """
    SELECT 'image_resized' AS stage, media_id,
           CAST(GREATEST(
             GREATEST(1, CAST(FLOOR(width  * LEAST(1.0, 64.0 / GREATEST(width, height))) AS BIGINT)),
             GREATEST(1, CAST(FLOOR(height * LEAST(1.0, 64.0 / GREATEST(width, height))) AS BIGINT))
           ) AS BIGINT) AS metric
    FROM m WHERE kind = 'image'
    UNION ALL
    SELECT 'video_frames' AS stage, media_id,
           CAST((((body_len + 63) // 64) + 7) // 8 AS BIGINT) AS metric
    FROM m WHERE kind = 'video'
    """,
)
def multimodal_resize_and_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from quantum_rag_data_pipeline_spark.operators.multimodal import (
        resize_images,
        sample_frames,
        synth_media_table,
    )

    docs = _t(spark, sf_dir, "documents")
    media = synth_media_table(docs)
    resized = resize_images(media, max_side=64).select(
        F.lit("image_resized").alias("stage"),
        F.col("media_id"),
        F.greatest("width", "height").cast("long").alias("metric"),
    )
    frames = sample_frames(media, every_k=8).groupBy("media_id").agg(
        F.count(F.lit(1)).alias("metric")
    ).select(F.lit("video_frames").alias("stage"), "media_id", "metric")
    return resized.unionByName(frames)


# ---------------------------------------------------------------------------
# SQL surface (§3.4 entry point 2): spark.sql over registered views,
# GROUPING SETS + HAVING + CTE in one statement.
# ---------------------------------------------------------------------------

@query(
    "sql_grouping_sets",
    oracle="""
    WITH joined AS (
      SELECT r_name AS region, c_mktsegment AS segment, o_totalprice
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
    )
    SELECT region, segment, COUNT(*) AS n_orders,
           ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE), 2) AS revenue
    FROM joined
    GROUP BY GROUPING SETS ((region), (segment), (region, segment))
    HAVING COUNT(*) > 10
    """,
)
def sql_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL entry point: temp views + one multi-feature statement
    (CTE, 4-way join, GROUPING SETS, HAVING) handed to Catalyst whole."""
    for t in ("orders", "customer", "nation", "region"):
        _t(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql("""
        WITH joined AS (
          SELECT r_name AS region, c_mktsegment AS segment, o_totalprice
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
        )
        SELECT region, segment, COUNT(*) AS n_orders,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE), 2) AS revenue
        FROM joined
        GROUP BY GROUPING SETS ((region), (segment), (region, segment))
        HAVING COUNT(*) > 10
    """)


# ---------------------------------------------------------------------------
# North star: text analysis wave 3 — repetition filter, inverted index,
# TF-IDF keyword scores.
# ---------------------------------------------------------------------------

@query(
    "text_repetition_filter",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS tok
      FROM documents
    ),
    bigrams AS (
      SELECT doc_id, len(tok) AS n_tokens,
             unnest(CASE WHEN len(tok) >= 2
               THEN [tok[i] || ' ' || tok[i+1] FOR i IN range(1, len(tok))]
               ELSE [] END) AS bigram
      FROM toks
    ),
    counts AS (
      SELECT doc_id, n_tokens, bigram, COUNT(*) AS c
      FROM bigrams GROUP BY doc_id, n_tokens, bigram
    )
    SELECT doc_id,
           MAX(c) AS top_bigram_count,
           ROUND(CAST(MAX(c) AS DOUBLE) / (ANY_VALUE(n_tokens) - 1), 6) AS top_bigram_ratio,
           (CAST(MAX(c) AS DOUBLE) / (ANY_VALUE(n_tokens) - 1)) <= 0.2 AS keep
    FROM counts GROUP BY doc_id
    """,
)
def text_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter: docs whose most frequent bigram
    exceeds 20% of bigram slots are flagged. Explode-once + two grouped
    aggregates — linear in corpus size."""
    d = _t(spark, sf_dir, "documents")
    # zip the token array with its own 1-shifted slice — each bigram costs
    # one concat. (The tempting per-index element_at(toks, i+2) form
    # re-evaluates the tokenizer expression PER ELEMENT → O(n²) per doc;
    # measured 5× slower on this query.)
    tok = text_ops.tokens("text")
    d2 = d.select("doc_id", tok.alias("tok"))
    bigrams = d2.select(
        "doc_id",
        F.size("tok").alias("n_tokens"),
        F.explode(
            F.when(
                F.size("tok") >= 2,
                F.zip_with(
                    F.slice("tok", 1, F.size("tok") - 1),
                    F.slice("tok", 2, F.size("tok") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            ).otherwise(F.array())
        ).alias("bigram"),
    )
    counts = bigrams.groupBy("doc_id", "n_tokens", "bigram").agg(F.count(F.lit(1)).alias("c"))
    ratio = F.max("c").cast("double") / (F.first("n_tokens") - 1)
    return counts.groupBy("doc_id").agg(
        F.max("c").alias("top_bigram_count"),
        F.round(ratio, 6).alias("top_bigram_ratio"),
        (ratio <= 0.2).alias("keep"),
    )


@query(
    "inverted_index",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')) AS term
      FROM documents
    )
    SELECT term,
           COUNT(DISTINCT doc_id) AS df,
           COUNT(*) AS total_tf,
           MIN(doc_id) AS first_doc
    FROM toks GROUP BY term
    """,
)
def inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Posting-list statistics (term → document frequency, total term
    frequency): the core retrieval-index build as one explode + aggregate."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.explode(text_ops.tokens("text")).alias("term"))
        .groupBy("term")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("total_tf"),
            F.min("doc_id").alias("first_doc"),
        )
    )


@query(
    "tfidf_top_terms",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')) AS term
      FROM documents
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             ROUND(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    ),
    ranked AS (
      SELECT doc_id, term, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rn
      FROM scored
    )
    SELECT doc_id, term, tfidf FROM ranked WHERE rn <= 3 AND doc_id < 50
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF keywords per document: tf and df from one exploded
    pass, df-side broadcast (vocabulary ≪ corpus), per-doc top-k window.
    n_docs rides along as a broadcast 1-row aggregate — the whole query
    stays ONE lazy DAG (no eager driver-side count job)."""
    d = _t(spark, sf_dir, "documents")
    n_docs = d.agg(F.count(F.lit(1)).cast("double").alias("_n_docs"))
    toks = d.select("doc_id", F.explode(text_ops.tokens("text")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = tf.join(F.broadcast(df_), "term").crossJoin(F.broadcast(n_docs)).select(
        "doc_id", "term",
        F.round(F.col("tf") * F.log(F.col("_n_docs") / F.col("df")), 6).alias("tfidf"),
    )
    top = win_ops.top_k_per_group(
        scored, ["doc_id"], [F.col("tfidf").desc(), F.col("term").asc()], 3
    )
    return top.filter(F.col("doc_id") < 50).select("doc_id", "term", "tfidf")


# ---------------------------------------------------------------------------
# Typed JSON extraction (from_json) + ordered array aggregation
# ---------------------------------------------------------------------------

@query(
    "typed_json_extraction",
    oracle="""
    SELECT user_id,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def typed_json_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with a declared schema (typed struct access, vs the
    stringly get_json_object path of p2) — integer sums, exact."""
    from pyspark.sql.types import LongType, StructField, StructType

    ev = _t(spark, sf_dir, "events")
    parsed = ev.withColumn(
        "p", F.from_json("props", StructType([StructField("k", LongType())]))
    )
    return parsed.groupBy("user_id").agg(
        F.sum("p.k").alias("sum_k"),
        F.max("p.k").alias("max_k"),
        F.count(F.lit(1)).alias("n_events"),
    )


@query(
    "ordered_array_agg",
    oracle="""
    SELECT o_custkey,
           array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS order_keys,
           COUNT(*) AS n_orders
    FROM orders
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY o_custkey
    """,
)
def ordered_array_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is unordered in a distributed engine — sort_array
    makes the aggregation deterministic; serialized for hash compare."""
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return o.groupBy("o_custkey").agg(
        F.array_join(F.sort_array(F.collect_list("o_orderkey")), ",").alias("order_keys"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# [absent] unpivot/melt, lateral explode, moving window frames
# ---------------------------------------------------------------------------

@query(
    "unpivot_melt",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             ROUND(ROUND(CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(30,2)) END) AS DOUBLE), 2)
               / COUNT(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 6) AS qty_O,
             ROUND(ROUND(CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(30,2)) END) AS DOUBLE), 2)
               / COUNT(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 6) AS qty_F
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, linestatus, avg_qty
    FROM wide UNPIVOT (avg_qty FOR linestatus IN (qty_O, qty_F))
    """,
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long melt (the inverse of J1): Spark's native unpivot.
    NULL cells are dropped by UNPIVOT in both engines."""
    wide = j1_pivot(spark, sf_dir)
    return wide.unpivot(
        ids=["l_returnflag"], values=["qty_O", "qty_F"],
        variableColumnName="linestatus", valueColumnName="avg_qty",
    )


@query(
    "lateral_explode",
    oracle="""
    SELECT doc_id, pos, token
    FROM (
      SELECT doc_id,
             generate_subscripts(toks, 1) - 1 AS pos,
             unnest(toks) AS token
      FROM (
        SELECT doc_id, list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '') AS toks
        FROM documents WHERE doc_id < 20
      )
    )
    """,
)
def lateral_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — one row per (doc, position, token); the lateral
    fan-out primitive every tokenization pipeline starts with."""
    d = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 20)
    return d.select(
        "doc_id", F.posexplode(text_ops.tokens("text")).alias("pos", "token")
    )


@query(
    "moving_avg_frame",
    oracle="""
    SELECT user_id, ts,
           ROUND(ROUND(CAST(SUM(CAST(value AS DECIMAL(30,2)))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE), 2)
             / COUNT(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 6) AS moving_avg
    FROM events WHERE user_id < 20
    """,
)
def moving_avg_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit ROWS frame: 7-row trailing average per user — decimal-
    exact numerator so the sliding sum is order-stable."""
    from pyspark.sql.window import Window

    ev = _t(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    num = F.round(F.sum(F.col("value").cast("decimal(30,2)")).over(w).cast("double"), 2)
    return ev.select(
        "user_id", "ts",
        F.round(num / F.count("value").over(w), 6).alias("moving_avg"),
    )


# ---------------------------------------------------------------------------
# [absent] approximate distinct counting (SURVEY §2.3) — the sketch value
# is engine-specific (Spark HLL++ vs DuckDB's sketch), so the driver-
# checkable contract is the TOLERANCE INVARIANT: emit the exact count and
# a boolean asserting the approx landed within 3×rsd of it.
# ---------------------------------------------------------------------------

@query(
    "approx_count_distinct_orders",
    oracle="""
    SELECT o_orderpriority AS priority,
           COUNT(DISTINCT o_custkey) AS exact_distinct,
           TRUE AS approx_within_tol
    FROM orders GROUP BY o_orderpriority
    """,
)
def approx_count_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++, rsd=0.05) vs the exact
    count, per order priority. The HLL sketch shuffles O(groups × 2^p)
    bytes instead of every distinct key — the 100 TB answer to
    COUNT(DISTINCT). Its value is engine-specific, so the oracled output
    asserts |approx − exact| ≤ 3×rsd×exact alongside the exact count."""
    o = _t(spark, sf_dir, "orders")
    agg = o.groupBy(F.col("o_orderpriority").alias("priority")).agg(
        F.countDistinct("o_custkey").alias("exact_distinct"),
        F.approx_count_distinct("o_custkey", rsd=0.05).alias("_approx"),
    )
    tol = F.abs(F.col("_approx") - F.col("exact_distinct")) <= 0.15 * F.col("exact_distinct")
    return agg.select("priority", "exact_distinct", tol.alias("approx_within_tol"))


# ---------------------------------------------------------------------------
# [absent] SQL-registered UDF (SURVEY §2.8): spark.udf.register exposes a
# Python function to the SQL surface. String-typed on purpose — no float
# rounding semantics to diverge between engines.
# ---------------------------------------------------------------------------

@query(
    "sql_registered_udf",
    oracle="""
    SELECT lower(split_part(o_orderpriority, '-', 1)) AS pclass,
           COUNT(*) AS n_orders
    FROM orders GROUP BY 1
    """,
)
def sql_registered_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A Python UDF registered into the SQL surface and invoked through
    spark.sql text. Registered as an Arrow-batched pandas_udf — the
    register/invoke API is what this exercises, and the vectorized form
    keeps even the demo off the row-at-a-time path."""
    import pandas as pd
    from pyspark.sql.types import StringType

    # no type hints: module-level `from __future__ import annotations`
    # stringifies them and pandas_udf cannot resolve the local alias
    def _pc(s):
        return s.str.split("-").str[0].str.lower()

    _priority_class = F.pandas_udf(_pc, StringType())

    spark.udf.register("priority_class", _priority_class)
    _t(spark, sf_dir, "orders").createOrReplaceTempView("_orders_for_udf")
    return spark.sql("""
        SELECT priority_class(o_orderpriority) AS pclass, COUNT(*) AS n_orders
        FROM _orders_for_udf GROUP BY 1
    """)
