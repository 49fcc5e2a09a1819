"""Corpus-curation operators for LLM training-data pipelines:
deterministic train/val/test splitting, per-domain caps, token-budget
sequence packing, and PII scrubbing.

All pure column expressions (whole-stage codegen, zero Python), and every
randomized-looking decision is a DETERMINISTIC hash of the row id — a
re-run on a re-partitioned 100 TB corpus assigns every document the same
split/sample, which is what makes ablations and incremental re-curation
reproducible. The hash is Knuth's multiplicative scheme
``((id * 2654435761 + salt * 40503) mod 2^32) mod span`` — plain 64-bit
integer arithmetic that any engine (and any oracle) reproduces exactly,
unlike engine-specific hash builtins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KNUTH_A = 2654435761  # floor(2^32 / golden ratio), Knuth multiplicative hashing
_M32 = 4294967296

# Conservative ASCII patterns — identical semantics in Java regex (Spark)
# and RE2 (DuckDB/Go), so oracles and scrubbing agree byte-for-byte.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z][A-Za-z]+"
PHONE_RE = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def hash_bucket(col: Column | str, span: int, salt: int = 0) -> Column:
    """Deterministic bucket in [0, span) from an integer id."""
    c = F.col(col) if isinstance(col, str) else col
    return ((c * F.lit(KNUTH_A) + F.lit(salt * 40503)) % F.lit(_M32)) % F.lit(span)


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 80,
    val_pct: int = 10,
    salt: int = 0,
) -> DataFrame:
    """Add a ``split`` column (train/val/test) keyed on a hash of the id —
    no shuffle, no RNG state, stable under re-partitioning."""
    b = hash_bucket(id_col, 100, salt)
    return df.withColumn(
        "split",
        F.when(b < train_pct, F.lit("train"))
        .when(b < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def cap_per_group(df: DataFrame, group_col: str, order_col: str, cap: int) -> DataFrame:
    """Keep at most ``cap`` rows per group (per-domain caps in web-corpus
    curation). Deterministic: ranked by ``order_col`` (unique), so the
    kept set is stable run-to-run. One shuffle on the group key; skewed
    mega-domains are bounded by the cap itself — the window never
    materializes more than it ranks, and rank-based filtering is
    AQE-skew-splittable since partitions only need per-group ordering."""
    w = Window.partitionBy(group_col).orderBy(order_col)
    return df.withColumn("_rn", F.row_number().over(w)).withColumn(
        "kept", F.col("_rn") <= F.lit(cap)
    )


def pack_token_budget(
    df: DataFrame,
    group_col: str,
    order_col: str,
    tokens_col: str,
    budget: int,
) -> DataFrame:
    """Streaming sequence packing: walk each group's docs in ``order_col``
    order, concatenating until the running total crosses ``budget`` —
    the bin index is just ``floor(preceding_cumsum / budget)``. One
    window cumsum per group (single shuffle), no greedy bin-packing
    state; this is the packer shape used for LLM context-window filling
    where docs may straddle a boundary."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(tokens_col).over(w)
    return df.withColumn(
        "bin", F.floor((cum - F.col(tokens_col)) / F.lit(float(budget))).cast("long")
    )


def redact_pii(col: Column | str) -> Column:
    """Replace email addresses and phone-shaped numbers with typed
    placeholder tags. Pure regexp_replace — codegen'd, scan-speed."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )


def pii_match_count(col: Column | str, pattern: str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 30,
    max_tokens: int = 5000,
    min_mean_wlen: float = 3.0,
    max_mean_wlen: float = 4.8,
    max_top_token_ratio: float = 0.15,
    stopword: str = "the",
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, "Scaling
    Language Models", Appendix A ‑ public paper), adapted to threshold
    columns: token-count bounds, mean-word-length band, single-token
    dominance (repetition proxy), and a stopword-presence check.

    All four rules are pure column expressions over one tokenization —
    no shuffle (flags are a projection) except the dominance rule,
    which needs a per-doc mode: computed here with ``aggregate`` over
    the sorted token array, NOT a groupBy — so the operator stays
    embarrassingly parallel at 100 TB.

    Emits the input plus boolean ``pass_r1..pass_r4`` and ``pass_all``
    columns; callers decide whether to filter or audit."""
    from quantum_rag_data_pipeline_spark.operators.text import tokens

    tk = tokens(text_col)
    d = df.withColumn("_tk", tk).withColumn("_ntok", F.size("_tk"))
    # total token length as a materialized column: referencing the O(ntok)
    # fold directly from BOTH band conditions of pass_r2 duplicated it in
    # the executed plan (catalyst only CSEs cheap expressions across a
    # collapsed projection); an attribute reference is always single-eval.
    d = d.withColumn(
        "_sumlen", F.aggregate(F.col("_tk"), F.lit(0), lambda a, t: a + F.length(t))
    )
    # mode frequency without a groupBy: sort tokens, then the longest run
    # length == max frequency. aggregate keeps a (best, cur, prev) state.
    sorted_tk = F.array_sort("_tk")
    run = F.aggregate(
        sorted_tk,
        F.struct(F.lit(0).alias("best"), F.lit(0).alias("cur"), F.lit("").alias("prev")),
        lambda acc, t: F.struct(
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
            F.when(t == acc["prev"], acc["cur"] + 1).otherwise(F.lit(1)).alias("cur"),
            t.alias("prev"),
        ),
        lambda acc: acc["best"],
    )
    mean_wlen = F.col("_sumlen") / F.col("_ntok")
    return (
        d.withColumn("_maxfreq", run)
        .withColumn(
            "pass_r1",
            (F.col("_ntok") >= min_tokens) & (F.col("_ntok") <= max_tokens),
        )
        .withColumn(
            "pass_r2",
            (mean_wlen >= F.lit(min_mean_wlen)) & (mean_wlen <= F.lit(max_mean_wlen)),
        )
        .withColumn(
            "pass_r3",
            (F.col("_maxfreq") / F.col("_ntok")) <= F.lit(max_top_token_ratio),
        )
        .withColumn("pass_r4", F.array_contains("_tk", stopword))
        .withColumn(
            "pass_all",
            F.col("pass_r1") & F.col("pass_r2") & F.col("pass_r3") & F.col("pass_r4"),
        )
        .drop("_tk", "_maxfreq", "_sumlen")
    )


def stratified_sample_exact(
    df: DataFrame,
    strata_cols: list[str],
    id_col: str,
    fraction: float,
    salt: int = 0,
) -> DataFrame:
    """Exact-count stratified sampling: keep ceil(fraction · N_s) rows
    from every stratum, chosen by ranking a deterministic hash of the
    id — reproducible under repartitioning (no RNG state), and exact
    per-stratum counts (``df.sampleBy`` is Bernoulli: right only in
    expectation). One shuffle on the strata key for the rank window;
    the hash makes the within-stratum order uniform-pseudorandom.

    For 100 TB strata the window is the same shape as any per-group
    top-k (AQE skew-splittable up to the ordering requirement); callers
    with mega-strata can pre-filter with a loose Bernoulli hash cut
    (keep hash%M < 2·fraction·M) before the exact rank."""
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_bucket(id_col, _M32, salt), F.col(id_col)
    )
    n = Window.partitionBy(*strata_cols)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_ns", F.count(F.lit(1)).over(n))
        .withColumn("sampled", F.col("_rn") <= F.ceil(F.col("_ns") * F.lit(fraction)))
        .drop("_rn", "_ns")
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 8,
    min_shared: int = 1,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing ≥
    ``min_shared`` distinct word ``ngram``-grams with any eval/benchmark
    document (the n-gram-overlap rule used by public LLM training
    pipelines, e.g. GPT-3 appendix C / The Pile — 8-13 gram collision).

    Shape for scale: the eval set is small by definition → its distinct
    shingles BROADCAST; the 100 TB train side streams map-side through
    the hash join, then one shuffle on (train_id, eval_id) for the
    overlap count. Train shingles are deduped per doc BEFORE the join
    (explode → distinct) so a repeated phrase can't inflate counts.

    Returns (train_id, eval_id, n_shared) pairs; join back to drop."""
    from quantum_rag_data_pipeline_spark.operators.text import tokens

    def shingles(df: DataFrame, out_id: str) -> DataFrame:
        tk = tokens(text_col)
        d = df.select(F.col(id_col).alias(out_id), tk.alias("_tk"))
        d = d.filter(F.size("_tk") >= ngram)
        sh = F.transform(
            F.sequence(F.lit(1), F.size("_tk") - ngram + 1),
            lambda i: F.array_join(F.slice("_tk", i, ngram), " "),
        )
        return d.select(out_id, F.explode(sh).alias("shingle")).distinct()

    ev = shingles(eval_df, "eval_id")
    tr = shingles(train, "train_id")
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def assign_global_ids(
    df: DataFrame,
    group_col: str,
    order_cols: list[str],
    id_name: str = "global_id",
) -> DataFrame:
    """Contiguous 0-based global row ids in (group, order) total order —
    WITHOUT a single-partition global window (the classic scale trap:
    ``row_number() OVER (ORDER BY ...)`` moves every row to one task).

    Two-level construction: row_number within each group partition, plus
    an exclusive running offset over the per-group COUNTS. The offsets
    frame has one row per group, so its global window is trivially small,
    and it broadcast-joins back onto the data. This is the standard way a
    training run assigns stable example ids to a sharded corpus."""
    from pyspark.sql.window import Window

    w_in = Window.partitionBy(group_col).orderBy(*[F.col(c) for c in order_cols])
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy(group_col).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        group_col,
        F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"),
    )
    return (
        df.join(F.broadcast(offsets), group_col)
        .withColumn(id_name, (F.row_number().over(w_in) - 1 + F.col("_off")).cast("bigint"))
        .drop("_off")
    )


def md5_bucket(col: Column | str, span: int, salt: str = "") -> Column:
    """Portable salted string→bucket hash: the first 8 hex chars of
    ``md5(salt | s)`` parsed as an integer, mod ``span``. md5 exists in
    every engine (the DuckDB oracle replays it bit-for-bit), which is
    what makes sketch queries exactly verifiable; ``xxhash64`` is the
    faster production choice when cross-engine replay isn't needed.
    Complements ``hash_bucket`` (Knuth multiplicative, integers)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit(f"{salt}|"), c)), 1, 8), 16, 10)
        .cast("bigint") % span
    )
