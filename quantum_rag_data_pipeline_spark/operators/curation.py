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
