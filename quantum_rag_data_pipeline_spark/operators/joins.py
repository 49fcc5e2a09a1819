"""Joins and pivots (SURVEY.md §2.4, J1–J2).

Scale policy, applied at every call site in this package:
- bounded-cardinality dimensions (region, nation, city lookup) → explicit
  ``broadcast()`` hint, no shuffle of the fact side;
- fact⋈fact equi joins → shuffled hash/sort-merge on the key, skew
  handled by AQE (``spark.sql.adaptive.skewJoin.enabled``);
- the reference's N-way full-outer pandas merge (``weather.py:94-97``) is
  re-expressed as groupBy().pivot() over the LONG format — one shuffle
  total instead of N-1 joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    fact: DataFrame, dim: DataFrame, on: str | list[str] | Column, how: str = "inner"
) -> DataFrame:
    """J2-style enrich join with an explicitly broadcast dimension."""
    return fact.join(F.broadcast(dim), on, how)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    suffix: str = "_matched",
) -> DataFrame:
    """As-of (backward) join: for each left row, the latest right row with
    ``right.ts <= left.ts`` on the same key.

    Union-and-window formulation — the scale-correct plan: ONE shuffle on
    the key (no per-key range cross product, no point-in-interval
    explosion), then a running ``last(..., ignorenulls=True)`` over the
    merged timeline. Right rows sort before left rows at equal timestamps
    so ties match (<=, like DuckDB/pandas ASOF)."""
    from pyspark.sql.window import Window

    l_tagged = left.select(
        F.col(key), F.col(left_ts).alias("_t"), F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in payload_cols],
    )
    r_tagged = right.select(
        F.col(key), F.col(right_ts).alias("_t"), F.lit(0).alias("_is_left"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{f.name}:{f.dataType.simpleString()}" for f in left.schema.fields) + ">"
        ).alias("_lrow"),
        *[F.col(c).alias(f"_r_{c}") for c in payload_cols],
    )
    merged = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in payload_cols:
        merged = merged.withColumn(f"{c}{suffix}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    out_cols = [F.col(f"_lrow.{c}").alias(c) for c in left.columns]
    return merged.filter(F.col("_is_left") == 1).select(
        *out_cols, *[F.col(f"{c}{suffix}") for c in payload_cols]
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower,
    upper,
    how: str = "inner",
) -> DataFrame:
    """Interval join: right rows with ``left.ts + lower <= right.ts <
    left.ts + upper`` on the same key. Equi-join on the key carries the
    shuffle; the range predicate evaluates post-match — at 100 TB add
    coarse time-bucket keys to both sides to bound the per-key fan-out."""
    lts, rts = F.col(f"_l.{left_ts}"), F.col(f"_r.{right_ts}")
    cond = (F.col(f"_l.{key}") == F.col(f"_r.{key}")) & (rts >= lts + lower) & (rts < lts + upper)
    return left.alias("_l").join(right.alias("_r"), cond, how)


def pivot_wide(
    df: DataFrame,
    key_col: str,
    pivot_col: str,
    value_col: str,
    pivot_values: list[str],
    agg: str = "first",
) -> DataFrame:
    """J1: long → wide pivot.

    Passing explicit ``pivot_values`` matters at scale: without them Spark
    runs an extra distinct() job over the full table just to discover the
    column set. One shuffle on ``key_col``; pivot columns are built
    map-side as a pivot-aggregate.
    """
    agg_fn = {"first": F.first, "avg": F.avg, "sum": F.sum, "max": F.max, "min": F.min}[agg]
    return (
        df.groupBy(key_col)
        .pivot(pivot_col, pivot_values)
        .agg(agg_fn(F.col(value_col)))
    )
