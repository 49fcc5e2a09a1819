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
