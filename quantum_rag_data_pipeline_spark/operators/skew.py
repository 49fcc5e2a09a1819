"""Skew-handling operators.

AQE's skew-join splitting (on by default in session.py) covers most
cases; these are the explicit patterns for the two places AQE can't help:

- ``salted_count_distinct`` — exact COUNT(DISTINCT v) per key without a
  giant per-key distinct state: salt by hash(value) % B so each distinct
  value lands in exactly ONE (key, salt) bucket; per-bucket distinct
  counts then SUM to the exact total. Turns one hot key's state into B
  independent partial states.
- ``salted_join`` — fact⋈dim equi-join where a few fact keys dominate:
  fact rows get a deterministic salt from their primary key, the dim side
  is replicated across all B salts, and the join key becomes (key, salt)
  — one hot key spreads over B tasks. Use when the dim is too big to
  broadcast but small enough to replicate B×.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    buckets: int = 16,
    alias: str | None = None,
) -> DataFrame:
    """Exact distinct count per key, skew-safe: hash-partition the VALUE
    space into ``buckets``; distinct is computed per (key, bucket) and
    the bucket counts sum exactly (a value never spans buckets)."""
    alias = alias or f"n_distinct_{value_col}"
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets)).alias("_salt")
    per_bucket = (
        df.select(*key_cols, F.col(value_col), salt)
        .groupBy(*key_cols, "_salt")
        .agg(F.countDistinct(value_col).alias("_partial"))
    )
    return per_bucket.groupBy(*key_cols).agg(F.sum("_partial").alias(alias))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_src_cols: list[str],
    buckets: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skewed fact⋈dim equi-join: fact salted deterministically from
    ``salt_src_cols`` (its own primary key — stable across retries), dim
    replicated over all salts; join on (key, salt). Result is identical
    to the plain join; the hot key's rows spread across ``buckets`` tasks."""
    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in salt_src_cols]), F.lit(buckets))
    )
    replicated_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    out = salted_fact.join(replicated_dim, [key, "_salt"], how)
    return out.drop("_salt")
