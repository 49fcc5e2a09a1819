"""Write-side layout optimizations: hive-partitioned and bucketed tables.

At 100 TB the cheapest shuffle is the one you never run: writing fact
tables bucketed by their join key lets every later equi-join/groupBy on
that key run shuffle-free (Spark reads co-located buckets). Partitioning
by a low-cardinality column (e.g. date) gives partition pruning on scan.

These are deploy-time choices, so they live in a sink module, not in the
operators: the same queries run unchanged, just faster, when the
warehouse uses these layouts. ``test_bucketed_join_has_no_shuffle``
proves the plan effect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, partition_cols: list[str],
                      mode: str = "overwrite") -> None:
    """date=/key= directory layout → Catalyst partition pruning: a filter
    on the partition column skips whole directories at scan planning."""
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table (saveAsTable — bucketing metadata needs the
    catalog). Joins/aggregations on ``bucket_col`` between tables with the
    same bucket count read co-located and skip the exchange."""
    w = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on)
