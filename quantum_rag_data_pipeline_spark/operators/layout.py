"""Data-layout operators: multi-dimensional clustering (Z-order) for
write-time organization.

Why it matters at 100 TB: parquet/ORC readers skip row groups whose
min/max statistics exclude the predicate. A table sorted on ONE column
skips beautifully for that column and not at all for others; interleaving
the bits of several columns (Morton / Z-order curve) gives every
interleaved column locality, so selective predicates on ANY of them prune
most row groups. This is the same technique Delta OPTIMIZE ZORDER BY and
Iceberg's zorder sort-order apply at table-maintenance time.

Everything here is integer bit math on JVM expressions — deterministic,
codegen-friendly, and exactly replayable in ANSI SQL (the corpus query's
oracle recomputes the interleaving bit-by-bit in DuckDB).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_bucket(c: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Rank-space quantization: map value into [0, 2^bits) by linear
    position between the column's min and max (both inclusive). Constant
    range degenerates to bucket 0."""
    span = hi - lo
    n = F.lit((1 << bits) - 1)
    return F.when(span <= 0, F.lit(0)).otherwise(
        F.least(((c - lo) * (n + 1) / (span + 1)).cast("long"), n)
    )


def interleave_bits(a: Column, b: Column, bits: int) -> Column:
    """Morton-interleave two ``bits``-wide bucket ids into one long:
    result bit 2i = a's bit i, bit 2i+1 = b's bit i. Plain shift/mask
    expressions — whole-stage codegen, no UDF."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a.cast("long"), i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b.cast("long"), i).bitwiseAND(F.lit(1))
        out = out.bitwiseOR(F.shiftleft(abit, 2 * i)).bitwiseOR(
            F.shiftleft(bbit, 2 * i + 1)
        )
    return out


def zorder_key(
    df: DataFrame, col_a: str, col_b: str, bits: int = 8
) -> DataFrame:
    """Append ``z_key``: the Morton code of the two columns' rank-space
    buckets. The min/max normalization constants come from a one-row
    aggregate cross-joined in (broadcast), so the whole computation is a
    single scan + map — no shuffle until the caller sorts/writes."""
    stats = df.agg(
        F.min(col_a).alias("_alo"), F.max(col_a).alias("_ahi"),
        F.min(col_b).alias("_blo"), F.max(col_b).alias("_bhi"),
    )
    with_stats = df.crossJoin(F.broadcast(stats))
    za = _to_bucket(F.col(col_a), F.col("_alo"), F.col("_ahi"), bits)
    zb = _to_bucket(F.col(col_b), F.col("_blo"), F.col("_bhi"), bits)
    return with_stats.withColumn("z_key", interleave_bits(za, zb, bits)).drop(
        "_alo", "_ahi", "_blo", "_bhi"
    )


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    part_col: str = "part_key",
    file_col: str = "file_id",
    size_col: str = "size_bytes",
) -> DataFrame:
    """Small-file compaction planner (the Delta ``OPTIMIZE`` / Iceberg
    ``rewrite_data_files`` bin-packing step, planned declaratively).

    Why it matters at 100 TB: streaming ingest and per-partition writes
    leave thousands of KB-scale files per partition; every one costs a
    NameNode/SBI listing round-trip and a task-scheduling slot. The
    standard fix groups small files into ~target-size rewrite bins.

    This is SEQUENTIAL FILL packing — files in deterministic (partition,
    file_id) order, running-total cumsum, bin = floor(exclusive-cumsum /
    target) — rather than first-fit-decreasing: the plan is a pure
    window expression (one shuffle on the partition key), deterministic
    under any input partitioning, and exactly SQL-replayable, at the
    cost of at most 2x optimal bin count (each bin except the last is
    at least half full whenever files are smaller than target).
    Oversized files naturally land in their own bin.

    Returns (part_key, file_id, size_bytes, bin_id, bin_bytes, bin_files).
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy(part_col).orderBy(file_col)
    cum_excl = F.coalesce(
        F.sum(size_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("long"),
    )
    binned = files.withColumn(
        "bin_id", F.floor(cum_excl / F.lit(target_bytes)).cast("bigint")
    )
    wb = Window.partitionBy(part_col, "bin_id")
    return binned.select(
        part_col,
        file_col,
        size_col,
        "bin_id",
        F.sum(size_col).over(wb).cast("bigint").alias("bin_bytes"),
        F.count(F.lit(1)).over(wb).cast("bigint").alias("bin_files"),
    )


def zone_map_stats(
    df: DataFrame,
    part_col: Column | str,
    stat_cols: list[str],
) -> DataFrame:
    """Zone maps: per-partition min/max per column — the file/row-group
    statistics a parquet footer carries, computed as a table so pruning
    can be REASONED about (which partitions would a predicate skip?
    what selectivity does the layout buy?). One partial-aggregable
    groupBy; shuffle volume is n_partitions x 2 values per column.

    Returns (zone, <c>_min, <c>_max ... for each stat col, n_rows).
    """
    aggs = []
    for c in stat_cols:
        aggs.append(F.min(c).alias(f"{c}_min"))
        aggs.append(F.max(c).alias(f"{c}_max"))
    aggs.append(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
    zone = part_col if isinstance(part_col, Column) else F.col(part_col)
    return df.groupBy(zone.alias("zone")).agg(*aggs)


def zone_pruning_report(
    zones: DataFrame, col: str, lo, hi
) -> DataFrame:
    """Given zone maps, report which zones a ``col BETWEEN lo AND hi``
    scan must read: a zone survives iff [min,max] overlaps [lo,hi] —
    exactly the skip test a reader applies per row group. Emits per-zone
    ``scanned`` plus rows_scanned/rows_skipped so layout quality is a
    number, not a feeling."""
    overlaps = (F.col(f"{col}_max") >= F.lit(lo)) & (F.col(f"{col}_min") <= F.lit(hi))
    return zones.select(
        "zone",
        f"{col}_min",
        f"{col}_max",
        "n_rows",
        overlaps.alias("scanned"),
    )


def write_zordered(
    df: DataFrame, path: str, col_a: str, col_b: str,
    bits: int = 8, n_files: int = 8,
) -> None:
    """Write parquet clustered on the Z-curve: range-partition by z_key
    (so file k holds a contiguous curve segment) and sort within
    partitions (so row groups inside a file are tight too). Readers then
    prune files AND row groups for predicates on either column."""
    keyed = zorder_key(df, col_a, col_b, bits)
    (
        keyed.repartitionByRange(n_files, "z_key")
        .sortWithinPartitions("z_key")
        .write.mode("overwrite")
        .parquet(path)
    )
