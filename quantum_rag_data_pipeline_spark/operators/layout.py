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
