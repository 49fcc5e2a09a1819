"""Round-14 A/B: dedup candidate joins keyed on xxhash64(shingle) longs
instead of shingle strings (guide §2.3 — shuffle fewer/narrower bytes).

Exactness: both operators verify every candidate against the FULL
shingle arrays (exact jaccard / containment at the true threshold), so a
hash-collision candidate is either a real qualifying pair (which the
string-keyed prefix join finds too — PPJoin guarantees qualifying pairs
share a true prefix shingle, and equal strings hash equal) or it fails
verification and is dropped. The verified outputs are therefore
set-identical by construction; this tool pins that with a row-level
compare before timing.

    python tools/r14/ab_hashkey.py            # equality check + min-of-N A/B

POINT-IN-TIME RECORD (round-15 note, per the r14 advisor): the 'str'
baseline arms call the PRODUCTION operators, which are hash-keyed since
the r14 merge — re-running this tool today compares hashed vs hashed
(the equality pin is tautological and the timing A/B no longer measures
the string-keyed baseline). The recorded r14 numbers are valid at the
pre-merge commit (6f71228^); to re-measure, inline a string-keyed
variant for the baseline arms.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from quantum_rag_data_pipeline_spark.operators import dedup as dedup_ops  # noqa: E402
from quantum_rag_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def ngram_jaccard_pairs_hashed(
    df: DataFrame, text_col="text", id_col="doc_id", n=3,
    threshold=0.5, max_df=None,
) -> DataFrame:
    """ngram_jaccard_pairs with the candidate join keyed on
    xxhash64(shingle) — everything else byte-for-byte the operator."""
    raw = dedup_ops.tokenized(df, text_col, id_col).select(
        F.col(id_col), F.explode(dedup_ops.shingles_of_tokens(n)).alias("shingle")
    )
    idx = raw.withColumn(
        "df_count", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    if max_df is not None:
        idx = idx.filter(F.col("df_count") <= max_df)
    packed = (
        idx.groupBy(id_col)
        .agg(F.sort_array(F.collect_list(F.struct("df_count", "shingle"))).alias("_ord"))
        .select(
            F.col(id_col),
            F.transform("_ord", lambda s: s["shingle"]).alias("sh"),
            F.size("_ord").alias("sz"),
        )
        .cache()
    )
    plen = F.col("sz") - F.ceil(F.col("sz") * threshold - 1e-9) + 1
    prefix = packed.select(
        F.col(id_col),
        F.explode(F.slice("sh", 1, plen.cast("int"))).alias("shingle"),
    ).select(F.col(id_col), F.xxhash64("shingle").alias("_shk"))
    cand = (
        prefix.alias("x")
        .join(prefix.alias("y"), "_shk")
        .filter(F.col(f"x.{id_col}") < F.col(f"y.{id_col}"))
        .select(F.col(f"x.{id_col}").alias("id_a"), F.col(f"y.{id_col}").alias("id_b"))
        .distinct()
    )
    sets_ = packed.select(F.col(id_col), "sh")
    return (
        cand.join(sets_.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")), "id_a")
        .join(sets_.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")), "id_b")
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("jaccard", F.col("inter") / (F.size("sh_a") + F.size("sh_b") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def containment_pairs(spark, sf_dir, hashed: bool) -> DataFrame:
    """dedup_shingle_containment's body, join key switchable."""
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    if not hashed:
        return QUERIES["dedup_shingle_containment"](spark, sf_dir)
    from quantum_rag_data_pipeline_spark.queries.curation_clustering import _t

    d = _t(spark, sf_dir, "documents")
    raw = dedup_ops.tokenized(d, "text", "doc_id").select(
        F.col("doc_id"), F.explode(dedup_ops.shingles_of_tokens(5)).alias("shingle")
    )
    idx = raw.withColumn(
        "df_count", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    ).filter(F.col("df_count") <= 64)
    packed = (
        idx.groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df_count", "shingle"))).alias("_ord"))
        .select(
            "doc_id",
            F.transform("_ord", lambda s: s["shingle"]).alias("sh"),
            F.size("_ord").alias("sz"),
        )
        .cache()
    )
    plen = F.col("sz") - F.ceil(F.col("sz") * 0.8 - 1e-9) + 1
    prefix = packed.select(
        "doc_id", F.explode(F.slice("sh", 1, plen.cast("int"))).alias("shingle")
    ).select("doc_id", F.xxhash64("shingle").alias("_shk"))
    full = packed.select(
        F.col("doc_id").alias("fid"), F.explode("sh").alias("shingle")
    ).select("fid", F.xxhash64("shingle").alias("_shk"))
    cand = (
        prefix.join(full, "_shk")
        .filter(F.col("doc_id") != F.col("fid"))
        .select(
            F.least("doc_id", "fid").alias("id_a"),
            F.greatest("doc_id", "fid").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sets_ = packed.select("doc_id", "sh", "sz")
    return (
        cand.join(
            sets_.select(F.col("doc_id").alias("id_a"),
                         F.col("sh").alias("sh_a"), F.col("sz").alias("sz_a")),
            "id_a",
        )
        .join(
            sets_.select(F.col("doc_id").alias("id_b"),
                         F.col("sh").alias("sh_b"), F.col("sz").alias("sz_b")),
            "id_b",
        )
        .withColumn("inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("containment", F.col("inter") / F.least("sz_a", "sz_b"))
        .filter(F.col("containment") >= 0.8)
        .select("id_a", "id_b", F.round("containment", 6).alias("containment"))
    )


def _rows(df: DataFrame):
    return sorted(tuple(r) for r in df.collect())


def main() -> int:
    runs = int(os.environ.get("AB_RUNS", "4"))
    spark = get_spark("ab-hashkey")
    spark.sparkContext.setLogLevel("ERROR")
    from quantum_rag_data_pipeline_spark.queries import QUERIES
    from quantum_rag_data_pipeline_spark.queries.curation_clustering import _t

    d = _t(spark, SF_DIR, "documents")

    # ---- equality pins (collect both arms, row-level compare) ----------
    a = _rows(QUERIES["dedup_ngram_jaccard"](spark, SF_DIR))
    spark.catalog.clearCache()
    b = _rows(ngram_jaccard_pairs_hashed(d, n=5, threshold=0.35, max_df=64))
    spark.catalog.clearCache()
    assert a == b, f"ngram_jaccard mismatch: {len(a)} vs {len(b)} rows"
    print(f"equality ok: dedup_ngram_jaccard ({len(a)} rows)")
    a = _rows(containment_pairs(spark, SF_DIR, hashed=False))
    spark.catalog.clearCache()
    b = _rows(containment_pairs(spark, SF_DIR, hashed=True))
    spark.catalog.clearCache()
    assert a == b, f"containment mismatch: {len(a)} vs {len(b)} rows"
    print(f"equality ok: dedup_shingle_containment ({len(a)} rows)")

    # ---- alternating min-of-N timing -----------------------------------
    def timed(build):
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.catalog.clearCache()
        return dt

    arms = {
        "ngram_jaccard str": lambda: QUERIES["dedup_ngram_jaccard"](spark, SF_DIR),
        "ngram_jaccard hash": lambda: ngram_jaccard_pairs_hashed(
            d, n=5, threshold=0.35, max_df=64),
        "containment str": lambda: containment_pairs(spark, SF_DIR, False),
        "containment hash": lambda: containment_pairs(spark, SF_DIR, True),
    }
    times = {k: [] for k in arms}
    for _ in range(runs):
        for k, build in arms.items():
            times[k].append(timed(build))
    for k, ts in times.items():
        ts = sorted(ts)
        print(f"{k:22s} min {ts[0]:.3f}  med {ts[len(ts)//2]:.3f}  all {[round(t,3) for t in ts]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
