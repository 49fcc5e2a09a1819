"""Vector similarity search over an ``array<float>`` embedding column.

Two paths:
- ``brute_force_topk`` — exact cosine top-k. The query side is broadcast
  (queries are always the small side), so the corpus is scanned once with
  NO shuffle of the vectors; per-partition heaps via TakeOrderedAndProject
  / row_number keep memory bounded. This is the correctness baseline and
  is also the right plan whenever |queries| × |corpus| work fits the
  cluster (it parallelizes perfectly).
- ``lsh_bucket_topk`` — approximate: sign-random-projection LSH buckets
  both sides; only same-bucket candidates are scored. At 100 TB this
  turns the cross product into a co-partitioned equi-join on bucket id.
  Probing multiple hash tables recovers recall.

Cosine math is ``zip_with`` + ``aggregate`` fold — sequential, JVM-side,
deterministic (bit-identical across partitionings, which the DuckDB
oracle comparison depends on).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quantum_rag_data_pipeline_spark.operators.windows import top_k_per_group


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x.cast("double") * x.cast("double")),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query. Queries broadcast; corpus never
    shuffled until the final per-query top-k (which moves only k rows per
    query per partition)."""
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qvec"))
    scored = corpus.select(F.col(corpus_id), F.col(vec_col)).crossJoin(F.broadcast(q)).select(
        query_id,
        corpus_id,
        cosine(F.col(vec_col), F.col("_qvec")).alias("cos_sim"),
    )
    return top_k_per_group(
        scored, [query_id], [F.col("cos_sim").desc(), F.col(corpus_id).asc()], k
    ).select(query_id, corpus_id, F.round("cos_sim", 6).alias("cos_sim"))


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    block_col: str | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold).

    ``block_col`` (e.g. an LSH bucket or cluster label) turns the O(n²)
    self-join into a per-block join; None = exact all-pairs (fine for
    dimension-sized corpora, NOT for 100 TB — use lsh buckets there).
    """
    left = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
                     *([F.col(block_col)] if block_col else []))
    right = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"),
                      *([F.col(block_col)] if block_col else []))
    joined = left.join(right, on=[block_col] if block_col else None, how="inner") \
        if block_col else left.crossJoin(right)
    return (
        joined.filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos_sim", cosine(F.col("vec_a"), F.col("vec_b")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def srp_bucket(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: one bit per hyperplane (sign of
    dot(vec, plane)), packed into a long. Planes are fixed literals
    (seeded driver-side) → deterministic, broadcast with the plan."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec_col, p) >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket.bitwiseOR(F.shiftleft(bit, i))
    return bucket


def make_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (numpy, fixed seed)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    corpus_id: str = "vec_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only candidates sharing an SRP bucket with
    the query in ANY of ``n_tables`` hash tables (multi-probe via table
    union). The scale path: corpus is bucketed once (write-time in a real
    deployment), the join is equi on (table, bucket)."""
    tables = []
    for t in range(n_tables):
        planes = make_planes(dim, n_planes, seed + t)
        tables.append((t, planes))

    def bucketed(df: DataFrame, id_alias: str) -> DataFrame:
        parts = [
            df.select(F.col(id_alias), F.col(vec_col),
                      F.lit(t).alias("tbl"), srp_bucket(F.col(vec_col), planes).alias("bucket"))
            for t, planes in tables
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    cb = bucketed(corpus.select(F.col(corpus_id), F.col(vec_col)), corpus_id)
    qb = bucketed(queries.select(F.col(query_id), F.col(vec_col)), query_id) \
        .select(query_id, F.col(vec_col).alias("_qvec"), "tbl", "bucket")
    cand = (
        cb.join(F.broadcast(qb), ["tbl", "bucket"])
        .select(query_id, corpus_id, F.col(vec_col), F.col("_qvec"))
        .dropDuplicates([query_id, corpus_id])
    )
    scored = cand.select(query_id, corpus_id, cosine(F.col(vec_col), F.col("_qvec")).alias("cos_sim"))
    return top_k_per_group(
        scored, [query_id], [F.col("cos_sim").desc(), F.col(corpus_id).asc()], k
    ).select(query_id, corpus_id, F.round("cos_sim", 6).alias("cos_sim"))
