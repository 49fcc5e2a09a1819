"""End-to-end RAG-ingestion plan: gate → dedup → embed → store → serve."""

from pyspark.sql import functions as F

from quantum_rag_data_pipeline_spark.functions.embedding import fake_encode_batch
from quantum_rag_data_pipeline_spark.plans.rag_ingest import ingest, serve_topk
from quantum_rag_data_pipeline_spark.sources.registry import load_table


def test_rag_ingest_end_to_end(spark, sf_dir, tmp_path):
    store = str(tmp_path / "vector_store")
    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    # inject exact + near duplicates (derived from the corpus itself)
    dup_exact = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    corpus = docs.unionByName(dup_exact)

    tally = ingest(spark, corpus, store, embed_dim=32)
    assert tally["raw"] == corpus.count()
    assert tally["after_quality"] <= tally["raw"]
    # every injected exact duplicate must be removed
    assert tally["after_exact_dedup"] <= tally["after_quality"] - dup_exact.count() + 1
    assert tally["after_near_dedup"] <= tally["after_exact_dedup"]

    stored = spark.read.parquet(store)
    assert stored.count() == tally["after_near_dedup"]
    assert len(stored.first()["embedding"]) == 32

    # idempotent re-ingest: same corpus → same store
    tally2 = ingest(spark, corpus, store, embed_dim=32)
    assert tally2 == tally
    assert spark.read.parquet(store).count() == tally["after_near_dedup"]

    # retrieval: querying with a stored doc's own embedding returns it first
    # (re-read: the upsert swapped the files under the old DataFrame's plan)
    stored = spark.read.parquet(store)
    probe_ids = [r["doc_id"] for r in stored.select("doc_id").limit(3).collect()]
    q = stored.filter(F.col("doc_id").isin(probe_ids)).select(
        F.col("doc_id").alias("query_id"), "embedding"
    )
    top = serve_topk(spark, store, q, k=5, dim=32)
    best = {r["query_id"]: r["vec_id"] for r in top.collect() if r["cos_sim"] >= 0.999999}
    assert all(best[i] == i for i in probe_ids)
