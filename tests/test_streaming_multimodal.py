"""Streaming-variant and multimodal-plumbing tests."""

import os

from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from quantum_rag_data_pipeline_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synth_media_table,
)
from quantum_rag_data_pipeline_spark.sources.registry import load_table
from quantum_rag_data_pipeline_spark.streaming.daily_stream import run_stream_to_upsert


def _stage_landing(sf_dir, tmp_path):
    landing = str(tmp_path / "landing")
    os.makedirs(landing, exist_ok=True)
    os.symlink(f"{sf_dir}/events.parquet", f"{landing}/events.parquet")
    return landing


def test_stream_upsert_matches_batch_and_is_idempotent(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    nanos = isinstance(schema["ts"].dataType, LongType)
    landing = _stage_landing(sf_dir, tmp_path)
    sink = str(tmp_path / "sink")

    run_stream_to_upsert(spark, landing, schema, sink, str(tmp_path / "ckpt1"),
                         ts_from_nanos_col="ts" if nanos else None)
    got = {r["window_start"]: (r["n_events"], r["sum_value"])
           for r in spark.read.parquet(sink).collect()}

    ev = load_table(spark, "events", sf_dir)
    batch = (
        ev.groupBy(F.window("ts", "2 days", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum(F.col("value").cast("decimal(30,8)")).cast("double").alias("s"))
        .select(F.col("w.start").alias("ws"), "n", "s")
    )
    want = {r["ws"]: (r["n"], r["s"]) for r in batch.collect()}
    assert got == want

    # re-run with a FRESH checkpoint (simulated redelivery) → same sink state
    run_stream_to_upsert(spark, landing, schema, sink, str(tmp_path / "ckpt2"),
                         ts_from_nanos_col="ts" if nanos else None)
    again = {r["window_start"]: (r["n_events"], r["sum_value"])
             for r in spark.read.parquet(sink).collect()}
    assert again == got  # keyed upsert → no duplicates


def test_multimodal_roundtrip(spark, sf_dir):
    docs = load_table(spark, "documents", sf_dir)
    media = synth_media_table(docs)
    n_docs = docs.count()
    assert media.count() == n_docs

    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == n_docs
    assert all(r["checksum"] is not None for r in rows)  # every header parses
    kinds = {r["kind"] for r in rows}
    assert kinds == {"image", "audio", "video"}

    resized = resize_images(media, max_side=64).collect()
    assert resized and all(max(r["width"], r["height"]) <= 64 for r in resized)

    frames = sample_frames(media, every_k=8)
    per_media = frames.groupBy("media_id").count().collect()
    assert per_media and all(r["count"] >= 1 for r in per_media)
    # deterministic across runs
    feats2 = {r["media_id"]: r["checksum"] for r in extract_features(media).collect()}
    feats1 = {r["media_id"]: r["checksum"] for r in rows}
    assert feats1 == feats2
