"""Spark-4 surface tests: custom Python DataSource + applyInPandasWithState."""

import os

from pyspark.sql import functions as F


def test_ercot_envelope_datasource(spark):
    from quantum_rag_data_pipeline_spark.sources.ercot_datasource import register

    register(spark)
    df = (
        spark.read.format("ercot_envelope")
        .option("endpoint", "np3-910-er/2d_agg_gen_summary")
        .option("date_from", "2025-05-01")
        .option("date_to", "2025-05-04")
        .load()
    )
    # 3 day-windows → 3 input partitions, executor-side fetch
    assert df.rdd.getNumPartitions() == 3
    days = {r["date_from"] for r in df.select("date_from").distinct().collect()}
    assert days == {"2025-05-01", "2025-05-02", "2025-05-03"}
    # long form feeds the same permissive-cast aggregation as the driver path
    agg = (
        df.filter(F.col("field") == "sumBasePointWGR")
        .select(F.col("value").try_cast("double").alias("v"), "date_from")
        .groupBy("date_from")
        .agg(F.sum("v").alias("wind_sum"))
    )
    rows = agg.collect()
    assert len(rows) == 3 and all(r["wind_sum"] > 0 for r in rows)
    # deterministic across reads
    again = spark.read.format("ercot_envelope") \
        .option("endpoint", "np3-910-er/2d_agg_gen_summary") \
        .option("date_from", "2025-05-01").option("date_to", "2025-05-04").load()
    key = lambda t: (t[0], t[1], t[2] if t[2] is not None else "")
    assert sorted(map(tuple, df.collect()), key=key) == sorted(map(tuple, again.collect()), key=key)


def test_streaming_dedup_by_key(spark, tmp_path):
    from quantum_rag_data_pipeline_spark.streaming.stateful import streaming_dedup_by_key

    src = str(tmp_path / "src")
    os.makedirs(src)
    # two files with overlapping keys → duplicates across micro-batches
    spark.createDataFrame(
        [("k1", 1), ("k2", 2), ("k1", 3)], "k string, v int"
    ).coalesce(1).write.parquet(f"{src}/f1")
    spark.createDataFrame(
        [("k2", 4), ("k3", 5), ("k1", 6)], "k string, v int"
    ).coalesce(1).write.parquet(f"{src}/f2")

    stream = (
        spark.readStream.schema("k string, v int")
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{src}/*")
    )
    deduped = streaming_dedup_by_key(stream, "k", "k string, v int")
    q = (
        deduped.writeStream.format("memory").queryName("dedup_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    out = spark.table("dedup_out").collect()
    keys = [r["k"] for r in out]
    assert sorted(keys) == ["k1", "k2", "k3"]  # exactly one row per key
