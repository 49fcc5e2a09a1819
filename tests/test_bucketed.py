"""Plan-shape tests: bucketed joins skip the shuffle; partitioned writes
prune at scan time."""

from pyspark.sql import functions as F

from quantum_rag_data_pipeline_spark.sinks.bucketed import (
    bucketed_join,
    write_bucketed_table,
    write_partitioned,
)
from quantum_rag_data_pipeline_spark.sources.registry import load_table


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    # warehouse dir is a static conf — tables land in ./spark-warehouse
    # and are dropped (catalog + location) at the end.
    import shutil

    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = load_table(spark, "orders", sf_dir)
    lineitem = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    write_bucketed_table(orders, "orders_b", "o_orderkey", 8, mode="overwrite")
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", 8,
        mode="overwrite",
    )
    # at test scale Spark would broadcast (also shuffle-free but not the
    # point); disable it to show bucketing itself removes the exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located buckets: no shuffle
        expected = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    for t in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    path = str(tmp_path / "events_by_day")
    ev = load_table(spark, "events", sf_dir).withColumn(
        "day", F.date_format("ts", "yyyy-MM-dd")
    )
    write_partitioned(ev, path, ["day"])
    one_day = spark.read.parquet(path).filter(F.col("day") == "2024-01-05")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan or "day#" in plan
    n_total = ev.count()
    n_day = one_day.count()
    assert 0 < n_day < n_total
