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


def test_zorder_write_disjoint_curve_segments(spark, sf_dir, tmp_path):
    """write_zordered range-partitions by z_key: every output file must
    hold a contiguous, pairwise-disjoint segment of the Z-curve (that
    disjointness is what makes file-level min/max pruning effective for
    predicates on either interleaved column)."""
    from quantum_rag_data_pipeline_spark.operators.layout import (
        interleave_bits, write_zordered, zorder_key,
    )
    from quantum_rag_data_pipeline_spark.sources.registry import load_table
    import pyspark.sql.functions as F

    o = load_table(spark, "orders", sf_dir)
    path = str(tmp_path / "zordered")
    write_zordered(o, path, "o_custkey", "o_totalprice", bits=8, n_files=4)

    back = spark.read.parquet(path)
    per_file = (
        back.select("z_key", F.input_file_name().alias("f"))
        .groupBy("f").agg(F.min("z_key").alias("lo"), F.max("z_key").alias("hi"))
        .collect()
    )
    ranges = sorted((r["lo"], r["hi"]) for r in per_file)
    assert len(ranges) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 <= lo2, f"overlapping curve segments {(lo1, hi1)} {(lo2, hi2)}"


def test_interleave_bits_matches_python(spark):
    """Morton interleave expression == reference Python bit interleave."""
    import pyspark.sql.functions as F
    from quantum_rag_data_pipeline_spark.operators.layout import interleave_bits

    rows = [(a, b) for a in (0, 1, 5, 170, 255) for b in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.select("a", "b", interleave_bits(F.col("a"), F.col("b"), 8).alias("z")).collect()
    }

    def ref(a, b):
        z = 0
        for i in range(8):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(a, b): ref(a, b) for a, b in rows}
