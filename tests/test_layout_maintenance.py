"""Unit tests for the round-4 table-maintenance operators
(layout.compaction_plan / zone_map_stats / zone_pruning_report)."""

from __future__ import annotations

from pyspark.sql import functions as F

from quantum_rag_data_pipeline_spark.operators.layout import (
    compaction_plan,
    zone_map_stats,
    zone_pruning_report,
)


def test_compaction_sequential_fill_semantics(spark):
    files = spark.createDataFrame(
        [("p", i, s) for i, s in enumerate([400, 400, 400, 5000, 100, 100])],
        "part_key string, file_id long, size_bytes long",
    )
    plan = compaction_plan(files, 1000).orderBy("file_id").collect()
    bins = {r.file_id: r.bin_id for r in plan}
    # files 0,1 fill bin 0 (cumsum_excl 0,400 < 1000); file 2 starts at 800 -> still bin 0
    assert bins[0] == bins[1] == bins[2] == 0
    # the oversized file lands alone in its own bin (cumsum 1200 // 1000 = 1)
    assert bins[3] == 1
    big_bin = [r for r in plan if r.file_id == 3][0]
    assert big_bin.bin_files == 1 and big_bin.bin_bytes == 5000
    # the small tail starts a fresh bin after the big file
    assert bins[4] == bins[5] and bins[4] > bins[3]
    # bin totals are consistent per bin
    for r in plan:
        members = [x for x in plan if x.bin_id == r.bin_id]
        assert r.bin_bytes == sum(x.size_bytes for x in members)
        assert r.bin_files == len(members)


def test_compaction_deterministic_under_repartition(spark):
    files = spark.createDataFrame(
        [("a", i, 250 + (i * 37) % 500) for i in range(40)]
        + [("b", i, 100 + (i * 11) % 900) for i in range(40)],
        "part_key string, file_id long, size_bytes long",
    )
    p1 = compaction_plan(files, 1000).orderBy("part_key", "file_id").collect()
    p2 = (
        compaction_plan(files.repartition(13), 1000)
        .orderBy("part_key", "file_id")
        .collect()
    )
    assert p1 == p2


def test_zone_maps_and_pruning(spark):
    rows = [(m, m * 100 + i) for m in range(5) for i in range(10)]
    df = spark.createDataFrame(rows, "zone_key int, v long")
    zones = zone_map_stats(df, F.col("zone_key").cast("string"), ["v"])
    got = {r.zone: (r.v_min, r.v_max, r.n_rows) for r in zones.collect()}
    assert got["2"] == (200, 209, 10)
    # predicate v BETWEEN 150 AND 305: zone 1 tops out at 109 (pruned),
    # zones 2 (200-209) and 3 (300-309, min 300 <= 305) overlap
    report = zone_pruning_report(zones, "v", 150, 305)
    scanned = {r.zone for r in report.collect() if r.scanned}
    assert scanned == {"2", "3"}
