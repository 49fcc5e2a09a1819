"""drain_available_now contract pins (round 7): state-partition scoping
and conf restoration."""


def test_drain_scopes_state_partitions_and_restores(spark, sf_dir):
    """Round-7 perf: drain_available_now scopes shuffle partitions to a
    state-sized value around query start and ALWAYS restores the
    session conf (finally), even when the stream fails to start."""
    import pytest

    from quantum_rag_data_pipeline_spark.sources.registry import load_table
    from quantum_rag_data_pipeline_spark.streaming.daily_stream import (
        drain_available_now,
    )

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    # failure path: a batch frame has no writeStream -> AttributeError,
    # and the conf must still be restored
    with pytest.raises(Exception):
        drain_available_now(
            load_table(spark, "events", sf_dir).limit(0).drop("props"),
            "not_a_stream",
        )
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev


def test_drain_previous_frame_survives_next_same_name_drain(spark, sf_dir):
    """Round-10: the drain returns a LAZY parquet read; numbered run
    dirs must keep the newest previous run's files alive so a frame
    returned by drain N stays collectible across drain N+1 (the old
    single-dir rmtree invalidated it)."""
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    df1 = QUERIES["streaming_sessionization"](spark, sf_dir)
    n1 = df1.count()
    QUERIES["streaming_sessionization"](spark, sf_dir)  # same query_name
    assert df1.count() == n1  # df1's files must not have been reclaimed


def _events_stream(spark, sf_dir, name):
    """Tiny watermarked daily-count stream over the events table, built
    on its own landing dir so tests don't share file-source state."""
    import os

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, TimestampNTZType

    from quantum_rag_data_pipeline_spark.paths import landing_root

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    landing = f"{landing_root()}/{os.path.basename(os.path.normpath(sf_dir))}/{name}"
    os.makedirs(landing, exist_ok=True)
    link = f"{landing}/events.parquet"
    if not os.path.exists(link):
        os.symlink(f"{sf_dir}/events.parquet", link)
    stream = spark.readStream.schema(schema).parquet(landing)
    if isinstance(stream.schema["ts"].dataType, LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(stream.schema["ts"].dataType, TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    # 2-day watermark (not "longer than the data span"): append mode only
    # EMITS windows the watermark has closed, so a span-dominating
    # watermark would make every append-mode drain legitimately empty.
    return (
        stream.withWatermark("ts", "2 days")
        .groupBy(F.window("ts", "1 day").alias("w"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def test_drain_blocks_matches_parquet_sink(spark, sf_dir):
    """Round-12: the opt-in blocks sink (localCheckpoint capture, for
    bounded-result drains) must return exactly the rows the default
    parquet sink returns, for both complete and append output modes."""
    from quantum_rag_data_pipeline_spark.streaming.daily_stream import (
        drain_available_now,
    )

    from collections import Counter

    for mode in ("complete", "append"):
        # multiset compare, not set: a double-appended batch in the
        # blocks accumulation (the class of bug that path could have)
        # produces duplicate rows a set compare would collapse away
        rows_b = Counter(
            tuple(r)
            for r in drain_available_now(
                _events_stream(spark, sf_dir, f"ev_sinkpar_{mode}"),
                f"sinkpar_b_{mode}", output_mode=mode, sink="blocks",
            ).collect()
        )
        rows_p = Counter(
            tuple(r)
            for r in drain_available_now(
                _events_stream(spark, sf_dir, f"ev_sinkpar_{mode}"),
                f"sinkpar_p_{mode}", output_mode=mode, sink="parquet",
            ).collect()
        )
        assert rows_b == rows_p and rows_b


def test_drain_blocks_frame_survives_next_same_name_drain(spark, sf_dir):
    """Round-12: blocks-sink survivorship twin of the parquet run-dir
    pin — a frame returned by drain N must stay collectible across a
    same-name drain N+1 (its checkpointed blocks are only unpersisted
    within their own drain call, never by a later one)."""
    from quantum_rag_data_pipeline_spark.streaming.daily_stream import (
        drain_available_now,
    )

    df1 = drain_available_now(
        _events_stream(spark, sf_dir, "ev_surv"), "blocks_surv", sink="blocks")
    n1 = df1.count()
    drain_available_now(
        _events_stream(spark, sf_dir, "ev_surv"), "blocks_surv", sink="blocks")
    assert n1 > 0 and df1.count() == n1


def test_concurrent_drains_use_disjoint_app_dirs(spark, sf_dir):
    """Round-11 advisor fix, round-12 regression pin: parquet drain run
    dirs are namespaced by applicationId, so two live sessions draining
    the SAME query_name must neither interleave run numbering nor
    reclaim each other's files. Simulates the second application by
    planting a foreign app's run dir (a drain output copied under a
    fake applicationId) and asserting a real drain leaves it intact
    and readable."""
    import os
    import shutil

    from quantum_rag_data_pipeline_spark.paths import artifact_root
    from quantum_rag_data_pipeline_spark.streaming.daily_stream import (
        drain_available_now,
    )

    app = spark.sparkContext.applicationId
    qname = "concurrent_drain_pin"
    df1 = drain_available_now(
        _events_stream(spark, sf_dir, "ev_conc"), qname, sink="parquet")
    n = df1.count()
    my_base = os.path.join(artifact_root(), "stream_drain", app, qname)
    my_runs = sorted(d for d in os.listdir(my_base) if d.isdigit())
    assert my_runs  # run dirs live under THIS app's namespace

    # plant the "other session": same query_name, different applicationId
    other_base = os.path.join(
        artifact_root(), "stream_drain", "app-fake-concurrent-0001", qname)
    shutil.rmtree(other_base, ignore_errors=True)
    os.makedirs(other_base)
    shutil.copytree(os.path.join(my_base, my_runs[-1]),
                    os.path.join(other_base, "0"))

    # two more same-name drains in THIS session: survivor logic may
    # reclaim OUR old runs but must never touch the other app's tree
    drain_available_now(
        _events_stream(spark, sf_dir, "ev_conc"), qname, sink="parquet")
    drain_available_now(
        _events_stream(spark, sf_dir, "ev_conc"), qname, sink="parquet")
    assert os.path.isdir(os.path.join(other_base, "0"))
    assert spark.read.parquet(os.path.join(other_base, "0")).count() == n
    shutil.rmtree(os.path.dirname(other_base), ignore_errors=True)


def test_knn_mutual_single_candidates_stage(spark, sf_dir):
    """Round-12 plan-shape pin: knn_graph_mutual must carry exactly ONE
    FlatMapGroupsInPandas candidates stage. The round-11 in-pass scoring
    change silently broke exchange reuse under the query's old reversed
    self-join — the executed plan ran the whole block-pair BLAS pass
    TWICE (the round's single 2x bench-gate violation) — and the window
    rewrite fixed it structurally. A second candidates stage reappearing
    means some future edit reintroduced a multi-reference shape."""
    from quantum_rag_data_pipeline_spark.queries import QUERIES

    df = QUERIES["knn_graph_mutual"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FlatMapGroupsInPandas") == 1


def test_block_accumulator_retry_replaces_epoch():
    """Round-12 advisor item: foreachBatch is at-least-once, so a
    micro-batch RETRY re-invokes the sink with the same epoch id. The
    blocks accumulator must key held batches by epoch — a retried epoch
    REPLACES its earlier (possibly partial) capture instead of
    double-appending it. Pure-Python test via a localCheckpoint fake:
    the accumulator's only DataFrame contact is .localCheckpoint()."""
    from quantum_rag_data_pipeline_spark.streaming.daily_stream import (
        _BlockAccumulator,
    )

    class FakeBatch:
        def __init__(self, tag):
            self.tag = tag

        def localCheckpoint(self, eager=True):
            assert eager
            return self

    # append mode: epochs accumulate, a retry replaces in place
    acc = _BlockAccumulator("append")
    acc(FakeBatch("e0"), 0)
    acc(FakeBatch("e1-try1"), 1)
    acc(FakeBatch("e1-try2"), 1)  # the retry
    acc(FakeBatch("e2"), 2)
    assert [b.tag for b in acc.drained()] == ["e0", "e1-try2", "e2"]

    # complete mode: each batch rewrites the full result; only the last
    # epoch survives, and a retry of it still yields exactly one batch
    acc = _BlockAccumulator("complete")
    acc(FakeBatch("e0"), 0)
    acc(FakeBatch("e1-try1"), 1)
    acc(FakeBatch("e1-try2"), 1)
    assert [b.tag for b in acc.drained()] == ["e1-try2"]
