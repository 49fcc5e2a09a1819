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
