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
