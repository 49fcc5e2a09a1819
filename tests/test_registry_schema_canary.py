"""Schema canary: the registry must hand every consumer event-time columns
of type TIMESTAMP (never TIMESTAMP_NTZ, never raw nanos longs).

The driver has regenerated /root/testdata across rounds with different
parquet timestamp encodings (TIMESTAMP(NANOS) in rounds 1-2, then µs
TIMESTAMP_NTZ in round 3), and under Spark 4 an NTZ event-time column
hard-fails ``unix_micros`` and ``withWatermark`` at analysis time. Round 3
lost 4 corpus queries and a streaming test to a silent regen; this test
exists so the NEXT regen fails one named test instead.
"""

from __future__ import annotations

from pyspark.sql.types import TimestampNTZType, TimestampType

from quantum_rag_data_pipeline_spark.sources.registry import (
    TABLES,
    load_table,
    normalize_ntz,
)


def test_events_ts_is_timestamp(spark, sf_dir):
    df = load_table(spark, "events", sf_dir)
    assert isinstance(df.schema["ts"].dataType, TimestampType), (
        f"events.ts must load as TIMESTAMP (got {df.schema['ts'].dataType}); "
        "unix_micros/withWatermark reject anything else — see registry.normalize_ntz"
    )


def test_no_table_exposes_ntz(spark, sf_dir):
    for name in TABLES:
        df = load_table(spark, name, sf_dir)
        ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
        assert not ntz, f"{name} exposes TIMESTAMP_NTZ columns {ntz} through the registry"


def test_normalize_ntz_is_value_preserving(spark):
    # session TZ is pinned UTC, so NTZ->TIMESTAMP must not move the instant
    df = spark.sql("SELECT TIMESTAMP_NTZ '2025-05-08 12:34:56.789' AS t")
    out = normalize_ntz(df)
    assert isinstance(out.schema["t"].dataType, TimestampType)
    row = out.selectExpr("date_format(t, 'yyyy-MM-dd HH:mm:ss.SSS') AS s").first()
    assert row["s"] == "2025-05-08 12:34:56.789"


def test_load_table_memo_is_session_scoped(spark, sf_dir):
    """Round-7 perf: load_table memoizes the immutable source frame per
    SESSION (an attribute on the session object) — repeat calls return
    the identical object; a newSession() gets its own frame, never the
    parent's."""
    from quantum_rag_data_pipeline_spark.sources.registry import load_table

    a1 = load_table(spark, "lineitem", sf_dir)
    a2 = load_table(spark, "lineitem", sf_dir)
    assert a1 is a2
    other = spark.newSession()
    b1 = load_table(other, "lineitem", sf_dir)
    assert b1 is not a1
    assert b1.sparkSession is other
    # and the frame still computes
    assert b1.limit(1).count() == 1


def test_load_table_memo_does_not_immortalize_sessions(spark, sf_dir):
    """Round-7 advisor: the previous module-global WeakKeyDictionary
    never freed entries — the cached DataFrames strongly referenced
    their SparkSession, so the value kept its own key alive forever and
    every newSession() that touched load_table leaked. The memo now
    lives on the session object itself: dropping the session must make
    its Python wrapper collectible."""
    import gc
    import weakref

    from quantum_rag_data_pipeline_spark.sources.registry import load_table

    other = spark.newSession()
    load_table(other, "region", sf_dir)
    ref = weakref.ref(other)
    # pyspark itself roots the MOST RECENTLY constructed session (the
    # _monkey_patch_RDD toDF closure captures it) — that root is outside
    # our control, so displace it with a fresh session before checking
    # that nothing OURS still holds `other`.
    displacer = spark.newSession()
    del other
    gc.collect()
    assert ref() is None, "memo still roots the session after del+gc"
    assert displacer is not None  # keep alive past the gc.collect()
