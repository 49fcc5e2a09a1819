"""Parquet table registry over the driver's synthetic testdata.

The TPC-H-ish star schema (``TESTDATA.md``) stands in for the reference's
API result sets in the correctness corpus (FIXTURES.md §7).

Scale notes: ``lineitem``/``orders``/``events`` are the fact tables and
grow with SF — they are scanned with pushed filters and pruned columns
(Catalyst handles both as long as plans stay declarative). ``region``,
``nation``, ``supplier``, ``documents``, ``embeddings`` are dimension-sized
and always broadcast-joined.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Tables small enough to broadcast at ANY scale factor (bounded cardinality
# in TPC-H terms: region=5, nation=25; documents/embeddings are corpus-sized
# in the testdata but would NOT be broadcast in production — see operators
# that join them for per-case decisions).
ALWAYS_BROADCAST = ("region", "nation")


def default_sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_ntz(df: DataFrame) -> DataFrame:
    """Cast every TIMESTAMP_NTZ column to TIMESTAMP (with session TZ).

    The testdata has been regenerated with different parquet timestamp
    encodings across rounds (TIMESTAMP(NANOS) → µs TIMESTAMP_NTZ); the
    engine pins the session TZ to UTC (session.py), so NTZ→TIMESTAMP is
    value-preserving, and it is required: Spark 4 rejects TIMESTAMP_NTZ
    in ``unix_micros`` and ``withWatermark`` at analysis time. The DuckDB
    oracle compares naive timestamps either way (tzinfo stripped), cf.
    reference create_weather_table.py:53 TIMESTAMP WITHOUT TIME ZONE.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    ntz_cols = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


# Per-session {(table, sf_dir) -> source DataFrame} memo. spark.read.parquet
# re-reads parquet footers for schema inference on EVERY call (~0.1 s of
# driver time at sf0.1, measured round 7) and each corpus query calls
# load_table 1-3x — across a 327-query bench that is tens of seconds of
# pure plan-build overhead. The source DataFrame is immutable and the
# testdata static for a session's lifetime, so memoizing it is safe:
# every caller builds its own transformations on top.
#
# The memo lives as an ATTRIBUTE ON THE SESSION OBJECT, not in a module
# global. Round 7 used a WeakKeyDictionary here, but that never freed
# anything: each cached DataFrame holds a strong reference to its
# SparkSession (df.sparkSession), and WeakKeyDictionary values are
# strongly held, so the value immortalized its own key (round-7 advisor
# item). With the dict hanging off the session there is no global root —
# the session→dict→df→session cycle is ordinary garbage the collector
# reclaims once the caller drops the session. Per-session isolation is
# preserved for free: a spark.newSession() wrapper is a distinct Python
# object with its own attribute, so it can never receive a frame planned
# under another session's conf (round-6 advisor lesson on the edge memo).
_MEMO_ATTR = "_qrdp_table_memo"


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or default_sf_dir()
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    per_session = getattr(spark, _MEMO_ATTR, None)
    if per_session is None:
        per_session = {}
        try:
            setattr(spark, _MEMO_ATTR, per_session)
        except AttributeError:
            # a slotted/proxy session (e.g. Spark Connect) — skip memoizing
            # rather than leak through a side table.
            pass
    key = (name, os.path.abspath(sf_dir))
    hit = per_session.get(key)
    if hit is not None:
        return hit
    if name == "events":
        # must be set before the scan is planned; runtime-settable SQLConf,
        # so this works even on a session we didn't build (the driver's).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) → read as nanos-since-epoch
        # long (spark.sql.legacy.parquet.nanosAsLong); truncate to µs like
        # every µs-native engine (DuckDB, Spark elsewhere) does.
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType

        if isinstance(df.schema["ts"].dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    df = normalize_ntz(df)
    per_session[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str | None = None) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every table as a temp view so ``spark.sql`` works directly."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
