"""The query registry: the single writer of ``QUERIES`` / ``ORACLE``.

Every corpus segment module registers through the ``@query`` decorator
here; the package ``__init__`` imports the segments in registration
order and then applies the driver-verify rotation. Conventions that
make the driver's hash-gate deterministic (see the package docstring):
DECIMAL-routed float sums, identical aliases on both sides, explicit
top-k tiebreaks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from quantum_rag_data_pipeline_spark.sources.registry import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, name, sf_dir)
