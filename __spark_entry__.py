"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (star-join revenue rollup) on sf0.001.
``queries()`` / ``oracle_sql()`` — the correctness corpus; definitions
live in ``quantum_rag_data_pipeline_spark.queries`` (one entry per
operator from SURVEY.md §2 plus the north-star LLM-data-pipeline ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from quantum_rag_data_pipeline_spark.queries import ORACLE, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["star_join_revenue"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL for every SQL-expressible query."""
    return dict(ORACLE)
