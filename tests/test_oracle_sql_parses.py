"""Fast canary: every oracle_sql() string must parse and bind in DuckDB.

The full oracle gate (tools/oracle_check.py) executes everything at
sf0.01 and takes minutes; this test only EXPLAINs each statement against
sf0.001 views, so a typo or a renamed column in an oracle fails one
named test in seconds instead of erring a corpus entry at the driver.
"""

from __future__ import annotations

import duckdb
import pytest

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return c


def test_every_oracle_parses_and_binds(con):
    from quantum_rag_data_pipeline_spark.queries import ORACLE

    bad = {}
    for name, sql in ORACLE.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # noqa: BLE001 — collect all, report once
            bad[name] = str(exc)[:200]
    assert not bad, f"{len(bad)} oracle(s) fail to bind: {bad}"
