"""Real-DynamoDB integration smoke for ``sinks/kv.dynamo_writer`` —
the same env-gated pattern as the Postgres smoke: the sandbox has
neither boto3 nor a DynamoDB endpoint, so this skips in CI but runs
anywhere a real (or dynamodb-local) endpoint exists::

    SPARK_GRAFT_DYNAMO_ENDPOINT=http://localhost:8000 \
        AWS_ACCESS_KEY_ID=x AWS_SECRET_ACCESS_KEY=x \
        python -m pytest tests/test_dynamo_integration.py -q

Reference parity exercised (src/storage/dynamodb.py): batch writes in
25-item chunks (:192-196), item round-trip of the flattened shape
(P11-P14), idempotent re-put of the same keys.
"""

from __future__ import annotations

import os

import pytest

ENDPOINT = os.environ.get("SPARK_GRAFT_DYNAMO_ENDPOINT")
boto3 = pytest.importorskip("boto3") if ENDPOINT else None

pytestmark = pytest.mark.skipif(
    not ENDPOINT, reason="set SPARK_GRAFT_DYNAMO_ENDPOINT to run the DynamoDB smoke"
)

TABLE = "spark_graft_kv_smoke"


@pytest.fixture()
def dynamo_table():
    res = boto3.resource("dynamodb", endpoint_url=ENDPOINT, region_name="us-east-1")
    try:
        res.Table(TABLE).delete()
    except Exception:
        pass
    table = res.create_table(
        TableName=TABLE,
        KeySchema=[{"AttributeName": "dataId", "KeyType": "HASH"}],
        AttributeDefinitions=[{"AttributeName": "dataId", "AttributeType": "S"}],
        BillingMode="PAY_PER_REQUEST",
    )
    table.wait_until_exists()
    yield table
    table.delete()


def test_dynamo_writer_round_trip_and_idempotency(spark, dynamo_table):
    from quantum_rag_data_pipeline_spark.sinks.kv import dynamo_writer

    writer = dynamo_writer(TABLE, endpoint_url=ENDPOINT)
    df = spark.createDataFrame(
        [(f"item-{i}", f"name {i}", i) for i in range(60)],  # > 2 batches of 25
        "dataId string, name string, qty long",
    )
    df.rdd.foreachPartition(writer)
    assert dynamo_table.scan()["Count"] == 60

    # re-put of the same keys is idempotent (put_item overwrites by PK)
    df.rdd.foreachPartition(writer)
    assert dynamo_table.scan()["Count"] == 60
    got = dynamo_table.get_item(Key={"dataId": "item-7"})["Item"]
    assert got["name"] == "name 7" and int(got["qty"]) == 7
