"""KV (DynamoDB-shaped) sink: flatten + conditional put (K3/K4, P11–P14).

The reference flattens nested JSON items (seller/image/shippingOptions
paths), coerces numerics to Decimal, snapshots the raw JSON, stamps
last_updated, and does conditional ``put_item`` in batches of 25 with
per-item error capture (dynamodb.py:54-228).

Spark-first:
- the FLATTEN is a plain nested-path ``select`` (P11) — NULLs propagate
  for free, no per-item python;
- ``raw_json``/``last_updated`` are column expressions (P13/P14);
- invalid-numeric → 0 Decimal coercion (P12) via try_cast+coalesce; the
  reference's falsy-0 skip quirk (dynamodb.py:83) is deliberately FIXED
  (0 is a value), documented here;
- local sink = keyed parquet upsert with insert-if-absent semantics
  (= ConditionExpression attribute_not_exists); a real DynamoDB
  deployment would swap in a foreachPartition boto3 batch writer with
  the same row schema (import-gated, see ``dynamo_writer``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quantum_rag_data_pipeline_spark.operators.projection import (
    decimal_coerce_with_zero_fallback,
    with_last_updated,
    with_raw_json,
)

#: nested paths flattened by the reference (dynamodb.py:100-137)
FLATTEN_PATHS: dict[str, str] = {
    "dataId": "dataId",
    "description": "description",
    "condition": "condition",
    "conditionId": "conditionId",
    "itemWebUrl": "itemWebUrl",
    "image_url": "image.imageUrl",
    "seller_username": "seller.username",
    "seller_feedback_score": "seller.feedbackScore",
    "seller_feedback_percentage": "seller.feedbackPercentage",
    "shipping_cost": "shippingOptions[0].shippingCost.value",
    "item_creation_date": "itemCreationDate",
    "item_location_country": "itemLocation.country",
    "listing_marketplace_id": "listingMarketplaceId",
}


def flatten_kv_items(items: DataFrame) -> DataFrame:
    """P11–P14 composed: nested-path flatten, Decimal coercion with
    0-fallback, raw_json snapshot, last_updated stamp. Rows without a
    dataId are rejected (reference dynamodb.py:67-70)."""
    items = with_raw_json(items)
    cols = [F.expr(src).alias(dst) for dst, src in FLATTEN_PATHS.items() if _has_path(items, src)]
    flat = items.select(*cols, F.col("raw_json"))
    if "efficiency" in items.columns:
        # struct variant {value, unit} and bare-number variant both occur
        # (dynamodb.py:79-97); 0 is kept (falsy-skip quirk fixed).
        eff = items.schema["efficiency"].dataType.typeName()
        src = F.col("efficiency.value") if eff == "struct" else F.col("efficiency")
        flat = items.select(
            *cols,
            decimal_coerce_with_zero_fallback(src).alias("efficiency_value"),
            F.col("raw_json"),
        )
    flat = flat.filter(F.col("dataId").isNotNull())
    return with_last_updated(flat)


def _has_path(df: DataFrame, path: str) -> bool:
    root = path.split(".")[0].split("[")[0]
    return root in df.columns


def store_kv_items(
    spark: SparkSession,
    items: DataFrame,
    path: str,
    if_not_exists: bool = True,
) -> None:
    """K3/K4 local emulation: conditional-write = keep the EXISTING row on
    key collision (attribute_not_exists semantics); unconditional = newest
    wins."""
    from quantum_rag_data_pipeline_spark.sinks.upsert import parquet_upsert

    flat = flatten_kv_items(items)
    if if_not_exists:
        import os

        if os.path.exists(path):
            existing_keys = spark.read.parquet(path).select("dataId")
            flat = flat.join(existing_keys, "dataId", "left_anti")
    parquet_upsert(spark, flat, path, ["dataId"], version_col=None)


def dynamo_writer(table_name: str, region: str = "us-east-1", batch_size: int = 25,
                  endpoint_url: str | None = None):
    """foreachPartition boto3 writer (real-DynamoDB path; import-gated).
    batch_size=25 mirrors the API limit the reference chunks by
    (dynamodb.py:192-196). ``endpoint_url`` targets dynamodb-local in
    the integration smoke — passed explicitly because executor workers
    do not reliably inherit driver-set env vars."""

    def write_partition(rows) -> None:
        try:
            import boto3
        except ImportError as e:  # pragma: no cover
            raise RuntimeError("dynamo_writer requires boto3 on executors") from e
        table = boto3.resource(
            "dynamodb", region_name=region, endpoint_url=endpoint_url
        ).Table(table_name)
        with table.batch_writer() as writer:
            for r in rows:
                writer.put_item(Item=r.asDict())

    return write_partition
