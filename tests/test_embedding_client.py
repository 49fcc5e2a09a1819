"""Hermetic tests for the production embedding client — the full client
logic (model/dimensions rules, scrubbing, zero-vector degradation,
batch alignment) driven through a fake transport; plus the wiring into
the Spark pandas UDF. Closes the "no production client module" gap: the
only part not exercised here is the openai SDK import itself, which is
env-gated exactly like the Postgres/DynamoDB smokes.
"""

from __future__ import annotations

import pytest

from quantum_rag_data_pipeline_spark.functions.embedding_client import (
    EmbeddingClient,
    MODEL_DIMS,
)


def recording_transport(log, dim=1536, fail=False, ragged=False):
    def call(model, inputs, dimensions):
        log.append({"model": model, "inputs": list(inputs), "dimensions": dimensions})
        if fail:
            raise RuntimeError("boom")
        vecs = [[float(i + 1)] * dim for i in range(len(inputs))]
        if ragged:
            vecs[0] = [1.0]  # wrong dimension
        return vecs

    return call


def test_dimensions_param_only_for_third_gen_models():
    log = []
    c3 = EmbeddingClient(transport=recording_transport(log))
    c3.embed("hello")
    assert log[-1]["dimensions"] == 1536

    log2 = []
    ada = EmbeddingClient(
        model="text-embedding-ada-002", transport=recording_transport(log2)
    )
    ada.embed("hello")
    assert log2[-1]["dimensions"] is None  # older models reject the param


def test_literal_backslash_n_scrub_matches_reference_quirk():
    log = []
    c = EmbeddingClient(transport=recording_transport(log))
    c.embed("a\\nb and a\nreal newline")
    sent = log[-1]["inputs"][0]
    assert "\\n" not in sent            # the two-char literal is scrubbed
    assert "\n" in sent                 # REAL newlines pass through (P15)


def test_zero_vector_on_transport_error():
    c = EmbeddingClient(transport=recording_transport([], fail=True))
    out = c.embed_batch(["x", "y"])
    assert out == [[0.0] * 1536, [0.0] * 1536]


def test_ragged_response_degrades_per_row_not_misaligns():
    c = EmbeddingClient(transport=recording_transport([], ragged=True))
    out = c.embed_batch(["bad", "good"])
    assert out[0] == [0.0] * 1536       # wrong-dim row zeroed
    assert out[1][0] == 2.0             # second row still aligned to input 2


def test_model_dim_defaults():
    assert EmbeddingClient(transport=lambda *a: []).dim == 1536
    large = EmbeddingClient(model="text-embedding-3-large", transport=lambda *a: [])
    assert large.dim == MODEL_DIMS["text-embedding-3-large"]


def test_missing_sdk_raises_clear_error_without_transport():
    with pytest.raises(RuntimeError, match="openai"):
        EmbeddingClient()  # no transport injected, no SDK in container


def test_client_plugs_into_spark_embed_udf(spark):
    from quantum_rag_data_pipeline_spark.functions.embedding import make_embed_udf

    dim = 8
    c = EmbeddingClient(dim=dim, transport=recording_transport([], dim=dim))
    embed = make_embed_udf(encoder=c.embed_batch, dim=dim)
    df = spark.createDataFrame([("alpha",), ("beta",)], "t string")
    rows = df.select(embed("t").alias("v")).collect()
    assert all(len(r.v) == dim for r in rows)
