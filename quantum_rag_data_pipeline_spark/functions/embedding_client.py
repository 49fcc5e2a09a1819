"""Production embedding-service client (U1's external half).

The engine's Spark side (``embedding.make_embed_udf``) takes any
``Encoder`` callable; this module supplies the PRODUCTION one with the
reference's exact semantics (reference ``src/services/embedding_service.py``):

- model ``text-embedding-3-small`` default, 1536 dims (:11, :31-34);
- the ``dimensions`` request parameter is sent ONLY for third-generation
  (``-3``) models — older models reject it (:30-43, :71-72);
- errors return a ZERO vector of the configured dimension — not None,
  not an exception; a failed batch degrades, the pipeline continues
  (:63, :89);
- the batch entry point embeds a list per request (:91-124);
- inputs are scrubbed of the two-character literal ``\\n`` before the
  request (:67, :107 — the P15 quirk, preserved for parity).

The HTTP/SDK transport is injectable: tests drive the full client logic
hermetically with a fake transport; production passes nothing and the
client lazily imports the ``openai`` SDK (import-gated — this container
does not ship it, and nothing here touches the network until
``embed_batch`` is called with a real transport).

Wiring into Spark::

    client = EmbeddingClient(api_key=...)            # or transport=fake
    embed = make_embed_udf(encoder=client.embed_batch, dim=client.dim)
    df.withColumn("embedding", embed("semantic_sentence"))
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

# transport signature: (model, inputs, dimensions|None) -> list of vectors
Transport = Callable[[str, list[str], int | None], list[list[float]]]

THIRD_GEN_PREFIX = "text-embedding-3"
MODEL_DIMS = {
    # reference embedding_service.py:31-34
    "text-embedding-3-small": 1536,
    "text-embedding-3-large": 3072,
    "text-embedding-ada-002": 1536,
}


def _openai_transport(api_key: str | None) -> Transport:
    """Lazily construct the real SDK transport. Import-gated: raises a
    clear error if the ``openai`` package is absent (this sandbox)."""
    try:
        from openai import OpenAI  # type: ignore[import-not-found]
    except ImportError as e:  # pragma: no cover - no SDK in this container
        raise RuntimeError(
            "EmbeddingClient needs the 'openai' package for the real "
            "transport; inject transport= for hermetic use"
        ) from e
    client = OpenAI(api_key=api_key)

    def call(model: str, inputs: list[str], dimensions: int | None) -> list[list[float]]:
        kwargs = {"model": model, "input": inputs}
        if dimensions is not None:
            kwargs["dimensions"] = dimensions
        resp = client.embeddings.create(**kwargs)
        # responses arrive index-tagged; return in input order
        by_index = sorted(resp.data, key=lambda d: d.index)
        return [d.embedding for d in by_index]

    return call


class EmbeddingClient:
    """Reference-parity embedding client over an injectable transport."""

    def __init__(
        self,
        model: str = "text-embedding-3-small",
        dim: int | None = None,
        api_key: str | None = None,
        transport: Transport | None = None,
    ) -> None:
        self.model = model
        self.dim = dim or MODEL_DIMS.get(model, 1536)
        self._transport = transport or _openai_transport(api_key)

    def _request_dimensions(self) -> int | None:
        # reference :30-43: only -3 models accept the dimensions param
        return self.dim if self.model.startswith(THIRD_GEN_PREFIX) else None

    @staticmethod
    def _scrub(text: str) -> str:
        # reference :67,:107 — replaces the LITERAL backslash-n pair
        return (text or "").replace("\\n", " ")

    def embed_batch(self, texts: Sequence[str]) -> list[list[float]]:
        """Batch embed; zero vectors for the whole batch on transport
        error (reference :89 — the pipeline never fails on the
        embedding hop)."""
        inputs = [self._scrub(t) for t in texts]
        if not inputs:
            return []
        try:
            vecs = self._transport(self.model, inputs, self._request_dimensions())
        except Exception:
            return [[0.0] * self.dim for _ in inputs]
        # defensive: a short/ragged response degrades to zeros per-row
        # rather than misaligning rows with vectors
        out = []
        for i in range(len(inputs)):
            v = vecs[i] if i < len(vecs) else None
            out.append(list(v) if v and len(v) == self.dim else [0.0] * self.dim)
        return out

    def embed(self, text: str) -> list[float]:
        """Single-text embed (reference :50-89). Zero vector on error."""
        return self.embed_batch([text])[0]
