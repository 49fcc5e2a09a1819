"""Custom stateful streaming operators via ``applyInPandasWithState``.

The built-in streaming surface (windows, watermarks, dropDuplicates)
covers the reference's needs; this module adds the escape hatch the
north star calls for: arbitrary per-key state with Arrow-batched Python.

``streaming_dedup_by_key`` — emit each key's FIRST row only, across the
whole stream (state = seen marker + count per key). This is streaming
exact-dedup for a document/event feed: re-deliveries and duplicates are
suppressed at the operator, before any sink. GroupStateTimeout can bound
state by event-time TTL in a real deployment; tests run unbounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "seen long"


def streaming_dedup_by_key(
    keyed_stream: DataFrame,
    key_col: str,
    output_schema: str,
) -> DataFrame:
    """``stream.groupBy(key).applyInPandasWithState(...)`` keeping one
    marker per key: first batch containing the key emits its first row;
    every later occurrence is dropped. Output schema must include the
    key column."""

    def dedup(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        seen = state.get[0] if state.exists else 0
        out = []
        for pdf in pdfs:
            if seen == 0 and len(pdf) > 0:
                out.append(pdf.iloc[:1])
            seen += len(pdf)
        state.update((seen,))
        if out:
            yield pd.concat(out)

    return keyed_stream.groupBy(key_col).applyInPandasWithState(
        dedup,
        outputStructType=output_schema,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_stateful_accumulate(
    keyed_stream: DataFrame,
    key_col: str,
    id_col: str,
    output_schema: str,
) -> DataFrame:
    """Arbitrary-state accumulator: per key keep (count, min id) across
    batches and emit the running totals each time the key appears.
    Unlike first-row dedup, the emitted values are ORDER-FREE (count
    and min commute), so the result is deterministic under any shuffle
    or batch split — which is what lets the driver gate hash-match it
    against a batch GROUP BY oracle."""

    def acc(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        n, mn = (state.get if state.exists else (0, None))
        for pdf in pdfs:
            if len(pdf):
                n += len(pdf)
                batch_min = int(pdf[id_col].min())
                mn = batch_min if mn is None else min(mn, batch_min)
        state.update((n, mn))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "min_id": [mn]})

    return keyed_stream.groupBy(key_col).applyInPandasWithState(
        acc,
        outputStructType=output_schema,
        stateStructType="n long, mn long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_transform_with_state(
    keyed_stream: DataFrame,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Spark 4's NEW arbitrary-state API (``transformWithStateInPandas``
    with a ``StatefulProcessor`` + ``ValueState``) — the successor to
    applyInPandasWithState, with explicitly-managed named state and
    timers. Accumulates per-key (count, cents) where cents is the
    per-row floor(value·100 + 0.5) integer — commutative integer state,
    so the emitted totals are order-free and batch-oracle-exact.

    NOTE: this API drives a protobuf-based state server; in containers
    without a working ``google.protobuf`` the stream crashes at
    initialization (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE).
    The test suite skips it there; applyInPandasWithState
    (``streaming_stateful_accumulate``) is the dependency-free fallback
    with the same semantics and IS driver-gated."""
    import numpy as np
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class KeyTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", "n LONG, cents LONG")

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                if len(pdf):
                    n += len(pdf)
                    cents += int(
                        np.floor(pdf[value_col].to_numpy(dtype=np.float64) * 100.0 + 0.5)
                        .astype(np.int64).sum()
                    )
            self._state.update((n, cents))
            yield pd.DataFrame({key_col: [key[0]], "n_events": [n], "value_cents": [cents]})

        def close(self) -> None:
            pass

    return keyed_stream.groupBy(key_col).transformWithStateInPandas(
        KeyTotals(),
        outputStructType=f"{key_col} long, n_events long, value_cents long",
        outputMode="append",
        timeMode="none",
    )
