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
