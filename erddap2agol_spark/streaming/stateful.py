"""Custom stateful streaming operators (SURVEY guide: Structured
Streaming + ``applyInPandasWithState`` for operators Spark lacks).

``stateful_dedup_stream`` is exactly-once first-occurrence dedup ACROSS
microbatches: per-key boolean state in the state store, first row per
key emitted, everything later (same batch or any future batch) dropped.
This is the streaming form of the content-hash skip (ST3) — the state
store scales keyed state horizontally, checkpointing makes it restart-
safe, and a watermark on the key's event time would bound state for
expiring keys.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T


def stateful_dedup_stream(
    stream: DataFrame, key_col: str
) -> DataFrame:
    """First-occurrence dedup over a streaming DataFrame, keyed by
    ``key_col``. Output schema == input schema. Batch-mode DataFrames
    are rejected by Spark (streaming only)."""
    out_schema = stream.schema
    state_schema = T.StructType([T.StructField("seen", T.BooleanType())])

    def dedup_fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            for _ in pdfs:  # drain; key already emitted in a past batch
                pass
            return
        emitted = False
        for pdf in pdfs:
            if not emitted and len(pdf):
                state.update((True,))
                yield pdf.iloc[[0]]
                emitted = True
        # key seen with zero rows can't happen (groups are non-empty)

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_max_stream(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running maximum across microbatches — the keyed
    high-water-mark pattern (ST2/ST4) as explicit state: emits one row
    per key per batch with the all-time max."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, stream.schema[key_col].dataType),
            T.StructField("running_max", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("mx", T.DoubleType())])

    def max_fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        mx = state.get[0] if state.exists else None
        for pdf in pdfs:
            if len(pdf):
                m = float(pdf[value_col].max())
                mx = m if mx is None else max(mx, m)
        if mx is not None:
            state.update((mx,))
            yield pd.DataFrame({key_col: [key[0]], "running_max": [mx]})

    return stream.groupBy(key_col).applyInPandasWithState(
        max_fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
