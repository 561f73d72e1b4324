"""Stuck-sensor run detector — keyed stateful streaming, dual-engine.

The QC state machine the reference's NRT loop implies but cannot express
(its CRC gate, src/utils/OverwriteFS.py, only detects *identical whole
files*): a per-station detector for a sensor reporting the SAME value over
and over (ice on an anemometer, a wedged ADC). The run length must survive
microbatch boundaries — exactly what keyed state is for.

Two engines, one state machine (``advance_run_state`` is the shared,
pure-Python transition function):

- ``applyInPandasWithState`` (always available): one state tuple per key.
- ``transformWithStateInPandas`` (Spark 4 API: named state variables,
  per-state TTL, timers) — REQUIRES a working ``google.protobuf`` in the
  Python environment (its state-server protocol is protobuf-framed) and
  the RocksDB state store provider. This container ships a broken
  protobuf, so the TWS path is an import-gated seam exactly like the
  multimodal decoder (operators/multimodal.py): the code is real and the
  engine picker falls back cleanly where protobuf is absent.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

#: state tuple: (last_v, run_len, alerted)
RunState = tuple[float | None, int, bool]

_EMPTY: RunState = (None, 0, False)


def advance_run_state(
    state: RunState, values: Iterator[float], min_run: int
) -> tuple[RunState, list[tuple[float, int]]]:
    """Advance the run-length machine over ``values``; return the new
    state and the alerts fired — ``(value, run_len)`` at the moment a run
    first reaches ``min_run``. The ``alerted`` latch stops an ongoing run
    from re-alerting every batch; any value change resets it."""
    last_v, run_len, alerted = state
    alerts: list[tuple[float, int]] = []
    for v in values:
        v = float(v)
        if last_v is not None and v == last_v:
            run_len += 1
        else:
            last_v, run_len, alerted = v, 1, False
        if run_len >= min_run and not alerted:
            alerts.append((v, run_len))
            alerted = True
    return (last_v, run_len, alerted), alerts


def tws_available() -> bool:
    """True when the transformWithState protobuf dependency imports."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def stuck_run_alerts(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    order_col: str,
    min_run: int = 3,
    ttl_ms: int | None = None,
    engine: str = "auto",
) -> DataFrame:
    """Alert once per stuck-value run of length >= ``min_run`` per key.

    Output: ``(k, stuck_value, run_len)`` — one row at the moment a run
    crosses the threshold. Rows are scanned in ``order_col`` order within
    each batch (cross-batch order is arrival order — the streaming
    contract).

    ``engine``: ``"auto"`` picks transformWithState when its protobuf
    dependency is importable, else applyInPandasWithState; force with
    ``"tws"`` / ``"apws"``. ``ttl_ms`` (state expiry for silent stations)
    is a transformWithState feature — the apws engine rejects it rather
    than silently keeping state forever.
    """
    if engine == "auto":
        engine = "tws" if tws_available() else "apws"
    if engine == "tws":
        return _stuck_run_tws(stream, key_col, value_col, order_col, min_run, ttl_ms)
    if engine != "apws":
        raise ValueError(f"unknown engine {engine!r}; use auto|tws|apws")
    if ttl_ms is not None:
        raise ValueError(
            "state TTL needs the transformWithState engine "
            "(applyInPandasWithState has no per-state TTL)"
        )
    return _stuck_run_apws(stream, key_col, value_col, order_col, min_run)


def _stuck_run_apws(
    stream: DataFrame, key_col: str, value_col: str, order_col: str, min_run: int
) -> DataFrame:
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = T.StructType(
        [
            T.StructField("k", stream.schema[key_col].dataType),
            T.StructField("stuck_value", T.DoubleType()),
            T.StructField("run_len", T.LongType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("last_v", T.DoubleType()),
            T.StructField("run_len", T.LongType()),
            T.StructField("alerted", T.BooleanType()),
        ]
    )

    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        st: RunState = tuple(state.get) if state.exists else _EMPTY
        fired: list[tuple] = []
        # a large group arrives as MULTIPLE Arrow chunks in partition
        # order; sorting per chunk would scan out of order across the
        # chunk boundary, so collect the batch's rows and sort ONCE
        # (state is per (key, batch): bounded by the micro-batch)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            whole = (
                chunks[0] if len(chunks) == 1 else pd.concat(chunks)
            ).sort_values(order_col)
            st, alerts = advance_run_state(
                st, whole[value_col].astype(float), min_run
            )
            fired.extend((key[0], v, n) for v, n in alerts)
        state.update(st)
        if fired:
            yield pd.DataFrame(fired, columns=["k", "stuck_value", "run_len"])

    return stream.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _stuck_run_tws(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    order_col: str,
    min_run: int,
    ttl_ms: int | None,
) -> DataFrame:
    """transformWithStateInPandas engine (needs protobuf + RocksDB state
    store provider: set ``spark.sql.streaming.stateStore.providerClass`` to
    ``...state.RocksDBStateStoreProvider`` before starting the query)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Processor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._run = handle.getValueState(
                "run",
                "last_v double, run_len bigint, alerted boolean",
                ttlDurationMs=ttl_ms,
            )

        def handleInputRows(
            self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
        ) -> Iterator[pd.DataFrame]:
            st_raw = self._run.get() if self._run.exists() else None
            st: RunState = tuple(st_raw) if st_raw is not None else _EMPTY
            fired: list[tuple] = []
            chunks = [pdf for pdf in rows if len(pdf)]
            if chunks:
                whole = (
                    chunks[0] if len(chunks) == 1 else pd.concat(chunks)
                ).sort_values(order_col)
                st, alerts = advance_run_state(
                    st, whole[value_col].astype(float), min_run
                )
                fired.extend((key[0], v, n) for v, n in alerts)
            self._run.update(st)
            if fired:
                yield pd.DataFrame(fired, columns=["k", "stuck_value", "run_len"])

        def close(self) -> None:
            pass

    key_type = stream.schema[key_col].dataType.simpleString()
    out_schema = f"k {key_type}, stuck_value double, run_len bigint"
    return stream.groupBy(key_col).transformWithStateInPandas(
        _Processor(),
        outputStructType=out_schema,
        outputMode="append",
        timeMode="none",
    )
