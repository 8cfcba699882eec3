"""Custom stateful streaming operator: applyInPandasWithState.

``session_window`` (windows.py) covers gap-sessionization declaratively;
this module is the escape hatch pattern for session logic Spark's
built-ins cannot express (custom merge rules, per-session payloads,
early emission). It demonstrates the full plumbing: state schema,
Arrow-batched update function, append-mode emission of *closed*
sessions, state carry across micro-batches.

Scale notes: state lives in the state store partitioned by the group
key — the same shuffle as a groupBy. Unbounded keys need a timeout
(event-time + watermark in production) so abandoned sessions are
flushed and their state evicted; NoTimeout here keeps the finite-test
behavior deterministic.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType


def _fold_session_events(
    start: int | None,
    last: int | None,
    n: int,
    user,
    ts_ms: list[int],
    gap_ms: int,
) -> tuple[int | None, int | None, int, list[tuple]]:
    """Pure per-key fold: apply sorted ``ts_ms`` to carried session
    state, returning the new open state and the CLOSED sessions.
    Extracted so the cross-batch merge rules are unit-testable."""
    closed: list[tuple] = []
    for t in ts_ms:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > gap_ms:
            closed.append((user, start, last + gap_ms, n))
            start, last, n = t, t, 1
        else:
            # late events in a later micro-batch may precede the
            # session's recorded bounds — extend, never move the
            # cursor backwards (a plain ``last = t`` would close
            # the session prematurely with a wrong end time)
            start, last, n = min(start, t), max(last, t), n + 1
    return start, last, n, closed


def sessionize_with_state(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_ms: int = 30 * 60 * 1000,
) -> DataFrame:
    """Per-user gap sessions over a stream; emits a row per CLOSED
    session (a session closes when a later event arrives MORE than
    ``gap_ms`` after its last event — an event at exactly last+gap
    merges, matching ``F.session_window``). The open tail session
    stays in state.

    Output: (user_id, session_start_ms, session_end_ms, n_events),
    end = last event + gap — matching F.session_window semantics.
    """
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("session_start_ms", LongType()),
            StructField("session_end_ms", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    state_schema = StructType(
        [
            StructField("start_ms", LongType()),
            StructField("last_ms", LongType()),
            StructField("n", LongType()),
        ]
    )

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user = key[0]
        start, last, n = state.get if state.exists else (None, None, 0)
        ts_ms: list[int] = []
        for pdf in pdfs:
            col = pdf[ts_col]
            # timestamps arrive as datetime64[ns] through Arrow
            ts_ms.extend((col.astype("int64") // 1_000_000).tolist())
        ts_ms.sort()
        start, last, n, closed = _fold_session_events(
            start, last, n, user, ts_ms, gap_ms
        )
        if start is not None:
            state.update((int(start), int(last), int(n)))
        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start_ms", "session_end_ms", "n_events"],
            )

    return events.groupBy(user_col).applyInPandasWithState(
        update, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def running_totals_with_state(
    events: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running totals via ``transformWithStateInPandas`` —
    Spark 4's arbitrary-state API (StatefulProcessor + typed state
    variables backed by the RocksDB state store), the successor to
    applyInPandasWithState above. Each micro-batch updates a
    ValueState (n_events, sum_cents) per user and emits the user's
    new cumulative row; with one availableNow batch the output is
    exactly one row per user, which a plain GROUP BY reproduces.

    Values are accumulated in integer cents via floor(v*100 + 0.5)
    (IEEE-reproducible cross-engine — floats would make the sum
    depend on accumulation order).

    Caller must run with
    ``spark.sql.streaming.stateStore.providerClass =
    RocksDBStateStoreProvider`` (transformWithState requires it).
    """
    import numpy as np
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_cents", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("cents", LongType())]
    )

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                v = pdf[value_col].to_numpy(dtype="float64")
                cents += int(np.floor(v * 100.0 + 0.5).astype("int64").sum())
                n += len(pdf)
            self._state.update((int(n), int(cents)))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return events.groupBy(user_col).transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=out_schema,
        outputMode="Update",
        timeMode="None",
    )
