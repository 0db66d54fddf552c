"""Custom stateful streaming operators (applyInPandasWithState).

Two operators the reference's loops imply but Spark lacks as built-ins:

- :func:`streaming_dedupe` — exactly-once pass-through of first
  occurrences per key across micro-batches (the streaming twin of the
  batch dedup family; state = seen-key set per group).
- :func:`liveness_monitor` — heartbeat liveness state machine: emits a
  row whenever a key transitions ALIVE↔DEAD based on the last heartbeat
  timestamp + timeout (the streaming twin of T2/heartbeatCheck
  :2392-2397, with the state held by the operator instead of a table
  scan per tick).

State sizing: both keep O(1) state per key (a timestamp / a seen-flag),
so state store size is bounded by |keys|, not traffic.  GroupStateTimeout
reaps idle keys for the dedupe case.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

DEDUP_OUTPUT = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("first_value", T.DoubleType()),
        T.StructField("n_duplicates_dropped", T.LongType()),
    ]
)
DEDUP_STATE = T.StructType(
    [T.StructField("seen", T.BooleanType()), T.StructField("dropped", T.LongType())]
)


def _dedupe_fn(
    key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (k,) = key
    seen, dropped = state.get if state.exists else (False, 0)
    out = []
    for pdf in pdfs:
        n = len(pdf)
        if not seen and n > 0:
            out.append(
                pd.DataFrame(
                    {
                        "key": [k],
                        "first_value": [float(pdf["value"].iloc[0])],
                        "n_duplicates_dropped": [0],
                    }
                )
            )
            seen = True
            n -= 1
        dropped += n
    state.update((seen, dropped))
    if out:
        yield from out


def streaming_dedupe(events: DataFrame, key_col: str = "user_id") -> DataFrame:
    """First-occurrence-per-key pass-through across micro-batches.
    ``events`` needs (key_col, value)."""
    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            _dedupe_fn,
            outputStructType=DEDUP_OUTPUT,
            stateStructType=DEDUP_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


LIVENESS_OUTPUT = T.StructType(
    [
        T.StructField("key", T.LongType()),
        T.StructField("status", T.StringType()),
        T.StructField("last_heartbeat_ms", T.LongType()),
    ]
)
LIVENESS_STATE = T.StructType(
    [T.StructField("last_ms", T.LongType()), T.StructField("alive", T.BooleanType())]
)


def make_liveness_fn(timeout_ms: int, enable_timeout: bool = True):
    """Transition function for :func:`liveness_monitor`.

    Three emit paths:
    - first heartbeat ever for a key → ALIVE;
    - heartbeat after a DEAD mark, or after an observed event-time gap
      > timeout (recovery) → ALIVE;
    - processing-time timeout fires with no new data → DEAD (the key's
      state is kept so the next heartbeat emits a recovery ALIVE).
    """

    def fn(
        key: tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (k,) = key
        if state.hasTimedOut:
            last, alive = state.get
            if alive:
                state.update((last, False))
                yield pd.DataFrame(
                    [(k, "DEAD", last)], columns=["key", "status", "last_heartbeat_ms"]
                )
            return
        last, alive = state.get if state.exists else (None, False)
        newest = last
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["hb_ms"].max())
                newest = m if newest is None else max(newest, m)
        transitions = []
        if newest is not None:
            gap = last is not None and (newest - last) > timeout_ms
            if last is None or not alive or gap:
                transitions.append((k, "ALIVE", newest))
            state.update((newest, True))
            if enable_timeout:
                state.setTimeoutDuration(timeout_ms)
        if transitions:
            yield pd.DataFrame(
                transitions, columns=["key", "status", "last_heartbeat_ms"]
            )

    return fn


def liveness_monitor(
    heartbeats: DataFrame,
    timeout_ms: int = 30_000,
    key_col: str = "key",
    emit_dead: bool = True,
) -> DataFrame:
    """Heartbeat ALIVE↔DEAD state machine: emits (key, ALIVE, ts) on
    first heartbeat and on recovery, and — with ``emit_dead`` —
    (key, DEAD, last_ts) when the processing-time timeout elapses with
    no heartbeat; the streaming twin of T2 (heartbeatCheck :2392-2397).
    ``heartbeats`` needs (key_col, hb_ms).

    ``emit_dead=False`` disables the timeout path (ALIVE transitions
    only); useful for bounded replays (``availableNow``), where pending
    processing-time timeouts would keep scheduling micro-batches past
    the end of input."""
    return heartbeats.groupBy(key_col).applyInPandasWithState(
        make_liveness_fn(timeout_ms, enable_timeout=emit_dead),
        outputStructType=LIVENESS_OUTPUT,
        stateStructType=LIVENESS_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if emit_dead
            else GroupStateTimeout.NoTimeout
        ),
    )
