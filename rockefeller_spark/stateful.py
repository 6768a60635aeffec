"""Custom stateful streaming operator: gap-based streaming sessionization
via ``applyInPandasWithState``.

Spark's built-in session windows aggregate; this operator keeps an OPEN
session per key in managed state and emits one record per CLOSED session
— the shape a downstream training-data pipeline wants (session spans as
rows, closed exactly once). It is the engine's demonstration of the
custom-stateful-operator pattern: Arrow-batched per-group user logic,
event-time timeouts bounded by the watermark, state that survives
restarts through the checkpoint.

Semantics: a session is a maximal run of a key's events where consecutive
event-time gaps are ≤ ``gap_sec``. A session closes when a later event of
the same key arrives past the gap (emitted immediately) or when the
WATERMARK passes its last event + gap (emitted via timeout — so tail
sessions close without needing another event for that key).

Scale notes: state is one small tuple per ACTIVE key (not per event);
Spark shuffles by key into state stores, so hot keys are single-task —
fine here because per-key work is O(events of key in batch), not O(all
history). Timeout eviction keeps the store bounded by active keys.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType(), False),
    T.StructField("session_start", T.TimestampType(), False),
    T.StructField("session_end", T.TimestampType(), False),
    T.StructField("n_events", T.LongType(), False),
])

# state: (start_epoch_us, end_epoch_us, n_events)
STATE_SCHEMA = T.StructType([
    T.StructField("start_us", T.LongType(), False),
    T.StructField("end_us", T.LongType(), False),
    T.StructField("n", T.LongType(), False),
])


def _sessionize_group(gap_sec: int):
    gap_us = gap_sec * 1_000_000

    def fn(key: tuple, pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        closed: list[tuple[Any, Any, int]] = []
        if state.hasTimedOut:
            start_us, end_us, n = state.get
            closed.append((start_us, end_us, n))
            state.remove()
        else:
            ts_us = pd.concat(list(pdfs))["event_ts"] \
                .astype("datetime64[us]").astype("int64").sort_values()
            if state.exists:
                start_us, end_us, n = state.get
            else:
                # open a zero-event session at the first timestamp; the
                # fold below counts every event including the first
                first = int(ts_us.iloc[0])
                start_us, end_us, n = first, first, 0
            for t in (int(x) for x in ts_us):
                if t - end_us > gap_us:
                    closed.append((start_us, end_us, n))
                    start_us, end_us, n = t, t, 1
                else:
                    end_us = max(end_us, t)
                    n += 1
            state.update((start_us, end_us, n))
            # close the open session once the watermark passes end + gap;
            # clamp above the current watermark (a key fed only late data
            # would otherwise request a timeout already in the past)
            to_ms = max(end_us // 1000 + gap_sec * 1000,
                        state.getCurrentWatermarkMs() + 1)
            state.setTimeoutTimestamp(to_ms)
        if closed:
            yield pd.DataFrame({
                "conv_id": conv_id,
                "session_start": pd.to_datetime([c[0] for c in closed], unit="us"),
                "session_end": pd.to_datetime([c[1] for c in closed], unit="us"),
                "n_events": [c[2] for c in closed],
            })

    return fn


def sessionize_stream(events: DataFrame, gap_sec: int = 1800,
                      key_col: str = "conv_id",
                      watermark: str = "0 seconds") -> DataFrame:
    """Attach the stateful sessionizer to a STREAMING change-event frame
    (must contain ``event_ts``). Returns the streaming DataFrame of closed
    sessions; callers pick the sink (tests drain to memory)."""
    w = events.withWatermark("event_ts", watermark)
    if key_col != "conv_id":
        w = w.withColumnRenamed(key_col, "conv_id")
    return (w.groupBy("conv_id")
            .applyInPandasWithState(_sessionize_group(gap_sec),
                                    SESSION_SCHEMA, STATE_SCHEMA,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))
