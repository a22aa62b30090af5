"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (the brief's designated mechanism for
stateful ops Spark lacks natively).

Batch twin: operators/events.sessionize — same gap semantics, so the
batch oracle validates the logic while the streaming variant is checked
for state handling (sessions spanning micro-batches, timeout flush).

State per user_id: (session_no, session_start_epoch, last_seen_epoch,
n_events). A new event either extends the open session or closes it and
opens the next; an event-time timeout flushes idle sessions.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_no", LongType()),
    StructField("n_events", LongType()),
    StructField("start_epoch", LongType()),
    StructField("end_epoch", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("session_no", LongType()),
    StructField("start_epoch", LongType()),
    StructField("last_epoch", LongType()),
    StructField("n_events", LongType()),
])


def _sessionize_group(key, pdfs: Iterator[pd.DataFrame],
                      state: GroupState) -> Iterator[pd.DataFrame]:
    gap_s = 1800
    (user_id,) = key

    if state.hasTimedOut:
        session_no, start, last, n = state.get
        state.remove()
        yield pd.DataFrame([{
            "user_id": user_id, "session_no": session_no, "n_events": n,
            "start_epoch": start, "end_epoch": last,
        }])
        return

    events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    epochs = (events["ts"].astype("int64") // 1_000_000_000).tolist()

    if state.exists:
        session_no, start, last, n = state.get
    else:
        session_no, start, last, n = 0, None, None, 0

    closed: list[dict] = []
    for ep in epochs:
        if start is None:
            session_no, start, last, n = session_no + 1, ep, ep, 1
        elif ep - last > gap_s:
            closed.append({"user_id": user_id, "session_no": session_no,
                           "n_events": n, "start_epoch": start, "end_epoch": last})
            session_no, start, last, n = session_no + 1, ep, ep, 1
        else:
            last, n = ep, n + 1

    state.update((session_no, start, last, n))
    state.setTimeoutTimestamp((last + gap_s) * 1000)
    yield pd.DataFrame(closed, columns=[f.name for f in OUTPUT_SCHEMA.fields])


def streaming_sessionize(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Sessionize a streaming events table (user_id, ts, event_id).

    Emits a row per CLOSED session (closed by a later event or by the
    event-time timeout). One stateful shuffle on user_id; state size is
    O(active users), the streaming-correct analogue of the batch window.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize_group,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
