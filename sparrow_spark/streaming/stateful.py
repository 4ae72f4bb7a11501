"""Custom stateful streaming operators via applyInPandasWithState —
the escape hatch for semantics session_window/window cannot express
(per-key custom state machines). The reference has no streaming at all
(SURVEY §2.2); this is the beyond-reference extension's stateful tier.

Operators:
- stateful_sessionize: explicit per-user session state machine
  (start, last_ts, n_events, sum_value) with event-time timeout —
  functionally the same sessions as F.session_window, but the state
  shape is user-defined, so it generalizes to richer per-session
  aggregates (distinct counts, first/last event payloads, ...).
- stream_dedup: exact-duplicate suppression bounded by the watermark
  (dropDuplicatesWithinWatermark) — the streaming twin of exact dedup.

Scale notes: state lives in the state store, partitioned by the group
key across executors; the event-time timeout (watermark) bounds both
state size and emission latency. Batches reach Python as Arrow-encoded
pandas frames (vectorized, not row-at-a-time).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from sparrow_spark.streaming.constants import (
    SESSION_GAP_SECONDS,
    WATERMARK_INTERVAL,
)

SESSION_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, "
    "n_events bigint, sum_value double"
)
_STATE_SCHEMA = "start_us long, last_us long, n long, sum_value double"

_US = 1_000_000


def _session_fn(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, n, sum_value = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_us, unit="us")],
                    "session_end": [pd.Timestamp(last_us + gap_us, unit="us")],
                    "n_events": [n],
                    "sum_value": [sum_value],
                }
            )
            return

        frames = [p for p in pdfs if len(p)]
        if not frames:
            return
        rows = pd.concat(frames).sort_values("ts")
        ts_us = rows["ts"].astype("int64") // 1000  # ns -> us
        vals = rows["value"].fillna(0.0)
        out: list[tuple[int, int, int, int, float]] = []
        if state.exists:
            start_us, last_us, n, sum_value = state.get
        else:
            start_us, last_us, n, sum_value = None, None, 0, 0.0
        for t, v in zip(ts_us, vals):
            if last_us is not None and t - last_us > gap_us:
                out.append((user_id, start_us, last_us + gap_us, n, sum_value))
                start_us, last_us, n, sum_value = t, t, 1, float(v)
            else:
                start_us = t if start_us is None else start_us
                last_us = t
                n += 1
                sum_value += float(v)
        state.update((start_us, last_us, n, sum_value))
        # Emit once the watermark passes session end + gap.
        state.setTimeoutTimestamp((last_us + gap_us) // 1000)
        if out:
            yield pd.DataFrame(
                {
                    "user_id": [o[0] for o in out],
                    "session_start": [pd.Timestamp(o[1], unit="us") for o in out],
                    "session_end": [pd.Timestamp(o[2], unit="us") for o in out],
                    "n_events": [o[3] for o in out],
                    "sum_value": [o[4] for o in out],
                }
            )

    return fn


def stateful_sessionize(
    events: DataFrame,
    gap_seconds: int = SESSION_GAP_SECONDS,
    watermark: str = WATERMARK_INTERVAL,
) -> DataFrame:
    """Per-user sessions (30-min inactivity gap) as an explicit state
    machine. A session is emitted when the gap elapses mid-stream or
    when the event-time timeout fires (watermark passed last_ts+gap).
    session_end = last_ts + gap, matching F.session_window's window
    end, so results are comparable with the session_window twin."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_seconds),
            outputStructType=SESSION_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_dedup(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = WATERMARK_INTERVAL,
) -> DataFrame:
    """Exact-duplicate suppression keyed on `keys` (default: event_id),
    state bounded by the watermark — the streaming twin of
    operators.dedup.exact_dedup for an append-only event stream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )
