"""Custom stateful streaming operator: per-user sessionization via
``applyInPandasWithState``.

The reference has no streaming (SURVEY §2.9); this is the Spark-native
extension point for custom stateful logic the built-in windowed
aggregations can't express — a session is closed by an inactivity GAP,
not a fixed window. State per user = the open session (start, last
event ts, count); completed sessions are emitted as soon as a later
event (possibly in a later micro-batch) proves the gap, so sessions
correctly stitch ACROSS micro-batches.

Scale: state is O(active users), partitioned by the group key; Spark
checkpoints it with the query. Skewed users produce big groups — the
Arrow batches bound memory per invocation.
"""

from __future__ import annotations

from collections.abc import Iterable
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id bigint, session_start_us bigint, session_end_us bigint, "
    "n_events bigint, closed_by string"
)
STATE_SCHEMA = "start_us bigint, last_us bigint, n bigint"

DEFAULT_GAP_US = 30 * 60 * 1_000_000  # 30 min, matches the batch twin


def _sessionize_group(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_us: int = DEFAULT_GAP_US,
    idle_timeout_ms: int | None = None,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    ts_list: list[int] = []
    for pdf in pdfs:
        ts_list.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
    ts_list.sort()

    if state.hasTimedOut:
        if state.exists:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                [(user_id, start, last, n, "timeout")],
                columns=["user_id", "session_start_us", "session_end_us", "n_events", "closed_by"],
            )
        return

    start = last = None
    n = 0
    if state.exists:
        start, last, n = state.get

    completed = []
    for t in ts_list:
        if start is None:
            start, last, n = t, t, 1
        elif t - last > gap_us:
            completed.append((user_id, start, last, n, "gap"))
            start, last, n = t, t, 1
        else:
            # max(): a cross-batch late event with t < stored last must
            # not move the session frontier backwards (it would make a
            # later in-gap event look like a gap split)
            last, n = max(last, t), n + 1
    if start is not None:
        state.update((start, last, n))
        # the idle timeout defaults to the SESSION GAP expressed in
        # processing time: a session only force-closes once the stream
        # has been quiet for a full gap, so a within-gap event arriving
        # late can still extend it — the previous fixed 60 s closed
        # sessions a later event should have extended. Callers tracking
        # fast-forwarded replays (processing time << event time) can
        # pass a smaller idle_timeout_ms explicitly; those 'timeout'
        # closures are provisional by nature.
        state.setTimeoutDuration(
            idle_timeout_ms if idle_timeout_ms is not None else max(gap_us // 1000, 1)
        )
    if completed:
        yield pd.DataFrame(
            completed,
            columns=["user_id", "session_start_us", "session_end_us", "n_events", "closed_by"],
        )


def sessionize_stream(
    events: DataFrame,
    gap_us: int = DEFAULT_GAP_US,
    idle_timeout_ms: int | None = None,
) -> DataFrame:
    """events stream (user_id, ts, ...) -> completed-session stream.

    ``idle_timeout_ms`` (default: gap_us/1000) is the processing-time
    quiet period after which an open session is force-closed with
    ``closed_by='timeout'`` — see _sessionize_group for semantics."""

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_us, idle_timeout_ms)

    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
