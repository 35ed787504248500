"""Custom stateful streaming operator: session windows via
applyInPandasWithState.

Watermark/windowed aggregation (streaming/__init__.py) covers the
built-in operators; session windows with a per-user idle gap need
ARBITRARY state — the per-group open session carried across
micro-batches. The state schema holds the running session id (so
emitted ids match the batch sessionizer's cumsum numbering exactly),
its start/end and event count; a session is emitted when a later event
arrives past the gap, or when the group's event-time timeout fires
(production; tests close sessions with in-data sentinel events so the
output is deterministic under any micro-batch slicing).

Invariant (tests/test_stateful_streaming.py): closed sessions from the
stream == the batch sessionizer's output over the same events,
regardless of how the input is sliced into micro-batches, for every
event that arrives while its session (or a later one for the same user)
is still OPEN — including late events inside the open session's span or
gap (clamped in) and late events older than start-minus-gap (emitted as
their own earlier session(s), with the open session renumbered past
them so ids keep matching the batch cumsum). The one reachable
divergence left is inherent to append-mode streaming: an event landing
within the gap of a session that was ALREADY emitted by the event-time
timeout (possible only when the watermark exceeds the gap) opens a new
session where the batch sessionizer would have extended the emitted
one — emitted rows cannot be retracted.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, start_us long, end_us long"
)
STATE_SCHEMA = "sid long, start_us long, end_us long, n long"


def _session_func(gap_minutes: int, use_timeout: bool):
    gap_us = gap_minutes * 60 * 1_000_000

    def func(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        cols = ["user_id", "session_id", "n_events", "start_us", "end_us"]

        if state.hasTimedOut:
            sid, s, e, n = state.get
            # Keep the session counter so the user's NEXT session continues
            # the batch sessionizer's cumsum numbering instead of restarting
            # at 1; start_us=None marks "no open session" (the s-is-None
            # branch below re-opens on the next event).
            state.update((sid, None, None, 0))
            yield pd.DataFrame([(user_id, sid, n, s, e)], columns=cols)
            return

        batch = pd.concat(list(pdfs), ignore_index=True)
        ts_list = [
            int(t)
            for t in batch["ts"]
            .astype("datetime64[us]")
            .astype("int64")
            .sort_values()
        ]
        if state.exists:
            sid, s, e, n = state.get
        else:
            sid, s, e, n = 0, None, None, 0

        out: list[tuple[Any, ...]] = []
        if s is not None and ts_list and ts_list[0] < s - gap_us:
            # Late events OLDER than the open session's start minus the
            # gap: in batch ordering these form separate session(s)
            # BEFORE the open one. Sessionize the (sorted) prefix
            # standalone and renumber — the pre-sessions take the open
            # session's id onward, and the still-unemitted open session
            # shifts past them, so ids keep matching the batch
            # sessionizer's cumsum numbering.
            pre = [t for t in ts_list if t < s - gap_us]
            ts_list = ts_list[len(pre):]
            ps, pe, pn = pre[0], pre[0], 1
            pre_sessions = []
            for t in pre[1:]:
                if t - pe > gap_us:
                    pre_sessions.append((ps, pe, pn))
                    ps, pe, pn = t, t, 1
                else:
                    pe, pn = t, pn + 1
            pre_sessions.append((ps, pe, pn))
            for k, (ps, pe, pn) in enumerate(pre_sessions):
                out.append((user_id, sid + k, pn, ps, pe))
            sid += len(pre_sessions)
        for t in ts_list:
            if s is None:
                sid, s, e, n = sid + 1, t, t, 1
            elif t - e > gap_us:
                out.append((user_id, sid, n, s, e))
                sid, s, e, n = sid + 1, t, t, 1
            else:
                # Clamp: a late event from a later micro-batch (t < e, but
                # inside the watermark and the gap) must not move the
                # session end backwards — later gap comparisons would then
                # use the regressed end and diverge from the batch
                # sessionizer. Extend the span, never shrink it.
                s, e, n = min(s, t), max(e, t), n + 1
        state.update((sid, s, e, n))
        if use_timeout and s is None:
            # nothing open (can only happen on an empty batch after a
            # timeout flush) — no deadline to arm
            yield pd.DataFrame(out, columns=cols)
            return
        if use_timeout:
            # event-time timeout: fires once the watermark passes the
            # open session's idle deadline
            state.setTimeoutTimestamp(e // 1000 + gap_minutes * 60 * 1000)
        yield pd.DataFrame(out, columns=cols)

    return func


def sessionize_stream(
    events_stream: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "1 hour",
    use_timeout: bool = True,
) -> DataFrame:
    """(user_id, ts, ...) stream -> closed sessions
    (user_id, session_id, n_events, start_us, end_us).

    use_timeout=True closes idle sessions when the event-time watermark
    passes their gap deadline (requires the watermark); with False,
    sessions close only when a post-gap event for the same user arrives.
    """
    ts = events_stream.withColumn(
        "ts", events_stream["ts"].cast("timestamp")
    )
    if use_timeout:
        ts = ts.withWatermark("ts", watermark)
        timeout = GroupStateTimeout.EventTimeTimeout
    else:
        timeout = GroupStateTimeout.NoTimeout
    return ts.groupBy("user_id").applyInPandasWithState(
        _session_func(gap_minutes, use_timeout),
        OUT_SCHEMA,
        STATE_SCHEMA,
        "append",
        timeout,
    )
