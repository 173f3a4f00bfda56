"""Custom stateful streaming operator: event-time sessionization via
``applyInPandasWithState``.

The reference has no sessionization, but its hand-rolled state patterns
(Redis day-sets, TTL join buffers — SURVEY §2.7) are exactly the class
of operator this API replaces when built-ins (dropDuplicates, windowed
aggs, stream-stream joins) can't express the semantics. Gap-based
sessions are the canonical example: session extent depends on the data
itself, so no fixed window works.

Semantics: per key, events within ``gap_seconds`` of the previous
event belong to one session. A session closes when a later event
arrives beyond the gap, or when the event-time watermark passes
session_end + gap (state timeout) — so output is append-only and each
session is emitted exactly once.

Scale: state is three longs per open session per key, evicted on
timeout; data arrives Arrow-batched per key group (no per-row Python
crossings); the shuffle is the single groupBy(key) hash partition.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "mid",
    ts_col: str = "event_ts",
    watermark: str = "10 seconds",
) -> DataFrame:
    """events(key_col, ts_col, ...) -> stream of closed sessions
    (key, session_start, session_end, n_events)."""
    gap_ms = gap_seconds * 1000
    out_schema = (
        f"{key_col} string, session_start timestamp, "
        f"session_end timestamp, n_events bigint"
    )
    state_schema = "start long, last long, n long"

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator["pd.DataFrame"],  # noqa: F821
        state: GroupState,
    ) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        k = key[0]
        closed: list[tuple] = []
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((k, start, last, n))
            state.remove()
        else:
            ts_ms: list[int] = []
            for pdf in pdfs:
                ts_ms.extend((pdf[ts_col].astype("int64") // 10**6).tolist())
            ts_ms.sort()
            if state.exists:
                start, last, n = state.get
            else:
                start = last = None
                n = 0
            if last is not None and ts_ms:
                # Late events older than the open session's backward
                # reach (t < start - gap) can never merge with it — the
                # batch sessionizer would emit them as separate earlier
                # sessions, and `t - last <= gap` alone is trivially
                # true for them (round-2 advice). They form a sorted
                # prefix; chain them among themselves and close.
                cut = 0
                while cut < len(ts_ms) and ts_ms[cut] < start - gap_ms:
                    cut += 1
                pre, ts_ms = ts_ms[:cut], ts_ms[cut:]
                ps = pl = pn = None
                for t in pre:
                    if pl is None:
                        ps, pl, pn = t, t, 1
                    elif t - pl <= gap_ms:
                        pl, pn = t, pn + 1
                    else:
                        closed.append((k, ps, pl, pn))
                        ps, pl, pn = t, t, 1
                if pl is not None:
                    closed.append((k, ps, pl, pn))
            for t in ts_ms:
                if last is None:
                    start, last, n = t, t, 1
                elif t - last <= gap_ms:
                    # events can arrive out of order ACROSS batches
                    # (late-but-within-watermark): the session end must
                    # advance monotonically — rewinding `last` to an
                    # earlier t could make the next event look
                    # out-of-gap and split a session the batch
                    # sessionizer (operators/sessions.py) keeps whole.
                    # The pre-chain above guarantees t >= start - gap
                    # here, so the backward extension via min() is
                    # bounded by one gap.
                    start, last, n = min(start, t), max(last, t), n + 1
                else:
                    closed.append((k, start, last, n))
                    start, last, n = t, t, 1
            if last is not None:
                state.update((start, last, n))
                # close via timeout once the watermark passes the gap;
                # Spark requires a timeout strictly beyond the current
                # watermark
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(last + gap_ms, wm + 1))
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] for c in closed], unit="ms"
                    ),
                    "session_end": pd.to_datetime(
                        [c[2] for c in closed], unit="ms"
                    ),
                    "n_events": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
