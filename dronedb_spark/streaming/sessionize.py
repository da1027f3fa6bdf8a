"""Streaming sessionization — the gap-window session build
(``operators/sessionize.py``) as a CONTINUOUS operator, completing the
batch/stream symmetry for the session family: closed sessions emit the
moment they are PROVABLY closed, which happens on either path a real
deployment needs —

* a folded event more than ``gap`` after the open session's last event
  closes it (the data path), or
* the watermark passes ``last_event + gap`` with no successor, so no
  admissible event can extend it: the session closes via EVENT-TIME
  TIMEOUT (the idle-key path — a user who walks away still gets their
  session emitted without any further event for that key).

Out-of-order arrival is handled by the same watermark-delayed reorder
front as ``streaming/scd2.py``: events buffer in state and fold only
once the watermark strictly passes their event time, in
(event_time, event_id) order — so any reordering bounded by the delay
yields exactly the batch sessions (pytest-pinned stream == batch on the
full events corpus; the batch twin carries the `sessionize_gap_windows`
driver oracle).  Per-key state: the open session triple + a session
counter + the pending buffer (bounded by one watermark delay of
events).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dronedb_spark.operators.sessionize import GAP_S
from dronedb_spark.streaming.reorder import buf_columns, split_ready

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_no", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("duration_s", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_closed", T.LongType()),
        T.StructField("open_start", T.LongType()),
        T.StructField("open_last", T.LongType()),
        T.StructField("open_n", T.LongType()),
        T.StructField("buf_t", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
    ]
)

_EMPTY_SESSIONS = pd.DataFrame(
    columns=["user_id", "session_no", "n_events", "start_us", "end_us", "duration_s"]
).astype("int64")


def _make_fold(gap_us: int):
    def fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            n_closed, ostart, olast, on, bt, be = state.get
            buf = list(zip(bt, be))
        else:
            n_closed, ostart, olast, on, buf = 0, None, None, 0, []
        # shared reorder front (streaming/reorder.py): fold in
        # (event_time, event_id) order once the watermark passes;
        # behind-watermark input is guarded out
        arrivals = (
            (int(t_us), int(eid))
            for pdf in ([] if state.hasTimedOut else pdfs)
            for t_us, eid in zip(
                pdf["t_us"].to_numpy(), pdf["event_id"].to_numpy()
            )
        )
        ready, pend = split_ready(buf, arrivals, wm_us)
        closed: list[dict] = []

        def close_open():
            nonlocal n_closed, ostart, olast, on
            n_closed += 1
            closed.append(
                {
                    "user_id": user_id,
                    "session_no": n_closed,
                    "n_events": on,
                    "start_us": ostart,
                    "end_us": olast,
                    "duration_s": (olast - ostart) // 1_000_000,
                }
            )
            ostart = olast = None
            on = 0

        for t_us, _eid in ready:
            if ostart is None:
                ostart, olast, on = t_us, t_us, 1
            elif t_us - olast > gap_us:
                close_open()
                ostart, olast, on = t_us, t_us, 1
            else:
                olast, on = t_us, on + 1
        # idle close: nothing admissible (every future event has
        # t >= wm) can extend a session once wm passes last + gap
        if ostart is not None and wm_us > olast + gap_us:
            close_open()
        state.update((n_closed, ostart, olast, on, *buf_columns(pend, 2)))
        # wake this key again at the earliest event-time that can change
        # its output: the open session's close horizon, or the first
        # pending event becoming foldable
        wakeups = []
        if ostart is not None:
            wakeups.append((olast + gap_us) // 1000 + 1)
        if pend:
            wakeups.append(min(t for t, _ in pend) // 1000 + 1)
        if wakeups:
            state.setTimeoutTimestamp(max(min(wakeups), wm_us // 1000 + 1))
        yield pd.DataFrame(closed) if closed else _EMPTY_SESSIONS

    return fold


def stream_sessionize(
    events_stream: DataFrame,
    gap_s: int = GAP_S,
    delay: str = "1 hour",
) -> DataFrame:
    """Closed (user_id, session_no, n_events, start_us, end_us,
    duration_s) sessions as a stream — identical rows to the batch
    ``sessionize`` for every session the watermark has closed."""
    from pyspark.sql import functions as F

    prepared = events_stream.withWatermark("ts", delay).select(
        "user_id",
        F.expr("unix_micros(ts)").alias("t_us"),
        "event_id",
        "ts",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_fold(gap_s * 1_000_000),
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def stream_sessionize_native(
    events_stream: DataFrame,
    gap_s: int = GAP_S,
    delay: str = "1 hour",
) -> DataFrame:
    """The BUILT-IN runtime: Spark's ``session_window`` gap aggregation
    — (user_id, n_events, start_us, end_us) per closed session, where
    ``end_us`` is the last event (the native window's end minus the
    gap).  Prefer this when session NUMBERING isn't needed: it is pure
    JVM aggregation (no Python state fold), merges partial sessions
    map-side, and the watermark closes sessions exactly like the
    custom runtime.  The custom ``stream_sessionize`` above exists for
    the extras the built-in can't express: per-key session numbers and
    deterministic (event_time, event_id) tie order.  Pytest pins
    native == batch on the full corpus."""
    from pyspark.sql import functions as F

    gap_us = gap_s * 1_000_000
    agged = (
        events_stream.withWatermark("ts", delay)
        .groupBy("user_id", F.session_window("ts", f"{gap_s} seconds"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    )
    return agged.select(
        "user_id",
        "n_events",
        F.expr("unix_micros(session_window.start)").alias("start_us"),
        (F.expr("unix_micros(session_window.end)") - gap_us)
        .cast("bigint")
        .alias("end_us"),
    )
