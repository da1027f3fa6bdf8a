"""Streaming SCD2 — the dimension-history build (``operators/scd2.py``)
as a CONTINUOUS operator: per key, the open episode lives in
``applyInPandasWithState`` state and a CLOSED episode row is emitted
the moment a different state arrives.  Completes the batch/stream
symmetry the dedup/URL/paragraph/substring families already have, for
the history family: the downstream as-of join consumes closed episodes
incrementally instead of rebuilding the table per day.

Semantics match the batch operator for CLOSED episodes exactly
(pytest-pinned stream == batch twin on the same input; the batch twin
is the `scd2_state_intervals` driver check): episodes close on state
TRANSITIONS only — an open episode stays in state indefinitely, which
is the honest SCD2 contract (a current row has no end date).

Two runtimes:

* ``stream_scd2`` — the ordered-arrival kernel: arrival must be
  per-key event-time ordered ACROSS microbatches (the kernel sorts
  within each batch).  This is the fast path for replays/backfills
  reading time-ordered storage, where the precondition holds by
  construction.  State: one (state, valid_from, n) triple per key.
* ``stream_scd2_reordered`` — the continuous runtime for transports
  that reorder: a WATERMARK-DELAYED REORDER FRONT buffers arrivals in
  state and folds an event only once the watermark strictly passes its
  event time, in (event_time, event_id) order — so any reordering
  bounded by the watermark delay yields exactly the batch episodes,
  and rows later than the delay are dropped by the watermark (standard
  streaming contract; the kernel also guards against them
  independently).  State: the triple + the pending buffer, bounded by
  the events inside one watermark delay per key.
  tests/test_stream_scd2.py pins an out-of-order stream == batch.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dronedb_spark.streaming.reorder import buf_columns, split_ready

EPISODE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("state", T.StringType()),
        T.StructField("valid_from_us", T.LongType()),
        T.StructField("valid_to_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("cur_state", T.StringType()),
        T.StructField("valid_from_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _scd2_fold(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    cur, vfrom, n = state.get if state.exists else (None, None, 0)
    closed: list[dict] = []
    for pdf in pdfs:
        pdf = pdf.sort_values(["t_us", "event_id"])
        for t_us, st in zip(pdf["t_us"].to_numpy(), pdf["state"]):
            t_us = int(t_us)
            if cur is None:
                cur, vfrom, n = st, t_us, 1
            elif st == cur:
                n += 1
            else:
                closed.append(
                    {
                        "user_id": user_id,
                        "state": cur,
                        "valid_from_us": vfrom,
                        "valid_to_us": t_us,
                        "n_events": n,
                    }
                )
                cur, vfrom, n = st, t_us, 1
    state.update((cur, vfrom, n))
    if closed:
        yield pd.DataFrame(closed)
    else:
        yield pd.DataFrame(
            columns=[
                "user_id",
                "state",
                "valid_from_us",
                "valid_to_us",
                "n_events",
            ]
        ).astype(
            {
                "user_id": "int64",
                "valid_from_us": "int64",
                "valid_to_us": "int64",
                "n_events": "int64",
            }
        )


def stream_scd2(events_stream: DataFrame, state_expr: str) -> DataFrame:
    """Closed SCD2 episodes as a stream.  ``state_expr`` is the SQL
    expression deriving the tracked state from an event row."""
    from pyspark.sql import functions as F

    prepared = events_stream.select(
        "user_id",
        F.expr("unix_micros(ts)").alias("t_us"),
        "event_id",
        F.expr(state_expr).alias("state"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _scd2_fold,
        outputStructType=EPISODE_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --------------------------------------------- watermark reorder front --

_STATE_SCHEMA_R = T.StructType(
    [
        T.StructField("cur_state", T.StringType()),
        T.StructField("valid_from_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("buf_t", T.ArrayType(T.LongType())),
        T.StructField("buf_eid", T.ArrayType(T.LongType())),
        T.StructField("buf_state", T.ArrayType(T.StringType())),
    ]
)

_EMPTY_EPISODES = pd.DataFrame(
    columns=["user_id", "state", "valid_from_us", "valid_to_us", "n_events"]
).astype(
    {
        "user_id": "int64",
        "valid_from_us": "int64",
        "valid_to_us": "int64",
        "n_events": "int64",
    }
)


def _scd2_reorder_fold(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    wm_us = state.getCurrentWatermarkMs() * 1000
    if state.exists:
        cur, vfrom, n, bt, be, bs = state.get
        buf = list(zip(bt, be, bs))
    else:
        cur, vfrom, n, buf = None, None, 0, []
    # shared reorder front (streaming/reorder.py): buffered events fold
    # only once the watermark STRICTLY passes their event time, in
    # (t, event_id) order — deterministic under any reordering bounded
    # by the delay; behind-watermark input is guarded out
    arrivals = (
        (int(t_us), int(eid), st)
        for pdf in pdfs
        for t_us, eid, st in zip(
            pdf["t_us"].to_numpy(), pdf["event_id"].to_numpy(), pdf["state"]
        )
    )
    ready, pend = split_ready(buf, arrivals, wm_us)
    closed: list[dict] = []
    for t_us, _eid, st in ready:
        if cur is None:
            cur, vfrom, n = st, t_us, 1
        elif st == cur:
            n += 1
        else:
            closed.append(
                {
                    "user_id": user_id,
                    "state": cur,
                    "valid_from_us": vfrom,
                    "valid_to_us": t_us,
                    "n_events": n,
                }
            )
            cur, vfrom, n = st, t_us, 1
    state.update((cur, vfrom, n, *buf_columns(pend, 3)))
    yield pd.DataFrame(closed) if closed else _EMPTY_EPISODES


def stream_scd2_reordered(
    events_stream: DataFrame, state_expr: str, delay: str = "10 minutes"
) -> DataFrame:
    """Closed SCD2 episodes as a stream, safe under out-of-order arrival
    bounded by ``delay``: the watermark-delayed reorder front holds each
    event in state until the watermark passes it, then folds per key in
    event-time order — emitted episodes equal the batch build's
    (pytest-pinned on a stream whose microbatches interleave and
    backfill timestamps).  Events later than ``delay`` are dropped by
    the watermark, the standard streaming lateness contract."""
    from pyspark.sql import functions as F

    prepared = events_stream.withWatermark("ts", delay).select(
        "user_id",
        F.expr("unix_micros(ts)").alias("t_us"),
        "event_id",
        F.expr(state_expr).alias("state"),
        "ts",
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _scd2_reorder_fold,
        outputStructType=EPISODE_SCHEMA,
        stateStructType=_STATE_SCHEMA_R,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
