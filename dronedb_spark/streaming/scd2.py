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

Ordering caveat (the transition-fold state machine's standard one):
arrival must be per-key event-time ordered ACROSS microbatches; the
kernel sorts within each batch, and production fronts the operator
with a watermark-delayed sorted replay when the transport reorders.
State size: one (state, valid_from, n) triple per key — key-bounded,
no growth with stream length.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

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
