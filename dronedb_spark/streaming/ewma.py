"""Streaming EWMA — the integer control-chart fold
(``operators/ewma.py``) as a CONTINUOUS operator: per series the EWMA
state lives in ``applyInPandasWithState`` state and a bucket's
(cnt, ewma_micro) row emits the moment the watermark passes the
bucket's END (no event of that hour can still arrive).  QUIET hours
fold as explicit zero-count steps — the decay between bursts is the
chart's content, so the stream fills the same gap-free grid the batch
build generates.

The grid ORIGIN is a deployment parameter (the stream's epoch): the
batch twin starts every series at the corpus-global first bucket, so
the stream==batch pytest passes the batch grid's origin in.  State per
series: the EWMA BIGINT + last folded index + the pending
(bucket, count) pairs inside one watermark delay — bounded, no growth
with stream length.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from dronedb_spark.operators.ewma import ALPHA_P, ALPHA_Q, SCALE
from dronedb_spark.operators.autocorr import BUCKET_S

EWMA_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("bucket", T.LongType()),
        T.StructField("cnt", T.LongType()),
        T.StructField("ewma_micro", T.LongType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("s", T.LongType()),
        T.StructField("last_idx", T.LongType()),
        T.StructField("pend_b", T.ArrayType(T.LongType())),
        T.StructField("pend_c", T.ArrayType(T.LongType())),
    ]
)

_EMPTY = pd.DataFrame(columns=["event_type", "bucket", "cnt", "ewma_micro"]).astype(
    {"bucket": "int64", "cnt": "int64", "ewma_micro": "int64"}
)


def _make_fold(origin_idx: int, p: int, q: int, bucket_s: int):
    bu = bucket_s * 1_000_000

    def fold(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (etype,) = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            s, last_idx, pb, pc = state.get
            pend = dict(zip(pb, pc))
        else:
            s, last_idx, pend = None, origin_idx - 1, {}
        if not state.hasTimedOut:
            for pdf in pdfs:
                for t_us in pdf["t_us"].to_numpy():
                    b = int(t_us) // bu
                    # late-row guard (mirrors _scd2_reorder_fold): a row
                    # whose bucket already folded would sit in `pend`
                    # forever — the fold loop never revisits idx <=
                    # last_idx — leaking state if Spark's late filter
                    # ever lets one through (watermark updates lag a
                    # microbatch).
                    if b <= last_idx:
                        continue
                    pend[b] = pend.get(b, 0) + 1
        # a bucket b is FINAL once wm passes its end: (b+1)·bu <= wm —
        # fold EVERY final index from the frontier, zeros included (the
        # decay between bursts is the chart's content, exactly the
        # batch grid)
        lim = wm_us // bu - 1
        out = []
        for idx in range(last_idx + 1, lim + 1):
            c = pend.pop(idx, 0)
            s = c * SCALE if s is None else (p * c * SCALE + (q - p) * s) // q
            out.append(
                {
                    "event_type": etype,
                    "bucket": idx * bucket_s,
                    "cnt": c,
                    "ewma_micro": s,
                }
            )
            last_idx = idx
        state.update((s, last_idx, list(pend.keys()), list(pend.values())))
        # wake at the next bucket boundary: the series keeps decaying
        # (and pending buckets keep flushing) without new data
        ts_ms = (last_idx + 2) * bucket_s * 1000 + 1
        state.setTimeoutTimestamp(max(ts_ms, wm_us // 1000 + 1))
        yield pd.DataFrame(out) if out else _EMPTY

    return fold


def stream_ewma(
    events_stream: DataFrame,
    origin_idx: int,
    p: int = ALPHA_P,
    q: int = ALPHA_Q,
    bucket_s: int = BUCKET_S,
    delay: str = "2 hours",
) -> DataFrame:
    """(event_type, bucket, cnt, ewma_micro) rows as buckets finalize —
    identical values to the batch ``ewma_series`` over the same grid
    origin (pytest-pinned)."""
    from pyspark.sql import functions as F

    prepared = events_stream.withWatermark("ts", delay).select(
        "event_type", F.expr("unix_micros(ts)").alias("t_us"), "ts"
    )
    return prepared.groupBy("event_type").applyInPandasWithState(
        _make_fold(origin_idx, p, q, bucket_s),
        outputStructType=EWMA_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
