"""Hypothesis fuzz of the SCD2 reorder-front KERNEL: any arrival order
and microbatch split (with Spark's late-filter contract applied) must
fold to exactly the in-order episodes — driven directly against
``_scd2_reorder_fold`` with a simulated GroupState, so thousands of
orderings run without a streaming query."""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from dronedb_spark.streaming.scd2 import _scd2_reorder_fold


class FakeState:
    def __init__(self):
        self._v = None
        self._wm_ms = 0
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v

    def getCurrentWatermarkMs(self):
        return self._wm_ms


def _reference_episodes(events):
    """In-order fold of (t, eid, state): the batch semantics."""
    closed = []
    cur = vfrom = None
    n = 0
    for t, _e, s in sorted(events):
        if cur is None:
            cur, vfrom, n = s, t, 1
        elif s == cur:
            n += 1
        else:
            closed.append((cur, vfrom, t, n))
            cur, vfrom, n = s, t, 1
    return closed, (cur, vfrom, n)


@st.composite
def scenario(draw):
    n = draw(st.integers(min_value=1, max_value=25))
    ts = draw(
        st.lists(
            st.integers(min_value=0, max_value=10_000),
            min_size=n, max_size=n, unique=True,
        )
    )
    states = draw(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=n, max_size=n)
    )
    events = [(t, i, s) for i, (t, s) in enumerate(zip(ts, states))]
    order = draw(st.permutations(events))
    # microbatch split points
    cuts = sorted(
        draw(
            st.lists(
                st.integers(min_value=0, max_value=n), max_size=5
            )
        )
    )
    delay = draw(st.integers(min_value=1, max_value=5_000))
    return events, order, cuts, delay


@settings(max_examples=300, deadline=None)
@given(scenario())
def test_any_bounded_reordering_folds_to_batch_episodes(sc):
    events, order, cuts, delay_us = sc
    batches = []
    prev = 0
    for c in cuts + [len(order)]:
        if c > prev:
            batches.append(order[prev:c])
            prev = c
    state = FakeState()
    emitted = []
    max_seen = 0
    accepted = []  # events that survive Spark's late filter
    wm_us = 0
    for batch in batches:
        # Spark computes the batch's watermark from PRIOR batches
        state._wm_ms = wm_us // 1000
        rows = [r for r in batch if r[0] >= wm_us]  # late filter
        accepted.extend(rows)
        pdf = pd.DataFrame(
            {
                "t_us": [r[0] for r in rows],
                "event_id": [r[1] for r in rows],
                "state": [r[2] for r in rows],
            }
        )
        out = list(_scd2_reorder_fold((7,), [pdf], state))
        for o in out:
            emitted.extend(
                (r.state, r.valid_from_us, r.valid_to_us, r.n_events)
                for r in o.itertuples()
            )
        max_seen = max([max_seen] + [r[0] for r in rows])
        wm_us = max(0, max_seen - delay_us)
    # flush: advance the watermark far past everything, fold once more
    state._wm_ms = (max_seen + delay_us + 10_000) // 1000 + 1
    out = list(_scd2_reorder_fold((7,), [pd.DataFrame(
        {"t_us": [], "event_id": [], "state": []})], state))
    for o in out:
        emitted.extend(
            (r.state, r.valid_from_us, r.valid_to_us, r.n_events)
            for r in o.itertuples()
        )
    want_closed, _open = _reference_episodes(accepted)
    assert emitted == want_closed
