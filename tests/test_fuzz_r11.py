"""Hypothesis fuzz of the round-11 exact-integer kernels against
brute-force references: the RBO weight table vs a Fraction-arithmetic
RBO, the Gini rank formula vs the mean-absolute-difference identity,
and the CDC packed-MAX fold vs a literal replay."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, settings
from hypothesis import strategies as st

from dronedb_spark.vectors.rbo import _W, DEPTH, RBO_DEN


# ---------------------------------------------------------------- rbo --


def _rbo_fraction(a: list, b: list) -> Fraction:
    """Textbook truncated RBO@DEPTH with p = 9/10, exact rationals."""
    p = Fraction(9, 10)
    total = Fraction(0)
    for d in range(1, DEPTH + 1):
        o_d = len(set(a[:d]) & set(b[:d]))
        total += (1 - p) * p ** (d - 1) * Fraction(o_d, d)
    return total


def _rbo_weights(a: list, b: list) -> int:
    """The operator's fold: each element in both top-DEPTH lists
    contributes W(max(rank_a, rank_b))."""
    ra = {x: i + 1 for i, x in enumerate(a[:DEPTH])}
    rb = {x: i + 1 for i, x in enumerate(b[:DEPTH])}
    return sum(_W[max(ra[x], rb[x])] for x in ra if x in rb)


@settings(max_examples=300, deadline=None)
@given(st.permutations(list(range(14))))
def test_rbo_weight_table_equals_fraction_rbo(perm):
    a = list(range(14))
    b = list(perm)
    assert Fraction(_rbo_weights(a, b), RBO_DEN) == _rbo_fraction(a, b)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(0, 30), min_size=DEPTH, max_size=20, unique=True),
    st.lists(st.integers(31, 61), min_size=DEPTH, max_size=20, unique=True),
)
def test_rbo_disjoint_lists_score_zero(a, b):
    assert _rbo_weights(a, b) == 0


# --------------------------------------------------------------- gini --


def _gini_rank_formula(masses: list) -> tuple:
    """The operator's integers: (2·Σ i·x_(i) − (n+1)·Σx, n·Σx) over the
    ascending rank assignment."""
    xs = sorted(masses)
    n, s = len(xs), sum(xs)
    num = 2 * sum((i + 1) * x for i, x in enumerate(xs)) - (n + 1) * s
    return num, n * s


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(1, 10_000), min_size=1, max_size=40))
def test_gini_rank_formula_equals_mean_abs_difference(masses):
    """Identity: G = Σ|xi−xj| / (2·n·Σx) — so the rank-formula
    numerator must equal half the brute-force absolute-difference sum,
    regardless of ties."""
    num, den = _gini_rank_formula(masses)
    brute = sum(abs(x - y) for x in masses for y in masses)
    assert 2 * num == brute
    assert 0 <= num <= den


# ---------------------------------------------------------------- cdc --


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 5),        # key
            st.integers(0, 99),       # t_us
            st.integers(0, 999),      # event_id (unique-ified below)
            st.sampled_from(["U", "D"]),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_cdc_packed_max_equals_replay(changes):
    """The zero-padded '<t_us><event_id><op>' MAX must pick exactly the
    change a literal in-order replay applies last — for every key,
    under any arrival order, with (t_us, event_id) the replay order."""
    # make (t_us, event_id) unique per key the way a real log is
    seen = set()
    log = []
    for k, t, e, op in changes:
        while (k, t, e) in seen:
            e += 1
        seen.add((k, t, e))
        log.append((k, t, e, op))

    def packed(t, e, op):
        return f"{t:020d}{e:012d}{op}"

    winners = {}
    for k, t, e, op in log:
        pk = packed(t, e, op)
        if k not in winners or pk > winners[k]:
            winners[k] = pk

    replay = {}
    for k, t, e, op in sorted(log, key=lambda r: (r[1], r[2])):
        replay[k] = (t, e, op)

    for k, (t, e, op) in replay.items():
        assert winners[k] == packed(t, e, op)
