"""Property-based tests (hypothesis) for the stateful session fold.

``_sessionize_group`` is a pure function over (batch, state), so we can
drive it with arbitrary event streams and arbitrary microbatch
boundaries without touching Spark. The central property is
batch-split invariance: HOW the stream is chunked into microbatches
must never change the final sessions — that is exactly the guarantee a
stateful streaming operator owes its user.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_city_directories_spark.streaming.stream_ops import (
    _GAP_US,
    _sessionize_group,
)


class FakeGroupState:
    """Minimal stand-in for pyspark GroupState (exists/get/update)."""

    def __init__(self):
        self._value = None

    @property
    def exists(self) -> bool:
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, value) -> None:
        self._value = tuple(value)


def reference_sessions(ts_sorted: list[int]) -> list[tuple[int, int, int, int]]:
    """Single-pass oracle: (seq, start, end, n) per session."""
    out = []
    for t in ts_sorted:
        if not out or t - out[-1][2] > _GAP_US:
            out.append([len(out) + 1, t, t, 1])
        else:
            out[-1][2] = t
            out[-1][3] += 1
    return [tuple(s) for s in out]


def run_chunked(ts_sorted: list[int], cuts: list[int]) -> dict[int, tuple]:
    """Feed the stream through _sessionize_group in chunks; return the
    LATEST emitted snapshot per session_seq (update-mode semantics)."""
    state = FakeGroupState()
    bounds = [0, *sorted(cuts), len(ts_sorted)]
    latest: dict[int, tuple] = {}
    for lo, hi in zip(bounds, bounds[1:]):
        chunk = ts_sorted[lo:hi]
        if not chunk:
            continue
        batches = iter([pd.DataFrame({"ts_us": chunk})])
        for pdf in _sessionize_group((7,), batches, state):
            for r in pdf.itertuples(index=False):
                latest[r.session_seq] = (
                    r.session_seq,
                    r.session_start_us,
                    r.session_end_us,
                    r.n_events,
                )
    return latest


timestamps = st.lists(
    st.integers(min_value=0, max_value=20 * _GAP_US), min_size=1, max_size=60
).map(sorted)


@settings(max_examples=200, deadline=None)
@given(
    ts=timestamps,
    cuts=st.lists(st.integers(min_value=0, max_value=60), max_size=6),
)
def test_sessions_invariant_under_microbatch_splits(ts, cuts):
    expected = {s[0]: s for s in reference_sessions(ts)}
    got = run_chunked(ts, [min(c, len(ts)) for c in cuts])
    assert got == expected


@settings(max_examples=100, deadline=None)
@given(ts=timestamps)
def test_session_structure_invariants(ts):
    sessions = reference_sessions(ts)
    got = run_chunked(ts, [])
    assert {s[0] for s in sessions} == set(got)
    for seq, start, end, n in got.values():
        assert start <= end
        assert n >= 1
    ordered = [got[k] for k in sorted(got)]
    for (_, _, prev_end, _), (_, nxt_start, _, _) in zip(ordered, ordered[1:]):
        assert nxt_start - prev_end > _GAP_US  # sessions separated by > gap
    assert sum(s[3] for s in ordered) == len(ts)  # every event in a session
