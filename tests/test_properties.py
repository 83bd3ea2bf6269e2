"""Property-based tests (hypothesis) for the pure kernels the
distributed operators delegate to — these run hundreds of generated
cases without Spark-job overhead.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etl_city_directories_spark.streaming.stream_ops import (
    _GAP_US,
    _sessionize_group,
)


class _FakeState:
    """Minimal GroupState stand-in for driving _sessionize_group."""

    def __init__(self):
        self._value = None

    @property
    def exists(self):
        return self._value is not None

    @property
    def get(self):
        return self._value

    def update(self, v):
        self._value = v


def _run(ts_batches: list[list[int]], user_id: int = 7):
    """Feed microbatches through the sessionizer; return the LAST
    snapshot per (user, seq) — the operator's read-back contract."""
    import pandas as pd

    state = _FakeState()
    latest: dict[tuple[int, int], tuple] = {}
    for ts_list in ts_batches:
        out = list(
            _sessionize_group(
                (user_id,),
                iter([pd.DataFrame({"ts_us": ts_list})]),
                state,
            )
        )
        for pdf in out:
            for r in pdf.itertuples(index=False):
                latest[(r.user_id, r.session_seq)] = (
                    r.session_start_us,
                    r.session_end_us,
                    r.n_events,
                )
    return latest


ts_lists = st.lists(
    st.integers(min_value=0, max_value=50 * _GAP_US), min_size=1, max_size=60
).map(sorted)


@settings(max_examples=200, deadline=None)
@given(ts_lists)
def test_sessionize_partitions_by_gap(ts):
    """Sessions partition the events: consecutive events in one session
    are ≤ gap apart, consecutive sessions are > gap apart, and counts
    sum to the input size."""
    sessions = sorted(_run([ts]).items())
    assert sum(n for _, (_, _, n) in sessions) == len(ts)
    bounds = [(s, e) for _, (s, e, _) in sessions]
    for (s, e) in bounds:
        assert s <= e
    for (_, e_prev), (s_next, _) in zip(bounds, bounds[1:]):
        assert s_next - e_prev > _GAP_US  # sessions split by > gap
    # within a session: reconstruct membership and check max step
    i = 0
    for (_, (s, e, n)) in sessions:
        chunk = ts[i : i + n]
        assert chunk[0] == s and chunk[-1] == e
        for a, b in zip(chunk, chunk[1:]):
            assert b - a <= _GAP_US
        i += n


@settings(max_examples=100, deadline=None)
@given(ts_lists, st.integers(min_value=0, max_value=59))
def test_sessionize_state_survives_any_batch_split(ts, cut):
    """Splitting the same event stream into two microbatches at ANY
    point must produce identical final sessions (state carries the
    open session across the boundary)."""
    cut = min(cut, len(ts))
    single = _run([ts])
    split = _run([ts[:cut], ts[cut:]] if ts[cut:] else [ts[:cut]] or [[]])
    assert single == split


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=8
    )
)
def test_manifest_parser_never_crashes_on_cell_noise(rows):
    """parse_manifest_html must tolerate arbitrary cell text (the
    reference drops rows with missing required fields, never raises)."""
    from etl_city_directories_spark.sources.manifest import parse_manifest_html

    body = "".join(
        "<tr>" + "".join(f"<td>{c}</td>" for c in [r, "1850", "1", "2", "2"]) + "</tr>"
        for r in rows
    )
    html = (
        "<table><thead><tr><th>uuid</th><th>year</th><th>startPage</th>"
        "<th>endPage</th><th>columnCount</th></tr></thead>"
        f"<tbody>{body}</tbody></table>"
    )
    out = parse_manifest_html(html)
    for row in out:
        assert row["uuid"]  # rows that survive have the required fields
        assert row["start_page"] == 1 and row["end_page"] == 2
