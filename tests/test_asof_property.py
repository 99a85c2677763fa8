"""Property parity for the as-of join partition kernel: the vectorized
running-maximum merge must match a naive per-user scan on arbitrary
event histories (user-boundary leaks and equal-timestamp tie-breaks are
the dangerous cases)."""

import sys

import numpy as np
import pyarrow as pa
from hypothesis import given, settings, strategies as st

sys.path.insert(0, "/root/repo")

from biomedical_el_ray.pipelines.analytics import _asof_partition  # noqa: E402

events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),      # user_id
        st.integers(min_value=0, max_value=20),     # ts (us)
        st.booleans(),                               # is_left (purchase)
    ),
    min_size=0,
    max_size=30,
)


def _naive(rows):
    """Per-user brute scan mirroring the documented semantics."""
    out = {}
    for eid, (uid, ts, is_left) in enumerate(rows):
        if not is_left:
            continue
        best = None  # (ts, eid) of best ref
        for rid, (ruid, rts, rleft) in enumerate(rows):
            if rleft or ruid != uid or rts > ts:
                continue
            if best is None or (rts, rid) > best:
                best = (rts, rid)
        out[eid] = best
    return out


@settings(deadline=None, max_examples=80)
@given(events)
def test_range_join_matches_naive(rows):
    """The merge-rank window bounds must produce exactly the same-user
    pairs within [ts - win, ts] that a brute double loop finds."""
    from biomedical_el_ray.pipelines.analytics import _range_partition

    WIN = 5
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(
                ["error" if r[2] else "click" for r in rows], pa.string()
            ),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype="datetime64[us]")
            ),
        }
    )
    out = _range_partition(t, "error", "click", WIN).to_pylist()
    got = {(r["event_id"], r["ref_event_id"], r["lag_us"]) for r in out}
    want = set()
    for eid, (uid, ts, is_left) in enumerate(rows):
        if not is_left:
            continue
        for rid, (ruid, rts, rleft) in enumerate(rows):
            if not rleft and ruid == uid and ts - WIN <= rts <= ts:
                want.add((eid, rid, ts - rts))
    assert got == want


@settings(deadline=None, max_examples=80)
@given(events)
def test_asof_matches_naive(rows):
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(
                ["purchase" if r[2] else "click" for r in rows], pa.string()
            ),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype="datetime64[us]")
            ),
        }
    )
    got = {
        r["event_id"]: (None if r["ref_event_id"] is None
                        else (r["lag_us"], r["ref_event_id"]))
        for r in _asof_partition(t, "purchase", "click").to_pylist()
    }
    want = {}
    for eid, best in _naive(rows).items():
        if best is None:
            want[eid] = None
        else:
            rts, rid = best
            want[eid] = (rows[eid][1] - rts, rid)
    assert got == want
