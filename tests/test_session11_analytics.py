"""Unit tests for the session-11 operators: chi2 grid completion and the
zero-contribution independence case, Markov pairs never crossing users,
dyadic-decay exactness, and sessionization gap/landing-tie semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from case_uco_ontology_map_ray.pipelines.analytics import (
    chi2_event_hour,
    event_type_transitions,
    session_dwell_stats,
    user_decayed_spend,
)


def _write_events(tmp_path, rows):
    """rows: (user_id, event_type, ts, value)"""
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([float(r[3]) for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))


def _ts(h, m=0, s=0, us=0, day=1):
    base = np.datetime64(f"2024-01-{day:02d}T00:00:00", "us")
    return (base + np.timedelta64(h, "h") + np.timedelta64(m, "m")
            + np.timedelta64(s, "s") + np.timedelta64(us, "us"))


def test_chi2_independent_table_is_zero(ray_session, tmp_path):
    """Perfectly proportional counts -> every cell o == e -> chi2 == 0;
    grid dims and df reflect OBSERVED types x hours."""
    rows = []
    # 2 types x 2 hours, counts 1:2 in both rows -> independent
    for n, (et, h) in zip([10, 20, 30, 60],
                          [("a", 0), ("a", 1), ("b", 0), ("b", 1)]):
        rows += [(1, et, _ts(h, m=i % 50), 1.0) for i in range(n)]
    _write_events(tmp_path, rows)
    out = chi2_event_hour(str(tmp_path))
    r = out.iloc[0]
    assert (int(r.n_events), int(r.n_types), int(r.n_hours), int(r.df)) == \
        (120, 2, 2, 1)
    assert int(r.chi2_micro) == 0


def test_chi2_zero_cell_contributes_expectation(ray_session, tmp_path):
    """A (type, hour) cell with NO events still contributes (0-e)^2/e = e.
    2x2 with an empty cell: o = [[4,0],[0,4]] -> chi2 = n = 8."""
    rows = [(1, "a", _ts(0, m=i), 1.0) for i in range(4)]
    rows += [(1, "b", _ts(1, m=i), 1.0) for i in range(4)]
    _write_events(tmp_path, rows)
    out = chi2_event_hour(str(tmp_path))
    assert int(out.iloc[0].chi2_micro) == 8_000_000


def test_transitions_never_cross_users_and_tiebreak(ray_session, tmp_path):
    """Pairs form only within a user; equal-ts events order by event_id
    (event_id is the row index in _write_events)."""
    t0 = _ts(0)
    rows = [
        (1, "a", t0, 1.0),        # id 0
        (1, "b", t0, 1.0),        # id 1: same ts -> a->b by event_id
        (2, "c", _ts(0, m=1), 1.0),  # id 2: user 2, no pair with user 1
        (2, "a", _ts(0, m=2), 1.0),  # id 3: c->a
    ]
    _write_events(tmp_path, rows)
    out = event_type_transitions(str(tmp_path))
    got = {(r.prev_type, r.next_type): int(r.n_pairs)
           for r in out.itertuples()}
    assert got == {("a", "b"): 1, ("c", "a"): 1}
    # row-normalized probabilities: single-pair rows are exactly 1e6
    assert set(out["p_micro"]) == {1_000_000}


def test_decayed_spend_dyadic_exactness(ray_session, tmp_path):
    """cents 100 two days before last + 200 on last day:
    decayed = 200e6 + 100 * 0.25 * 1e6 = 225_000_000 exactly."""
    rows = [(1, "view", _ts(0, day=1), 1.00),
            (1, "view", _ts(0, day=3), 2.00)]
    _write_events(tmp_path, rows)
    out = user_decayed_spend(str(tmp_path))
    assert int(out.iloc[0].decayed_microcents) == 225_000_000
    assert int(out.iloc[0].n_days_obs) == 2


def test_session_dwell_gap_boundary_and_landing(ray_session, tmp_path):
    """Exactly 30m inactivity does NOT break a session (> rule); 30m+1us
    does. Bounce = single-event session. Landing of a same-ts tie = lower
    event_id."""
    t0 = _ts(0)
    m30 = np.timedelta64(30, "m")
    us1 = np.timedelta64(1, "us")
    rows = [
        (1, "b", t0, 1.0),                 # id 0: landing tie winner
        (1, "a", t0, 1.0),                 # id 1: same ts, higher id
        (1, "c", t0 + m30, 1.0),           # id 2: exactly 30m -> same sess
        (1, "d", t0 + m30 + m30 + us1, 1.0),  # id 3: 30m+1us -> new sess
        (2, "e", t0, 1.0),                 # id 4: bounce session
    ]
    _write_events(tmp_path, rows)
    out = session_dwell_stats(str(tmp_path))
    got = {r.landing_type: (int(r.n_sessions), int(r.n_bounces),
                            int(r.sum_dwell_us))
           for r in out.itertuples()}
    assert got == {
        "b": (1, 0, 30 * 60 * 1_000_000),  # ids 0,1,2: dwell 30m
        "d": (1, 1, 0),
        "e": (1, 1, 0),
    }
