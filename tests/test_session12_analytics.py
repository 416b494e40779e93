"""Unit tests for the session-12 operators: tie-corrected Mann-Whitney /
AUC against hand-computed U, KS max-gap on a known grid, PSI common-band
convention (identical distributions -> 0; one-sided bands dropped), and
triangle counting on a hand-built co-purchase graph (orientation totality,
duplicate-edge collapse, clustering coefficient)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from case_uco_ontology_map_ray.pipelines.analytics import (
    copurchase_triangles,
    event_value_psi,
    ks_click_purchase,
    mannwhitney_auc_click_purchase,
)


def _write_events(tmp_path, rows):
    """rows: (event_type, ts, value)"""
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([1] * len(rows), pa.int64()),
        "event_type": pa.array([r[0] for r in rows]),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "value": pa.array([float(r[2]) for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))


_TS = np.datetime64("2024-01-03T12:00:00", "us")  # a Wednesday


def test_mannwhitney_hand_computed(ray_session, tmp_path):
    """clicks {1,2,3}, purchases {2,3,4}: U_purchase = 1.5+2.5+3 = 7
    (ties count half), 2U = 14, AUC = 7/9."""
    rows = [("click", _TS, v) for v in (1.0, 2.0, 3.0)]
    rows += [("purchase", _TS, v) for v in (2.0, 3.0, 4.0)]
    rows += [("view", _TS, 99.0)]  # other types must be excluded
    _write_events(tmp_path, rows)
    r = mannwhitney_auc_click_purchase(str(tmp_path)).iloc[0]
    assert (int(r.n_click), int(r.n_purchase)) == (3, 3)
    assert int(r.u2_purchase) == 14
    assert int(r.auc_nano) == 777777778  # round-half-away(7/9 * 1e9)


def test_ks_hand_computed(ray_session, tmp_path):
    """Same grids: cumA = 1,2,3,3 / cumB = 0,1,2,3 over values 1..4 ->
    d_num = max|cA*3 - cB*3| = 3, KS = 1/3."""
    rows = [("click", _TS, v) for v in (1.0, 2.0, 3.0)]
    rows += [("purchase", _TS, v) for v in (2.0, 3.0, 4.0)]
    _write_events(tmp_path, rows)
    r = ks_click_purchase(str(tmp_path)).iloc[0]
    assert int(r.d_num) == 3
    assert int(r.ks_nano) == 333333333


def test_mannwhitney_empty_when_one_side_missing(ray_session, tmp_path):
    _write_events(tmp_path, [("click", _TS, 1.0), ("view", _TS, 2.0)])
    assert mannwhitney_auc_click_purchase(str(tmp_path)).empty
    assert ks_click_purchase(str(tmp_path)).empty


def test_psi_identical_distributions_zero(ray_session, tmp_path):
    """Same band histogram on a weekday and a weekend day -> every common
    band has p == q -> PSI exactly 0; a weekday-only band is dropped."""
    wd = np.datetime64("2024-01-03T12:00:00", "us")  # Wed
    we = np.datetime64("2024-01-06T12:00:00", "us")  # Sat
    rows = []
    for ts in (wd, we):
        rows += [("view", ts, 5.0)] * 3 + [("view", ts, 15.0)] * 2
    rows += [("view", wd, 25.0)]  # band 2 observed on weekdays only
    _write_events(tmp_path, rows)
    r = event_value_psi(str(tmp_path)).iloc[0]
    assert (int(r.n_weekday_common), int(r.n_weekend_common)) == (5, 5)
    assert int(r.n_bands_common) == 2
    assert int(r.psi_nano) == 0


def test_psi_empty_when_no_common_bands(ray_session, tmp_path):
    wd = np.datetime64("2024-01-03T12:00:00", "us")
    we = np.datetime64("2024-01-06T12:00:00", "us")
    _write_events(tmp_path, [("view", wd, 5.0), ("view", we, 15.0)])
    assert event_value_psi(str(tmp_path)).empty


def _write_lineitem(tmp_path, rows):
    """rows: (orderkey, partkey)"""
    t = pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))


def test_triangles_hand_built_graph(ray_session, tmp_path):
    """Order 1 buys parts {1,2,3} -> triangle 1-2-3; order 2 buys {1,2}
    (duplicate edge must collapse); order 3 buys {3,4} (pendant edge).
    Edges {12,13,23,34}: degrees 2,2,3,1 -> wedges 1+1+3+0 = 5,
    triangles = 1, gcc = 3/5."""
    rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (3, 3), (3, 4),
            (1, 1)]  # duplicate lineitem row must not create a self-pair
    _write_lineitem(tmp_path, rows)
    r = copurchase_triangles(str(tmp_path)).iloc[0]
    assert (int(r.n_nodes), int(r.n_edges)) == (4, 4)
    assert int(r.n_wedges) == 5
    assert int(r.n_triangles) == 1
    assert int(r.gcc_nano) == 600000000


def test_triangles_no_triangle_star(ray_session, tmp_path):
    """A star (orders {1,2},{1,3},{1,4} around part 1) has wedges but no
    closure."""
    _write_lineitem(tmp_path, [(1, 1), (1, 2), (2, 1), (2, 3),
                               (3, 1), (3, 4)])
    r = copurchase_triangles(str(tmp_path)).iloc[0]
    assert (int(r.n_edges), int(r.n_wedges), int(r.n_triangles)) == (3, 3, 0)
    assert int(r.gcc_nano) == 0


def test_referential_integrity_planted_violations(ray_session, tmp_path):
    """Orders {1,2,2,3(cust 99)}; lineitems on orders {1,1,7}; customers
    {10,20} with order custkeys {10,10,99} -> 1 dup orderkey, 1 orphan
    lineitem key (2 rows), childless orders {2,3}, orphan order rows with
    custkey 99, customer 20 has no orders."""
    from case_uco_ontology_map_ray.pipelines.analytics import (
        referential_integrity_audit,
    )

    pq.write_table(pa.table({
        "o_orderkey": pa.array([1, 2, 2, 3], pa.int64()),
        "o_custkey": pa.array([10, 10, 10, 99], pa.int64()),
    }), str(tmp_path / "orders.parquet"))
    pq.write_table(pa.table({
        "l_orderkey": pa.array([1, 1, 7, 7], pa.int64()),
        "l_partkey": pa.array([1, 2, 3, 4], pa.int64()),
    }), str(tmp_path / "lineitem.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([10, 20], pa.int64()),
    }), str(tmp_path / "customer.parquet"))
    r = referential_integrity_audit(str(tmp_path)).iloc[0]
    assert int(r.n_lineitems) == 4
    assert int(r.n_orphan_lineitems) == 2      # the two rows on order 7
    assert int(r.n_childless_orders) == 2      # orderkeys 2 and 3
    assert int(r.n_dup_orderkeys) == 1         # orderkey 2
    assert int(r.n_orders) == 4
    assert int(r.n_orphan_orders) == 1         # custkey 99 row
    assert int(r.n_customers_no_orders) == 1   # customer 20
    assert int(r.n_dup_custkeys) == 0


def test_volume_anomalies_hand_computed(ray_session, tmp_path):
    """Three Mondays, hour 12, hourly counts (1, 1, 4): mean 2, sample
    var 3 -> z(4) = 2/sqrt(3), z(1) = -1/sqrt(3). Top row is the spike."""
    from case_uco_ontology_map_ray.pipelines.analytics import (
        event_volume_anomalies,
    )

    mondays = [np.datetime64(f"2024-01-{d:02d}T12:00:00", "us")
               for d in (1, 8, 15)]
    rows = [("view", mondays[0], 1.0), ("view", mondays[1], 1.0)]
    rows += [("view", mondays[2] + np.timedelta64(i, "m"), 1.0)
             for i in range(4)]
    _write_events(tmp_path, rows)
    out = event_volume_anomalies(str(tmp_path))
    assert len(out) == 3
    top = out.iloc[0]
    assert (int(top.dow), int(top.hod), int(top.c)) == (0, 12, 4)
    assert int(top.z_nano) == int(np.round(2.0 / np.sqrt(3.0) * 1e9))
    assert int(out.iloc[1].z_nano) == -int(np.round(1.0 / np.sqrt(3.0) * 1e9))
    # ties on |z| break by earlier hour
    assert out.iloc[1].hour_ts < out.iloc[2].hour_ts


def test_volume_anomalies_drops_degenerate_cells(ray_session, tmp_path):
    """A (dow,hod) cell with one hour (n=1) or zero variance yields no z."""
    from case_uco_ontology_map_ray.pipelines.analytics import (
        event_volume_anomalies,
    )

    rows = [("view", np.datetime64("2024-01-01T09:00:00", "us"), 1.0),
            ("view", np.datetime64("2024-01-01T10:00:00", "us"), 1.0),
            ("view", np.datetime64("2024-01-08T10:00:00", "us"), 1.0)]
    _write_events(tmp_path, rows)
    assert event_volume_anomalies(str(tmp_path)).empty


def test_peak_concurrency_overlap_and_day_span(ray_session, tmp_path):
    """u1 active 00:00-00:10, u2 active 00:05-00:20 on day 2, u3 spans the
    day-1 -> day-2 midnight (23:50 -> 00:05, 15-min gap keeps one
    session): peak 3 reached earliest at day-2 00:05."""
    from case_uco_ontology_map_ray.pipelines.analytics import (
        peak_concurrent_sessions,
    )

    def ts(day, h, m):
        return np.datetime64(f"2024-01-{day:02d}T{h:02d}:{m:02d}:00", "us")

    rows = []
    rows += [(1, "view", ts(2, 0, 0), 1.0), (1, "view", ts(2, 0, 10), 1.0)]
    rows += [(2, "view", ts(2, 0, 5), 1.0), (2, "view", ts(2, 0, 20), 1.0)]
    rows += [(3, "view", ts(1, 23, 50), 1.0), (3, "view", ts(2, 0, 5), 1.0)]
    # u3 again much later: separate session (gap > 30 min)
    rows += [(3, "view", ts(2, 12, 0), 1.0)]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([float(r[3]) for r in rows], pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    r = peak_concurrent_sessions(str(tmp_path)).iloc[0]
    assert int(r.n_sessions) == 4
    assert int(r.peak_concurrency) == 3
    assert r.peak_ts == pd.Timestamp("2024-01-02T00:05:00")


def test_peak_concurrency_inclusive_end(ray_session, tmp_path):
    """A session ending exactly when another starts still overlaps
    (active on [start, end] INCLUSIVE -> -1 lands at end+1us)."""
    from case_uco_ontology_map_ray.pipelines.analytics import (
        peak_concurrent_sessions,
    )

    t0 = np.datetime64("2024-01-01T10:00:00", "us")
    rows = [(1, t0 - np.timedelta64(10, "m")), (1, t0), (2, t0)]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows)),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    r = peak_concurrent_sessions(str(tmp_path)).iloc[0]
    assert (int(r.n_sessions), int(r.peak_concurrency)) == (2, 2)
    assert r.peak_ts == pd.Timestamp("2024-01-01T10:00:00")


def test_triangles_small_equals_distributed(ray_session, tmp_path):
    """All three adaptive closure paths (driver numpy / broadcast-edge
    probe / co-grouped exchange) compute identical stats on the same
    graph."""
    rng = np.random.default_rng(7)
    rows = []
    for ok in range(40):
        parts = rng.choice(30, size=rng.integers(2, 6), replace=False)
        rows += [(ok, int(p)) for p in parts]
    _write_lineitem(tmp_path, rows)
    small = copurchase_triangles(str(tmp_path))
    bcast = copurchase_triangles(str(tmp_path), small_work=0)
    exchange = copurchase_triangles(str(tmp_path), small_work=0,
                                    broadcast_edges=0)
    assert small.to_dict("records") == bcast.to_dict("records")
    assert small.to_dict("records") == exchange.to_dict("records")
    assert int(small.iloc[0].n_triangles) > 0
