"""Session-15 operators: RFM segmentation bins, Markov stationary vector."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from case_uco_ontology_map_ray.pipelines.analytics import (
    customer_rfm_segments,
    event_markov_stationary,
)


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_rfm_bins_exact_rank_rule(tmp_path):
    """n=7 customers: the pinned rule (rank-1)*5 // 7 + 1 gives bin sizes
    2,1,2,1,1 (ranks 1..7 -> bins 1,1,2,3,3,4,5) — NOT ntile(5)'s 2,2,1,1,1.
    One order per customer, all three metrics share the same ordering, so
    each customer's (r,f,m) bins land on its own diagonal cell."""
    n = 7
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array(range(1, n + 1), pa.int64()),
        # strictly increasing day and price; freq is constant (=1) so the
        # freq rank falls back to the custkey tie-break (same order)
        "o_orderdate": pa.array(
            [np.datetime64(f"2024-01-{d:02d}T00:00:00", "us")
             for d in range(1, n + 1)]),
        "o_totalprice": pa.array([float(100 * d) for d in range(1, n + 1)],
                                 pa.float64()),
    }))
    out = customer_rfm_segments(str(tmp_path))
    # expected bins per rank r: ((r-1)*5)//7 + 1
    exp_bins = [(r - 1) * 5 // n + 1 for r in range(1, n + 1)]
    assert exp_bins == [1, 1, 2, 3, 3, 4, 5]
    got = out.set_index(["r_bin", "f_bin", "m_bin"])["n_customers"].to_dict()
    from collections import Counter
    exp = Counter((b, b, b) for b in exp_bins)
    assert got == dict(exp)
    assert int(out["n_customers"].sum()) == n
    # monetary totals: cents sum preserved through the grid
    assert int(out["total_cents"].sum()) == sum(100 * d * 100
                                                for d in range(1, n + 1))


@pytest.mark.usefixtures("ray_session")
def test_rfm_aggregates_per_customer(tmp_path):
    """Multiple orders per customer: recency = max day, freq = count,
    monetary = total cents (ranked on whole dollars)."""
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderdate": pa.array([
            np.datetime64("2024-01-01T00:00:00", "us"),
            np.datetime64("2024-03-01T00:00:00", "us"),
            np.datetime64("2024-02-01T00:00:00", "us")]),
        "o_totalprice": pa.array([10.0, 20.0, 5.0], pa.float64()),
    }))
    out = customer_rfm_segments(str(tmp_path))
    # cust 1: rec later, freq 2, cents 3000; cust 2: rec earlier, freq 1,
    # cents 500 -> with n=2 ranks map to bins (1-based): rank1->1, rank2->3
    assert int(out["n_customers"].sum()) == 2
    assert int(out["total_cents"].sum()) == 3500
    big = out[out["total_cents"] == 3000].iloc[0]
    assert (big["r_bin"], big["f_bin"], big["m_bin"]) == (3, 3, 3)


@pytest.mark.usefixtures("ray_session")
def test_k_anonymity_hand_case(tmp_path):
    """Classes of sizes 1, 3, 7: below k=2 -> 1 class / 1 row; below k=5
    -> 2 classes / 4 rows; below k=10 and 20 -> all 3 / 11 rows."""
    nk = [1] * 1 + [2] * 3 + [3] * 7
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array(range(len(nk)), pa.int64()),
        "c_nationkey": pa.array(nk, pa.int32()),
        "c_mktsegment": pa.array(["S"] * len(nk)),
    }))
    from case_uco_ontology_map_ray.pipelines.analytics import (
        customer_k_anonymity,
    )
    out = customer_k_anonymity(str(tmp_path)).set_index("k")
    assert out.loc[2].tolist() == [1, 1, 3]
    assert out.loc[5].tolist() == [2, 4, 3]
    assert out.loc[10].tolist() == [3, 11, 3]
    assert out.loc[20].tolist() == [3, 11, 3]


@pytest.mark.usefixtures("ray_session")
def test_hourly_p95_integer_rule(tmp_path):
    """20 values 1..20 in one hour: p95 = min v with 20*cum >= 19*20,
    i.e. cum >= 19 -> v = 19 (the discrete lower-p95, not interpolated)."""
    ts = [np.datetime64("2024-01-01T10:00:00", "us")
          + np.timedelta64(i, "m") for i in range(20)]
    _write(tmp_path, "events", pa.table({
        "ts": pa.array(ts),
        "value": pa.array([float(v) for v in range(1, 21)], pa.float64()),
    }))
    from case_uco_ontology_map_ray.pipelines.analytics import hourly_value_p95
    out = hourly_value_p95(str(tmp_path))
    assert len(out) == 1
    assert out.iloc[0]["n"] == 20 and out.iloc[0]["p95_cents"] == 1900


@pytest.mark.usefixtures("ray_session")
def test_event_type_runs_hand_case(tmp_path):
    """Stream A A A B A for user 1 and A A for user 2: runs are
    (1,A,3), (1,B,1), (1,A,1), (2,A,2) — runs split on type change and
    never merge across the gap or across users."""
    rows = [(1, "A", "2024-01-01T00:00:00", 0),
            (1, "A", "2024-01-01T00:01:00", 1),
            (1, "A", "2024-01-01T00:02:00", 2),
            (1, "B", "2024-01-01T00:03:00", 3),
            (1, "A", "2024-01-01T00:04:00", 4),
            (2, "A", "2024-01-01T00:00:00", 5),
            (2, "A", "2024-01-01T00:05:00", 6)]
    _write(tmp_path, "events", _events(rows))
    from case_uco_ontology_map_ray.pipelines.analytics import (
        user_event_type_runs,
    )
    out = user_event_type_runs(str(tmp_path))
    got = list(zip(out["user_id"], out["event_type"], out["run_len"]))
    # equal-length runs order by run_start: B (00:03) precedes A (00:04)
    assert got == [(1, "A", 3), (2, "A", 2), (1, "B", 1), (1, "A", 1)]
    top = out.iloc[0]
    assert str(top["run_start"]) == "2024-01-01 00:00:00"
    assert str(top["run_end"]) == "2024-01-01 00:02:00"


@pytest.mark.usefixtures("ray_session")
def test_fd_audit_holds_and_violations(tmp_path):
    """PK-backed FD (orderkey -> custkey) reports 0 violations; the
    planted custkey -> priority violation (cust 1 uses two priorities)
    reports 1 violating LHS with fan-out 2."""
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([10, 11, 12], pa.int64()),
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_orderpriority": pa.array(["HIGH", "LOW", "LOW"]),
    }))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([10, 10], pa.int64()),
        "l_partkey": pa.array([5, 5], pa.int64()),
        "l_suppkey": pa.array([7, 8], pa.int64()),
        "l_returnflag": pa.array(["N", "N"]),
    }))
    from case_uco_ontology_map_ray.pipelines.analytics import (
        functional_dependency_audit,
    )
    out = functional_dependency_audit(str(tmp_path)).set_index("fd")
    assert out.loc["orderkey_to_custkey", "n_violating_lhs"] == 0
    assert out.loc["custkey_to_priority", "n_violating_lhs"] == 1
    assert out.loc["custkey_to_priority", "max_rhs_variants"] == 2
    assert out.loc["partkey_to_suppkey", "n_violating_lhs"] == 1
    assert out.loc["orderkey_to_returnflag", "n_violating_lhs"] == 0


@pytest.mark.usefixtures("ray_session")
def test_logreg_learns_direction_and_is_deterministic(tmp_path):
    """Purchases at high values, clicks at low: gradient descent must push
    the slope b positive and the learning must be deterministic (the
    quantized-gradient reduction is order-exact by construction)."""
    rows, eid = [], 0
    for v, et in [(1.0, "click")] * 20 + [(300.0, "purchase")] * 20:
        rows.append((1, et, f"2024-01-01T00:{eid % 60:02d}:00", eid))
        eid += 1
    tab = _events(rows)
    tab = tab.append_column("value", pa.array(
        [1.0] * 20 + [300.0] * 20, pa.float64()))
    _write(tmp_path, "events", tab)
    from case_uco_ontology_map_ray.pipelines.analytics import (
        logreg_click_purchase,
    )
    out = logreg_click_purchase(str(tmp_path))
    assert list(out["iter"]) == [1, 2, 3]
    assert out.iloc[-1]["b_nano"] > 0  # slope learned the separation
    again = logreg_click_purchase(str(tmp_path))
    pd.testing.assert_frame_equal(out, again)


@pytest.mark.usefixtures("ray_session")
def test_stump_finds_separating_threshold(tmp_path):
    """Clicks at $1, purchases at $3: the best stump threshold is the
    boundary of the click mass (t = 100 cents) with perfect accuracy."""
    rows, eid = [], 0
    vals = []
    for v, et in [(1.0, "click")] * 5 + [(3.0, "purchase")] * 5:
        rows.append((1, et, f"2024-01-01T00:{eid:02d}:00", eid))
        vals.append(v)
        eid += 1
    tab = _events(rows).append_column("value", pa.array(vals, pa.float64()))
    _write(tmp_path, "events", tab)
    from case_uco_ontology_map_ray.pipelines.analytics import (
        stump_click_purchase,
    )
    out = stump_click_purchase(str(tmp_path)).iloc[0]
    assert out["threshold_cents"] == 100
    assert out["n_correct"] == 10 and out["n"] == 10
    assert out["acc_nano"] == 1_000_000_000


@pytest.mark.usefixtures("ray_session")
def test_adaboost_improves_on_xor_bands(tmp_path):
    """Value bands click/purchase/click: one stump can't separate (best
    single threshold mislabels one band) but two boosted stumps carve
    both boundaries — ensemble accuracy must beat round-1's."""
    rows, vals, eid = [], [], 0
    for v, et, cnt in [(1.0, "click", 10), (2.0, "purchase", 10),
                       (3.0, "click", 6)]:
        for _ in range(cnt):
            rows.append((1, et, f"2024-01-01T00:{eid % 60:02d}:00", eid))
            vals.append(v)
            eid += 1
    tab = _events(rows).append_column("value", pa.array(vals, pa.float64()))
    _write(tmp_path, "events", tab)
    from case_uco_ontology_map_ray.pipelines.analytics import (
        adaboost_click_purchase,
        stump_click_purchase,
    )
    stump = stump_click_purchase(str(tmp_path)).iloc[0]
    boost = adaboost_click_purchase(str(tmp_path)).iloc[0]
    assert boost["n"] == 26 and stump["n"] == 26
    assert boost["n_correct_ensemble"] >= stump["n_correct"]
    assert boost["alpha1_nano"] > 0  # round-1 better than chance
    again = adaboost_click_purchase(str(tmp_path))
    pd.testing.assert_frame_equal(
        again, adaboost_click_purchase(str(tmp_path)))


def _events(users_types_ts):
    uid, et, ts, eid = zip(*users_types_ts)
    return pa.table({
        "user_id": pa.array(uid, pa.int64()),
        "event_type": pa.array(et, pa.string()),
        "ts": pa.array([np.datetime64(t, "us") for t in ts]),
        "event_id": pa.array(eid, pa.int64()),
    })


@pytest.mark.usefixtures("ray_session")
def test_markov_stationary_alternating_chain(tmp_path):
    """A perfectly alternating A<->B stream has P = [[0,1],[1,0]]; the
    uniform start vector is stationary, so every round returns (0.5, 0.5)."""
    rows = []
    for i in range(10):
        rows.append((1, "A" if i % 2 == 0 else "B",
                     f"2024-01-01T00:{i:02d}:00", i))
    _write(tmp_path, "events", _events(rows))
    out = event_markov_stationary(str(tmp_path))
    assert out.to_dict("records") == [
        {"event_type": "A", "p_stat_micro": 500000},
        {"event_type": "B", "p_stat_micro": 500000}]


@pytest.mark.usefixtures("ray_session")
def test_markov_sink_only_target_dropped(tmp_path):
    """A type that only ever appears as a transition TARGET (never a
    source) is not a state: transitions into it are dropped and the
    remaining rows renormalize. Stream A->A->Z per user (Z terminal):
    states = {A}, P(A,A) = 1 after renormalization, pi = (1.0,)."""
    rows = [(1, "A", "2024-01-01T00:00:00", 0),
            (1, "A", "2024-01-01T00:01:00", 1),
            (1, "Z", "2024-01-01T00:02:00", 2),
            (2, "A", "2024-01-01T00:00:00", 3),
            (2, "Z", "2024-01-01T00:01:00", 4)]
    _write(tmp_path, "events", _events(rows))
    out = event_markov_stationary(str(tmp_path))
    assert out.to_dict("records") == [
        {"event_type": "A", "p_stat_micro": 1000000}]
