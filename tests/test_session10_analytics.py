"""Unit tests for the session-10 operators: RANGE-frame window tie/boundary
semantics, map-side pivot counts, OLS on an exact line, grouped-median
even/odd positions, mode tie-breaks, and token-entropy closed forms."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from case_uco_ontology_map_ray.pipelines.analytics import (
    EVENT_TYPES,
    event_type_pivot,
    most_common_event_per_user,
    priority_median_price,
    returnflag_price_regression,
    user_daily_interpolation,
    user_spend_quartiles,
    user_value_range_window,
)
from case_uco_ontology_map_ray.pipelines.corpus import doc_token_entropy


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


def test_range_window_ties_and_boundaries(ray_session, tmp_path):
    """RANGE frame semantics: equal-ts peers are in EACH OTHER's frame
    (unlike ROWS); exactly window-start is inside (inclusive), 1us earlier
    is outside; users never see each other's events."""
    base = np.datetime64("2024-01-01T12:00:00", "us")
    m10 = np.timedelta64(10, "m")
    us1 = np.timedelta64(1, "us")
    rows = [
        # user 1: a peer PAIR at base (ties) + one event exactly 10m before
        # + one event 10m+1us before (outside)
        (1, "view", base - m10 - us1, 1000.0),
        (1, "view", base - m10, 100.0),
        (1, "view", base, 10.0),
        (1, "view", base, 1.0),
        # user 2: same timestamps — must not leak into user 1's frames
        (2, "view", base, 5.0),
    ]
    _write_events(tmp_path, rows)
    out = user_value_range_window(str(tmp_path), minutes=10, k=50)
    got = {int(r.event_id): int(r.window_cents) for r in out.itertuples()}
    # event 0: only itself; event 1: itself (0 is outside its window)
    # events 2+3: each other + event 1 (exactly 10m before) = 11100
    # event 4 (user 2): only itself
    assert got == {0: 100000, 1: 10000 + 100000, 2: 11100, 3: 11100,
                   4: 500}


def test_event_type_pivot_wide_counts(ray_session, tmp_path):
    d1 = np.datetime64("2024-01-01T05:00:00", "us")
    d2 = np.datetime64("2024-01-02T23:59:59", "us")
    rows = [(1, "click", d1, 0.0), (1, "click", d1, 0.0),
            (2, "view", d1, 0.0), (3, "purchase", d2, 0.0)]
    _write_events(tmp_path, rows)
    out = event_type_pivot(str(tmp_path))
    assert list(out.columns) == (["day"] + [f"n_{n}" for n in EVENT_TYPES]
                                 + ["n_total"])
    r1 = out[out.day == "2024-01-01"].iloc[0]
    assert (int(r1.n_click), int(r1.n_view), int(r1.n_purchase),
            int(r1.n_error), int(r1.n_signup), int(r1.n_total)) \
        == (2, 1, 0, 0, 0, 3)
    r2 = out[out.day == "2024-01-02"].iloc[0]
    assert int(r2.n_purchase) == 1 and int(r2.n_total) == 1


def test_regression_recovers_exact_line(ray_session, tmp_path):
    # price = 3*qty + 7 dollars exactly -> slope 300 cents/unit,
    # intercept 700 cents
    q = np.array([1, 2, 3, 4, 10, 25], np.float64)
    t = pa.table({
        "l_returnflag": pa.array(["A"] * len(q)),
        "l_quantity": pa.array(q, pa.float64()),
        "l_extendedprice": pa.array(3.0 * q + 7.0, pa.float64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = returnflag_price_regression(str(tmp_path))
    assert len(out) == 1
    assert int(out.slope_nano.iloc[0]) == 300 * 10**9
    assert int(out.intercept_micro.iloc[0]) == 700 * 10**6


def _write_orders(tmp_path, prios, prices):
    t = pa.table({
        "o_orderkey": pa.array(range(len(prios)), pa.int64()),
        "o_custkey": pa.array([1] * len(prios), pa.int64()),
        "o_orderstatus": pa.array(["O"] * len(prios)),
        "o_totalprice": pa.array(prices, pa.float64()),
        "o_orderdate": pa.array(
            [np.datetime64("2024-01-01T00:00:00", "us")] * len(prios),
            pa.timestamp("us")),
        "o_orderpriority": pa.array(prios),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))


def test_priority_median_even_and_odd(ray_session, tmp_path):
    _write_orders(tmp_path,
                  ["1-URGENT"] * 4 + ["5-LOW"] * 3,
                  [10.0, 20.0, 30.0, 40.0,   1.0, 2.0, 9.0])
    out = priority_median_price(str(tmp_path))
    got = {r.o_orderpriority: (int(r.n), int(r.median_x2_cents))
           for r in out.itertuples()}
    # even n: lower+upper middle = 2000+3000; odd n: 2*200
    assert got == {"1-URGENT": (4, 5000), "5-LOW": (3, 400)}


def test_mode_tie_breaks_to_smallest_type(ray_session, tmp_path):
    d = np.datetime64("2024-01-01T00:00:00", "us")
    rows = ([(1, "view", d, 0.0)] * 2 + [(1, "click", d, 0.0)] * 2
            + [(1, "error", d, 0.0)]
            + [(2, "signup", d, 0.0)] * 3)
    _write_events(tmp_path, rows)
    out = most_common_event_per_user(str(tmp_path))
    got = {int(r.user_id): (r.mode_type, int(r.n_mode))
           for r in out.itertuples()}
    # user 1 ties view/click at 2 -> 'click' (lexicographically first)
    assert got == {1: ("click", 2), 2: ("signup", 3)}


def test_doc_token_entropy_closed_forms(ray_session, tmp_path):
    texts = ["a a a a", "a b c d", "x x y", ""]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
        "lang": pa.array(["en"] * len(texts)),
        "source": pa.array(["s"] * len(texts)),
        "n_chars": pa.array([len(s) for s in texts], pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = doc_token_entropy(str(tmp_path), k=10)
    got = {int(r.doc_id): (int(r.n_tokens), int(r.n_distinct),
                           float(r.entropy_r))
           for r in out.itertuples()}
    assert 3 not in got  # empty doc emits no row (SQL-twin semantics)
    assert got[0] == (4, 1, 0.0)
    assert got[1] == (4, 4, round(math.log(4), 4))
    # H("x x y") = ln(3) - (2 ln 2)/3
    assert got[2] == (3, 2, round(math.log(3) - 2 * math.log(2) / 3, 4))


def test_spend_quartiles_remainder_and_tied_boundary(ray_session, tmp_path):
    """10 users -> tile sizes 3,3,2,2 (first n MOD k tiles take the extra
    row); three users TIE on cents straddling the tile-1/2 boundary — the
    histogram plan must split their count across tiles without knowing
    which user went where (they contribute identical values)."""
    d = np.datetime64("2024-01-01T00:00:00", "us")
    # users 1..10; users 2,3,4 all spend 5.00; others distinct
    spend = {1: 1.0, 2: 5.0, 3: 5.0, 4: 5.0, 5: 6.0, 6: 7.0, 7: 8.0,
             8: 9.0, 9: 10.0, 10: 11.0}
    rows = [(u, "view", d, v) for u, v in spend.items()]
    _write_events(tmp_path, rows)
    out = user_spend_quartiles(str(tmp_path))
    got = {int(r.tile): (int(r.n_users), int(r.sum_cents),
                         int(r.min_cents), int(r.max_cents))
           for r in out.itertuples()}
    # sorted cents: 100,500,500,500,600,700,800,900,1000,1100
    assert got == {1: (3, 1100, 100, 500),
                   2: (3, 1800, 500, 700),
                   3: (2, 1700, 800, 900),
                   4: (2, 2100, 1000, 1100)}


def test_daily_interpolation_values(ray_session, tmp_path):
    day = np.timedelta64(1, "D")
    d0 = np.datetime64("2024-01-01T10:00:00", "us")
    rows = [
        # user 1: days 0 and 3 observed (100, 400 cents) -> days 1,2
        # interpolated at 200, 300 cents
        (1, "view", d0, 1.0), (1, "view", d0 + 3 * day, 4.0),
        # user 2: days 0 and 2 observed (100, 101) -> day 1 = 100.5 cents
        (2, "view", d0, 1.0), (2, "view", d0 + 2 * day, 1.01),
        # user 3: single day -> nothing to interpolate
        (3, "view", d0, 9.0),
        # user 1 second event on day 0 sums into the day total
        (1, "click", d0 + np.timedelta64(2, "h"), 0.5),
    ]
    _write_events(tmp_path, rows)
    out = user_daily_interpolation(str(tmp_path))
    got = {int(r.user_id): (int(r.n_days), int(r.n_obs), int(r.n_interp),
                            int(r.sum_interp_microcents))
           for r in out.itertuples()}
    # user 1: day0=150, day3=400 -> day1 = 150 + (400-150)*1/3 = 233.333...
    # micro = 150e6 + round(250*1/3*1e6) = 233333333; day2 = 316666667
    assert got[1] == (4, 2, 2, 233333333 + 316666667)
    assert got[2] == (3, 2, 1, 100500000)
    assert got[3] == (1, 1, 0, 0)


def test_welch_ttest_closed_form(ray_session, tmp_path):
    import math
    d = np.datetime64("2024-01-01T00:00:00", "us")
    clicks = [1.0, 2.0, 3.0, 4.0]
    purchases = [10.0, 12.0, 14.0]
    rows = ([(i, "click", d, v) for i, v in enumerate(clicks)]
            + [(100 + i, "purchase", d, v)
               for i, v in enumerate(purchases)]
            + [(999, "view", d, 1e9)])  # other types must be excluded
    _write_events(tmp_path, rows)
    from case_uco_ontology_map_ray.pipelines.analytics import (
        welch_ttest_click_purchase,
    )
    out = welch_ttest_click_purchase(str(tmp_path))
    r = out.iloc[0]
    c = np.array(clicks) * 100
    p = np.array(purchases) * 100
    v1 = c.var(ddof=1) / len(c)
    v2 = p.var(ddof=1) / len(p)
    t = (c.mean() - p.mean()) / math.sqrt(v1 + v2)
    df = (v1 + v2) ** 2 / (v1 ** 2 / (len(c) - 1) + v2 ** 2 / (len(p) - 1))
    assert int(r.n_click) == 4 and int(r.n_purchase) == 3
    assert abs(int(r.t_nano) - t * 1e9) <= 2  # ulp-level tolerance
    assert abs(int(r.df_micro) - df * 1e6) <= 2
