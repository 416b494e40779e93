"""Unit tests for the session-8 relational/window/stats operators: skyline
kernel vs brute force, interval-join window boundaries (incl. the composite
key-space clamp), market-basket pair counting, cohort retention offsets,
dense-rank ties, and exact decile positions."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from case_uco_ontology_map_ray.pipelines.analytics import (
    _skyline_frame,
    click_purchase_within_hour,
    cohort_retention,
    copurchase_pairs,
    orders_price_deciles,
    part_skyline,
    supplier_rank_in_nation,
)


def _brute_skyline(cents, size):
    n = len(cents)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if (cents[j] <= cents[i] and size[j] >= size[i]
                    and (cents[j] < cents[i] or size[j] > size[i])):
                keep[i] = False
                break
    return keep


def test_skyline_frame_matches_bruteforce_with_ties():
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 40))
        # small domains force duplicates and exact ties
        cents = rng.integers(0, 8, n).astype(np.int64)
        size = rng.integers(0, 6, n).astype(np.int64)
        got = _skyline_frame(cents, size)
        want = _brute_skyline(cents, size)
        assert got.tolist() == want.tolist()


def test_skyline_duplicates_both_kept():
    # identical points never dominate each other
    cents = np.array([100, 100, 200], np.int64)
    size = np.array([5, 5, 9], np.int64)
    keep = _skyline_frame(cents, size)
    assert keep.tolist() == [True, True, True]


def _write_events(tmp_path, rows):
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))


def test_click_purchase_window_boundaries(ray_session, tmp_path):
    """click at exactly ts-1h counts (inclusive), click at ts does not
    (strict); another user's click never attributes even at the key-space
    boundary (purchase < 1h after the bucket's t0)."""
    h = np.timedelta64(1, "h")
    us1 = np.timedelta64(1, "us")
    base = np.datetime64("2024-01-01T12:00:00", "us")
    rows = [
        # user 1: click exactly one hour before -> converted
        (1, "click", base - h), (1, "purchase", base),
        # user 2: click exactly at purchase ts -> NOT converted
        (2, "click", base), (2, "purchase", base),
        # user 3: click 1h+1us before -> NOT converted
        (3, "click", base - h - us1), (3, "purchase", base),
        # user 4: purchase 1us after bucket t0; user 3's clicks are near in
        # time but must never attribute cross-user
        (4, "purchase", base - h + us1),
        # user 5: two purchases, one converted
        (5, "click", base), (5, "purchase", base + us1),
        (5, "purchase", base + np.timedelta64(2, "h")),
    ]
    _write_events(tmp_path, rows)
    out = click_purchase_within_hour(str(tmp_path))
    got = {int(r.user_id): (int(r.n_purchases), int(r.n_converted))
           for r in out.itertuples()}
    assert got == {1: (1, 1), 2: (1, 0), 3: (1, 0), 4: (1, 0), 5: (2, 1)}


def test_cohort_retention_offsets(ray_session, tmp_path):
    d0 = np.datetime64("2024-01-01T03:00:00", "us")
    day = np.timedelta64(1, "D")
    rows = [
        # user 1: days 0, 0 (dup), 2
        (1, "view", d0), (1, "click", d0 + np.timedelta64(5, "h")),
        (1, "view", d0 + 2 * day),
        # user 2: joins day 1, active day 1 and 2
        (2, "view", d0 + day), (2, "view", d0 + 2 * day),
    ]
    _write_events(tmp_path, rows)
    out = cohort_retention(str(tmp_path))
    got = {(str(r.cohort_day.date()), int(r.offset_days)): int(r.n_users)
           for r in out.itertuples()}
    assert got == {("2024-01-01", 0): 1, ("2024-01-01", 2): 1,
                   ("2024-01-02", 0): 1, ("2024-01-02", 1): 1}


def test_copurchase_pairs_counts(ray_session, tmp_path):
    # orders: {1,2,3}, {1,2}, {2,3}, {1,2} (with a duplicate lineitem of
    # part 2 that must not inflate support)
    ok = [10, 10, 10, 11, 11, 12, 12, 13, 13, 13]
    pk = [1, 2, 3, 1, 2, 2, 3, 1, 2, 2]
    t = pa.table({
        "l_orderkey": pa.array(ok, pa.int64()),
        "l_partkey": pa.array(pk, pa.int64()),
    })
    pq.write_table(t, str(tmp_path / "lineitem.parquet"))
    out = copurchase_pairs(str(tmp_path), k=10, min_support=2)
    got = {(int(r.k1), int(r.k2)): int(r.support) for r in out.itertuples()}
    assert got == {(1, 2): 3, (2, 3): 2}


def test_supplier_rank_keeps_ties(ray_session, tmp_path):
    t = pa.table({
        "s_suppkey": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "s_name": pa.array([f"s{i}" for i in range(6)]),
        "s_nationkey": pa.array([0, 0, 0, 0, 0, 1], pa.int32()),
        # nation 0: 9.00, 9.00 (tie rank1), 8.00 (rank2), 7.00 (rank3),
        # 6.00 (rank4, pruned); nation 1: single supplier rank1
        "s_acctbal": pa.array([9.0, 9.0, 8.0, 7.0, 6.0, 1.0]),
    })
    pq.write_table(t, str(tmp_path / "supplier.parquet"))
    out = supplier_rank_in_nation(str(tmp_path))
    got = [(int(r.s_nationkey), int(r.s_suppkey), int(r.rnk))
           for r in out.itertuples()]
    assert got == [(0, 1, 1), (0, 2, 1), (0, 3, 2), (0, 4, 3), (1, 6, 1)]


def test_orders_price_deciles_positions(ray_session, tmp_path):
    # 10 distinct prices 1..10 dollars: decile d picks position d (ceil(d*10/10)=d)
    t = pa.table({"o_totalprice": pa.array([float(i) for i in range(1, 11)])})
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    out = orders_price_deciles(str(tmp_path))
    assert out["decile"].tolist() == list(range(1, 10))
    assert out["cents"].tolist() == [i * 100 for i in range(1, 10)]


def test_part_skyline_small(ray_session, tmp_path):
    t = pa.table({
        "p_partkey": pa.array([1, 2, 3, 4], pa.int64()),
        "p_name": pa.array(["a", "b", "c", "d"]),
        "p_brand": pa.array(["B"] * 4),
        "p_type": pa.array(["T"] * 4),
        # (price, size): (1.00,5) and (2.00,9) on frontier; (2.00,5)
        # dominated by both; (3.00,9) dominated by (2.00,9)
        "p_size": pa.array([5, 9, 5, 9], pa.int32()),
        "p_retailprice": pa.array([1.0, 2.0, 2.0, 3.0]),
    })
    pq.write_table(t, str(tmp_path / "part.parquet"))
    out = part_skyline(str(tmp_path))
    assert out["p_partkey"].tolist() == [1, 2]


def test_gram_matrix_exact_small(ray_session):
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.similarity import gram_matrix

    # scale=1 keeps the values as plain ints: G = X^T X exactly
    X = np.array([[1, 2, 3], [4, 5, 6], [-7, 0, 2]], dtype=np.float64)
    t = pa.table({"embedding": pa.array([list(r) for r in X],
                                        pa.list_(pa.float32()))})
    out = gram_matrix(rd.from_arrow(t).repartition(2), scale=1.0)
    G = X.T @ X
    got = {(int(r.i), int(r.j)): int(r.g) for r in out.itertuples()}
    for i in range(3):
        for j in range(i, 3):
            assert got[(i + 1, j + 1)] == int(G[i, j])
    assert len(got) == 6  # upper triangle only


def test_gopher_rule_report_edge_docs(ray_session, tmp_path):
    from case_uco_ontology_map_ray.pipelines.corpus import gopher_rule_report

    docs = [
        "",                         # empty: 0 tokens -> fails wc, passes dup (0>=0)
        " ".join(["the"] * 30),     # 30 tokens all dup: wc pass, dup fail
        # 26 distinct tokens (mean len ~5.8, in [3,10]) + a stopword
        " ".join(f"word{i}" for i in range(25)) + " the",
        "short doc",                # 2 tokens: wc fail
    ]
    t = pa.table({"doc_id": pa.array(range(4), pa.int64()),
                  "text": pa.array(docs),
                  "lang": pa.array(["en"] * 4),
                  "source": pa.array(["s"] * 4),
                  "n_chars": pa.array([len(d) for d in docs], pa.int64())})
    pq.write_table(t, str(tmp_path / "documents.parquet"))
    out = gopher_rule_report(str(tmp_path))
    got = dict(zip(out.rule, out.n_pass))
    assert out.n_docs.iloc[0] == 4
    # word_count in [25,60]: docs 1 and 2
    assert got["word_count"] == 2
    # dup rule 2*distinct >= n: doc0 (0>=0), doc2 (54>=26... 27 distinct), doc3
    assert got["dup_fraction"] == 3
    # stopword: doc1 ('the'), doc2 ('the')
    assert got["stopword"] == 2
    # all rules: doc2 only (26 tokens in [25,60], mean len ok, stopword, distinct)
    assert got["all_rules"] == 1


def test_partition_pruned_counts_routing(ray_session, tmp_path, monkeypatch):
    """Every row lands in exactly one day partition and only the requested
    days are aggregated."""
    import shutil

    from case_uco_ontology_map_ray.pipelines.analytics import (
        events_partition_pruned_counts,
    )

    rows = []
    for d in (4, 5, 6, 7, 8):
        for k in range(d):  # d rows on day d, value = day
            rows.append((1, "view",
                         np.datetime64(f"2024-01-{d:02d}T06:00:00", "us")))
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([1.25] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    shutil.rmtree(f"/tmp/cuomr_part/events_daily_{tmp_path.name}",
                  ignore_errors=True)
    out = events_partition_pruned_counts(str(tmp_path))
    got = {r.day: (int(r.n_events), float(r.sum_value))
           for r in out.itertuples()}
    assert got == {"2024-01-05": (5, 6.25), "2024-01-06": (6, 7.5),
                   "2024-01-07": (7, 8.75)}


def test_quantile_summary_rank_bound(ray_session):
    """Merged summary estimates stay within the n/k rank bound across many
    blocks, for skewed and uniform data."""
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.sketches import (
        quantile_summary,
        quantile_summary_query,
    )

    rng = np.random.default_rng(11)
    for vals in (rng.integers(0, 10**6, 20000),
                 (rng.pareto(1.5, 20000) * 1000).astype(np.int64)):
        t = pa.table({"x": pa.array(vals.astype(np.int64), pa.int64())})
        ds = rd.from_arrow(t).repartition(16)
        k = 128
        summary, n = quantile_summary(ds, "x", k=k)
        assert n == len(vals)
        assert int(summary["weight"].sum()) == n
        est = quantile_summary_query(summary, n, [10, 50, 90])
        v = np.sort(vals)
        for pct, e in zip([10, 50, 90], est):
            target = (pct * n + 99) // 100
            lo = np.searchsorted(v, e, "left")
            hi = np.searchsorted(v, e, "right")
            slack = n // k
            assert lo <= target - 1 + slack and hi >= target - slack, \
                (pct, e, lo, hi, target, slack)


def test_quantile_summary_small_block_exact(ray_session):
    """Blocks smaller than k pass through uncompressed (weight 1 each), so
    a small dataset's estimates are exact."""
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.sketches import (
        quantile_summary,
        quantile_summary_query,
    )

    vals = np.arange(1, 101, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"x": pa.array(vals)})).repartition(4)
    summary, n = quantile_summary(ds, "x", k=256)
    est = quantile_summary_query(summary, n, [10, 50, 90])
    assert est.tolist() == [10, 50, 90]


def test_profile_orders_counts_nulls(ray_session, tmp_path):
    from case_uco_ontology_map_ray.pipelines.analytics import profile_orders

    t = pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_custkey": pa.array([10, 10, None, 20], pa.int64()),
        "o_orderstatus": pa.array(["O", "F", "O", None]),
        "o_totalprice": pa.array([1.0, 1.0, 2.0, 3.0]),
        "o_orderdate": pa.array([np.datetime64("2024-01-01", "us")] * 4,
                                pa.timestamp("us")),
        "o_orderpriority": pa.array(["1-URGENT"] * 4),
    })
    pq.write_table(t, str(tmp_path / "orders.parquet"))
    out = profile_orders(str(tmp_path)).set_index("column")
    assert out.loc["o_custkey", "n_null"] == 1
    assert out.loc["o_custkey", "n_distinct"] == 2
    assert out.loc["o_orderstatus", "n_distinct"] == 2
    assert out.loc["o_totalprice", "n_distinct"] == 3
    assert (out["n"] == 4).all()
