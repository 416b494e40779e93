"""Session-14 operators: Gini, lag-1 autocorrelation, key-skew report."""

import math

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from case_uco_ontology_map_ray.pipelines.analytics import (
    autocorr_daily_orders,
    gini_customer_spend,
    key_skew_report,
)


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_gini_equal_spend_is_zero(tmp_path):
    """Perfect equality (every customer spends the same) must give Gini 0
    exactly: 2*S/(nT) - (n+1)/n with S = T*(n+1)/2 cancels to 0."""
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_totalprice": pa.array([10.0] * 4, pa.float64())}))
    r = gini_customer_spend(str(tmp_path))
    assert r.to_dict("records") == [
        {"n_customers": 4, "total_cents": 4000, "gini_nano": 0}]


@pytest.mark.usefixtures("ray_session")
def test_gini_hand_case(tmp_path):
    """Hand case: spends (cents) 100, 100, 200, 600 -> sorted ranks 1..4,
    S = 1*100+2*100+3*200+4*600 = 3300, T = 1000, n = 4:
    gini = 2*3300/4000 - 5/4 = 0.4."""
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([1, 2, 3, 4], pa.int64()),
        "o_totalprice": pa.array([1.0, 1.0, 2.0, 6.0], pa.float64())}))
    r = gini_customer_spend(str(tmp_path))
    assert r.loc[0, "gini_nano"] == 400_000_000


@pytest.mark.usefixtures("ray_session")
def test_gini_sums_orders_per_customer(tmp_path):
    """Multiple orders per customer aggregate before ranking."""
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([1, 1, 2], pa.int64()),
        "o_totalprice": pa.array([1.0, 1.0, 2.0], pa.float64())}))
    r = gini_customer_spend(str(tmp_path))
    # both customers end at 200 cents -> perfect equality
    assert r.to_dict("records") == [
        {"n_customers": 2, "total_cents": 400, "gini_nano": 0}]


@pytest.mark.usefixtures("ray_session")
def test_autocorr_alternating_series_is_negative(tmp_path):
    """A strictly alternating daily series has lag-1 correlation -1."""
    days = pa.array(
        [np.datetime64(f"1995-01-{d:02d}", "us") for d in range(1, 9)],
        pa.timestamp("us"))
    counts = [3, 1, 3, 1, 3, 1, 3, 1]
    rows_day, rows_cust = [], []
    for d, c in zip(days.to_pylist(), counts):
        rows_day += [d] * c
        rows_cust += list(range(c))
    _write(tmp_path, "orders", pa.table({
        "o_orderdate": pa.array(rows_day, pa.timestamp("us")),
        "o_custkey": pa.array(rows_cust, pa.int64())}))
    r = autocorr_daily_orders(str(tmp_path))
    assert r.loc[0, "n_pairs"] == 7
    assert r.loc[0, "corr_nano"] == -1_000_000_000


@pytest.mark.usefixtures("ray_session")
def test_autocorr_single_day_is_empty(tmp_path):
    """Fewer than two distinct days -> no lag pairs -> empty frame."""
    _write(tmp_path, "orders", pa.table({
        "o_orderdate": pa.array([np.datetime64("1995-01-01", "us")] * 5,
                                pa.timestamp("us")),
        "o_custkey": pa.array(range(5), pa.int64())}))
    r = autocorr_daily_orders(str(tmp_path))
    assert len(r) == 0 and "corr_nano" in r.columns


@pytest.mark.usefixtures("ray_session")
def test_key_skew_uniform_entropy_is_ln_k(tmp_path):
    """Uniform keys: entropy == ln(n_keys); a constant column: entropy 0,
    top1 == all rows."""
    n_users, per = 8, 5
    uid = np.repeat(np.arange(n_users, dtype=np.int64), per)
    _write(tmp_path, "events", pa.table({
        "user_id": pa.array(uid),
        "event_type": pa.array(["click"] * len(uid))}))
    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([7] * 3, pa.int64())}))
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([1, 2], pa.int64())}))
    r = key_skew_report(str(tmp_path)).set_index("src")
    u = r.loc["events.user_id"]
    assert u["n_rows"] == n_users * per and u["n_keys"] == n_users
    assert abs(u["entropy_nano"] / 1e9 - math.log(n_users)) < 1e-4
    # single-key columns: entropy is exactly the quantized-formula zero
    # (ln(N) - round4(N*ln N)/N), i.e. pure 4dp per-term quantization noise
    def expected_zero(n):
        term = math.floor(abs(1e4 * (float(n) * math.log(float(n)))) + 0.5)
        e = 1e9 * (math.log(float(n)) - (term / 1e4) / float(n))
        return int(math.copysign(math.floor(abs(e) + 0.5), e))

    et = r.loc["events.event_type"]
    assert et["n_keys"] == 1 and et["top1_n"] == n_users * per
    assert et["entropy_nano"] == expected_zero(n_users * per)
    lp = r.loc["lineitem.l_partkey"]
    assert lp["n_keys"] == 1 and lp["entropy_nano"] == expected_zero(3)


def _brute_islands(keys, k=10):
    keys = np.unique(np.asarray(keys, dtype=np.int64))
    brk = np.flatnonzero(np.diff(keys) > 1)
    starts = keys[np.r_[0, brk + 1]]
    ends = keys[np.r_[brk, len(keys) - 1]]
    import pandas as pd
    df = pd.DataFrame({"start_key": starts, "end_key": ends})
    df["island_len"] = df["end_key"] - df["start_key"] + 1
    df = df.sort_values(["island_len", "start_key"],
                        ascending=[False, True]).head(k).reset_index(
                            drop=True)
    df.insert(0, "rk", np.arange(1, len(df) + 1, dtype=np.int64))
    df["n_islands"] = len(starts)
    df["n_keys"] = len(keys)
    return df.astype("int64")


@pytest.mark.usefixtures("ray_session")
def test_orderkey_islands_boundary_stitch(tmp_path):
    """Islands that cross range-bucket boundaries (incl. chains through
    whole single-island buckets) must stitch to the brute-force answer.
    target_buckets=7 forces many boundaries on a small key set."""
    from case_uco_ontology_map_ray.pipelines.analytics import orderkey_islands

    rng = np.random.RandomState(7)
    # dense blocks + scattered singletons + one long run spanning buckets
    keys = np.concatenate([
        np.arange(10, 40),            # long run
        np.arange(55, 58),
        np.array([70, 72, 74, 90]),
        np.arange(95, 130),           # longest run
        rng.choice(np.arange(200, 400), size=60, replace=False),
    ])
    # duplicates must not matter
    keys = np.concatenate([keys, keys[:20]])
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array(keys, pa.int64())}))
    got = orderkey_islands(str(tmp_path), target_buckets=7)
    exp = _brute_islands(keys)
    assert got.to_dict("records") == exp.to_dict("records")


@pytest.mark.usefixtures("ray_session")
def test_orderkey_islands_random_equivalence(tmp_path):
    """Randomized equivalence vs brute force at several bucket counts."""
    from case_uco_ontology_map_ray.pipelines.analytics import orderkey_islands

    rng = np.random.RandomState(123)
    keys = rng.choice(np.arange(1, 3000), size=900, replace=False)
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array(keys, pa.int64())}))
    exp = _brute_islands(keys).to_dict("records")
    for tb in (1, 3, 64, 4096):
        got = orderkey_islands(str(tmp_path), target_buckets=tb)
        assert got.to_dict("records") == exp, f"target_buckets={tb}"


@pytest.mark.usefixtures("ray_session")
def test_hits_small_equals_distributed(tmp_path):
    """The driver bincount path and the bucket-join round path must emit
    identical integer scores (the pinned micro-grid normalization makes
    float-sum order immaterial)."""
    from case_uco_ontology_map_ray.pipelines.analytics import (
        customer_part_hits,
    )

    rng = np.random.RandomState(42)
    n_orders = 120
    okey = np.arange(n_orders, dtype=np.int64)
    cust = rng.randint(0, 15, size=n_orders).astype(np.int64)
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array(okey), "o_custkey": pa.array(cust)}))
    li_ok = np.repeat(okey, 3)
    li_pk = rng.randint(0, 25, size=len(li_ok)).astype(np.int64)
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array(li_ok), "l_partkey": pa.array(li_pk)}))
    small = customer_part_hits(str(tmp_path))
    dist = customer_part_hits(str(tmp_path), small_edges=0)
    assert small.to_dict("records") == dist.to_dict("records")
    assert (small["side"] == "authority").sum() > 0
    assert (small["side"] == "hub").sum() > 0


@pytest.mark.usefixtures("ray_session")
def test_hits_star_graph_authority(tmp_path):
    """Every customer buys part 1; only customer 0 also buys parts 2..4.
    Part 1 must be the top authority; customer 0 the top hub."""
    from case_uco_ontology_map_ray.pipelines.analytics import (
        customer_part_hits,
    )

    orders, custs, li_o, li_p = [], [], [], []
    oid = 0
    for c in range(5):
        orders.append(oid); custs.append(c)
        li_o.append(oid); li_p.append(1)
        oid += 1
    for p in (2, 3, 4):
        orders.append(oid); custs.append(0)
        li_o.append(oid); li_p.append(p)
        oid += 1
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array(orders, pa.int64()),
        "o_custkey": pa.array(custs, pa.int64())}))
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array(li_o, pa.int64()),
        "l_partkey": pa.array(li_p, pa.int64())}))
    r = customer_part_hits(str(tmp_path))
    auth = r[r["side"] == "authority"].reset_index(drop=True)
    hub = r[r["side"] == "hub"].reset_index(drop=True)
    assert auth.loc[0, "key"] == 1
    assert hub.loc[0, "key"] == 0
