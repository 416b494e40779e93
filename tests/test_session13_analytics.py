"""Session-13 operators: weighted median, association lift, MAD outliers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from case_uco_ontology_map_ray.pipelines.analytics import (
    copurchase_lift,
    event_value_mad_outliers,
    returnflag_weighted_median_price,
)


def _write(tmp_path, name, table):
    pq.write_table(table, str(tmp_path / f"{name}.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_weighted_median_skewed_weights(tmp_path):
    """One heavy row dominates: the weighted median must land on its price
    even though it is a single row among many."""
    prices = [1.00] * 10 + [99.00]
    qtys = [1.0] * 10 + [50.0]
    _write(tmp_path, "lineitem", pa.table({
        "l_returnflag": pa.array(["A"] * 11),
        "l_extendedprice": pa.array(prices, pa.float64()),
        "l_quantity": pa.array(qtys, pa.float64())}))
    r = returnflag_weighted_median_price(str(tmp_path))
    assert r.to_dict("records") == [
        {"l_returnflag": "A", "total_qty": 60, "wmedian_cents": 9900}]


@pytest.mark.usefixtures("ray_session")
def test_weighted_median_reduces_to_plain_median_at_unit_weight(tmp_path):
    """With all weights 1 the weighted lower median equals the plain lower
    median of the values."""
    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0]
    _write(tmp_path, "lineitem", pa.table({
        "l_returnflag": pa.array(["R"] * len(vals)),
        "l_extendedprice": pa.array(vals, pa.float64()),
        "l_quantity": pa.array([1.0] * len(vals), pa.float64())}))
    r = returnflag_weighted_median_price(str(tmp_path))
    # sorted cents: 100,100,200,300,400,500,900 -> lower median = 300
    assert int(r.iloc[0].wmedian_cents) == 300


@pytest.mark.usefixtures("ray_session")
def test_copurchase_lift_values(tmp_path):
    """Hand-checked lift: parts 1,2 co-occur in 2 of 4 orders; part 1 in 3,
    part 2 in 2 -> lift = 4*2/(3*2) = 4/3; conf(1->2) = 2/3."""
    rows = [(1, 1), (1, 2), (2, 1), (2, 2), (3, 1), (4, 3), (4, 9)]
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
        "l_partkey": pa.array([r[1] for r in rows], pa.int64())}))
    r = copurchase_lift(str(tmp_path), min_support=1)
    top = r[(r.k1 == 1) & (r.k2 == 2)].iloc[0]
    assert int(top.support) == 2
    assert int(top.conf_nano) == round(1e9 * 2 / 3)
    assert int(top.lift_nano) == round(1e9 * 4 * 2 / (3 * 2))


@pytest.mark.usefixtures("ray_session")
def test_mad_outliers_flags_only_the_outlier(tmp_path):
    """Cluster at 10.00 with one extreme value: median/MAD ignore the
    outlier and exactly one row is flagged."""
    vals = [10.0, 10.01, 9.99, 10.02, 9.98, 10.0, 500.0]
    _write(tmp_path, "events", pa.table({
        "event_type": pa.array(["click"] * len(vals)),
        "value": pa.array(vals, pa.float64())}))
    r = event_value_mad_outliers(str(tmp_path))
    row = r.iloc[0]
    assert int(row.median_cents) == 1000
    assert int(row.mad_cents) == 1  # deviations 0,0,1,1,2,2,49000 -> lower med 1
    assert int(row.n_outliers) == 1  # dev > 3*1: only the 49000-dev row


@pytest.mark.usefixtures("ray_session")
def test_mad_outliers_zero_mad_degenerate(tmp_path):
    """All-identical values: MAD = 0, every deviating value is an outlier
    (the standard MAD degenerate case), none here."""
    _write(tmp_path, "events", pa.table({
        "event_type": pa.array(["view"] * 5),
        "value": pa.array([7.0] * 5, pa.float64())}))
    r = event_value_mad_outliers(str(tmp_path))
    row = r.iloc[0]
    assert (int(row.mad_cents), int(row.n_outliers)) == (0, 0)


@pytest.mark.usefixtures("ray_session")
def test_benford_digit_extraction_exact(tmp_path):
    """First-digit extraction is exact on the cents grid, including the
    power-of-ten boundaries where float log10 would be libm-dependent."""
    from case_uco_ontology_map_ray.pipelines.analytics import (
        benford_price_digits,
    )

    # cents: 100, 1000, 99900, 10 -> digits 1, 1, 9, 1
    prices = [1.00, 10.00, 999.00, 0.10]
    _write(tmp_path, "orders", pa.table({
        "o_totalprice": pa.array(prices, pa.float64())}))
    r = benford_price_digits(str(tmp_path))
    got = dict(zip(r.digit, r.n_obs))
    assert got == {1: 3, 9: 1}
    assert int(r[r.digit == 1].iloc[0].share_nano) == 750000000
