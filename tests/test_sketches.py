"""Sketch aggregate tests: HLL distinct within 3%, histogram quantiles
within a bin width, determinism across parallelism."""

import numpy as np
import pytest

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.01"


def test_hll_accuracy_and_merge():
    from case_uco_ontology_map_ray.ops.sketches import HyperLogLog, _hash_ints

    rng = np.random.RandomState(0)
    vals = rng.randint(0, 1_000_000, size=200_000).astype(np.int64)
    truth = len(np.unique(vals))
    whole = HyperLogLog(12)
    whole.add_hashes(_hash_ints(vals))
    assert abs(whole.estimate() - truth) / truth < 0.03

    # mergeability: split into 8 sketches -> identical registers
    parts = HyperLogLog(12)
    for chunk in np.array_split(vals, 8):
        h = HyperLogLog(12)
        h.add_hashes(_hash_ints(chunk))
        parts = parts.merge(h)
    assert np.array_equal(parts.registers, whole.registers)


def test_approx_distinct_users_vs_exact():
    import duckdb
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.sketches import approx_distinct

    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["user_id"])
    est = approx_distinct(ds, "user_id")
    exact = duckdb.sql(
        f"SELECT count(DISTINCT user_id) FROM read_parquet('{SF}/events.parquet')"
    ).fetchone()[0]
    assert abs(est - exact) / exact < 0.05


def test_approx_quantiles_vs_exact():
    import duckdb
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.sketches import approx_quantiles

    lo, hi = 0.0, 1000.0
    ds = rd.read_parquet(f"{SF}/events.parquet", columns=["value"])
    qs = approx_quantiles(ds, "value", [0.5, 0.9, 0.99], lo=lo, hi=hi, bins=1024)
    exact = duckdb.sql(
        f"""SELECT quantile_cont(value, 0.5), quantile_cont(value, 0.9),
                   quantile_cont(value, 0.99)
            FROM read_parquet('{SF}/events.parquet')"""
    ).fetchone()
    width = (hi - lo) / 1023
    for got, want in zip(qs, exact):
        assert abs(got - want) <= 2 * width + abs(want) * 0.02
