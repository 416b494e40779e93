"""Unit tests for the round-2 join/aggregation helpers: bucket_semi_join
(semi/anti, nulls, hot keys), grouped_sums_ds, topk_ds."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from case_uco_ontology_map_ray.ops.agg import grouped_sums_ds, topk_ds
from case_uco_ontology_map_ray.ops.joins import bucket_semi_join


def _ds(table: pa.Table, blocks: int = 3):
    return rd.from_arrow(table).repartition(blocks)


def test_bucket_semi_join_semi_and_anti(ray_session):
    left = _ds(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "x": pa.array(list("abcdef")),
    }))
    right = _ds(pa.table({"rk": pa.array([2, 4, 4, 9], pa.int64())}))

    semi = bucket_semi_join(left, right, on="k", right_on="rk").to_pandas()
    assert sorted(semi.k) == [2, 4]
    assert set(semi.columns) == {"k", "x"}

    anti = bucket_semi_join(left, right, on="k", right_on="rk",
                            negate=True).to_pandas()
    assert sorted(anti.k) == [1, 3, 5, 6]


def test_bucket_semi_join_null_keys_dropped(ray_session):
    """Null left keys are never matched (mirrors SQL IN semantics for semi;
    for anti they are kept only if fill_null says so — we drop them, which
    matches NOT IN only when the right side is non-null; documented)."""
    left = _ds(pa.table({"k": pa.array([1, None, 3], pa.int64())}), blocks=1)
    right = _ds(pa.table({"k": pa.array([3], pa.int64())}), blocks=1)
    semi = bucket_semi_join(left, right, on="k").to_pandas()
    assert semi.k.tolist() == [3]


def test_bucket_semi_join_hot_key(ray_session):
    """A single hot key (80% of rows) still filters correctly — hash
    bucketing puts all copies in one bucket; the membership check is O(1)
    per row, so skew costs scan time, not memory blowup."""
    n = 5000
    keys = np.where(np.arange(n) % 5 == 0, np.arange(n), 7).astype(np.int64)
    left = _ds(pa.table({"k": pa.array(keys, pa.int64())}), blocks=4)
    right = _ds(pa.table({"k": pa.array([7], pa.int64())}), blocks=1)
    out = bucket_semi_join(left, right, on="k").to_pandas()
    assert len(out) == (keys == 7).sum()
    assert (out.k == 7).all()


def test_grouped_sums_ds_and_topk(ray_session):
    t = pa.table({
        "g": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "v": pa.array([10, 5, 7, 7, 100], pa.int64()),
    })
    agg = grouped_sums_ds(_ds(t), keys=["g"], sum_cols={"total": "v"},
                          count_alias="n")
    df = agg.to_pandas().sort_values("g").reset_index(drop=True)
    assert df.total.tolist() == [15, 14, 100]
    assert df.n.tolist() == [2, 2, 1]

    top = topk_ds(agg, by=["total", "g"], ascending=[False, True], k=2)
    assert top.g.tolist() == [3, 1]


def test_topk_ds_ties_deterministic(ray_session):
    t = pa.table({
        "g": pa.array([5, 1, 3, 2, 4], pa.int64()),
        "total": pa.array([9, 9, 9, 9, 9], pa.int64()),
    })
    top = topk_ds(_ds(t, blocks=5), by=["total", "g"],
                  ascending=[False, True], k=3)
    assert top.g.tolist() == [1, 2, 3]
