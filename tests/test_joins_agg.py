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


def test_auto_num_buckets_sizing(tmp_path):
    """The sizing rule: smallest power of two covering est_bytes/target,
    clamped to [32, 65536]; non-file-backed datasets fall back to the min."""
    from case_uco_ontology_map_ray.ops import joins as J

    f = tmp_path / "a.bin"
    f.write_bytes(b"x" * (1 << 20))  # 1 MiB on disk -> 4 MiB est in memory

    class FakeDS:
        def __init__(self, files):
            self._files = files

        def input_files(self):
            return self._files

    mem = FakeDS([])  # in-memory dataset: no files
    assert J.auto_num_buckets(mem) == J._MIN_BUCKETS
    # 4 MiB est / 64 KiB target = 64 buckets
    assert J.auto_num_buckets(FakeDS([str(f)]), target_bytes=64 << 10) == 64
    # both sides add up: 8 MiB est / 64 KiB = 128
    assert J.auto_num_buckets(FakeDS([str(f)]), FakeDS([str(f)]),
                              target_bytes=64 << 10) == 128
    # clamp at the ceiling
    assert J.auto_num_buckets(FakeDS([str(f)]), target_bytes=1) == J._MAX_BUCKETS
    # missing files are skipped, not fatal
    assert J.auto_num_buckets(FakeDS(["/nonexistent/zz"])) == J._MIN_BUCKETS


def test_bucket_join_invariant_to_bucket_count(ray_session):
    """Forced tiny/large bucket counts must give identical join results —
    proves per-bucket processing is sound at any sizing."""
    import numpy as np

    from case_uco_ontology_map_ray.ops.joins import bucket_join

    rng = np.random.RandomState(5)
    left = pa.table({"k": pa.array(rng.randint(0, 40, 300), pa.int64()),
                     "a": pa.array(rng.randint(0, 100, 300), pa.int64())})
    right = pa.table({"k": pa.array(np.arange(40), pa.int64()),
                      "b": pa.array(rng.randint(0, 9, 40), pa.int64())})
    outs = []
    for nb in (1, 2, 64):
        got = bucket_join(_ds(left, blocks=4), _ds(right, blocks=2),
                          on="k", num_buckets=nb).to_pandas()
        outs.append(got.sort_values(["k", "a", "b"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])
    pd.testing.assert_frame_equal(outs[0], outs[2])


def test_adaptive_semi_join_both_strategies_agree(ray_session):
    from case_uco_ontology_map_ray.ops.joins import adaptive_semi_join

    left = _ds(pa.table({
        "k": pa.array(range(100), pa.int64()),
        "x": pa.array([str(i) for i in range(100)]),
    }))
    right = _ds(pa.table({"rk": pa.array([i * 2 for i in range(30)], pa.int64())}))

    # broadcast path (count 30 <= bound)
    b = adaptive_semi_join(left, right, on="k", right_on="rk",
                           max_broadcast_keys=1000).to_pandas()
    # forced bucketed path (bound below the count)
    s = adaptive_semi_join(left, right, on="k", right_on="rk",
                           max_broadcast_keys=5).to_pandas()
    assert sorted(b.k) == sorted(s.k) == [i * 2 for i in range(30)]

    # anti: broadcast path only fires with the complete key set, so both
    # strategies agree on negate too
    ba = adaptive_semi_join(left, right, on="k", right_on="rk", negate=True,
                            max_broadcast_keys=1000).to_pandas()
    sa = adaptive_semi_join(left, right, on="k", right_on="rk", negate=True,
                            max_broadcast_keys=5).to_pandas()
    assert sorted(ba.k) == sorted(sa.k) == sorted(set(range(100)) - {i * 2 for i in range(30)})


def test_adaptive_join_both_strategies_agree(ray_session):
    from case_uco_ontology_map_ray.ops.joins import adaptive_join

    left = _ds(pa.table({
        "k": pa.array([1, 2, 2, 3, 9], pa.int64()),
        "x": pa.array(list("abcde")),
    }))
    right = _ds(pa.table({
        "k": pa.array([2, 3, 4], pa.int64()),
        "y": pa.array([20, 30, 40], pa.int64()),
    }))

    b = adaptive_join(left, right, on="k",
                      max_broadcast_rows=100).to_pandas()
    s = adaptive_join(left, right, on="k",
                      max_broadcast_rows=1).to_pandas()  # forced bucketed
    key = ["k", "x", "y"]
    b = b.sort_values(key).reset_index(drop=True).astype({"y": "int64"})
    s = s.sort_values(key).reset_index(drop=True).astype({"y": "int64"})
    pd.testing.assert_frame_equal(b[key], s[key])
    assert list(b.k) == [2, 2, 3]  # inner-join semantics, dup keys kept


def test_adaptive_join_executes_right_lineage_once(ray_session):
    """The adaptive joins materialize the right side before the gating
    count(), so the right lineage runs exactly ONCE whichever strategy
    fires (VERDICT r3 'What's wrong' #2). Spy: a counter actor incremented
    per right-side row processed — two executions would double it."""
    import ray

    from case_uco_ontology_map_ray.ops.joins import (
        adaptive_join, adaptive_semi_join)

    @ray.remote
    class Counter:
        def __init__(self):
            self.n = 0

        def add(self, k):
            self.n += k

        def get(self):
            return self.n

    left = _ds(pa.table({"k": list(range(50)), "lv": list(range(50))}))

    for fn, kwargs in [
        (adaptive_join, {"on": "k"}),
        (adaptive_join, {"on": "k", "max_broadcast_rows": 0}),   # bucket path
        (adaptive_semi_join, {"on": "k"}),
        (adaptive_semi_join, {"on": "k", "max_broadcast_keys": 0}),
    ]:
        counter = Counter.remote()

        def spy(t: pa.Table, _c=counter) -> pa.Table:
            ray.get(_c.add.remote(t.num_rows))
            return t

        right = _ds(pa.table({"k": list(range(30)),
                              "rv": list(range(30))})).map_batches(
            spy, batch_format="pyarrow")
        out = fn(left, right, **kwargs).to_pandas()
        assert len(out) == 30                       # join correctness intact
        assert ray.get(counter.get.remote()) == 30  # lineage ran exactly once


def test_auto_num_buckets_prefers_materialized_size(ray_session, tmp_path):
    """A heavily filtered, MATERIALIZED derived dataset is sized from its own
    in-memory bytes, not its source parquet lineage (ADVICE r3 #6)."""
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.joins import (
        _MIN_BUCKETS, auto_num_buckets)

    big = pa.table({"k": list(range(200_000)),
                    "pad": ["x" * 200] * 200_000})
    path = str(tmp_path / "big")
    rd.from_arrow(big).write_parquet(path)

    filtered = rd.read_parquet(path).filter(expr="k < 3").materialize()
    # tiny target bytes so lineage-based sizing WOULD over-bucket
    n = auto_num_buckets(filtered, target_bytes=4096)
    assert n == _MIN_BUCKETS


def test_banded_self_join_matches_brute_force(ray_session):
    """Pairs from the bucketed banded join equal the O(n^2) definition —
    including cross-value-bucket pairs, ties (dvalue == 0), and the strict
    < band boundary."""
    from case_uco_ontology_map_ray.ops.joins import banded_self_join

    rng = np.random.default_rng(7)
    n, band = 400, 10
    df = pd.DataFrame({
        "id": np.arange(n, dtype=np.int64),
        "g": rng.choice(["a", "b", "c"], n),
        # values clustered so plenty of pairs land exactly on bucket edges
        "v": rng.integers(0, 80, n).astype(np.int64),
    })
    got = banded_self_join(rd.from_pandas(df), group_col="g", value_col="v",
                           band=band, id_col="id", num_buckets=8).to_pandas()
    got = set(map(tuple, got[["g", "id_lo", "id_hi", "dvalue"]].values.tolist()))

    want = set()
    rows = df.to_dict("records")
    for i in range(n):
        for j in range(i + 1, n):
            a, b = rows[i], rows[j]
            if a["g"] == b["g"] and abs(a["v"] - b["v"]) < band:
                want.add((a["g"], min(a["id"], b["id"]), max(a["id"], b["id"]),
                          abs(a["v"] - b["v"])))
    assert got == want


def test_user_funnel_requires_strictly_increasing_stages(ray_session, tmp_path):
    """A click at or before the first view does not advance the funnel; a
    later click does, and only purchases after that click count."""
    import pyarrow.parquet as pq

    from case_uco_ontology_map_ray.pipelines.analytics import user_funnel

    def ts(s):
        return np.datetime64(f"2024-01-01T00:00:{s:02d}", "us")

    rows = [
        # user 1: full funnel in order
        (1, "view", ts(1)), (1, "click", ts(2)), (1, "purchase", ts(3)),
        # user 2: click BEFORE view and purchase SIMULTANEOUS with view
        (2, "click", ts(1)), (2, "view", ts(2)), (2, "purchase", ts(2)),
        # user 3: view then click at the SAME ts (strict > excludes it)
        (3, "view", ts(5)), (3, "click", ts(5)),
        # user 4: view only
        (4, "view", ts(1)),
        # user 5: purchase before click (click counts, purchase doesn't)
        (5, "view", ts(1)), (5, "purchase", ts(2)), (5, "click", ts(3)),
    ]
    t = pa.table({
        "event_id": pa.array(range(len(rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "event_type": pa.array([r[1] for r in rows]),
        "ts": pa.array([r[2] for r in rows], pa.timestamp("us")),
        "value": pa.array([0.0] * len(rows)),
        "props": pa.array(["{}"] * len(rows)),
    })
    pq.write_table(t, str(tmp_path / "events.parquet"))
    out = user_funnel(str(tmp_path))
    by_stage = dict(zip(out.stage, out.n_users))
    assert by_stage == {"view": 5, "click": 2, "purchase": 1}


def test_topk_ds_empty_keeps_full_output_columns():
    """r5 ADVICE: a fully-empty Dataset must return ALL schema columns, not
    just the ranking keys, so callers selecting other columns don't raise."""
    import pyarrow as pa
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.agg import topk_ds

    empty = rd.from_arrow(pa.table({
        "user_id": pa.array([], pa.int64()),
        "ts": pa.array([], pa.timestamp("us")),
        "gap_us": pa.array([], pa.int64()),
    })).filter(expr="gap_us > 0")
    out = topk_ds(empty, by=["gap_us"], ascending=[False], k=5,
                  columns=["user_id", "ts", "gap_us"])
    assert out.empty
    assert set(["user_id", "ts", "gap_us"]) <= set(out.columns)
    out[["user_id", "ts"]]  # the caller's projection must not KeyError


def test_mix_bucket_binary_keys():
    """r5: fixed-size and variable binary keys route deterministically and
    consistently (equal keys -> equal bucket) across representations."""
    import pyarrow as pa

    from case_uco_ontology_map_ray.ops.joins import _mix_bucket

    vals = [b"0123456789abcdef", b"fedcba9876543210", b"0123456789abcdef"]
    fixed = pa.chunked_array([pa.array(vals, pa.binary(16))])
    b1 = _mix_bucket(fixed, 64).to_pylist()
    assert b1[0] == b1[2] and all(0 <= x < 64 for x in b1)
    var = pa.chunked_array([pa.array(vals, pa.binary())])
    b2 = _mix_bucket(var, 64).to_pylist()
    assert b2[0] == b2[2] and all(0 <= x < 64 for x in b2)
    # sliced fixed-width array (nonzero offset) routes identically
    sl = pa.chunked_array([pa.array(vals, pa.binary(16)).slice(1, 2)])
    assert _mix_bucket(sl, 64).to_pylist() == b1[1:]


def test_bucket_join_composite_key_outer(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.joins import bucket_join

    left = rd.from_arrow(pa.table({
        "u": pa.array([1, 1, 2], pa.int64()),
        "d": pa.array(["a", "b", "a"], pa.string()),
        "x": pa.array([10, 11, 12], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "u": pa.array([1, 3], pa.int64()),
        "d": pa.array(["a", "z"], pa.string()),
        "y": pa.array([100, 300], pa.int64())}))

    inner = bucket_join(left, right, on=["u", "d"], num_buckets=4).to_pandas()
    assert len(inner) == 1 and inner.iloc[0][["x", "y"]].tolist() == [10, 100]

    outer = (bucket_join(left, right, on=["u", "d"], num_buckets=4,
                         how="outer").to_pandas()
             .sort_values(["u", "d"]).reset_index(drop=True))
    assert len(outer) == 4  # 1 matched + 2 left-only + 1 right-only
    row = outer[(outer.u == 3) & (outer.d == "z")]
    assert len(row) == 1 and pd.isna(row.iloc[0]["x"]) \
        and row.iloc[0]["y"] == 300

    # composite routing must co-locate equal pairs under any bucket count
    for nb in (1, 7):
        again = (bucket_join(left, right, on=["u", "d"], num_buckets=nb,
                             how="outer").to_pandas()
                 .sort_values(["u", "d"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(outer, again)


def test_global_row_number_matches_pandas_window(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.agg import global_row_number

    rng = np.random.default_rng(7)
    df = pd.DataFrame({"id": np.arange(200, dtype=np.int64),
                       "key": rng.integers(0, 9, 200).astype(np.int64)})
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)

    for asc in (True, False):
        got = (global_row_number(ds, "key", "id", key_ascending=asc)
               .to_pandas().sort_values("rnk").reset_index(drop=True))
        want = df.sort_values(["key", "id"],
                              ascending=[asc, True]).reset_index(drop=True)
        assert got["id"].tolist() == want["id"].tolist()
        assert got["rnk"].tolist() == list(range(1, 201))
