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


def test_misra_gries_guarantee_under_merges(ray_session):
    """Skewed stream across many batches: every true heavy hitter
    (freq > n/(k+1)) survives the per-batch sketch + driver merges, and
    estimates stay within [true - n/(k+1), true]."""
    import collections

    import pyarrow as pa
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.sketches import frequent_tokens

    rng = np.random.default_rng(5)
    # zipf-ish vocabulary: a few hot tokens + a long tail
    hot = [f"hot{i}" for i in range(5)]
    tail = [f"t{i}" for i in range(5000)]
    words = list(rng.choice(tail, 20000)) + hot * 2000
    rng.shuffle(words)
    docs = [" ".join(words[i:i + 50]) for i in range(0, len(words), 50)]
    truth = collections.Counter(words)
    n = sum(truth.values())
    K = 32
    ds = rd.from_arrow(pa.table({"doc_id": list(range(len(docs))),
                                 "text": docs})).repartition(16)
    mg, total = frequent_tokens(ds, k=K)
    assert total == n
    bound = n / (K + 1)
    heavy = {t for t, c in truth.items() if c > bound}
    assert heavy  # the hot tokens must actually be heavy in this stream
    assert heavy <= set(mg.counters)
    for t, est in mg.counters.items():
        assert est <= truth[t]
        assert est >= truth[t] - bound
    # deterministic across parallelism? NOT guaranteed for estimates (merge
    # order shifts decrements) but the heavy-hitter SET must be stable
    mg2, _ = frequent_tokens(ds.repartition(3), k=K)
    assert heavy <= set(mg2.counters)


def test_bloom_filter_no_false_negatives_and_merge():
    import numpy as np

    from case_uco_ontology_map_ray.ops.sketches import BloomFilter

    rng = np.random.default_rng(3)
    a = rng.integers(0, 2**63, 3000, dtype=np.int64).astype(np.uint64)
    b = rng.integers(0, 2**63, 3000, dtype=np.int64).astype(np.uint64)
    f1, f2 = BloomFilter(1 << 16, 4), BloomFilter(1 << 16, 4)
    f1.add_hashes(a); f2.add_hashes(b)
    merged = f1.merge(f2)
    assert merged.contains_hashes(a).all()
    assert merged.contains_hashes(b).all()
    # serialization roundtrip preserves membership
    back = BloomFilter.from_bytes(merged.to_bytes(), 1 << 16, 4)
    assert back.contains_hashes(a).all()
    # false-positive rate stays near theory at this load (~2.4%)
    probe = rng.integers(0, 2**63, 50000, dtype=np.int64).astype(np.uint64)
    assert merged.contains_hashes(probe).mean() < 0.06


def test_approx_distinct_by_group_accuracy_and_merge():
    import numpy as np
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.sketches import approx_distinct_by_group

    rng = np.random.default_rng(3)
    rows = []
    truth = {"a": 500, "b": 50, "c": 1}
    for g, n in truth.items():
        vals = rng.choice(n * 10, size=n, replace=False)
        for v in vals:
            rows.append({"g": g, "v": int(v)})
            rows.append({"g": g, "v": int(v)})  # duplicates must not inflate
    ds = rd.from_items(rows).repartition(5)  # sketches must merge across blocks
    out = approx_distinct_by_group(ds, "g", "v", p=12)
    got = dict(zip(out.g, out.approx_distinct))
    for g, n in truth.items():
        assert abs(got[g] - n) / n <= 0.1, (g, got[g], n)


def test_kmv_merge_invariance_and_set_estimates():
    import numpy as np

    from case_uco_ontology_map_ray.ops.sketches import KMV, _hash_ints

    rng = np.random.default_rng(2)
    a_keys = rng.choice(200_000, 50_000, replace=False)
    b_keys = np.concatenate([a_keys[:20_000],
                             rng.choice(np.arange(200_000, 400_000),
                                        30_000, replace=False)])
    ha, hb = _hash_ints(a_keys), _hash_ints(b_keys)
    s1, s2 = KMV(1024), KMV(1024)
    s1.add_hashes(ha[:25_000])
    s2.add_hashes(ha[25_000:])
    sa = s1.merge(s2)
    whole = KMV(1024)
    whole.add_hashes(ha)
    assert (sa.values == whole.values).all()  # merge == single-pass

    sb = KMV(1024)
    sb.add_hashes(hb)
    assert abs(sa.estimate() - 50_000) / 50_000 < 0.15
    assert abs(KMV.intersection_estimate(sa, sb) - 20_000) / 20_000 < 0.25
    # under-k sketches are exact
    small = KMV(1024)
    small.add_hashes(_hash_ints(np.arange(100)))
    assert small.estimate() == 100.0


def test_kmv_from_partials_matches_driver_build(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from case_uco_ontology_map_ray.ops.sketches import KMV, kmv_from_hashes

    rng = np.random.default_rng(5)
    h = rng.integers(0, 2**63, 5000, dtype=np.int64)
    ds = rd.from_arrow(pa.table({"h": h})).repartition(9)
    got = kmv_from_hashes(ds, "h", k=256)
    whole = KMV(256)
    whole.add_hashes(h.astype(np.uint64))
    assert (got.values == whole.values).all()
