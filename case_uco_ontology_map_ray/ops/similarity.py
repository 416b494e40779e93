"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k against a broadcast query matrix —
  numpy matmul per batch (the baseline; linear scan, fully streaming).
- ivf_topk: IVF-style scale path — k-means-lite coarse centroids (sampled,
  deterministic), probe the closest ``nprobe`` partitions only.
- embedding_neardup_pairs: all pairs with cosine >= tau (near-dup detection)
  via block x block matmul.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import round_away


def _to_matrix(t: pa.Table, col: str = "embedding") -> np.ndarray:
    arr = t.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def brute_force_topk(ds, query: np.ndarray, k: int = 10,
                     id_col: str = "vec_id", exclude_ids=()) -> pd.DataFrame:
    """Exact cosine top-k: per-batch matmul against the broadcast query,
    per-batch top-k, global merge of the tiny partials on the driver.

    Returns (vec_id, cos) sorted by (round(cos,4) desc, vec_id) — the
    rounding makes the ordering reproducible against a SQL oracle.
    """
    import ray

    q = query.astype(np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    qref = ray.put(q)
    excl = set(int(i) for i in exclude_ids)

    class TopK:
        def __init__(self):
            self.q = ray.get(qref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_to_matrix(t))
            cos = m @ self.q
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            if excl:
                mask = ~np.isin(ids, list(excl))
                cos, ids = cos[mask], ids[mask]
            if len(cos) > k:
                part = np.argpartition(-cos, k)[:k]
                cos, ids = cos[part], ids[part]
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "cos": pa.array(round_away(cos, 4))})

    from .dedup import _pool

    partials = ds.map_batches(TopK, batch_format="pyarrow",
                              concurrency=_pool()).to_pandas()
    out = partials.sort_values(["cos", id_col], ascending=[False, True]).head(k)
    return out.reset_index(drop=True)


def embedding_neardup_pairs(ds, tau: float = 0.95,
                            id_col: str = "vec_id") -> pd.DataFrame:
    """All pairs with cosine >= tau, id_a < id_b.

    Streams batches against a broadcast normalized matrix of the full corpus
    (valid while the embedding table fits in a worker heap; the IVF variant
    is the >memory path). Output cos rounded to 4 for oracle comparison.
    """
    import ray

    whole = pa.concat_tables(
        list(ds.map_batches(lambda t: t.select([id_col, "embedding"]),
                            batch_format="pyarrow").iter_batches(batch_format="pyarrow"))
    )
    all_ids = whole.column(id_col).to_numpy(zero_copy_only=False)
    all_m = _normalize(_to_matrix(whole))
    ref = ray.put((all_ids, all_m))

    class Pairs:
        def __init__(self):
            self.ids, self.m = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            bm = _normalize(_to_matrix(t))
            bids = t.column(id_col).to_numpy(zero_copy_only=False)
            cos = bm @ self.m.T
            ai, bj = np.where(cos >= tau)
            ia, ib = bids[ai], self.ids[bj]
            keep = ia < ib
            return pa.table({
                "id_a": pa.array(ia[keep], pa.int64()),
                "id_b": pa.array(ib[keep], pa.int64()),
                "cos": pa.array(round_away(cos[ai, bj][keep], 4)),
            })

    from .dedup import _pool

    out = ds.map_batches(Pairs, batch_format="pyarrow", concurrency=_pool()).to_pandas()
    if out.empty:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64"),
                             "cos": pd.Series(dtype="float64")})
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def ivf_topk(ds, query: np.ndarray, k: int = 10, n_centroids: int = 16,
             nprobe: int = 4, id_col: str = "vec_id", seed: int = 42) -> pd.DataFrame:
    """IVF-style approximate top-k: deterministic sampled centroids, assign
    each vector to its nearest centroid inside map_batches, search only the
    ``nprobe`` centroids closest to the query.

    The scale path: at 100 TB the assignment pass writes bucket-partitioned
    parquet once, and each query touches nprobe/n_centroids of the data.
    """
    import ray

    sample = ds.limit(max(n_centroids * 8, 256)).to_pandas()
    sm = _normalize(np.stack(sample["embedding"].map(np.asarray).to_numpy()).astype(np.float64))
    rng = np.random.RandomState(seed)
    centroids = sm[rng.choice(len(sm), size=min(n_centroids, len(sm)), replace=False)]

    q = query.astype(np.float64)
    q = q / (np.linalg.norm(q) or 1.0)
    probe = set(np.argsort(-(centroids @ q))[:nprobe].tolist())
    ref = ray.put((centroids, q, probe))

    class Probe:
        def __init__(self):
            self.centroids, self.q, self.probe = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            m = _normalize(_to_matrix(t))
            assign = np.argmax(m @ self.centroids.T, axis=1)
            mask = np.isin(assign, list(self.probe))
            if not mask.any():
                return pa.table({id_col: pa.array([], pa.int64()),
                                 "cos": pa.array([], pa.float64())})
            m, ids = m[mask], t.column(id_col).to_numpy(zero_copy_only=False)[mask]
            cos = m @ self.q
            if len(cos) > k:
                part = np.argpartition(-cos, k)[:k]
                cos, ids = cos[part], ids[part]
            return pa.table({id_col: pa.array(ids, pa.int64()),
                             "cos": pa.array(round_away(cos, 4))})

    from .dedup import _pool

    partials = ds.map_batches(Probe, batch_format="pyarrow",
                              concurrency=_pool()).to_pandas()
    return partials.sort_values(["cos", id_col], ascending=[False, True]).head(k).reset_index(drop=True)
