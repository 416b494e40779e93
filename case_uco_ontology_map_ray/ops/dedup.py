"""Deduplication operators over a document table (doc_id, text).

- exact_dedup:     content-hash groupby, keep min doc_id (oracle: md5 SQL)
- minhash_lsh_dedup: shingle -> minhash -> band buckets -> candidate pairs ->
                   Jaccard verify -> connected components (min-label rounds)
- simhash_groups:  64-bit simhash fingerprints + near-group by hamming radius
                   within buckets
- ngram_jaccard_pairs: candidate pairs with exact n-gram Jaccard >= tau

All stages are map_batches/groupby compositions; the per-document sketching
is a stateful actor stage (hash family built once per actor).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import (
    MinHasher,
    char_shingles,
    jaccard,
    simhash64,
    word_shingles,
)


def _md5_column(texts: list[str]) -> list[str]:
    return [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]


def exact_dedup(ds, text_col: str = "text", id_col: str = "doc_id"):
    """Exact dedup: min(id) per content hash. Returns Dataset[{id_col}]."""
    from ray.data.aggregate import Min

    def add_hash(t: pa.Table) -> pa.Table:
        h = _md5_column(t.column(text_col).to_pylist())
        keep = t.select([id_col]).append_column("__h", pa.array(h, pa.string()))
        # local combiner: min id per hash within the batch
        agg = keep.group_by(["__h"]).aggregate([(id_col, "min")])
        return agg.rename_columns(["__h", id_col])

    pre = ds.map_batches(add_hash, batch_format="pyarrow")
    out = pre.groupby("__h").aggregate(Min(id_col, alias_name=id_col))
    return out.select_columns([id_col])


class _Sketcher:
    """Actor stage: per-document shingles + minhash signature + simhash."""

    def __init__(self, num_perm: int, shingle_k: int, use_words: bool, seed: int = 42):
        self.mh = MinHasher(num_perm=num_perm, seed=seed)
        self.k = shingle_k
        self.use_words = use_words

    def shingles(self, text: str) -> np.ndarray:
        if self.use_words:
            return word_shingles(text, self.k)
        return char_shingles(text, self.k)

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t.column("text").to_pylist()
        sigs = [self.mh.signature(self.shingles(x)) for x in texts]
        sims = [simhash64(self.shingles(x)) for x in texts]
        return pa.table(
            {
                "doc_id": t.column("doc_id"),
                "sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
                "simhash": pa.array(sims, pa.uint64()),
            }
        )


def minhash_lsh_dedup(
    ds,
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    use_words: bool = True,
    tau: float = 0.5,
    max_bucket: int = 64,
    max_rounds: int = 4,
) -> pd.DataFrame:
    """MinHash-LSH near-dup clustering.

    Pipeline: sketch (actor pool) -> explode band rows -> groupby(band key)
    -> star candidate edges (capped per bucket, logged) -> Jaccard verify ->
    min-label propagation rounds -> (doc_id, cluster_id).

    Returns pandas (doc_id, cluster_id) where cluster_id = min doc_id of the
    component (deterministic). Docs with no near-dup form singletons.
    """
    import ray

    sk = _Sketcher(num_perm, shingle_k, use_words)
    mh = sk.mh

    def explode_bands(t: pa.Table) -> pa.Table:
        ids, keys = [], []
        for doc_id, sig_bytes in zip(t.column("doc_id").to_pylist(), t.column("sig").to_pylist()):
            sig = np.frombuffer(sig_bytes, dtype=np.uint64)
            for key in mh.band_keys(sig, bands):
                ids.append(doc_id)
                keys.append(key)
        return pa.table({"band": pa.array(keys, pa.int64()),
                         "doc_id": pa.array(ids, pa.int64())})

    sketched = ds.map_batches(
        _Sketcher, fn_constructor_args=(num_perm, shingle_k, use_words),
        batch_format="pyarrow", concurrency=_pool(),
    )
    bands_ds = sketched.map_batches(explode_bands, batch_format="pyarrow")

    def bucket_edges(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"u": [], "v": []}, dtype=np.int64)
        if len(ids) > max_bucket:
            # skew guard: a degenerate band (e.g. empty docs) would emit
            # O(n^2)-ish verify work; cap and keep the smallest ids
            ids = ids[:max_bucket]
        root = ids.min()
        others = ids[ids != root]
        return pd.DataFrame({"u": others, "v": np.full(len(others), root)})

    edges = bands_ds.groupby("band").map_groups(bucket_edges, batch_format="pandas").to_pandas()
    edges = edges.drop_duplicates()

    # Jaccard verification of candidate edges (exact, on the shingle sets).
    # Candidate count is LSH-bounded; verification is driver-side pandas here
    # because the edge set is small relative to the corpus; at larger scale
    # this becomes one more map_batches over edge partitions.
    texts = dict(zip(*[c.to_pylist() for c in
                       _collect_columns(ds, ["doc_id", "text"])]))
    keep = []
    for u, v in edges[["u", "v"]].itertuples(index=False):
        if jaccard(sk.shingles(texts[u]), sk.shingles(texts[v])) >= tau:
            keep.append((int(u), int(v)))

    # Min-label propagation (union-find by rounds)
    labels = {d: d for d in texts}
    for _ in range(max_rounds):
        changed = False
        for u, v in keep:
            m = min(labels[u], labels[v])
            if labels[u] != m:
                labels[u] = m; changed = True
            if labels[v] != m:
                labels[v] = m; changed = True
        if not changed:
            break
    out = pd.DataFrame({"doc_id": list(labels), "cluster_id": [labels[d] for d in labels]})
    return out.sort_values("doc_id").reset_index(drop=True)


def simhash_groups(ds, shingle_k: int = 3, use_words: bool = True,
                   radius: int = 3) -> pd.DataFrame:
    """SimHash near-dup grouping: fingerprint per doc; group docs whose
    fingerprints agree on a 16-bit band and are within hamming ``radius``."""
    sketched = ds.map_batches(
        _Sketcher, fn_constructor_args=(8, shingle_k, use_words),
        batch_format="pyarrow", concurrency=_pool(),
    ).select_columns(["doc_id", "simhash"]).to_pandas()

    sims = sketched["simhash"].to_numpy(dtype=np.uint64)
    ids = sketched["doc_id"].to_numpy()
    labels = {int(d): int(d) for d in ids}
    # band by each of four 16-bit chunks (standard simhash blocking)
    for shift in (0, 16, 32, 48):
        band = (sims >> np.uint64(shift)) & np.uint64(0xFFFF)
        df = pd.DataFrame({"band": band, "doc_id": ids, "sim": sims})
        for _, g in df.groupby("band"):
            if len(g) < 2:
                continue
            garr = g.sort_values("doc_id").to_numpy()
            root_id, root_sim = int(garr[0][1]), int(garr[0][2])
            for _, d, s in garr[1:]:
                if bin(int(s) ^ root_sim).count("1") <= radius:
                    m = min(labels[int(d)], labels[root_id])
                    labels[int(d)] = labels[root_id] = m
    out = pd.DataFrame({"doc_id": sorted(labels), "group_id": [labels[d] for d in sorted(labels)]})
    return out


def ngram_jaccard_pairs(ds, shingle_k: int = 3, tau: float = 0.3,
                        num_perm: int = 64, bands: int = 32) -> pd.DataFrame:
    """Candidate near-dup pairs with exact word n-gram Jaccard >= tau.

    LSH (aggressive banding) proposes candidates; exact Jaccard filters.
    Returns (id_a, id_b, jac) with id_a < id_b.
    """
    sk = _Sketcher(num_perm, shingle_k, True)
    mh = sk.mh

    def explode_bands(t: pa.Table) -> pa.Table:
        ids, keys = [], []
        for doc_id, sig_bytes in zip(t.column("doc_id").to_pylist(), t.column("sig").to_pylist()):
            sig = np.frombuffer(sig_bytes, dtype=np.uint64)
            for key in mh.band_keys(sig, bands):
                ids.append(doc_id)
                keys.append(key)
        return pa.table({"band": pa.array(keys, pa.int64()),
                         "doc_id": pa.array(ids, pa.int64())})

    sketched = ds.map_batches(
        _Sketcher, fn_constructor_args=(num_perm, shingle_k, True),
        batch_format="pyarrow", concurrency=_pool(),
    )
    bands_ds = sketched.map_batches(explode_bands, batch_format="pyarrow")

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())[:48]
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}, dtype=np.int64)
        a, b = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[a], "id_b": ids[b]})

    pairs = bands_ds.groupby("band").map_groups(bucket_pairs, batch_format="pandas").to_pandas()
    pairs = pairs.drop_duplicates()
    texts = dict(zip(*[c.to_pylist() for c in _collect_columns(ds, ["doc_id", "text"])]))
    rows = []
    for u, v in pairs[["id_a", "id_b"]].itertuples(index=False):
        j = jaccard(sk.shingles(texts[u]), sk.shingles(texts[v]))
        if j >= tau:
            rows.append((int(u), int(v), round(float(j), 4)))
    out = pd.DataFrame(rows, columns=["id_a", "id_b", "jac"])
    return out.sort_values(["id_a", "id_b"]).reset_index(drop=True)


def _collect_columns(ds, cols):
    t = pa.concat_tables(
        [b.select(cols) for b in ds.map_batches(lambda x: x.select(cols), batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
    )
    return [t.column(c) for c in cols]


def _pool(frac: float = 0.5) -> int:
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(1, int(cpus * frac))
