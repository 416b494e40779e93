"""Edit-distance (Levenshtein) string-similarity join.

The string-similarity family the engine lacked: all pairs of rows in a
group whose texts are within edit distance ``d`` — the record-linkage /
fuzzy-key-dedup shape (short strings: names, titles, identifiers), where
character EDITS, not token overlap, define similarity (the token-set
near-dup families in ops/dedup.py cover the long-document case).

Distances are computed over UTF-8 BYTES — exactly DuckDB's
``levenshtein`` semantics (probed: levenshtein('é','e') = 2), and
zero-copy from the Arrow string buffers (no Python string
materialization anywhere in the verify path). For ASCII corpora byte
and codepoint distances coincide.

Scale shape
-----------
Candidate generation reuses the banded self-join on BYTE LENGTH:
``|len(a) - len(b)| <= d`` is a NECESSARY condition for
``levenshtein(a, b) <= d``, so length is the band axis — fixed 2x ghost
replication across adjacent length buckets, no all-pairs blowup across
bands. Within a (group, length-band) co-group the pair expansion is
bounded by the co-group size (the documented partitioning assumption of
every bucketed pair plan in this repo: a group whose members all share
one length band pays O(group^2) pairs, which is the operator's
contract — "all qualifying pairs").

Verification is a PAIR-VECTORIZED dynamic program: numpy over the pair
axis, the Python loop runs over the (max_len_a x max_len_b) DP grid
only. Per candidate block that is O(La*Lb) numpy ops on pair-sized
int32 vectors — never a Python loop over pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import _arrow_string_spans

# padding sentinels outside the byte range (matrix is uint16)
_PAD_A = np.uint16(0xFFFF)
_PAD_B = np.uint16(0xFFFE)


def _byte_matrix(arr: pa.Array, pad: np.uint16) -> tuple[np.ndarray, np.ndarray]:
    """(n, max_len) uint16 byte matrix + int64 byte-length vector for an
    Arrow string array — zero-copy from the utf-8 data buffer; the scatter
    into the padded matrix is one boolean-mask assignment (row-major order
    matches the buffer's concatenation order)."""
    buf, offs = _arrow_string_spans(arr)
    n = len(offs) - 1
    if n <= 0:
        return np.empty((0, 1), np.uint16), np.empty(0, np.int64)
    lens = np.diff(offs).astype(np.int64)
    m = max(int(lens.max()), 1)
    mat = np.full((n, m), pad, np.uint16)
    mask = np.arange(m, dtype=np.int64)[None, :] < lens[:, None]
    # rows of `mask` fill in row-major order == byte order in the buffer,
    # but the buffer may start at a nonzero offset (sliced arrays)
    flat = buf[offs[0]:offs[-1]].astype(np.uint16)
    mat[mask] = flat
    return mat, lens


def levenshtein_pairs_arrow(a: pa.Array, b: pa.Array) -> np.ndarray:
    """Exact byte-level Levenshtein distance per aligned pair (a[i], b[i])
    (== DuckDB ``levenshtein``). Vectorized across PAIRS: the Python loop
    runs over the DP grid only, each step numpy ops on pair-sized int32
    vectors. Returns int64[n]."""
    n = len(a)
    if n == 0:
        return np.empty(0, np.int64)
    A, la = _byte_matrix(a, _PAD_A)
    B, lb = _byte_matrix(b, _PAD_B)
    lam, lbm = A.shape[1], B.shape[1]
    res = np.empty(n, np.int64)
    prev = np.tile(np.arange(lbm + 1, dtype=np.int32), (n, 1))
    zero = la == 0
    res[zero] = lb[zero]
    for i in range(1, lam + 1):
        cur = np.empty_like(prev)
        cur[:, 0] = i
        ai = A[:, i - 1]
        for j in range(1, lbm + 1):
            sub = prev[:, j - 1] + (ai != B[:, j - 1])
            cur[:, j] = np.minimum(
                np.minimum(prev[:, j], cur[:, j - 1]) + 1, sub)
        hit = la == i
        if hit.any():
            res[hit] = cur[hit, lb[hit]]
        prev = cur
    return res


def levenshtein_pairs(a, b) -> np.ndarray:
    """Convenience wrapper over Python-string sequences (tests, small
    inputs); the engine path is :func:`levenshtein_pairs_arrow`."""
    return levenshtein_pairs_arrow(
        pa.array(list(a), pa.string()), pa.array(list(b), pa.string()))


def edit_distance_pairs(ds, group_col: str, id_col: str, text_col: str,
                        d: int, num_buckets: int = 64):
    """All pairs within ``group_col`` whose ``text_col`` values are within
    Levenshtein distance ``d`` (SQL: self-join on the group with
    ``levenshtein(a, b) <= d AND a.id < b.id``).

    DISTINCT-TEXT-FIRST plan — the DP never runs twice for the same text
    pair: rows reduce to distinct (group, text) values (real key corpora
    are heavily duplicated — names, titles, identifiers — so this shrinks
    the quadratic stage by the duplication factor squared; the part-name
    bench drops 12.2 s -> ~1 s), then

    1. candidates over the DISTINCT values via the banded self-join on
       byte length (band = d + 1: qualifying pairs differ by < d+1 bytes),
    2. pair-vectorized DP verify of the distinct-text pairs,
    3. expansion back to id pairs through two measured-adaptive membership
       joins (cross-text pairs) plus an in-co-group C(m,2) expansion for
       each duplicate-text class (dist = 0 pairs).

    Distinct texts are keyed by a 64-bit content hash of group||US||text
    (vocabulary-sized key space; the US separator makes the pairing
    injective). Returns a Dataset of (group_col, k1, k2, dist) with
    k1 < k2, dist int64.
    """
    from ..functions.hashing import content_hash64_arrow
    from .joins import _expand_pairs, adaptive_join, banded_self_join

    def with_nid(t: pa.Table) -> pa.Table:
        key = pc.binary_join_element_wise(
            pc.cast(t.column(group_col), pa.string()),
            t.column(text_col), "\x1f")
        nid = content_hash64_arrow(key.combine_chunks()).astype(np.int64)
        return t.append_column("nid", pa.array(nid, pa.int64()))

    keyed = ds.map_batches(with_nid, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    # distinct (group, text) values: per-batch distinct combiner -> ONE
    # exact-distinct exchange over the composite key (nid determines the
    # pair, so groups are single-valued)
    from .agg import grouped_sums_ds

    distinct = grouped_sums_ds(
        keyed.map_batches(
            lambda t: (t.select(["nid", group_col, text_col])
                       .group_by(["nid", group_col, text_col])
                       .aggregate([])),
            batch_format="pyarrow"),
        keys=["nid", group_col, text_col], sum_cols={}).materialize()

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            group_col: t.column(group_col),
            "nid": t.column("nid"),
            "len": pc.cast(pc.binary_length(t.column(text_col)), pa.int64()),
        })

    lens = distinct.map_batches(prep, batch_format="pyarrow")
    cands = banded_self_join(lens, group_col, "len", band=d + 1,
                             id_col="nid", num_buckets=num_buckets)

    def side(suffix: str):
        def ren(t: pa.Table) -> pa.Table:
            return pa.table({f"id_{suffix}": t.column("nid"),
                             f"text_{suffix}": t.column(text_col)})
        return distinct.map_batches(ren, batch_format="pyarrow")

    cands = adaptive_join(cands, side("lo"), on="id_lo")
    cands = adaptive_join(cands, side("hi"), on="id_hi")

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"nid_lo": pa.array([], pa.int64()),
                             "nid_hi": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        dist = levenshtein_pairs_arrow(
            t.column("text_lo").combine_chunks(),
            t.column("text_hi").combine_chunks())
        keep = dist <= d
        return pa.table({
            "nid_lo": pa.array(
                t.column("id_lo").to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "nid_hi": pa.array(
                t.column("id_hi").to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "dist": pa.array(dist[keep], pa.int64())})

    tpairs = cands.map_batches(verify, batch_format="pyarrow")

    members = keyed.map_batches(
        lambda t: t.select([group_col, id_col, "nid"]),
        batch_format="pyarrow")

    # cross-text id pairs: two membership joins expand each verified text
    # pair to its id combinations (the output's own cardinality)
    def mlo(t: pa.Table) -> pa.Table:
        return pa.table({"nid_lo": t.column("nid"),
                         group_col: t.column(group_col),
                         "id_a": t.column(id_col)})

    def mhi(t: pa.Table) -> pa.Table:
        return pa.table({"nid_hi": t.column("nid"),
                         "id_b": t.column(id_col)})

    cross = adaptive_join(tpairs, members.map_batches(
        mlo, batch_format="pyarrow"), on="nid_lo")
    cross = adaptive_join(cross, members.map_batches(
        mhi, batch_format="pyarrow"), on="nid_hi")

    def orient(t: pa.Table) -> pa.Table:
        a = t.column("id_a").to_numpy(zero_copy_only=False)
        b = t.column("id_b").to_numpy(zero_copy_only=False)
        return pa.table({
            group_col: t.column(group_col),
            "k1": pa.array(np.minimum(a, b), pa.int64()),
            "k2": pa.array(np.maximum(a, b), pa.int64()),
            "dist": t.column("dist").cast(pa.int64())})

    cross = cross.map_batches(orient, batch_format="pyarrow")

    # dist-0 pairs: C(m, 2) inside each duplicate-text class, expanded
    # with one segment pass per nid co-group (bounded by class size —
    # the same contract as every bucketed pair plan)
    def dup_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({group_col: t.column(group_col).slice(0, 0),
                          "k1": pa.array([], pa.int64()),
                          "k2": pa.array([], pa.int64()),
                          "dist": pa.array([], pa.int64())})
        if t.num_rows < 2:
            return empty
        t = t.sort_by([("nid", "ascending"), (id_col, "ascending")])
        nid = t.column("nid").to_numpy(zero_copy_only=False)
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        n = len(nid)
        seg_end = np.searchsorted(nid, nid, side="right").astype(np.int64)
        lo = np.arange(1, n + 1, dtype=np.int64)
        i, j = _expand_pairs(lo, seg_end)
        if len(i) == 0:
            return empty
        return pa.table({
            group_col: t.column(group_col).take(pa.array(i, pa.int64())),
            "k1": pa.array(ids[i], pa.int64()),
            "k2": pa.array(ids[j], pa.int64()),
            "dist": pa.array(np.zeros(len(i), np.int64))})

    # hash-bucket co-groups (complete nid classes per bucket), segment
    # pass inside — never one dispatch per duplicate class
    def add_cg(t: pa.Table) -> pa.Table:
        cg = pc.bit_wise_and(t.column("nid"),
                             pa.scalar(num_buckets - 1, pa.int64()))
        return t.append_column("__cg", cg)

    dups = keyed.map_batches(add_cg, batch_format="pyarrow") \
        .groupby("__cg").map_groups(dup_pairs, batch_format="pyarrow")
    return cross.union(dups)
