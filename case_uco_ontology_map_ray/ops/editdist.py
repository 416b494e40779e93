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

    Plan: byte-length-band candidate generation (banded self-join, band =
    ``d + 1`` since qualifying pairs differ by < d+1 in length) ->
    endpoint texts attached via two measured-adaptive joins (broadcast
    when the (id, text) side proves small, hash-bucketed at scale) ->
    pair-vectorized DP verify. Returns a Dataset of
    (group_col, k1, k2, dist) with k1 < k2, dist int64.
    """
    from .joins import adaptive_join, banded_self_join

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            group_col: t.column(group_col),
            id_col: t.column(id_col),
            "len": pc.cast(pc.binary_length(t.column(text_col)), pa.int64()),
        })

    lens = ds.map_batches(prep, batch_format="pyarrow", zero_copy_batch=True)
    cands = banded_self_join(lens, group_col, "len", band=d + 1,
                             id_col=id_col, num_buckets=num_buckets)

    def side(suffix: str):
        def ren(t: pa.Table) -> pa.Table:
            return pa.table({f"id_{suffix}": t.column(id_col),
                             f"text_{suffix}": t.column(text_col)})
        return ds.map_batches(ren, batch_format="pyarrow",
                              zero_copy_batch=True)

    cands = adaptive_join(cands, side("lo"), on="id_lo")
    cands = adaptive_join(cands, side("hi"), on="id_hi")

    def verify(t: pa.Table) -> pa.Table:
        grp = t.column(group_col)
        if t.num_rows == 0:
            return pa.table({group_col: grp,
                             "k1": pa.array([], pa.int64()),
                             "k2": pa.array([], pa.int64()),
                             "dist": pa.array([], pa.int64())})
        dist = levenshtein_pairs_arrow(
            t.column("text_lo").combine_chunks(),
            t.column("text_hi").combine_chunks())
        keep = dist <= d
        idx = np.flatnonzero(keep)
        return pa.table({
            group_col: grp.take(pa.array(idx, pa.int64())),
            "k1": pa.array(
                t.column("id_lo").to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "k2": pa.array(
                t.column("id_hi").to_numpy(zero_copy_only=False)[keep],
                pa.int64()),
            "dist": pa.array(dist[keep], pa.int64())})

    return cands.map_batches(verify, batch_format="pyarrow")
