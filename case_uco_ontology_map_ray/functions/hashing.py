"""Hashing / sketching kernels: MinHash, SimHash, shingles, rolling hashes.

Built for batch use inside ``map_batches``: the per-row work is a tight loop
over short strings, the per-hash-function work is numpy-vectorized. All
hashes are seeded and deterministic across processes (no PYTHONHASHSEED
dependence — everything goes through blake2b/numpy arithmetic).
"""

from __future__ import annotations

import hashlib

import numpy as np

_MERSENNE = (1 << 61) - 1


def stable_hash64(s: str, seed: int = 0) -> int:
    """Deterministic 64-bit hash (blake2b, process-independent)."""
    h = hashlib.blake2b(s.encode("utf-8"), digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


def char_shingles(text: str, k: int = 4) -> np.ndarray:
    """Distinct k-char shingle hashes of a string as uint64 array."""
    n = len(text)
    if n < k:
        return np.array([stable_hash64(text)], dtype=np.uint64) if text else np.array([], dtype=np.uint64)
    # vectorized rolling view over the utf-8 bytes
    b = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    if len(b) < k:
        return np.array([stable_hash64(text)], dtype=np.uint64)
    windows = np.lib.stride_tricks.sliding_window_view(b, k).astype(np.uint64)
    weights = np.uint64(1099511628211) ** np.arange(k, dtype=np.uint64)
    vals = (windows * weights).sum(axis=1, dtype=np.uint64)
    vals ^= vals >> np.uint64(33)
    vals *= np.uint64(0xFF51AFD7ED558CCD)
    vals ^= vals >> np.uint64(33)
    return np.unique(vals)


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Distinct k-word shingle hashes (token n-grams) as uint64 array."""
    toks = text.split()
    if len(toks) < k:
        joined = " ".join(toks)
        return (np.array([stable_hash64(joined)], dtype=np.uint64)
                if joined else np.array([], dtype=np.uint64))
    out = np.empty(len(toks) - k + 1, dtype=np.uint64)
    for i in range(len(toks) - k + 1):
        out[i] = stable_hash64(" ".join(toks[i:i + k]))
    return np.unique(out)


class MinHasher:
    """num_perm universal-hash minhash over shingle sets.

    h_i(x) = (a_i * x + b_i) mod p  (p = 2^61 - 1), a/b seeded — the
    standard Broder construction; signatures are mergeable by elementwise min.
    """

    def __init__(self, num_perm: int = 128, seed: int = 42):
        rng = np.random.RandomState(seed)
        self.num_perm = num_perm
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        """uint64[num_perm] minhash signature (max-value when empty)."""
        if len(shingles) == 0:
            return np.full(self.num_perm, np.iinfo(np.uint64).max, dtype=np.uint64)
        x = shingles.astype(np.uint64).reshape(-1, 1)
        # (a*x + b) mod p with python-int matmul avoided: use object-free
        # modmul via splitting — for p = 2^61-1, (a*x) fits in uint128; numpy
        # lacks uint128, so reduce with float-free double-step arithmetic:
        # do the multiply in python ints only for the per-row min — instead
        # use uint64 wraparound hashing, which is a valid universal family
        # for LSH banding purposes (documented deviation from exact mod-p).
        vals = (self.a * x + self.b)  # uint64 wraparound
        return vals.min(axis=0)

    def band_keys(self, sig: np.ndarray, bands: int) -> list[int]:
        """Split the signature into ``bands`` bands, hash each to an int key."""
        r = self.num_perm // bands
        keys = []
        for i in range(bands):
            band = sig[i * r:(i + 1) * r]
            h = hashlib.blake2b(band.tobytes(), digest_size=8,
                                salt=i.to_bytes(8, "little"))
            keys.append(int.from_bytes(h.digest(), "little") >> 1)
        return keys


def simhash64(shingles: np.ndarray) -> int:
    """64-bit SimHash of a shingle-hash set (bit-majority fingerprint)."""
    if len(shingles) == 0:
        return 0
    bits = ((shingles[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1))
    votes = bits.sum(axis=0).astype(np.int64) * 2 - np.int64(len(shingles))
    return int((votes > 0).astype(np.uint64) @ (np.uint64(1) << np.arange(64, dtype=np.uint64)))


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard over two distinct-shingle arrays."""
    if len(a) == 0 and len(b) == 0:
        return 1.0
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter / (len(a) + len(b) - inter)


def rolling_fingerprint(text: str, window: int = 64, keep: int = 8) -> list[int]:
    """Winnowing-style document fingerprint: the ``keep`` smallest distinct
    window hashes (rolling polynomial over bytes)."""
    sh = char_shingles(text, k=min(window, max(4, len(text) // 16 or 4)))
    if len(sh) == 0:
        return []
    return sorted(int(v) for v in np.sort(sh)[:keep])
