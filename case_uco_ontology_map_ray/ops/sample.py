"""Deterministic sampling operators for training-data pipelines.

Bernoulli and stratified sampling keyed on a stable hash of a row key —
map-only (no shuffle, no driver state), reproducible across runs and
cluster shapes. Two keep-rule modes:

- ``method="mix64"`` (default, PRODUCTION): fully vectorized — the key
  column is hashed with ``pandas.util.hash_pandas_object`` (SipHash-style
  64-bit, C-implemented, any dtype), seed-mixed with the same xorshift
  avalanche as ``ops.joins._mix_bucket``, and kept when
  ``hash / 2^64 < pct / 100``. Supports FRACTIONAL rates (pct=0.5 keeps
  ~0.5%) and costs no per-row Python — the right rule at 10^12 rows.
- ``method="md5"`` (ORACLE mode): first 8 hex digits of
  md5(f"{key}:{seed}") as an int, mod 100, < pct — reproducible in DuckDB
  (``md5()`` + hex-prefix cast), so sampled sets can be verified
  row-for-row against SQL. Per-row Python md5: use only for
  oracle-checked runs and tests, never on the 100-TB path. NOTE: the
  mod-100 rule quantizes pct to whole percents (pct=0.5 behaves as ~1%,
  matching ``hash % 100 == 0``); pass integer pct in this mode.

Both rules are uniform over keys and independent of partitioning.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _mix64_u(x: np.ndarray) -> np.ndarray:
    """uint64 xorshift-multiply avalanche (same constants as
    ops.similarity._mix64 / ops.joins._mix_bucket family)."""
    x = x.astype(np.uint64, copy=True)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xFF51AFD7ED558CCD)
    x ^= x >> np.uint64(33)
    x *= np.uint64(0xC4CEB9FE1A85EC53)
    x ^= x >> np.uint64(33)
    return x


def _keep_mask_mix64(keys: pd.Series, pcts: np.ndarray | float, seed: int) -> np.ndarray:
    """Vectorized keep mask: hash(key) seed-mixed, uniform in [0, 1)."""
    h = pd.util.hash_pandas_object(keys, index=False).to_numpy()  # uint64
    h = _mix64_u(h ^ np.uint64(seed * 0x9E3779B97F4A7C15 % (1 << 64)))
    u = h.astype(np.float64) / float(1 << 64)
    return u < (np.asarray(pcts, dtype=np.float64) / 100.0)


def _keep_mask_md5(keys, pcts, seed: int) -> list[bool]:
    # oracle-parity rule; per-row md5 is the documented cost of SQL parity
    if np.isscalar(pcts):
        pcts = [pcts] * len(keys)
    return [
        int(hashlib.md5(f"{k}:{seed}".encode()).hexdigest()[:8], 16) % 100 < p
        for k, p in zip(keys, pcts)
    ]


def bernoulli_sample(ds, key_col: str, pct: float, seed: int = 42,
                     method: str = "mix64"):
    """Deterministic ~pct% sample keyed on ``key_col`` (map-only filter).

    ``method="mix64"`` (default) is vectorized and supports fractional pct;
    ``method="md5"`` is the DuckDB-reproducible oracle rule (integer pct)."""
    if method not in ("mix64", "md5"):
        raise ValueError(f"unknown sampling method {method!r}")

    if method == "md5":
        def filt(t: pa.Table) -> pa.Table:
            keep = _keep_mask_md5(t.column(key_col).to_pylist(), pct, seed)
            return t.filter(pa.array(keep, pa.bool_()))
    else:
        def filt(t: pa.Table) -> pa.Table:
            keys = t.column(key_col).to_pandas()
            return t.filter(pa.array(_keep_mask_mix64(keys, pct, seed)))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(ds, key_col: str, strata_col: str, pcts: dict,
                      default_pct: float = 0.0, seed: int = 42,
                      method: str = "mix64"):
    """Per-stratum sampling rates (e.g. keep 20% of English docs, 5% of the
    rest) — the standard training-mix rebalancing shape. Same deterministic
    keep rule per row, with the rate chosen by the row's stratum."""
    if method not in ("mix64", "md5"):
        raise ValueError(f"unknown sampling method {method!r}")

    if method == "md5":
        def filt(t: pa.Table) -> pa.Table:
            keys = t.column(key_col).to_pylist()
            rates = [pcts.get(s, default_pct)
                     for s in t.column(strata_col).to_pylist()]
            keep = _keep_mask_md5(keys, rates, seed)
            return t.filter(pa.array(keep, pa.bool_()))
    else:
        def filt(t: pa.Table) -> pa.Table:
            keys = t.column(key_col).to_pandas()
            rates = (t.column(strata_col).to_pandas().map(pcts)
                     .fillna(default_pct).to_numpy(dtype=np.float64))
            return t.filter(pa.array(_keep_mask_mix64(keys, rates, seed)))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
