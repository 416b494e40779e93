"""Deterministic sampling operators for training-data pipelines.

Bernoulli and stratified sampling keyed on a stable hash of a row key —
map-only (no shuffle, no driver state), reproducible across runs and
cluster shapes, and ORACLE-CHECKABLE: the hash is md5 of "{key}:{seed}",
which DuckDB reproduces exactly (``md5()`` + hex-prefix cast), so sampled
sets can be verified row-for-row against SQL. Per-row md5 is the same
accepted cost/parity trade as ``ops.text.doc_fingerprints``.

The keep rule: first 8 hex digits of md5(f"{key}:{seed}") as an integer,
mod 100, < pct. Uniform over keys, independent of partitioning.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa


def _keep_mask(keys, pct: float, seed: int) -> list[bool]:
    return [
        int(hashlib.md5(f"{k}:{seed}".encode()).hexdigest()[:8], 16) % 100 < pct
        for k in keys
    ]


def bernoulli_sample(ds, key_col: str, pct: float, seed: int = 42):
    """Deterministic ~pct% sample keyed on ``key_col`` (map-only filter)."""

    def filt(t: pa.Table) -> pa.Table:
        keep = _keep_mask(t.column(key_col).to_pylist(), pct, seed)
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)


def stratified_sample(ds, key_col: str, strata_col: str, pcts: dict,
                      default_pct: float = 0.0, seed: int = 42):
    """Per-stratum sampling rates (e.g. keep 20% of English docs, 5% of the
    rest) — the standard training-mix rebalancing shape. Same deterministic
    keep rule per row, with the rate chosen by the row's stratum."""

    def filt(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_pylist()
        strata = t.column(strata_col).to_pylist()
        keep = [
            int(hashlib.md5(f"{k}:{seed}".encode()).hexdigest()[:8], 16) % 100
            < pcts.get(s, default_pct)
            for k, s in zip(keys, strata)
        ]
        return t.filter(pa.array(keep, pa.bool_()))

    return ds.map_batches(filt, batch_format="pyarrow", zero_copy_batch=True)
