"""Sessionization / rolling-window bench at >=1M users.

Round-2 verdict item 1: groupby(user_id).map_groups dispatched one Python
call (~1 ms) PER USER — at 10^6 users that is ~17 min of pure dispatch.
Round 3 co-groups users into 64 hash buckets (analytics._keyed_segments) and
sessionizes every user in a bucket in one vectorized pass. This bench
measures the co-grouped implementations end-to-end at N users and, for
reference, times the OLD per-user-dispatch shape on a 20k-user slice to
estimate the dispatch cost the rewrite removed.

Usage: python scripts/bench_sessions_scaling.py [n_users] [events_per_user]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from case_uco_ontology_map_ray.pipelines import analytics  # noqa: E402


def synth_events(out_dir: str, n_users: int, events_per_user: int) -> None:
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.RandomState(42)
    n = n_users * events_per_user
    user_id = np.repeat(np.arange(n_users, dtype=np.int64), events_per_user)
    # per-user event times spread over 30 days (us)
    ts = rng.randint(0, 30 * 86400 * 1_000_000, size=n).astype("int64")
    base = np.datetime64("2024-01-01T00:00:00", "us").astype("int64")
    t = pa.table({
        "event_id": pa.array(np.arange(n, dtype=np.int64)),
        "ts": pa.array((base + ts).view("datetime64[us]")),
        "user_id": pa.array(user_id),
    })
    pq.write_table(t, f"{out_dir}/events.parquet", row_group_size=1 << 20)


def old_per_user_dispatch(sf_dir: str, k: int = 15):
    """The round-2 shape: one map_groups dispatch per user (for reference)."""
    import pandas as pd
    import ray.data as rd

    gap_us = 30 * 60 * 1_000_000
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"])

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("ts")
        t = g["ts"].astype("int64").to_numpy()
        new_session = np.ones(len(t), dtype=np.int64)
        new_session[1:] = (np.diff(t) > gap_us).astype(np.int64)
        sid = np.cumsum(new_session)
        out = g.assign(session_id=sid).groupby("session_id").agg(
            user_id=("user_id", "first"), session_start=("ts", "min"),
            n_events=("ts", "size"))
        return out.reset_index(drop=True)

    sessions = ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
    return sessions.to_pandas().sort_values(
        ["n_events", "user_id", "session_start"],
        ascending=[False, True, True]).head(k).reset_index(drop=True)


def main() -> None:
    n_users = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    epu = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    cpus = int(os.environ.get("RAY_GRAFT_CPUS", "16"))
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=cpus, include_dashboard=False,
                 log_to_driver=False)

    big_dir = "/tmp/bench_sessions_big"
    small_dir = "/tmp/bench_sessions_small"
    synth_events(big_dir, n_users, epu)
    synth_events(small_dir, 20_000, epu)

    out = {"n_users": n_users, "events_per_user": epu, "num_cpus": cpus}

    t0 = time.perf_counter()
    s = analytics.event_sessions(big_dir)
    out["event_sessions_sec"] = round(time.perf_counter() - t0, 2)
    assert len(s) == 15

    t0 = time.perf_counter()
    r = analytics.rolling_hour_counts(big_dir)
    out["rolling_hour_counts_sec"] = round(time.perf_counter() - t0, 2)
    assert len(r) == 25

    # reference: old per-user dispatch on 20k users only (1M would take ~17min)
    t0 = time.perf_counter()
    old = old_per_user_dispatch(small_dir)
    old_sec = time.perf_counter() - t0
    out["old_dispatch_20k_users_sec"] = round(old_sec, 2)
    out["old_dispatch_extrapolated_sec_at_n"] = round(old_sec * n_users / 20_000, 1)

    # cross-check: co-grouped == per-user dispatch on the same input
    new_small = analytics.event_sessions(small_dir)
    assert new_small.equals(old.astype(new_small.dtypes.to_dict())), \
        "co-grouped sessionization diverged from per-user reference"

    out["rows"] = n_users * epu
    out["sessions_rows_per_sec"] = round(out["rows"] / out["event_sessions_sec"])
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
