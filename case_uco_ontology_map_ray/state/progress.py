"""Live job-progress feed for long-running pipelines.

The reference streams per-step events over SSE while a session executes
(``routes.py:50-128`` wraps ``services.py:82-245``, which yields
``{"type": "step"|"completion"|"error", ...}`` dicts from the LangGraph
stream). The Ray-native equivalent for a batch engine is a driver-owned
``ProgressActor`` that pipeline stages post events to, plus a poll-based
``follow()`` generator — the same consumption contract SSE gives the
reference's UI (a stream of JSON-able event dicts ending in a
``completion`` event), without an HTTP server in the data plane.

Design notes for scale:
- Stages post one fire-and-forget actor call per BATCH (``.remote`` without
  ray.get), so the tracker adds no synchronous latency to the hot path; a
  single actor absorbs tens of thousands of tiny calls per second, far
  above the batch rate of any real pipeline (batches are >=1k rows).
- ``track_stage`` wraps a Dataset with a zero-copy pass-through
  ``map_batches`` that counts rows — it does NOT change blocks, schema, or
  ordering, and it composes anywhere in a lazy pipeline.
- Events carry a monotone per-job sequence number assigned by the actor, so
  ``follow()`` can resume from any offset (the SSE reconnect analog).
"""

from __future__ import annotations

import time
from typing import Any, Iterator

import pyarrow as pa
import ray


@ray.remote(num_cpus=0)
class ProgressActor:
    """Driver-owned event log: stages post, clients poll.

    num_cpus=0: the actor must never compete with pipeline workers for a
    CPU slot (a 1-CPU actor would deadlock fully-subscribed actor pools).
    """

    # Bound on retained raw events: long-lived drivers (many jobs, millions
    # of batches) must not grow the actor heap without limit. When exceeded,
    # the OLDEST progress events are folded into the per-(job, stage) rollup
    # that snapshot() reports anyway. Terminal (completion/error) events are
    # kept as long as they are a minority — but when terminals ALONE
    # approach the cap (very many short jobs), the oldest half of the
    # retained list is retired outright so every compaction is guaranteed to
    # halve the list (without this, each post() past the cap re-scanned
    # 100k events while shrinking nothing — quadratic, ADVICE r4). Followers
    # more than _MAX_EVENTS behind miss retired events — the documented
    # trade for a bounded actor.
    _MAX_EVENTS = 100_000

    def __init__(self):
        self._events: list[dict] = []
        self._next_seq = 0
        self._rollup: dict[tuple, dict] = {}
        self._n_compacted = 0
        self._n_retired_terminals = 0

    def _fold(self, e: dict) -> None:
        key = (e["job"], e["stage"])
        s = self._rollup.setdefault(key, {"job": e["job"], "stage": e["stage"],
                                          "rows": 0, "batches": 0,
                                          "first_ts": e["ts"], "last_ts": e["ts"]})
        s["rows"] += e["rows"]
        s["batches"] += 1
        s["last_ts"] = max(s["last_ts"], e["ts"])
        s["first_ts"] = min(s["first_ts"], e["ts"])

    def post(self, event: dict) -> None:
        event["seq"] = self._next_seq
        self._next_seq += 1
        event.setdefault("ts", time.time())
        self._events.append(event)
        if len(self._events) > self._MAX_EVENTS:
            keep, fold = [], []
            cut = len(self._events) // 2
            for i, e in enumerate(self._events):
                (fold if i < cut and e["type"] == "progress" else keep).append(e)
            for e in fold:
                self._fold(e)
            self._n_compacted += len(fold)
            self._events = keep
            # guaranteed shrink: if terminal events alone still exceed the
            # cap, retire the oldest half outright (progress among them is
            # folded, terminals are counted) — each compaction then halves
            # the retained list no matter the event mix
            if len(self._events) > self._MAX_EVENTS:
                cut = len(self._events) // 2
                for e in self._events[:cut]:
                    if e["type"] == "progress":
                        self._fold(e)
                        self._n_compacted += 1
                    else:
                        self._n_retired_terminals += 1
                self._events = self._events[cut:]

    def events_since(self, seq: int) -> list[dict]:
        # seq is the global monotone index; binary search over retained
        # events (compaction keeps them seq-sorted)
        lo, hi = 0, len(self._events)
        while lo < hi:
            mid = (lo + hi) // 2
            if self._events[mid]["seq"] < seq:
                lo = mid + 1
            else:
                hi = mid
        return self._events[lo:]

    def snapshot(self) -> dict:
        """Rolled-up view: per (job, stage) row counts + batch counts +
        last-event timestamps (including compacted events), plus terminal
        events."""
        stages: dict[tuple, dict] = {k: dict(v) for k, v in self._rollup.items()}
        terminal: list[dict] = []
        for e in self._events:
            if e["type"] == "progress":
                key = (e["job"], e["stage"])
                s = stages.setdefault(key, {"job": e["job"], "stage": e["stage"],
                                            "rows": 0, "batches": 0,
                                            "first_ts": e["ts"], "last_ts": e["ts"]})
                s["rows"] += e["rows"]
                s["batches"] += 1
                s["last_ts"] = max(s["last_ts"], e["ts"])
                s["first_ts"] = min(s["first_ts"], e["ts"])
            elif e["type"] in ("completion", "error"):
                terminal.append(e)
        return {"stages": sorted(stages.values(),
                                 key=lambda s: (s["job"], s["stage"])),
                "terminal": terminal, "n_events": self._next_seq}


def start_tracker() -> "ray.actor.ActorHandle":
    return ProgressActor.remote()


def track_stage(ds, tracker, job: str, stage: str):
    """Wrap a Dataset with a pass-through row counter that posts one
    fire-and-forget progress event per batch. Blocks/schema/order are
    untouched (zero_copy_batch)."""

    def _track(t: pa.Table) -> pa.Table:
        tracker.post.remote({"type": "progress", "job": job, "stage": stage,
                             "rows": t.num_rows})
        return t

    # task-based on purpose: an actor pool here could combine with
    # fully-reserved pools elsewhere in the pipeline and deadlock the
    # scheduler (see ops/dedup.ngram_jaccard_exact's payload stage note)
    return ds.map_batches(_track, batch_format="pyarrow", zero_copy_batch=True)


def post_completion(tracker, job: str, **fields: Any) -> None:
    ray.get(tracker.post.remote({"type": "completion", "job": job, **fields}))


def post_error(tracker, job: str, error: str, **fields: Any) -> None:
    ray.get(tracker.post.remote({"type": "error", "job": job,
                                 "error": error, **fields}))


def follow(tracker, job: str | None = None, poll_s: float = 0.2,
           timeout_s: float = 300.0, drain_s: float = 0.5) -> Iterator[dict]:
    """Yield events as they arrive until the job's terminal event (the SSE
    stream contract: step* -> completion|error, terminal yielded LAST).
    ``job=None`` follows all jobs and ends on the first terminal event.

    Worker progress posts are fire-and-forget, so a few may arrive AFTER
    the driver's terminal post; once a terminal event is seen, polling
    continues until the feed is quiet for ``drain_s`` and any straggler
    progress events are yielded before the terminal one.
    """
    seq = 0
    terminal: dict | None = None
    quiet_since: float | None = None
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        new = ray.get(tracker.events_since.remote(seq))
        relevant = False  # did this poll deliver events for the FOLLOWED job?
        for e in new:
            seq = e["seq"] + 1
            if job is not None and e.get("job") != job:
                continue
            relevant = True
            if e["type"] in ("completion", "error"):
                terminal = terminal or e
            else:
                yield e
        if terminal is not None:
            # quiet = no new events FOR THIS JOB — unrelated jobs' traffic
            # on a busy multi-job tracker must not starve the drain
            if relevant:
                quiet_since = None
            elif quiet_since is None:
                quiet_since = time.time()
            elif time.time() - quiet_since >= drain_s:
                yield terminal
                return
        if not new:
            time.sleep(poll_s)
    raise TimeoutError(f"no terminal event within {timeout_s}s")
