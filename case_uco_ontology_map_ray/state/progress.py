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

    def __init__(self):
        self._events: list[dict] = []

    def post(self, event: dict) -> None:
        event["seq"] = len(self._events)
        event.setdefault("ts", time.time())
        self._events.append(event)

    def events_since(self, seq: int) -> list[dict]:
        return self._events[seq:]

    def snapshot(self) -> dict:
        """Rolled-up view: per (job, stage) row counts + batch counts +
        last-event timestamps, plus terminal events."""
        stages: dict[tuple, dict] = {}
        terminal: list[dict] = []
        for e in self._events:
            if e["type"] == "progress":
                key = (e["job"], e["stage"])
                s = stages.setdefault(key, {"job": e["job"], "stage": e["stage"],
                                            "rows": 0, "batches": 0,
                                            "first_ts": e["ts"], "last_ts": e["ts"]})
                s["rows"] += e["rows"]
                s["batches"] += 1
                s["last_ts"] = e["ts"]
            elif e["type"] in ("completion", "error"):
                terminal.append(e)
        return {"stages": sorted(stages.values(),
                                 key=lambda s: (s["job"], s["stage"])),
                "terminal": terminal, "n_events": len(self._events)}


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
        for e in new:
            seq = e["seq"] + 1
            if job is not None and e.get("job") != job:
                continue
            if e["type"] in ("completion", "error"):
                terminal = terminal or e
            else:
                yield e
        if terminal is not None:
            if new:
                quiet_since = None
            elif quiet_since is None:
                quiet_since = time.time()
            elif time.time() - quiet_since >= drain_s:
                yield terminal
                return
        if not new:
            time.sleep(poll_s)
    raise TimeoutError(f"no terminal event within {timeout_s}s")
