"""Job-progress feed (state/progress.py) — the batch-engine analog of the
reference's SSE step stream (routes.py:50-128, services.py:82-245)."""

import pytest

pytestmark = pytest.mark.usefixtures("ray_session")


def _pipeline_with_tracking(tracker, job: str):
    import pyarrow.compute as pc
    import ray.data as rd

    from case_uco_ontology_map_ray.state.progress import track_stage

    ds = rd.range(10_000).map_batches(
        lambda t: t.rename_columns(["v"]), batch_format="pyarrow")
    ds = track_stage(ds, tracker, job, "read")
    ds = ds.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t.column("v"), 1), 0)),
        batch_format="pyarrow")
    ds = track_stage(ds, tracker, job, "filter_even")
    return ds


def test_progress_counts_match_dataset():
    import ray

    from case_uco_ontology_map_ray.state.progress import (
        post_completion, start_tracker)

    from case_uco_ontology_map_ray.state.progress import follow

    tracker = start_tracker()
    ds = _pipeline_with_tracking(tracker, "job-a")
    n = ds.count()
    post_completion(tracker, "job-a", rows=n)

    list(follow(tracker, job="job-a", timeout_s=30))  # drain stragglers
    snap = ray.get(tracker.snapshot.remote())
    by_stage = {s["stage"]: s for s in snap["stages"] if s["job"] == "job-a"}
    assert by_stage["read"]["rows"] == 10_000
    assert by_stage["filter_even"]["rows"] == 5_000 == n
    assert by_stage["read"]["batches"] >= 1
    assert snap["terminal"][-1]["type"] == "completion"
    assert snap["terminal"][-1]["rows"] == 5_000


def test_track_stage_is_passthrough():
    import ray.data as rd

    from case_uco_ontology_map_ray.state.progress import (
        start_tracker, track_stage)

    tracker = start_tracker()
    base = rd.range(1_000).map_batches(
        lambda t: t.rename_columns(["v"]), batch_format="pyarrow")
    tracked = track_stage(base, tracker, "job-b", "s")
    # row-set equality: Ray does not guarantee identical block ARRIVAL order
    # across two independent executions, so compare sorted rows
    key = lambda r: r["v"]  # noqa: E731
    assert sorted(tracked.take_all(), key=key) == sorted(base.take_all(), key=key)
    assert tracked.schema().names == ["v"]


def test_follow_yields_stream_until_completion():
    from case_uco_ontology_map_ray.state.progress import (
        follow, post_completion, start_tracker)

    tracker = start_tracker()
    ds = _pipeline_with_tracking(tracker, "job-c")
    n = ds.count()  # executes; progress events land in the actor
    post_completion(tracker, "job-c", rows=n)

    events = list(follow(tracker, job="job-c", timeout_s=30))
    # SSE contract: step* -> completion (terminal yielded last even when
    # straggler progress posts arrive after it; their seqs stay increasing)
    assert events[-1]["type"] == "completion"
    assert all(e["type"] == "progress" for e in events[:-1])
    seqs = [e["seq"] for e in events[:-1]]
    assert seqs == sorted(seqs)
    assert sum(e["rows"] for e in events[:-1]
               if e["stage"] == "filter_even") == 5_000


def test_follow_error_terminates_stream():
    from case_uco_ontology_map_ray.state.progress import (
        follow, post_error, start_tracker)

    tracker = start_tracker()
    post_error(tracker, "job-d", error="boom")
    events = list(follow(tracker, job="job-d", timeout_s=10))
    assert events == [{"type": "error", "job": "job-d", "error": "boom",
                       "seq": 0, "ts": events[0]["ts"]}]


def test_compaction_retires_terminal_floods():
    """r5 ADVICE: when terminal events alone exceed the cap, compaction must
    still shrink the retained list (quadratic posting cost otherwise)."""
    from case_uco_ontology_map_ray.state.progress import ProgressActor

    actor = ProgressActor.__ray_metadata__.modified_class.__ray_actor_class__  # unwrap
    a = actor()
    a._MAX_EVENTS = 100  # small cap for the test
    for i in range(1000):
        a.post({"type": "completion", "job": f"j{i}"})
        assert len(a._events) <= 101  # never grows past cap + the new event
    assert a._n_retired_terminals > 0
    # recent terminals are still visible to followers
    recent = [e for e in a.events_since(0) if e["type"] == "completion"]
    assert recent and recent[-1]["job"] == "j999"
