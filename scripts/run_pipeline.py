"""Job entrypoint for the flagship pipeline (the `ray job submit` shape):

    python scripts/run_pipeline.py --input <transcripts_dir> --output <dir> \
        [--resume] [--validate] [--canonicalize] [--num-cpus N]

On a real cluster this file is the `ray job submit --working-dir .`
entrypoint; in the sandbox it owns its local Ray session (guarded init, as
the driver contract requires of scripts).
"""

import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--resume", action="store_true",
                    help="chunked resumable run with lineage manifests")
    ap.add_argument("--validate", action="store_true",
                    help="emit violation column + summary")
    ap.add_argument("--canonicalize", action="store_true",
                    help="also write entity table + canonical link triples")
    ap.add_argument("--num-cpus", type=int, default=None)
    ap.add_argument("--progress", action="store_true",
                    help="stream per-stage progress events to stderr while "
                         "the job runs (the reference's SSE step feed, "
                         "routes.py:50-128, as a batch-engine poll stream)")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    t0 = time.perf_counter()
    metrics = {}

    if args.resume:
        from case_uco_ontology_map_ray.state.lineage import triples_resumable

        summary = triples_resumable(args.input, f"{args.output}/triples")
        metrics["resume_summary"] = summary
    else:
        from case_uco_ontology_map_ray.pipelines.kg import (
            triples_from_transcripts,
            validated_triples,
            violation_summary,
        )

        tracker = follower = None
        if args.progress:
            import threading

            from case_uco_ontology_map_ray.state.progress import (
                follow, post_completion, start_tracker, track_stage)

            tracker = start_tracker()

            def _print_feed():
                for ev in follow(tracker, job="run_pipeline", timeout_s=86400):
                    print(json.dumps(ev), file=sys.stderr, flush=True)

            follower = threading.Thread(target=_print_feed, daemon=True)
            follower.start()

        def _tracked(ds, stage):
            if tracker is None:
                return ds
            from case_uco_ontology_map_ray.state.progress import track_stage

            return track_stage(ds, tracker, "run_pipeline", stage)

        if args.validate:
            ds = _tracked(validated_triples(args.input), "validated_triples")
            ds.filter(expr="violation == ''").write_parquet(f"{args.output}/triples")
            metrics["violations"] = violation_summary(
                validated_triples(args.input)
            ).to_dict("records")
        else:
            _tracked(triples_from_transcripts(args.input), "triples") \
                .write_parquet(f"{args.output}/triples")

        if tracker is not None:
            from case_uco_ontology_map_ray.state.progress import post_completion

            post_completion(tracker, "run_pipeline")
            follower.join(timeout=30)

    if args.canonicalize:
        from case_uco_ontology_map_ray.pipelines.kg import triples_from_transcripts
        from case_uco_ontology_map_ray.pipelines.linking import canonical_entities

        entity, link = canonical_entities(triples_from_transcripts(args.input))
        entity.write_parquet(f"{args.output}/entities")
        link.write_parquet(f"{args.output}/entity_links")

    metrics["wall_sec"] = round(time.perf_counter() - t0, 2)
    # triple/throughput metrics from the written output (parquet metadata
    # only — no second data pass)
    try:
        import pyarrow.parquet as pq
        from pathlib import Path

        rows = sum(pq.read_metadata(str(f)).num_rows
                   for f in Path(args.output, "triples").rglob("*.parquet"))
        metrics["triples"] = rows
        metrics["triples_per_sec"] = round(rows / metrics["wall_sec"], 1)
    except Exception:
        pass
    with open(f"{args.output}/_metrics.json", "w") as f:
        json.dump(metrics, f, indent=1)
    print(json.dumps(metrics))
    ray.shutdown()


if __name__ == "__main__":
    main()
