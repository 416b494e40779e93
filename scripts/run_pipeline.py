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

        if args.validate:
            ds = validated_triples(args.input)
            ds.filter(expr="violation == ''").write_parquet(f"{args.output}/triples")
            metrics["violations"] = violation_summary(
                validated_triples(args.input)
            ).to_dict("records")
        else:
            triples_from_transcripts(args.input).write_parquet(f"{args.output}/triples")

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
