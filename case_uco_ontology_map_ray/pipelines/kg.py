"""End-to-end KG construction pipeline: transcripts -> triples (-> parquet).

Ray-Data-first shape (SURVEY.md §7.1 step 3):
    read_parquet (columns pruned)
      -> map_batches(TurnTriples actor pool, batch_format='pyarrow')
      -> [optional] write_parquet (partitioned, resumable)

The stage is record-local: no shuffle anywhere in triple construction.
Determinism: uuid5 IDs mean re-running any shard reproduces identical
triples, so the pipeline is idempotent and restart-safe.
"""

from __future__ import annotations

import ray.data as rd

from ..stages.kg_stage import TurnTriples

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
# Columns the triple stage actually needs — pruned at the read.
TRIPLE_INPUT_COLUMNS = ["conv_id", "turn_idx", "role", "text"]


def triples_from_transcripts(
    source: "str | rd.Dataset",
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int = 2048,
) -> rd.Dataset:
    """Build the (lazy) triples Dataset from a transcripts parquet path or
    an existing Dataset."""
    if isinstance(source, str):
        ds = rd.read_parquet(source, columns=TRIPLE_INPUT_COLUMNS)
    else:
        ds = source
    if concurrency is None:
        # Size the actor pool to the cluster, leaving headroom for the
        # read/write stages so no stage starves (ray_guide: pool sizing).
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = max(1, cpus - 2)
    return ds.map_batches(
        TurnTriples,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


TRIPLE_KEY = ["subj", "pred", "obj", "obj_dt"]


def distinct_triples(triples: rd.Dataset) -> rd.Dataset:
    """Exact triple dedup (SURVEY.md §2.5 A5 generalized to triples).

    Identical records in different turns produce identical uuid5 subjects, so
    the raw triple stream contains exact duplicates differing only in lineage.
    Two-phase dedup keeps the shuffle small:
      1. local combiner: per-batch arrow group_by drops in-batch duplicates;
      2. global hash-partitioned groupby on the triple key, keeping the
         lexicographically smallest lineage (deterministic under any
         parallelism / block arrival order).
    """
    from ray.data.aggregate import Min

    def local_dedup(t: "pa.Table") -> "pa.Table":
        agg = t.group_by(TRIPLE_KEY).aggregate(
            [("conv_id", "min"), ("turn_idx", "min"),
             ("artifact_type", "min"), ("record_fp", "min")]
        )
        return agg.rename_columns(TRIPLE_KEY + ["conv_id", "turn_idx", "artifact_type", "record_fp"])

    import pyarrow as pa  # noqa: F401  (annotation scope)

    pre = triples.map_batches(local_dedup, batch_format="pyarrow")
    return pre.groupby(TRIPLE_KEY).aggregate(
        Min("conv_id", alias_name="conv_id"),
        Min("turn_idx", alias_name="turn_idx"),
        Min("artifact_type", alias_name="artifact_type"),
        Min("record_fp", alias_name="record_fp"),
    )


def sorted_turns(source: "str | rd.Dataset") -> rd.Dataset:
    """Stable (conv_id, turn_idx) ordering of transcript turns — the per-turn
    text-equality invariant's ordering contract (BASELINE.json input_hint)."""
    ds = rd.read_parquet(source, columns=TRANSCRIPT_COLUMNS) if isinstance(source, str) else source
    return ds.sort(["conv_id", "turn_idx"])


def write_triples(triples: rd.Dataset, out_dir: str, min_rows_per_file: int = 200_000):
    """Partitioned parquet sink — a directory of part files, resumable via
    the lineage manifest written next to it (state/lineage.py)."""
    triples.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)
