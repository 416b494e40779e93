"""Transcript-corpus preprocessing ahead of KG construction.

Multi-turn agent transcripts carry heavy cross-conversation boilerplate:
prompt templates, canned assistant acknowledgements, duplicated tool
payloads (the generator plants all three — user prompt templates recur in
hundreds of conversations). A C4/CCNet-style corpus cleaner removes turns
whose exact text recurs across many *distinct* conversations before any
per-turn work is spent on them.

Reference tie-in: the reference ingests each upload in isolation
(`tools.py` record extraction) and has no cross-payload view; this stage is
the corpus-scale complement — the same exact-text identity the reference's
uuid5 fingerprints rely on, applied across the whole transcript corpus.

Scale shape (10^12 turns):
  1. per-batch combiner: distinct (pid=content-hash-of-text, conv_id) pairs
     with partial turn counts — the shuffle carries one row per distinct
     (text, conv) per block, never the turns, and never the text bytes
     more than once per block;
  2. pid-bucket partition (`__part` = low bits of pid) -> per-partition
     finish: a pid never spans partitions, so distinct-conv counting is
     partition-local (the same co-location argument as
     pipelines/kg.node_counts_by_artifact_type);
  3. removal is a bucketed ANTI join of the turn stream against the
     boilerplate pid set (ops/joins.bucket_semi_join) — the boilerplate
     set is NOT assumed driver-small (at 10^12 turns / min_convs it can be
     huge), so no broadcast of it anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import content_hash64_arrow

TURN_COLUMNS = ["conv_id", "turn_idx", "role", "text"]


def _read_turns(source: "str | rd.Dataset", columns=None) -> rd.Dataset:
    if isinstance(source, str):
        return rd.read_parquet(source, columns=columns or TURN_COLUMNS)
    return source


def _pid(text_col) -> pa.Array:
    h = (content_hash64_arrow(text_col) >> np.uint64(1)).astype(np.int64)
    return pa.array(h, pa.int64())


def turn_text_stats(source: "str | rd.Dataset",
                    num_parts: int = 64) -> rd.Dataset:
    """Dataset[(pid, text, role, n_convs, n_turns)] — one row per distinct
    turn text with its cross-conversation spread.

    ``role`` is the minimum role label over the text's occurrences (texts
    are role-homogeneous in practice; min makes the value deterministic and
    SQL-reproducible either way).
    """
    ds = _read_turns(source, columns=["conv_id", "role", "text"])

    def local(t: pa.Table) -> pa.Table:
        for i, field in enumerate(t.schema):
            if pa.types.is_dictionary(field.type):
                t = t.set_column(i, pa.field(field.name, field.type.value_type),
                                 t.column(i).cast(field.type.value_type))
        keyed = t.append_column("pid", _pid(t.column("text")))
        # distinct (pid, conv) with partial turn counts; text/role ride
        # along once per pair via min (deterministic representative)
        agg = (keyed.group_by(["pid", "conv_id"])
               .aggregate([([], "count_all"), ("text", "min"), ("role", "min")]))
        agg = agg.rename_columns(["pid", "conv_id", "n_turns", "text", "role"])
        part = pc.bit_wise_and(agg.column("pid"),
                               pa.scalar(num_parts - 1, pa.int64()))
        return agg.append_column("__part", part.cast(pa.int32()))

    pre = ds.map_batches(local, batch_format="pyarrow")

    def finish(g: pa.Table) -> pa.Table:
        # a pid never spans partitions: fold cross-batch (pid, conv)
        # duplicates, then count distinct convs + total turns per pid
        pairs = (g.drop_columns(["__part"])
                 .group_by(["pid", "conv_id"])
                 .aggregate([("n_turns", "sum"), ("text", "min"),
                             ("role", "min")]))
        out = (pairs.group_by(["pid"])
               .aggregate([([], "count_all"), ("n_turns_sum", "sum"),
                           ("text_min", "min"), ("role_min", "min")]))
        return pa.table({
            "pid": out.column("pid"),
            "n_convs": out.column("count_all").cast(pa.int64()),
            "n_turns": out.column("n_turns_sum_sum").cast(pa.int64()),
            "text": out.column("text_min_min"),
            "role": out.column("role_min_min"),
        })

    return pre.groupby("__part").map_groups(finish, batch_format="pyarrow")


def boilerplate_turns(source: "str | rd.Dataset",
                      min_convs: int = 10) -> pd.DataFrame:
    """Texts recurring in >= ``min_convs`` distinct conversations:
    (text, role, n_convs, n_turns), text-sorted. The result is small by
    construction relative to the stats stream (bounded by turns/min_convs
    distinct texts), but the *computation* never assumes so — the filter
    runs distributed and only the flagged rows reach the driver."""
    stats = turn_text_stats(source)
    flagged = stats.filter(expr=f"n_convs >= {int(min_convs)}")
    out = flagged.select_columns(["text", "role", "n_convs", "n_turns"]).to_pandas()
    if out.empty:
        return pd.DataFrame({"text": pd.Series(dtype="str"),
                             "role": pd.Series(dtype="str"),
                             "n_convs": pd.Series(dtype="int64"),
                             "n_turns": pd.Series(dtype="int64")})
    return (out.astype({"n_convs": "int64", "n_turns": "int64"})
            .sort_values("text").reset_index(drop=True))


def boilerplate_removal_counts(source: "str | rd.Dataset",
                               min_convs: int = 10) -> pd.DataFrame:
    """One-row corpus summary of the cleanup: total / removed / kept turn
    counts plus the flagged-text count — computed from the per-text stats
    stream (no second pass over the turns)."""
    stats = turn_text_stats(source)

    def partial(t: pa.Table) -> pa.Table:
        flagged = pc.greater_equal(t.column("n_convs"),
                                   pa.scalar(min_convs, pa.int64()))
        nt = t.column("n_turns")
        total = pc.sum(nt).as_py() or 0
        removed = pc.sum(pc.if_else(flagged, nt, pa.scalar(0, pa.int64()))).as_py() or 0
        ntexts = pc.sum(flagged.cast(pa.int64())).as_py() or 0
        return pa.table({"total": pa.array([total], pa.int64()),
                         "removed": pa.array([removed], pa.int64()),
                         "ntexts": pa.array([ntexts], pa.int64())})

    parts = stats.map_batches(partial, batch_format="pyarrow").to_pandas()
    if parts.empty or "total" not in parts.columns:
        # empty corpus -> no stats batches at all; stay schema-stable
        parts = pd.DataFrame({"total": [0], "removed": [0], "ntexts": [0]})
    total = int(parts["total"].sum())
    removed = int(parts["removed"].sum())
    return pd.DataFrame({
        "n_turns_total": pd.Series([total], dtype="int64"),
        "n_turns_removed": pd.Series([removed], dtype="int64"),
        "n_turns_kept": pd.Series([total - removed], dtype="int64"),
        "n_boilerplate_texts": pd.Series([int(parts["ntexts"].sum())],
                                         dtype="int64"),
    })


def remove_boilerplate_turns(source: "str | rd.Dataset",
                             min_convs: int = 10) -> rd.Dataset:
    """The cleaned turn stream: drop every turn whose text recurs in >=
    ``min_convs`` distinct conversations. Bucketed ANTI join on pid — the
    boilerplate set is never collected or broadcast."""
    from ..ops.joins import bucket_semi_join

    ds = _read_turns(source)

    def key(t: pa.Table) -> pa.Table:
        return t.append_column("pid", _pid(t.column("text")))

    keyed = ds.map_batches(key, batch_format="pyarrow")
    flagged = (turn_text_stats(source)
               .filter(expr=f"n_convs >= {int(min_convs)}")
               .select_columns(["pid"]))
    kept = bucket_semi_join(keyed, flagged, on="pid", negate=True)
    return kept.drop_columns(["pid"])
