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

import pyarrow as pa
import ray.data as rd

from ..functions.jsonx import loads_fast
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
        # Default: stateless tasks with a per-worker-process compiled-stage
        # cache — fully elastic, no actor-pool ramp-up (the compiled state
        # is <1 ms to build). Pass an explicit concurrency to run the same
        # stage as a bounded actor pool instead.
        from ..stages.kg_stage import turn_triples_fn

        return ds.map_batches(
            turn_triples_fn,
            batch_format="pyarrow",
            batch_size=batch_size,
            zero_copy_batch=True,
        )
    return ds.map_batches(
        TurnTriples,
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


TRIPLE_KEY = ["subj", "pred", "obj", "obj_dt"]


def _local_dedup(t: "pa.Table") -> "pa.Table":
    """Arrow hash-dedup on the triple key keeping the smallest lineage."""
    # decode dictionary columns: arrow's hash_min kernel (and downstream
    # cross-block schema unification) needs plain strings
    for i, field in enumerate(t.schema):
        if pa.types.is_dictionary(field.type):
            t = t.set_column(i, pa.field(field.name, field.type.value_type),
                             t.column(i).cast(field.type.value_type))
    agg = t.group_by(TRIPLE_KEY).aggregate(
        [("conv_id", "min"), ("turn_idx", "min"),
         ("artifact_type", "min"), ("record_fp", "min")]
    )
    return agg.rename_columns(
        TRIPLE_KEY + ["conv_id", "turn_idx", "artifact_type", "record_fp"]
    )


def _subj_partition(t: "pa.Table", num_parts: int) -> "pa.Table":
    """Vectorized partition id from the subject uuid's first two hex chars.

    All duplicates of a triple share the subject (uuid5 of the record), so
    partitioning by subject prefix co-locates every duplicate. numpy parses
    the hex pair without a Python loop.
    """
    import numpy as np
    import pyarrow.compute as pc

    pref = pc.utf8_slice_codeunits(t.column("subj"), 0, 2)
    b = pref.combine_chunks().to_numpy(zero_copy_only=False).astype("S2")
    digits = b.view(np.uint8).reshape(-1, 2).astype(np.int32)
    # '0'-'9' -> 0-9, 'a'-'f' -> 10-15
    digits = np.where(digits >= 97, digits - 87, digits - 48)
    part = (digits[:, 0] * 16 + digits[:, 1]) % num_parts
    return t.append_column("__part", pa.array(part, pa.int32()))


def distinct_triples(triples: rd.Dataset, num_parts: int = 256) -> rd.Dataset:
    """Exact triple dedup (SURVEY.md §2.5 A5 generalized to triples).

    Identical records in different turns produce identical uuid5 subjects, so
    the raw triple stream contains exact duplicates differing only in lineage.
    Three-phase, shuffle-light dedup:
      1. local combiner: per-batch arrow group_by drops in-batch duplicates
         (keeps the smallest lineage);
      2. partition by subject-uuid prefix (every duplicate shares its subj) —
         the shuffle key is a single int32, far cheaper to exchange than the
         4-string triple key;
      3. per-partition arrow group_by finishes the dedup.
    Result is deterministic under any parallelism / block arrival order:
    lineage = lexicographically smallest (conv_id, turn_idx) per column.
    """
    pre = triples.map_batches(_local_dedup, batch_format="pyarrow")
    parted = pre.map_batches(
        lambda t: _subj_partition(t, num_parts), batch_format="pyarrow"
    )

    def finish(g: "pa.Table") -> "pa.Table":
        return _local_dedup(g.drop_columns(["__part"]))

    return parted.groupby("__part").map_groups(finish, batch_format="pyarrow")


def distinct_triples_by_record(source: "str | rd.Dataset",
                               num_parts: int = 64,
                               batch_size: int = 2048) -> rd.Dataset:
    """Exact-dedup triples by deduplicating RECORDS before triple expansion.

    A record deterministically yields its full triple set (uuid5), so
    record-level dedup on the fingerprint is equivalent to triple-level
    dedup — but the shuffle moves one row per record (~1/10th the rows and
    none of the 11x triple strings):

      tool turns -> (fp head as int64, payload, min lineage)  [local dedup]
        -> groupby(fp % parts) -> per-partition arrow dedup
        -> triple construction on unique records only

    Lineage = lexicographically smallest (conv_id#turn_idx) among the
    duplicate occurrences, matching distinct_triples (verified in tests).
    """
    import json as _json

    import pyarrow.compute as pc

    from ..functions.fingerprint import record_fingerprint
    from ..kg.records import extract_records
    from ..stages.kg_stage import TurnTriples

    if isinstance(source, str):
        ds = rd.read_parquet(source, columns=TRIPLE_INPUT_COLUMNS)
    else:
        ds = source

    def extract_fp(t: "pa.Table") -> "pa.Table":
        mask = pc.and_(pc.equal(t.column("role"), "tool"),
                       pc.not_equal(t.column("text"), ""))
        tool_turns = t.filter(mask)
        fps, fp_ints, recs, lins = [], [], [], []
        for text, conv, turn in zip(tool_turns.column("text").to_pylist(),
                                    tool_turns.column("conv_id").to_pylist(),
                                    tool_turns.column("turn_idx").to_pylist()):
            try:
                payload = loads_fast(text)
            except (ValueError, TypeError):
                continue
            for record in extract_records(payload):
                fp = record_fingerprint(record)
                fps.append(fp)
                fp_ints.append(int(fp[:15], 16))  # 60-bit head, plenty for routing
                # INSERTION order, not sort_keys: property routing is
                # key-order-sensitive (last field matching a property wins,
                # ref uuid_planner.py:136-191) — e.g. EVTX's Level vs the
                # flattened artifact_type both match eventType. The
                # fingerprint above is canonical (sorted) regardless.
                recs.append(_json.dumps(record))
                lins.append(f"{conv}#{turn:010d}")
        t2 = pa.table({
            "fp": pa.array(fps, pa.string()),
            "fp_int": pa.array(fp_ints, pa.int64()),
            "record": pa.array(recs, pa.string()),
            "lineage": pa.array(lins, pa.string()),
        })
        # local combiner: min lineage per fingerprint within the batch
        agg = t2.group_by(["fp", "fp_int"]).aggregate(
            [("record", "min"), ("lineage", "min")]
        )
        agg = agg.rename_columns(["fp", "fp_int", "record", "lineage"])
        part = pc.bit_wise_and(agg.column("fp_int"),
                               pa.scalar(num_parts - 1, pa.int64()))
        return agg.append_column("__part", part.cast(pa.int32()))

    pre = ds.map_batches(extract_fp, batch_format="pyarrow", batch_size=batch_size)

    stage_holder: dict = {}

    def finish(g: "pa.Table") -> "pa.Table":
        agg = g.drop_columns(["__part"]).group_by(["fp", "fp_int"]).aggregate(
            [("record", "min"), ("lineage", "min")]
        )
        agg = agg.rename_columns(["fp", "fp_int", "record", "lineage"])
        stage = stage_holder.get("s")
        if stage is None:
            stage = stage_holder["s"] = TurnTriples()
        subj, pred, obj, dt = [], [], [], []
        convs, turns, atypes, fps_out = [], [], [], []
        for rec_json, lineage, fp in zip(agg.column("record").to_pylist(),
                                         agg.column("lineage").to_pylist(),
                                         agg.column("fp").to_pylist()):
            record = loads_fast(rec_json)
            atype = record.get("artifact_type")
            mapper = stage._mapper_for(atype, record)
            _, n = mapper.process_record_into(record, subj, pred, obj, dt,
                                              fp=fp)
            conv, _, turn = lineage.partition("#")
            convs.extend([conv] * n)
            turns.extend([int(turn)] * n)
            atypes.extend([atype or ""] * n)
            fps_out.extend([fp] * n)
        return pa.table({
            "subj": pa.array(subj, pa.string()),
            "pred": pa.array(pred, pa.string()),
            "obj": pa.array(obj, pa.string()),
            "obj_dt": pa.array(dt, pa.string()),
            "conv_id": pa.array(convs, pa.string()),
            "turn_idx": pa.array(turns, pa.int32()),
            "artifact_type": pa.array(atypes, pa.string()),
            "record_fp": pa.array(fps_out, pa.string()),
        })

    return pre.groupby("__part").map_groups(finish, batch_format="pyarrow")


def validated_triples(source: "str | rd.Dataset", concurrency=None,
                      batch_size: int = 2048) -> rd.Dataset:
    """Triples + violation column (stages.validate_stage); split with
    ``.filter(expr="violation == ''")`` / ``!=``."""
    from ..stages.validate_stage import ValidatingTurnTriples

    if isinstance(source, str):
        ds = rd.read_parquet(source, columns=TRIPLE_INPUT_COLUMNS)
    else:
        ds = source
    if concurrency is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = max(1, cpus - 2)
    return ds.map_batches(
        ValidatingTurnTriples, batch_format="pyarrow", batch_size=batch_size,
        zero_copy_batch=True, concurrency=concurrency,
    )


def violation_summary(validated: rd.Dataset):
    """Failure-pattern rollup (reference memory.py:21-57): violations
    Dataset -> groupby(rule).count, as pandas."""
    from ..ops.agg import grouped_sums

    import pandas as pd

    bad = validated.filter(expr="violation != ''")
    out = grouped_sums(bad, keys=["violation", "pred"], sum_cols={},
                       count_alias="n")
    if out.empty:
        return pd.DataFrame({"violation": pd.Series(dtype="str"),
                             "pred": pd.Series(dtype="str"),
                             "n": pd.Series(dtype="int64")})
    return out.sort_values(["n", "violation"], ascending=[False, True]).reset_index(drop=True)


def coverage_by_artifact_type(source: "str | rd.Dataset", concurrency=None):
    """A1 coverage stats: per artifact type, record count + field mapping
    coverage (partial map-side stats + global sum)."""
    from ..ops.agg import grouped_sums, round_away
    from ..stages.kg_stage import CoverageStats

    if isinstance(source, str):
        ds = rd.read_parquet(source, columns=TRIPLE_INPUT_COLUMNS)
    else:
        ds = source
    if concurrency is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = max(1, cpus - 2)
    per_record = ds.map_batches(CoverageStats, batch_format="pyarrow",
                                batch_size=2048, concurrency=concurrency)
    out = grouped_sums(per_record, keys=["artifact_type"],
                       sum_cols={"total_fields": "total_fields",
                                 "mapped_fields": "mapped_fields",
                                 "unmapped_fields": "unmapped_fields"},
                       count_alias="n_records")
    out["coverage"] = round_away(out.mapped_fields / out.total_fields, 4)
    return out.sort_values("artifact_type").reset_index(drop=True)


def node_counts_by_artifact_type(triples: rd.Dataset, num_parts: int = 64):
    """Distinct subjects (= emitted graph nodes) per artifact type — the
    second DuckDB-oracled KG invariant (VERDICT r4 #4): the generator's
    per-type record shape is fixed, so nodes-per-record is a schema constant
    (object + facet [+ relationship] — the rdf:type arity) and the expected
    count is SQL-counted records x that constant. Externally gates the
    skeleton builder's node allocation (M7/M8) beyond triple arity.

    Scale shape: per-batch distinct (type, subj) pairs -> partition by the
    subject-uuid prefix (all rows of one subj co-locate; the exchanged key
    is one int32) -> per-partition distinct -> tiny grouped count. The
    shuffle carries one row per (type, node) per block, never the triples.
    """
    import pandas as pd

    from ..ops.agg import grouped_sums

    def local(t: "pa.Table") -> "pa.Table":
        for i, field in enumerate(t.schema):
            if pa.types.is_dictionary(field.type):
                t = t.set_column(i, pa.field(field.name, field.type.value_type),
                                 t.column(i).cast(field.type.value_type))
        pairs = (t.select(["artifact_type", "subj"])
                 .group_by(["artifact_type", "subj"]).aggregate([]))
        return _subj_partition(pairs, num_parts)

    pre = triples.map_batches(local, batch_format="pyarrow")

    def finish(g: "pa.Table") -> "pa.Table":
        d = (g.drop_columns(["__part"])
             .group_by(["artifact_type", "subj"]).aggregate([]))
        agg = d.group_by(["artifact_type"]).aggregate([([], "count_all")])
        return agg.rename_columns(["artifact_type", "n_nodes"])

    counts = pre.groupby("__part").map_groups(finish, batch_format="pyarrow")
    out = grouped_sums(counts, keys=["artifact_type"],
                       sum_cols={"n_nodes": "n_nodes"})
    if out.empty:
        return pd.DataFrame({"artifact_type": pd.Series(dtype="str"),
                             "n_nodes": pd.Series(dtype="int64")})
    return out.sort_values("artifact_type").reset_index(drop=True)


def literal_value_counts(triples: rd.Dataset) -> "pd.DataFrame":
    """Value-level multiset of LITERAL triples: n per (artifact_type, pred,
    obj) over every non-IRI object the pipeline emits. This is the KG
    family's strongest external gate (VERDICT r4 gap #2): where the arity /
    node-count invariants check only COUNTS, the DuckDB twin of this query
    reproduces every literal VALUE by its own JSON extraction of the
    transcripts plus the same stringification rules (_emit_value,
    kg/mapper.py: str pass-through, int str(), bool true/false, float
    repr — all byte-identical to DuckDB's json_extract_string of the raw
    token), so any drift in property routing (M4/M5), value normalization
    (M10), or emission arity for any of the 48 literal (type, pred) pairs
    mismatches row-for-row. IRIs (rdf:type / hasFacet / kb: references) are
    excluded: uuid5 has no SQL twin; those are gated by the count
    invariants + goldens.

    Scale shape: per-batch filter + partial groupby count (grouped_sums),
    one small exchange keyed on (type, pred, obj); result cardinality is
    O(distinct literal values) — for a gate query collected to the driver;
    at corpus scale keep the grouped_sums_ds Dataset form instead.
    """
    import pandas as pd

    from ..ops.agg import grouped_sums

    def lit(t: "pa.Table") -> "pa.Table":
        for i, field in enumerate(t.schema):
            if pa.types.is_dictionary(field.type):
                t = t.set_column(i, pa.field(field.name, field.type.value_type),
                                 t.column(i).cast(field.type.value_type))
        import pyarrow.compute as pc

        mask = pc.not_equal(t.column("obj_dt"), "@id")
        return t.filter(mask).select(["artifact_type", "pred", "obj"])

    out = grouped_sums(triples.map_batches(lit, batch_format="pyarrow"),
                       keys=["artifact_type", "pred", "obj"], sum_cols={},
                       count_alias="n")
    if out.empty:
        return pd.DataFrame({"artifact_type": pd.Series(dtype="str"),
                             "pred": pd.Series(dtype="str"),
                             "obj": pd.Series(dtype="str"),
                             "n": pd.Series(dtype="int64")})
    return (out.sort_values(["artifact_type", "pred", "obj"])
            .reset_index(drop=True))


def custom_facet_definitions(source: "str | rd.Dataset", concurrency=None):
    """T4 as a distributed aggregate: per artifact type (custom-facet path
    only), the deterministic dfc-ext facet definition + TTL stub inferred
    from that type's record schema — a groupby(artifact_type) over
    field-signature rows (reference custom_facet.py:122-222 semantics,
    computed once per type instead of per payload).

    Precedence matches TurnTriples._mapper_for: a type the deterministic
    auto-mapper (ontology/automap.py) maps to real UCO classes never reaches
    the dfc-ext path, so it emits no custom facet here either."""
    import json as _json

    import pandas as pd
    import pyarrow.compute as pc

    from ..config import FALLBACK_ONTOLOGY_MAP, ONTOLOGY_MAPS, RESERVED_RECORD_KEYS
    from ..kg.custom_facets import generate_custom_facets
    from ..kg.mapper import ArtifactMapper
    from ..kg.records import extract_records

    if isinstance(source, str):
        ds = rd.read_parquet(source, columns=["role", "text"])
    else:
        ds = source

    known = set(ONTOLOGY_MAPS)

    def sigs(t: "pa.Table") -> "pa.Table":
        mask = pc.and_(pc.equal(t.column("role"), "tool"),
                       pc.not_equal(t.column("text"), ""))
        atypes, sig_rows, samples = [], [], []
        for text in t.filter(mask).column("text").to_pylist():
            try:
                payload = loads_fast(text)
            except (ValueError, TypeError):
                continue
            for record in extract_records(payload):
                atype = record.get("artifact_type")
                if atype in known:
                    continue
                fields = tuple(sorted(k for k in record
                                      if k not in RESERVED_RECORD_KEYS))
                atypes.append(atype or "")
                sig_rows.append(_json.dumps(fields))
                samples.append(_json.dumps(record, sort_keys=True))
        t2 = pa.table({"artifact_type": pa.array(atypes, pa.string()),
                       "field_sig": pa.array(sig_rows, pa.string()),
                       "sample": pa.array(samples, pa.string())})
        # combiner: one sample per (type, signature), smallest sample wins
        agg = t2.group_by(["artifact_type", "field_sig"]).aggregate([("sample", "min")])
        return agg.rename_columns(["artifact_type", "field_sig", "sample"])

    pre = ds.map_batches(sigs, batch_format="pyarrow")

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        from ..ontology.automap import build_ontology_map

        g = g.sort_values(["field_sig", "sample"])
        atype = g["artifact_type"].iloc[0]
        record = loads_fast(g["sample"].iloc[0])
        empty = pd.DataFrame({"artifact_type": [], "facet_name": [],
                              "properties": [], "ttl": []})
        auto_map, _ = build_ontology_map(atype or "", sorted(record.keys()))
        if auto_map is not None:
            return empty
        base = ArtifactMapper(FALLBACK_ONTOLOGY_MAP)
        unmapped = base.unmapped_fields(record, reserved=RESERVED_RECORD_KEYS)
        details = [{"field": f, "sampleValue": record.get(f)} for f in unmapped]
        custom, _updated, ttl = generate_custom_facets(
            details, record, atype, FALLBACK_ONTOLOGY_MAP
        )
        if not custom:
            return empty
        facet_name = next(iter(custom["facetDefinitions"]))
        props = _json.dumps(custom["facetDefinitions"][facet_name]["properties"],
                            sort_keys=True)
        return pd.DataFrame({"artifact_type": [atype], "facet_name": [facet_name],
                             "properties": [props], "ttl": [ttl]})

    out = pre.groupby("artifact_type").map_groups(per_type, batch_format="pandas")
    return out.to_pandas().sort_values("artifact_type").reset_index(drop=True)


def sorted_turns(source: "str | rd.Dataset") -> rd.Dataset:
    """Stable (conv_id, turn_idx) ordering of transcript turns — the per-turn
    text-equality invariant's ordering contract (BASELINE.json input_hint)."""
    ds = rd.read_parquet(source, columns=TRANSCRIPT_COLUMNS) if isinstance(source, str) else source
    return ds.sort(["conv_id", "turn_idx"])


def write_triples(triples: rd.Dataset, out_dir: str, min_rows_per_file: int = 200_000):
    """Partitioned parquet sink — a directory of part files, resumable via
    the lineage manifest written next to it (state/lineage.py)."""
    triples.write_parquet(out_dir, min_rows_per_file=min_rows_per_file)


def incremental_triples(source: "str | rd.Dataset", prior_conv_ids: rd.Dataset,
                        concurrency=None, batch_size: int = 2048) -> rd.Dataset:
    """Delta KG construction: build triples ONLY for conversations not in
    ``prior_conv_ids`` (a Dataset with a ``conv_id`` column — typically the
    conversation set recorded by a previous run's lineage manifests).

    The prior set is excluded by a bucketed ANTI join on conv_id BEFORE the
    triple stage, so no parse/mapping work is spent on already-processed
    conversations and the prior set is never collected or broadcast (at
    10^12 turns the prior corpus is arbitrarily large). uuid5 determinism
    makes the union of prior + delta outputs identical to a full rebuild
    (the same reuse-equals-recompute argument as state/lineage resume).
    """
    from ..ops.joins import bucket_semi_join

    if isinstance(source, str):
        ds = rd.read_parquet(source, columns=TRIPLE_INPUT_COLUMNS)
    else:
        ds = source
    fresh = bucket_semi_join(ds, prior_conv_ids, on="conv_id", negate=True)
    return triples_from_transcripts(fresh, concurrency=concurrency,
                                    batch_size=batch_size)
