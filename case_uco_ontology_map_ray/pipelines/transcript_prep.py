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


def turn_latency_stats(source: "str | rd.Dataset",
                       num_buckets: int = 64) -> pd.DataFrame:
    """Per-conversation timing profile over the transcript stream: number
    of turns, total span (last ts - first ts) and the largest gap between
    consecutive turns (turn_idx order), all in EXACT integer microseconds
    — the agent-ops latency dashboard over the input_hint table.

    Scale shape: conversations are hash-bucketed into co-groups (many
    conversations per dispatch); each bucket sorts once by
    (conv_id, turn_idx) and computes every conversation's span/max-gap in
    one vectorized diff pass (gaps never cross conversations because the
    boundary positions are masked). The exchange carries one row per
    conversation.

    Oracle: SQL lead() window over the same parquet — see __ray_entry__.
    """
    from ..ops.joins import _mix_bucket

    ds = _read_turns(source, columns=["conv_id", "turn_idx", "ts"])
    cols = ["conv_id", "n_turns", "span_us", "max_gap_us"]
    empty = pd.DataFrame({"conv_id": pd.Series(dtype="object")}
                         | {c: pd.Series(dtype="int64") for c in cols[1:]})

    def add_bucket(t: pa.Table) -> pa.Table:
        conv = t.column("conv_id")
        if pa.types.is_dictionary(conv.type):
            conv = conv.cast(pa.string())
            t = t.set_column(t.column_names.index("conv_id"), "conv_id", conv)
        return t.append_column("__b", _mix_bucket(conv, num_buckets))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        if g.empty:
            return empty
        g = g.sort_values(["conv_id", "turn_idx"], kind="mergesort")
        conv = g["conv_id"].to_numpy()
        us = g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        same = np.r_[False, conv[1:] == conv[:-1]]
        gap = np.r_[np.int64(0), np.diff(us)]
        # boundary rows carry -inf so a conversation's max is over its TRUE
        # gaps only (a negative max gap must survive; single-turn convs
        # have no gaps and clamp to 0 below — the SQL COALESCE twin)
        gap[~same] = np.iinfo(np.int64).min
        out = pd.DataFrame({"conv_id": conv, "us": us, "gap": gap})
        agg = (out.groupby("conv_id", sort=False)
               .agg(n_turns=("us", "size"), lo=("us", "min"),
                    hi=("us", "max"), max_gap_us=("gap", "max"))
               .reset_index())
        agg.loc[agg["max_gap_us"] == np.iinfo(np.int64).min,
                "max_gap_us"] = 0
        agg["span_us"] = agg["hi"] - agg["lo"]
        return agg[cols].astype({c: "int64" for c in cols[1:]})

    out = (ds.map_batches(add_bucket, batch_format="pyarrow")
           .groupby("__b").map_groups(
               lambda g: per_bucket(g.drop(columns=["__b"])),
               batch_format="pandas")
           .to_pandas())
    if out.empty or "conv_id" not in out.columns:
        return empty
    return out.sort_values("conv_id").reset_index(drop=True)[cols]


def tool_usage_stats(source: "str | rd.Dataset") -> pd.DataFrame:
    """Per-tool usage rollup over the tool turns: call count, distinct
    conversations using the tool, and total payload characters — the
    agent-telemetry rollup. One combiner pass emits distinct
    (tool, conv_id) partials + per-(tool) count/chars partials; the
    exchange is tool-domain-sized.

    Oracle: SQL GROUP BY over the same parquet — see __ray_entry__.
    """
    from ..ops.agg import grouped_sums

    ds = _read_turns(source, columns=["conv_id", "role", "text", "tool"])
    cols = ["tool", "n_calls", "n_convs", "total_chars"]
    empty = pd.DataFrame({"tool": pd.Series(dtype="object")}
                         | {c: pd.Series(dtype="int64") for c in cols[1:]})

    def partial(t: pa.Table) -> pa.Table:
        tool = t.column("tool")
        if pa.types.is_dictionary(tool.type):
            tool = tool.cast(pa.string())
        role = t.column("role")
        if pa.types.is_dictionary(role.type):
            role = role.cast(pa.string())
        keep = pc.and_(pc.equal(role, "tool"), pc.is_valid(tool))
        x = pa.table({"tool": tool,
                      "conv_id": t.column("conv_id"),
                      "chars": pc.utf8_length(t.column("text"))
                      .cast(pa.int64())}).filter(keep)
        # distinct (tool, conv) within the batch carries the conv marker;
        # per-tool counts/chars are plain partial sums
        pairs = x.group_by(["tool", "conv_id"]).aggregate(
            [([], "count_all"), ("chars", "sum")])
        return pairs.rename_columns(["tool", "conv_id", "n_part", "c_part"])

    from ..ops.joins import _mix_bucket

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _mix_bucket(t.column("conv_id"), 64))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # a conversation lives in exactly one bucket, so distinct-conv
        # counting is bucket-local and the emitted rows are per-(tool)
        # partials — the driver only sums tool-domain-sized rows
        g = (g.drop(columns=["__b"])
             .groupby(["tool", "conv_id"], as_index=False)
             .agg(n=("n_part", "sum"), c=("c_part", "sum")))
        out = (g.groupby("tool", as_index=False)
               .agg(n_calls=("n", "sum"), n_convs=("conv_id", "size"),
                    total_chars=("c", "sum")))
        return out

    parts = (ds.map_batches(partial, batch_format="pyarrow",
                            zero_copy_batch=True)
             .map_batches(add_bucket, batch_format="pyarrow")
             .groupby("__b").map_groups(per_bucket, batch_format="pandas"))
    agg = grouped_sums(parts, keys=["tool"],
                       sum_cols={"n_calls": "n_calls", "n_convs": "n_convs",
                                 "total_chars": "total_chars"})
    if agg.empty:
        return empty
    return (agg[cols].astype({c: "int64" for c in cols[1:]})
            .sort_values("tool").reset_index(drop=True))


def tool_copresence_lift(source: "str | rd.Dataset") -> pd.DataFrame:
    """Association mining over the agent's tool usage: for every tool pair
    (a < b), in how many conversations do BOTH appear, and how does that
    compare to independence — ``lift = n_convs * n_ab / (n_a * n_b)``
    (nano, one pinned IEEE expression over exact int64 counts). The
    telemetry a tool-routing designer reads to find coupled tools.

    Shape: distinct (conv, tool) pairs via a per-batch combiner; each
    conversation's pair fan-out happens inside conv co-groups (tools per
    conv is bounded by the tool domain, so C(k,2) is tiny); the pair
    exchange is tool-pair-domain-sized. Oracle: SQL self-join on distinct
    pairs — see __ray_entry__.
    """
    from ..ops.agg import grouped_sums, round_away
    from ..ops.joins import _mix_bucket

    ds = _read_turns(source, columns=["conv_id", "role", "tool"])
    cols = ["tool_a", "tool_b", "n_ab", "n_a", "n_b", "lift_nano"]

    def distinct_pairs(t: pa.Table) -> pa.Table:
        role = t.column("role")
        if pa.types.is_dictionary(role.type):
            role = role.cast(pa.string())
        tool = t.column("tool")
        if pa.types.is_dictionary(tool.type):
            tool = tool.cast(pa.string())
        x = pa.table({"conv_id": t.column("conv_id"), "tool": tool}).filter(
            pc.and_(pc.equal(role, "tool"), pc.is_valid(tool)))
        return x.group_by(["conv_id", "tool"]).aggregate([])

    pre = ds.map_batches(distinct_pairs, batch_format="pyarrow",
                         zero_copy_batch=True)

    def add_bucket(t: pa.Table) -> pa.Table:
        return t.append_column("__b", _mix_bucket(t.column("conv_id"), 64))

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = (g.drop(columns=["__b"])
             .drop_duplicates(["conv_id", "tool"])
             .sort_values(["conv_id", "tool"], kind="mergesort"))
        rows = {"tool_a": [], "tool_b": [], "n_part": []}
        singles = {"tool": [], "n_part": []}
        n_convs_part = 0
        for _, sub in g.groupby("conv_id", sort=False):
            ts = sub["tool"].tolist()
            n_convs_part += 1
            singles["tool"].extend(ts)
            singles["n_part"].extend([1] * len(ts))
            for i in range(len(ts)):
                for j in range(i + 1, len(ts)):
                    rows["tool_a"].append(ts[i])
                    rows["tool_b"].append(ts[j])
                    rows["n_part"].append(1)
        pairs = (pd.DataFrame(rows)
                 .groupby(["tool_a", "tool_b"], as_index=False)
                 .agg(n_part=("n_part", "sum")))
        pairs["kind"] = "pair"
        sing = (pd.DataFrame(singles).groupby("tool", as_index=False)
                .agg(n_part=("n_part", "sum"))
                .rename(columns={"tool": "tool_a"}))
        sing["tool_b"] = ""
        sing["kind"] = "single"
        conv = pd.DataFrame({"tool_a": ["__convs__"], "tool_b": [""],
                             "n_part": [n_convs_part], "kind": ["conv"]})
        return pd.concat([pairs, sing, conv], ignore_index=True)[
            ["kind", "tool_a", "tool_b", "n_part"]]

    parts = (pre.map_batches(add_bucket, batch_format="pyarrow")
             .groupby("__b").map_groups(per_bucket, batch_format="pandas"))
    agg = grouped_sums(parts, keys=["kind", "tool_a", "tool_b"],
                       sum_cols={"n": "n_part"})
    empty = pd.DataFrame({c: pd.Series(dtype="object" if c.startswith("tool")
                                       else "int64") for c in cols})
    if agg.empty:
        return empty
    n_convs = int(agg.loc[agg["kind"] == "conv", "n"].sum())
    sing = agg[agg["kind"] == "single"].set_index("tool_a")["n"]
    pairs = agg[agg["kind"] == "pair"].copy()
    if pairs.empty or n_convs == 0:
        return empty
    na = sing.loc[pairs["tool_a"]].to_numpy(np.int64)
    nb = sing.loc[pairs["tool_b"]].to_numpy(np.int64)
    nab = pairs["n"].to_numpy(np.int64)
    # pinned expression (verbatim in SQL): 1e9 * (n_convs * n_ab) / (n_a * n_b)
    lift = round_away(
        (1e9 * (np.float64(n_convs) * nab)) / (na.astype(np.float64) * nb), 0)
    out = pd.DataFrame({"tool_a": pairs["tool_a"].to_numpy(),
                        "tool_b": pairs["tool_b"].to_numpy(),
                        "n_ab": nab, "n_a": na, "n_b": nb,
                        "lift_nano": lift.astype(np.int64)})
    return (out.sort_values(["tool_a", "tool_b"]).reset_index(drop=True)
            .astype({c: "int64" for c in ["n_ab", "n_a", "n_b",
                                          "lift_nano"]}))


def pii_by_tool(source: "str | rd.Dataset") -> pd.DataFrame:
    """Per-tool PII exposure telemetry: which tools emit how much
    PII-shaped content (the governance rollup a redaction policy is
    tuned against). Runs the sequential RE2 family redaction
    (ops/text.redact_pii — order is semantics) over the tool turns and
    sums per-family match counts per tool. One map pass + a
    tool-domain-sized exchange.

    Oracle: the pii_redaction CTE chain with tool carried through,
    GROUP BY tool — see __ray_entry__.
    """
    from ..ops.agg import grouped_sums
    from ..ops.text import PII_FAMILIES, redact_pii

    ds = _read_turns(source, columns=["role", "text", "tool"])

    def keep_tool_turns(t: pa.Table) -> pa.Table:
        role = t.column("role")
        if pa.types.is_dictionary(role.type):
            role = role.cast(pa.string())
        tool = t.column("tool")
        if pa.types.is_dictionary(tool.type):
            tool = tool.cast(pa.string())
        text = t.column("text")
        keep = pc.and_(pc.and_(pc.equal(role, "tool"),
                               pc.not_equal(text, "")),
                       pc.is_valid(tool))
        return pa.table({"tool": tool, "text": text}).filter(keep)

    red = redact_pii(ds.map_batches(keep_tool_turns,
                                    batch_format="pyarrow",
                                    zero_copy_batch=True))
    fam = [f"n_{name}" for name, _, _ in PII_FAMILIES]
    cols = ["tool", "n_turns"] + fam

    def partial(t: pa.Table) -> pa.Table:
        x = t.select(["tool"] + fam)
        agg = x.group_by(["tool"]).aggregate(
            [([], "count_all")] + [(c, "sum") for c in fam])
        return agg.rename_columns(["tool", "t_part"]
                                  + [f"{c}_part" for c in fam])

    out = grouped_sums(red.map_batches(partial, batch_format="pyarrow"),
                       keys=["tool"],
                       sum_cols={"n_turns": "t_part",
                                 **{c: f"{c}_part" for c in fam}})
    if out.empty:
        return pd.DataFrame({"tool": pd.Series(dtype="object")}
                            | {c: pd.Series(dtype="int64")
                               for c in cols[1:]})
    return (out[cols].astype({c: "int64" for c in cols[1:]})
            .sort_values("tool").reset_index(drop=True))
