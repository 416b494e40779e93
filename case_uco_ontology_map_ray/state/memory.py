"""Failure-pattern learning accumulator (T8).

The reference accumulates per-session failure patterns and derives
correction strategies fed back into later LLM prompts
(``memory.py:21-91``: extract_failure_pattern -> generate_correction_pattern
-> update_memory_context). The engine's deterministic path has no prompts to
feed, but the same learning product is valuable operationally: which
(artifact type, rule) combinations fail, how often, on which properties, and
what the bounded correction pass (stages/validate_stage.py) will do about
them. This module computes that as a distributed aggregate over the
validated triple stream and renders the reference-shaped memory context.

Strategy derivation mirrors ``generate_correction_pattern``: the strategy is
the corrective action the pipeline actually applies (drop-property
recompose), with priority "high" when a pattern fired more than twice else
"medium" (reference memory.py:62-66).
"""

from __future__ import annotations

import pandas as pd


def learn_failure_patterns(validated) -> pd.DataFrame:
    """Validated triples Dataset -> one pattern row per
    (artifact_type, rule): count, distinct properties hit, sample property.

    Columns: artifact_type, rule, n, n_props, sample_pred, strategy, priority
    """
    from ..ops.agg import grouped_sums

    bad = validated.filter(expr="violation != ''")
    per_pred = grouped_sums(bad, keys=["artifact_type", "violation", "pred"],
                            sum_cols={}, count_alias="n")
    if per_pred.empty:
        return pd.DataFrame({
            "artifact_type": pd.Series(dtype="str"),
            "rule": pd.Series(dtype="str"),
            "n": pd.Series(dtype="int64"),
            "n_props": pd.Series(dtype="int64"),
            "sample_pred": pd.Series(dtype="str"),
            "strategy": pd.Series(dtype="str"),
            "priority": pd.Series(dtype="str"),
        })
    for c in ("artifact_type", "violation", "pred"):
        per_pred[c] = per_pred[c].astype(str)
    # normalize parameterized rules (datatype[xsd:integer] -> datatype)
    per_pred["rule"] = per_pred["violation"].str.replace(
        r"\[.*\]$", "", regex=True)
    grp = per_pred.groupby(["artifact_type", "rule"], sort=True)
    out = grp.agg(
        n=("n", "sum"),
        n_props=("pred", "nunique"),
        sample_pred=("pred", "min"),
    ).reset_index()
    out["n"] = out["n"].astype("int64")
    out["strategy"] = "drop-property-recompose"
    out["priority"] = out["n"].map(lambda n: "high" if n > 2 else "medium")
    return out.sort_values(["n", "artifact_type", "rule"],
                           ascending=[False, True, True]).reset_index(drop=True)


def memory_context(patterns: pd.DataFrame) -> str:
    """Render the reference-shaped memory context string
    (``memory.py:69-91``)."""
    if patterns.empty:
        return "No previous memory available"
    parts = ["Previous failure patterns:"]
    for _, row in patterns.iterrows():
        parts.append(f"- {row.artifact_type}/{row.rule}: {row.n} violations "
                     f"across {row.n_props} properties (e.g. {row.sample_pred})")
    parts.append("Correction strategies:")
    for _, row in patterns.iterrows():
        parts.append(f"- {row.artifact_type}/{row.rule}: {row.strategy} "
                     f"[{row.priority}]")
    return "\n".join(parts)
