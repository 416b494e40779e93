"""Graph visualization export — the engine's analog of the reference's S7
dev tool (``visualize.py:1-26``, which renders its LangGraph workflow to a
mermaid PNG via ``graph.get_graph().draw_mermaid_png()``).

Two exports, both plain-text (no rendering deps in scope — the reference
itself degrades gracefully when its renderer is missing):

- ``pipeline_mermaid``: the engine's stage DAG as a mermaid flowchart — the
  direct analog of the reference's agent-workflow chart.
- ``kg_subgraph_mermaid`` / ``kg_subgraph_dot``: a bounded sample of the
  produced knowledge graph (IRI-object triples = edges) as mermaid / DOT.
  The sample is taken with ``Dataset.limit`` — a streaming prefix read, no
  full materialization — because a viz of more than a few hundred edges is
  unreadable anyway.

``export_graph_visualization`` mirrors the reference script's behavior:
write the chart to a file, report the path.
"""

from __future__ import annotations

import re
from pathlib import Path

# The engine's stage DAG (kept in sync with pipelines.kg / stages.*; names
# match the class / function names so the chart is greppable).
_PIPELINE_EDGES = [
    ("read_parquet[transcripts]", "TurnTriples"),
    ("TurnTriples", "ValidatingTurnTriples"),
    ("ValidatingTurnTriples", "bounded_correction"),
    ("bounded_correction", "RuleEngine.validate"),
    ("RuleEngine.validate", "write_parquet[triples]"),
    ("TurnTriples", "exact_dedup[triples]"),
    ("exact_dedup[triples]", "write_parquet[distinct]"),
    ("TurnTriples", "entity_canonicalization"),
    ("entity_canonicalization", "minhash_lsh[values]"),
    ("minhash_lsh[values]", "propagate_components"),
    ("propagate_components", "LinkJoin"),
    ("LinkJoin", "write_parquet[links]"),
]


def _mermaid_id(name: str) -> str:
    return re.sub(r"[^A-Za-z0-9_]", "_", name)


def pipeline_mermaid(edges=None) -> str:
    """Engine stage DAG as a mermaid ``graph TD`` flowchart."""
    edges = edges if edges is not None else _PIPELINE_EDGES
    lines = ["graph TD"]
    seen: set[str] = set()
    for src, dst in edges:
        for n in (src, dst):
            if n not in seen:
                seen.add(n)
                lines.append(f'    {_mermaid_id(n)}["{n}"]')
    for src, dst in edges:
        lines.append(f"    {_mermaid_id(src)} --> {_mermaid_id(dst)}")
    return "\n".join(lines) + "\n"


def _sample_edges(triples_ds, max_edges: int):
    """Bounded (subj, pred, obj) IRI-edge sample: object-reference triples
    only (obj_dt == '@id'), streamed via limit — no full-graph collect."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def iri_edges(t: pa.Table) -> pa.Table:
        cols = {c: t.column(c).cast(pa.string()) if
                pa.types.is_dictionary(t.column(c).type) else t.column(c)
                for c in ("subj", "pred", "obj", "obj_dt")}
        t = pa.table(cols)
        return t.filter(pc.equal(t.column("obj_dt"), "@id")) \
                .select(["subj", "pred", "obj"])

    return triples_ds.map_batches(iri_edges, batch_format="pyarrow") \
                     .limit(max_edges).to_pandas()


def _short(iri: str, maxlen: int = 40) -> str:
    label = iri.rsplit("/", 1)[-1].rsplit("#", 1)[-1].rsplit(":", 1)[-1]
    return label if len(label) <= maxlen else label[: maxlen - 1] + "…"


def kg_subgraph_mermaid(triples_ds, max_edges: int = 60) -> str:
    """A sampled KG subgraph as a mermaid flowchart (nodes = entity IRIs,
    edges labeled with the predicate's local name)."""
    df = _sample_edges(triples_ds, max_edges)
    lines = ["graph LR"]
    seen: set[str] = set()
    for subj, pred, obj in df.itertuples(index=False):
        for n in (subj, obj):
            if n not in seen:
                seen.add(n)
                lines.append(f'    {_mermaid_id(n)}["{_short(n)}"]')
        lines.append(
            f"    {_mermaid_id(subj)} -->|{_short(pred)}| {_mermaid_id(obj)}")
    return "\n".join(lines) + "\n"


def kg_subgraph_dot(triples_ds, max_edges: int = 60) -> str:
    """The same sampled subgraph as Graphviz DOT."""
    df = _sample_edges(triples_ds, max_edges)
    lines = ["digraph kg {", "  rankdir=LR;", "  node [shape=box];"]
    seen: set[str] = set()
    for subj, pred, obj in df.itertuples(index=False):
        for n in (subj, obj):
            if n not in seen:
                seen.add(n)
                lines.append(f'  "{_mermaid_id(n)}" [label="{_short(n)}"];')
        lines.append(f'  "{_mermaid_id(subj)}" -> "{_mermaid_id(obj)}" '
                     f'[label="{_short(pred)}"];')
    lines.append("}")
    return "\n".join(lines) + "\n"


def export_graph_visualization(out_path: str, triples_ds=None,
                               max_edges: int = 60) -> str:
    """Write the chart to ``out_path`` (.mmd → mermaid, .dot → DOT) and
    return the path — the reference script's contract (print + save;
    ``visualize.py:14-22``). Without a triples Dataset, exports the
    pipeline DAG; with one, the sampled KG subgraph."""
    p = Path(out_path)
    if triples_ds is None:
        text = pipeline_mermaid()
    elif p.suffix == ".dot":
        text = kg_subgraph_dot(triples_ds, max_edges)
    else:
        text = kg_subgraph_mermaid(triples_ds, max_edges)
    p.write_text(text)
    return str(p)
