"""Hypothesis property tests for the deterministic KG core: structural
invariants must hold for ARBITRARY records, not just fixtures."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from case_uco_ontology_map_ray.config import ONTOLOGY_MAPS, RESERVED_RECORD_KEYS
from case_uco_ontology_map_ray.kg.mapper import ArtifactMapper
from case_uco_ontology_map_ray.ontology.validate import allowed_value_forms

field_names = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), whitelist_characters="_"),
    min_size=1, max_size=20,
).filter(lambda s: s not in RESERVED_RECORD_KEYS)

scalar_values = st.one_of(
    st.booleans(),
    st.integers(min_value=-(2**31), max_value=2**31),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=40),
)
values = st.one_of(scalar_values, st.lists(st.text(min_size=1, max_size=20), max_size=4))

records = st.dictionaries(field_names, values, min_size=1, max_size=12)


@settings(max_examples=150, deadline=None)
@given(records)
def test_mapper_invariants_hold_for_arbitrary_records(record):
    mapper = ArtifactMapper(ONTOLOGY_MAPS["MFT Records"])
    fp1, triples1 = mapper.process_record(record)
    fp2, triples2 = ArtifactMapper(ONTOLOGY_MAPS["MFT Records"]).process_record(record)

    # determinism across independent mapper instances
    assert fp1 == fp2 and triples1 == triples2

    # exactly one rdf:type per subject
    types = {}
    for s, p, o, dt in triples1:
        if p == "rdf:type":
            assert s not in types
            types[s] = o
    assert types  # at least the primary node exists

    # no empty objects
    assert all(o != "" for _, _, o, _ in triples1)

    # parent objects only carry rdf:type / hasFacet
    parents = {s for s, p, _, _ in triples1 if p == "uco-core:hasFacet"}
    for s, p, o, dt in triples1:
        if s in parents:
            assert p in ("rdf:type", "uco-core:hasFacet")

    # hasFacet targets exist and are typed
    for s, p, o, dt in triples1:
        if p == "uco-core:hasFacet":
            assert o in types and dt == "@id"

    # fidelity: every emitted literal derives from the input record
    allowed = allowed_value_forms(record)
    for s, p, o, dt in triples1:
        if p == "rdf:type" or dt == "@id":
            continue
        assert o in allowed, (p, o)


@settings(max_examples=60, deadline=None)
@given(records)
def test_fingerprint_is_canonical_json_sha256(record):
    import hashlib

    from case_uco_ontology_map_ray.functions.fingerprint import record_fingerprint

    want = hashlib.sha256(
        json.dumps(record, sort_keys=True, separators=(",", ":")).encode()
    ).hexdigest()
    assert record_fingerprint(record) == want


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=200))
def test_shingle_minhash_simhash_total(text):
    """Sketch kernels never crash and are deterministic on arbitrary text."""
    from case_uco_ontology_map_ray.functions.hashing import (
        MinHasher,
        char_shingles,
        simhash64,
    )

    sh = char_shingles(text, 4)
    mh = MinHasher(16)
    assert (mh.signature(sh) == mh.signature(sh)).all()
    assert simhash64(sh) == simhash64(sh)


json_values = st.recursive(
    st.one_of(st.none(), st.booleans(),
              st.integers(min_value=-(2**200), max_value=2**200),
              st.floats(allow_nan=False, allow_infinity=False),
              st.text(max_size=30)),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=10), children, max_size=4)),
    max_leaves=20,
)


@settings(max_examples=200, deadline=None)
@given(json_values)
def test_loads_fast_equals_stdlib_for_arbitrary_json(value):
    """loads_fast must reproduce stdlib's parse VALUE- and TYPE-exactly for
    any JSON stdlib can emit — including >64-bit integers (the orjson
    widening trap) and deep nesting."""
    from case_uco_ontology_map_ray.functions.jsonx import loads_fast

    text = json.dumps(value)
    a, b = loads_fast(text), json.loads(text)

    def eq(x, y):
        if isinstance(x, dict):
            return isinstance(y, dict) and x.keys() == y.keys() and all(
                eq(x[k], y[k]) for k in x)
        if isinstance(x, list):
            return isinstance(y, list) and len(x) == len(y) and all(
                eq(p, q) for p, q in zip(x, y))
        return type(x) is type(y) and x == y

    assert eq(a, b)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**62), min_size=1,
                max_size=300, unique=True),
       st.integers(min_value=0, max_value=2**31))
def test_split_assign_disjoint_exhaustive_stable(keys, seed):
    """Property form of the split guarantees: every key gets exactly one
    label, and the label is a pure function of (key, seed) — independent of
    which other keys are present."""
    import numpy as np
    import pandas as pd

    from case_uco_ontology_map_ray.ops.sample import _mix64_u

    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    edges = np.cumsum([fr[l] for l in fr]); edges[-1] = 1.0 + 1e-12
    labels = list(fr)

    def assign(ks):
        h = pd.util.hash_pandas_object(pd.Series(ks), index=False).to_numpy()
        h = _mix64_u(h ^ np.uint64(seed * 0x9E3779B97F4A7C15 % (1 << 64)))
        u = h.astype(np.float64) / float(1 << 64)
        ix = np.minimum(np.searchsorted(edges, u, side="right"), len(labels) - 1)
        return [labels[i] for i in ix]

    full = dict(zip(keys, assign(keys)))
    half = keys[: max(1, len(keys) // 2)]
    sub = dict(zip(half, assign(half)))
    assert all(sub[k] == full[k] for k in half)
    assert set(full.values()) <= set(labels)


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.floats(min_value=-1e6, max_value=1e6, width=32),
                         min_size=4, max_size=4), min_size=1, max_size=40))
def test_quantization_roundtrip_bound(vectors):
    """For any float32 vectors: codes in [-127,127], zero vectors -> zero
    codes, reconstruction error <= scale/2 element-wise."""
    import numpy as np

    from case_uco_ontology_map_ray.ops.agg import round_away

    m = np.asarray(vectors, dtype=np.float32).astype(np.float64)
    maxabs = np.abs(m).max(axis=1)
    scale = np.where(maxabs > 0, maxabs / 127.0, 1.0)
    codes = round_away(m / scale[:, None], 0)
    codes[maxabs == 0] = 0
    assert np.abs(codes).max(initial=0) <= 127
    recon = codes * scale[:, None]
    err = np.abs(recon - m)
    assert (err <= scale[:, None] / 2 + 1e-9).all()


def test_normalize_texts_matches_scalar_reference():
    import re

    import pyarrow as pa
    import ray.data as rd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from case_uco_ontology_map_ray.ops.text import normalize_texts

    def scalar(x: str) -> str:
        return re.sub(r"[^a-z0-9]+", " ", x.lower()).strip()

    @settings(max_examples=25, deadline=None)
    @given(st.lists(st.text(max_size=40), min_size=1, max_size=8))
    def check(texts):
        tab = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                        "text": pa.array(texts, pa.string())})
        out = (normalize_texts(rd.from_arrow(tab)).to_pandas()
               .sort_values("doc_id"))
        assert list(out.norm_text) == [scalar(t) for t in texts]

    check()


def test_pagerank_quantized_iteration_is_scale_free():
    """rank_norm is normalized to mean ~1: on a k-regular graph every node
    must get exactly rank 1.0 at every iteration (fixed point)."""
    import ray.data as rd

    from tests.test_linking import _path_triples_table
    from case_uco_ontology_map_ray.pipelines.linking import entity_pagerank

    # 4-cycle via two conversations -> 2-regular
    tab = _path_triples_table({"c1": ["a", "b"], "c2": ["b", "c"],
                               "c3": ["c", "d"], "c4": ["d", "a"]})
    out = entity_pagerank(rd.from_arrow(tab), iters=3, k=10)
    assert (out.rank_norm == 1.0).all()
    assert (out.degree == 2).all()


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 30), st.integers(0, 30)),
                min_size=0, max_size=120))
def test_wedge_keys_match_brute_force(pairs):
    """_wedge_keys + _count_members equal a brute-force triangle count on
    arbitrary edge sets (degree-oriented, same convention as
    copurchase_triangles)."""
    import numpy as np

    from case_uco_ontology_map_ray.pipelines.analytics import (
        _count_members,
        _wedge_keys,
    )

    edges = sorted({(min(u, v), max(u, v)) for u, v in pairs if u != v})
    pk = np.sort(np.array([(np.int64(u) << np.int64(32)) | np.int64(v)
                           for u, v in edges], dtype=np.int64))
    # degree-ordered orientation
    from collections import Counter

    deg = Counter()
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    src, dst = [], []
    for u, v in edges:
        if (deg[u], u) < (deg[v], v):
            src.append(u), dst.append(v)
        else:
            src.append(v), dst.append(u)
    o = np.lexsort((np.array(dst or [0]), np.array(src or [0])))[:len(src)]
    s = np.array(src, dtype=np.int64)[o] if src else np.empty(0, np.int64)
    d = np.array(dst, dtype=np.int64)[o] if dst else np.empty(0, np.int64)
    got = _count_members(pk, _wedge_keys(s, d))
    eset = set(edges)
    nodes = sorted({x for e in edges for x in e})
    want = sum(1 for i, a in enumerate(nodes) for b in nodes[i + 1:]
               for c in nodes if c > b and (a, b) in eset and (a, c) in eset
               and (b, c) in eset)
    assert got == want
