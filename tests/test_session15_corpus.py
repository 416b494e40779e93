"""Session-15 operators: temperature mixing, token-budget quality pruning,
blocklist filtering, Zipf fit — edge semantics pinned by hand cases."""

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from case_uco_ontology_map_ray.ops.sample import grouped_bottomk_sample
from case_uco_ontology_map_ray.pipelines.corpus import (
    blocklist_filter,
    doc_quality_budget,
    doc_temperature_mixture,
    zipf_token_fit,
)


def _write_docs(tmp_path, doc_ids, texts, langs=None):
    langs = langs or ["en"] * len(doc_ids)
    pq.write_table(pa.table({
        "doc_id": pa.array(doc_ids, pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    }), str(tmp_path / "documents.parquet"))


@pytest.mark.usefixtures("ray_session")
def test_temperature_mixture_quota_math(tmp_path):
    """alpha=0.5 hand case: n=(100, 4) -> weights (1e10, 2e9), quotas
    300*w//12e9 = (250, 50) -> capped at (100, 4): every doc of both
    languages is selected (the rare language is fully upsampled)."""
    n_a, n_b = 100, 4
    ids = list(range(n_a + n_b))
    _write_docs(tmp_path, ids, ["x"] * (n_a + n_b),
                ["aa"] * n_a + ["bb"] * n_b)
    out = doc_temperature_mixture(str(tmp_path))
    assert out["lang"].value_counts().to_dict() == {"aa": n_a, "bb": n_b}


@pytest.mark.usefixtures("ray_session")
def test_temperature_mixture_partial_quota(tmp_path):
    """Uncapped quota selects exactly the quota-smallest md5 ranks: one
    language, n=100, quota = 300*w//w = 300 capped at 100 -> all kept;
    two equal languages n=100 each -> quota 150 capped 100 each."""
    ids = list(range(200))
    _write_docs(tmp_path, ids, ["x"] * 200, ["aa"] * 100 + ["bb"] * 100)
    out = doc_temperature_mixture(str(tmp_path))
    assert len(out) == 200  # equal weights: 300*w//2w = 150, capped at 100


@pytest.mark.usefixtures("ray_session")
def test_grouped_bottomk_dict_k(ray_session, tmp_path):
    """Per-group k dict: group quotas honored exactly, groups absent from
    the dict dropped, selection = k smallest md5 ranks per group."""
    import ray.data as rd

    rows = [{"g": g, "k": i} for g in ("a", "b", "c") for i in range(10)]
    ds = rd.from_items(rows)
    out = (grouped_bottomk_sample(ds, "g", "k", {"a": 3, "b": 10},
                                  method="md5")
           .to_pandas())
    got = out.groupby("g")["k"].apply(set).to_dict()
    assert set(got) == {"a", "b"}
    assert len(got["a"]) == 3 and got["b"] == set(range(10))
    ranked = sorted(range(10),
                    key=lambda v: hashlib.md5(f"{v}:42".encode()).hexdigest())
    assert got["a"] == set(ranked[:3])


@pytest.mark.usefixtures("ray_session")
def test_quality_budget_matches_brute_force(tmp_path):
    """The bucketed no-global-sort plan equals the brute-force rule: order
    by (avg_nll 4dp, md5 rank, doc_id), keep while cum-tokens-before < B =
    total // 3 — including a crossing that lands mid-bucket."""
    rng = np.random.default_rng(7)
    texts = []
    vocab = [f"w{i}" for i in range(30)]
    weights = np.arange(30, 0, -1, dtype=float)
    weights /= weights.sum()
    for _ in range(60):
        k = int(rng.integers(3, 20))
        texts.append(" ".join(rng.choice(vocab, size=k, p=weights)))
    ids = list(range(60))
    _write_docs(tmp_path, ids, texts)
    out = doc_quality_budget(str(tmp_path))

    # brute force on the driver
    toks = [t.split() for t in texts]
    from collections import Counter
    c = Counter(w for tt in toks for w in tt)
    n = sum(c.values())
    rows = []
    for d, tt in zip(ids, toks):
        if not tt:
            continue
        nll = round(sum(-math.log(c[w] / n) for w in tt) / len(tt), 4)
        rows.append((d, len(tt), nll,
                     hashlib.md5(f"{d}:42".encode()).hexdigest()))
    budget = sum(r[1] for r in rows) // 3
    rows.sort(key=lambda r: (r[2], r[3], r[0]))
    kept, cum = [], 0
    for d, nt, nll, _ in rows:
        if cum < budget:
            kept.append((d, nt, nll))
        cum += nt
    exp = pd.DataFrame(kept, columns=["doc_id", "n_tokens", "avg_nll"]) \
        .sort_values("doc_id").reset_index(drop=True)
    got = out.reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"n_tokens": "int64"}), exp.astype({"n_tokens": "int64"}),
        check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_blocklist_word_boundaries(tmp_path):
    """\\b semantics: 'sparky' must NOT hit the spark rule; repeated and
    multiple-rule hits are counted per occurrence."""
    _write_docs(tmp_path, [1, 2, 3],
                ["sparky sparks nothing here",
                 "spark and spark are slow",
                 "clean text only"])
    out = blocklist_filter(str(tmp_path)).set_index("doc_id")
    assert out.loc[1, "n_spark"] == 0 and out.loc[1, "keep"] == 1
    assert out.loc[2, "n_spark"] == 2 and out.loc[2, "n_slow"] == 1
    assert out.loc[2, "keep"] == 0 and out.loc[2, "n_blocked"] == 3
    assert out.loc[3, "keep"] == 1


@pytest.mark.usefixtures("ray_session")
def test_corpus_prep_report_funnel(tmp_path):
    """Hand funnel: duplicate text collapses in dedup, a blocklisted doc
    drops at the blocklist stage, a stopword-free doc fails the quality
    rule; the final token count covers only full survivors."""
    from case_uco_ontology_map_ray.pipelines.corpus import corpus_prep_report

    good = "the quick value of it is that the table for it"  # passes all
    _write_docs(
        tmp_path, [1, 2, 3, 4],
        [good, good,                      # 2 is an exact dup of 1
         "the spark of it is that for it",  # blocklisted
         "zz qq ww rr tt yy uu ii oo pp"],  # no stopwords -> quality fail
        ["en"] * 4)
    out = corpus_prep_report(str(tmp_path)).set_index("lang")
    row = out.loc["en"]
    assert row["n_raw"] == 4 and row["n_dedup"] == 3
    assert row["n_blocklist"] == 2 and row["n_final"] == 1
    assert row["tokens_final"] == len(good.split())
    # funnel monotonicity holds by construction
    assert (row["n_raw"] >= row["n_dedup"] >= row["n_blocklist"]
            >= row["n_final"])


@pytest.mark.usefixtures("ray_session")
def test_embedding_norm_stats_exact_quantization(tmp_path):
    """x2^20 round-half-away quantization: 0.5 -> 524288 exactly, so
    [0.5, -0.5] gives sum_q 0 and norm2_q 2 * 524288^2; the zero vector
    gives all-zero stats (the degenerate case norm screening exists for)."""
    from case_uco_ontology_map_ray.pipelines.corpus import embedding_norm_stats

    pq.write_table(pa.table({
        "vec_id": pa.array([1, 2], pa.int64()),
        "embedding": pa.array([[0.5, -0.5], [0.0, 0.0]],
                              pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    out = embedding_norm_stats(str(tmp_path)).set_index("vec_id")
    assert out.loc[1, "sum_q"] == 0
    assert out.loc[1, "norm2_q"] == 2 * 524288 ** 2
    assert out.loc[2, "norm2_q"] == 0 and out.loc[2, "n_dims"] == 2


@pytest.mark.usefixtures("ray_session")
def test_embedding_class_scatter_hand_case(tmp_path):
    """Two 1-point classes scatter 0; a 2-point class at q = (+512, -512)
    per dim has centroid 0 and mean sq distance = d * 512^2 exactly."""
    from case_uco_ontology_map_ray.pipelines.corpus import (
        embedding_class_scatter,
    )

    d = 4
    pq.write_table(pa.table({
        "vec_id": pa.array([1, 2, 3, 4], pa.int64()),
        "label": pa.array([0, 1, 1, 2], pa.int32()),
        "embedding": pa.array([[0.25] * d, [0.5] * d, [-0.5] * d,
                               [0.0] * d], pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    out = embedding_class_scatter(str(tmp_path)).set_index("label")
    assert out.loc[0, "scatter_nano"] == 0 and out.loc[2, "scatter_nano"] == 0
    # label 1: A = 2 * d * 512^2, B = 0 -> (A - 0)/2 = d * 512^2
    assert out.loc[1, "a_sum"] == 2 * d * 512 ** 2
    assert out.loc[1, "b_sum"] == 0
    assert out.loc[1, "scatter_nano"] == d * 512 ** 2 * 10 ** 9


@pytest.mark.usefixtures("ray_session")
def test_split_leakage_audit_flags_cross_split_neardups(tmp_path):
    """Identical texts are jac-1.0 pairs; leaky iff the md5 80/10/10 rule
    puts the two doc_ids in different splits — verified against the rule
    computed independently here."""
    from case_uco_ontology_map_ray.pipelines.corpus import split_leakage_audit

    text = "alpha beta gamma delta epsilon zeta"
    ids = [1, 2, 3, 4]
    _write_docs(tmp_path, ids, [text] * 4)
    out = split_leakage_audit(str(tmp_path))
    assert len(out) == 6  # C(4,2) identical pairs, all jac 1.0
    assert (out["jac"] == 1.0).all()

    def split_of(k):
        b = int(hashlib.md5(f"{k}:42".encode()).hexdigest()[:8], 16) % 100
        return "train" if b < 80 else ("val" if b < 90 else "test")

    for _, r in out.iterrows():
        assert r["split_a"] == split_of(r["id_a"])
        assert r["split_b"] == split_of(r["id_b"])
        assert r["leaky"] == int(r["split_a"] != r["split_b"])


@pytest.mark.usefixtures("ray_session")
def test_nb_confusion_separable_languages(tmp_path):
    """Fully separable vocabularies train a perfect classifier: the
    confusion matrix is diagonal. An empty-text doc is omitted (no
    evidence), so counts sum to 6, not 7."""
    from case_uco_ontology_map_ray.pipelines.corpus import nb_lang_confusion

    _write_docs(
        tmp_path, [1, 2, 3, 4, 5, 6, 7],
        ["aa bb cc", "aa aa bb", "cc aa bb",
         "xx yy zz", "yy yy xx", "zz xx yy", ""],
        ["en", "en", "en", "de", "de", "de", "en"])
    out = nb_lang_confusion(str(tmp_path))
    got = {(r.true_lang, r.pred_lang): r.n for r in out.itertuples()}
    assert got == {("en", "en"): 3, ("de", "de"): 3}


@pytest.mark.usefixtures("ray_session")
def test_knn_confusion_planted_clusters(tmp_path):
    """Two tight clusters far apart: every probe's nearest neighbor shares
    its label -> diagonal confusion; the probe itself is excluded (vec 0's
    nearest is vec 1, not itself)."""
    from case_uco_ontology_map_ray.pipelines.corpus import knn_label_confusion

    vecs, labels = [], []
    for i in range(6):
        base = 0.0 if i < 3 else 0.4  # quantized: 0 vs 410 per dim
        vecs.append([base + 0.001 * i] * 4)
        labels.append(0 if i < 3 else 1)
    pq.write_table(pa.table({
        "vec_id": pa.array(range(6), pa.int64()),
        "label": pa.array(labels, pa.int32()),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
    }), str(tmp_path / "embeddings.parquet"))
    out = knn_label_confusion(str(tmp_path), probe_mod=2)  # probes 0,2,4
    got = {(r.true_label, r.pred_label): r.n for r in out.itertuples()}
    assert got == {(0, 0): 2, (1, 1): 1}


@pytest.mark.usefixtures("ray_session")
def test_nb_mislabel_audit_finds_planted_error(tmp_path):
    """A de-vocabulary doc labeled 'en' is the one flagged row; correctly
    labeled docs are absent and the margin is positive."""
    from case_uco_ontology_map_ray.pipelines.corpus import nb_mislabel_audit

    _write_docs(
        tmp_path, [1, 2, 3, 4, 5],
        ["aa bb cc", "aa aa bb", "xx yy zz", "yy zz xx",
         "xx yy zz yy"],  # doc 5 is German-vocab but labeled en
        ["en", "en", "de", "de", "en"])
    out = nb_mislabel_audit(str(tmp_path))
    assert list(out["doc_id"]) == [5]
    assert out.iloc[0]["lang"] == "en" and out.iloc[0]["pred_lang"] == "de"
    assert out.iloc[0]["margin_q4"] > 0


@pytest.mark.usefixtures("ray_session")
def test_doc_keywords_idf_beats_tf(tmp_path):
    """A term appearing in every doc has ln(N/df) = 0 regardless of tf; a
    rare term wins even with lower tf. Doc 1's top keyword must be its
    unique term, not the corpus-wide filler it repeats."""
    from case_uco_ontology_map_ray.pipelines.corpus import doc_keywords

    _write_docs(tmp_path, [1, 2, 3],
                ["common common common rareterm",
                 "common other words",
                 "common more words"])
    out = doc_keywords(str(tmp_path))
    top1 = out[(out.doc_id == 1) & (out["rank"] == 1)].iloc[0]
    assert top1["term"] == "rareterm"
    # 'common' (df = 3 = N) scores exactly 0
    sc = out[(out.doc_id == 1) & (out.term == "common")]
    assert (sc["score_nano"] == 0).all()


@pytest.mark.usefixtures("ray_session")
def test_zipf_exact_power_law(tmp_path):
    """A corpus whose token counts are exactly c_r = round(1000 / r)
    fits slope near -1 (within the discretization error of the rounded
    counts) — and the fit is deterministic."""
    texts = []
    for r in range(1, 51):
        texts.append(" ".join([f"t{r:03d}"] * round(1000 / r)))
    _write_docs(tmp_path, list(range(len(texts))), texts)
    out = zipf_token_fit(str(tmp_path), v=50)
    assert out["v"].iloc[0] == 50
    slope = out["slope_nano"].iloc[0] / 1e9
    assert -1.02 < slope < -0.98
    again = zipf_token_fit(str(tmp_path), v=50)
    pd.testing.assert_frame_equal(out, again)
