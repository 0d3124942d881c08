"""CVGeneration flow (``mains/CVGeneration.java``): corpus → feature
selection → SaveCV/SaveCVStat files, byte-stable and consumable by the
frozen-CV analyzer mode."""

import os

import numpy as np
import pandas as pd
import pytest


def _docs_ds(n=120, seed=4):
    import ray.data

    rng = np.random.default_rng(seed)
    en = ["the", "cat", "sat", "on", "mat", "dog", "runs", "fast", "tree"]
    de = ["der", "hund", "lauft", "schnell", "baum", "katze", "sitzt"]
    rows = []
    for i in range(n):
        lang = "en" if i % 2 == 0 else "de"
        words = en if lang == "en" else de
        k = int(rng.integers(4, 9))
        rows.append({"doc_id": i, "lang": lang,
                     "text": " ".join(rng.choice(words, size=k))})
    return ray.data.from_items(rows), rows


def test_cv_generation_byte_stable_and_loadable(ray_session, tmp_path):
    from ir_base_ray.pipelines.cvgen import cv_generation
    from ir_base_ray.sources.loaders import load_cv

    ds, _rows = _docs_ds()
    fv1, st1 = str(tmp_path / "fv1.txt"), str(tmp_path / "st1.txt")
    fv2, st2 = str(tmp_path / "fv2.txt"), str(tmp_path / "st2.txt")
    out1 = cv_generation(ds, fv1, st1, method="IG", start_prob=0.0,
                         end_prob=1.0, max_df=10**6, min_df=1)
    out2 = cv_generation(ds, fv2, st2, method="IG", start_prob=0.0,
                         end_prob=1.0, max_df=10**6, min_df=1)

    assert open(fv1, "rb").read() == open(fv2, "rb").read()   # byte-stable
    assert open(st1, "rb").read() == open(st2, "rb").read()
    assert out1["features"] == out2["features"]
    assert len(out1["features"]) > 0
    assert out1["summary"]["maxDF"] > 0

    names, config = load_cv(fv1)
    assert names == out1["features"]
    assert config["Selection"] == "IG"
    assert config["NGram"] == "1"

    # stat file: selected features in selection order, df/ttf per line
    lines = open(st1).read().splitlines()
    assert len(lines) == len(names)
    assert [ln.split("\t")[0] for ln in lines] == names


def test_cv_generation_df_band_and_topk(ray_session, tmp_path):
    from ir_base_ray.pipelines.cvgen import cv_generation
    from ir_base_ray.sources.loaders import load_cv

    ds, rows = _docs_ds()
    # DF method: exact band semantics (minDF < df < maxDF, exclusive)
    docs = pd.DataFrame(rows)
    df_true = {}
    for t in set(" ".join(docs["text"]).split()):
        df_true[t] = sum(t in r["text"].split() for r in rows)
    lo, hi = 10, 50
    fv = str(tmp_path / "fv_df.txt")
    out = cv_generation(ds, fv, method="DF", start_prob=0.0, end_prob=1.0,
                        max_df=hi, min_df=lo)
    expected = {t for t, d in df_true.items() if lo < d < hi}
    assert set(out["features"]) == expected

    # top-K overload: K highest scores, header start/end pinned to 0/1
    fvk = str(tmp_path / "fv_topk.txt")
    outk = cv_generation(ds, fvk, method="DF", max_df=10**6, min_df=1,
                         top_k=3)
    assert len(outk["features"]) == 3
    top3 = sorted(df_true, key=lambda t: (-df_true[t], t))[:3]
    assert sorted(outk["features"]) == sorted(top3)
    _names, config = load_cv(fvk)
    assert config["Start"] == "0.000000" and config["End"] == "1.000000"


def test_cv_consumable_by_frozen_analyzer(ray_session, tmp_path):
    """The generated CV file round-trips into analyze_dataset(vocab_ref=) —
    the S8/J1 frozen-vocabulary mode drops everything outside it."""
    import ray

    from ir_base_ray.config import AnalyzerSpec
    from ir_base_ray.pipelines.cvgen import cv_generation
    from ir_base_ray.sources.loaders import load_cv
    from ir_base_ray.stages.analyze import analyze_dataset

    ds, _rows = _docs_ds()
    fv = str(tmp_path / "fv.txt")
    # analyze with the SAME full-mode analyzer the frozen pass will use, so
    # CV terms are in stemmed space (the reference selects over stemmed
    # features too)
    from ir_base_ray.functions.analyzer import Analyzer
    from ir_base_ray.sources.stopwords import load_stopwords

    an = Analyzer(ngram=1, stopwords=load_stopwords(None), lang="en")
    def analyze(t):
        return [w for w, c in an.term_counts(t).items() for _ in range(c)]

    out = cv_generation(ds, fv, method="CHI", start_prob=0.5, end_prob=1.0,
                        max_df=10**6, min_df=1, analyze=analyze)
    names, _config = load_cv(fv)
    assert names

    spec = AnalyzerSpec(ngram=1, mode="full")
    vocab_ref = ray.put(names)
    frozen = analyze_dataset(ds, spec, keep_cols=("doc_id",),
                             vocab_ref=vocab_ref).to_pandas()
    allowed = set(names)
    seen = set()
    for terms in frozen["terms"]:
        seen.update(terms)
        assert set(terms) <= allowed
    assert seen  # the CV actually matches corpus terms
