"""Model save/load round-trips (reference ``-sm``/``-lm`` flags,
``BaseClassifier.saveModel``): train → save → load → predict must be
bit-equal to predicting from the in-memory model, for LR, NB and LDA."""

import numpy as np
import pandas as pd
import pytest


def _vec_ds(n=80, f=12, n_classes=3, seed=5):
    """Separable sparse doc vectors: class c docs load features [4c, 4c+3]."""
    import ray.data
    import pyarrow as pa

    rng = np.random.default_rng(seed)
    ids, tids, vals, labels = [], [], [], []
    for i in range(n):
        c = i % n_classes
        base = 4 * c
        k = int(rng.integers(2, 5))
        f_ids = np.sort(rng.choice(np.arange(base, base + 4), size=k,
                                   replace=False))
        ids.append(i)
        tids.append(f_ids.tolist())
        vals.append(rng.integers(1, 4, size=k).astype(np.float64).tolist())
        labels.append(c)
    tbl = pa.table({
        "doc_id": pa.array(ids, pa.int64()),
        "tids": pa.array(tids, pa.list_(pa.int64())),
        "vals": pa.array(vals, pa.list_(pa.float64())),
        "label": pa.array(labels, pa.int64()),
    })
    return ray.data.from_arrow(tbl), f, n_classes


def test_lr_save_load_predict_bitequal(ray_session, tmp_path):
    from ir_base_ray.pipelines.linear import (predict_linear,
                                              train_logistic_regression)
    from ir_base_ray.state.models import load_linear_model, save_linear_model

    ds, F, C = _vec_ds()
    beta, _f, _it = train_logistic_regression(ds, n_classes=C, n_features=F,
                                              lam=1.0, max_iter=40)
    path = str(tmp_path / "lr_model")
    terms = [f"t{i}" for i in range(F)]
    save_linear_model(path, beta, classes=[f"c{c}" for c in range(C)],
                      terms=terms, kind="lr", params={"lam": 1.0})
    beta2, classes, meta = load_linear_model(path)

    assert np.array_equal(beta, beta2)          # bit-exact weights
    assert classes == [f"c{c}" for c in range(C)]
    assert meta["params"]["lam"] == 1.0

    p1 = predict_linear(beta, ds).to_pandas().sort_values("doc_id")
    p2 = predict_linear(beta2, ds).to_pandas().sort_values("doc_id")
    assert (p1["pred"].to_numpy() == p2["pred"].to_numpy()).all()


def test_nb_save_load_predict_bitequal(ray_session, tmp_path):
    from collections import Counter

    import ray.data

    from ir_base_ray.pipelines.classify import (predict_naive_bayes,
                                                train_naive_bayes)
    from ir_base_ray.state.models import load_naive_bayes, save_naive_bayes

    rows = []
    for i in range(60):
        if i % 2 == 0:
            rows.append({"id": i, "text": "apple banana fruit sweet",
                         "label": "fruit"})
        else:
            rows.append({"id": i, "text": "engine wheel metal fast",
                         "label": "car"})
    ds = ray.data.from_items(rows)
    tok = lambda t: Counter(t.split())
    model = train_naive_bayes(ds, label_col="label", text_col="text",
                              tokenizer=tok)
    path = str(tmp_path / "nb_model")
    save_naive_bayes(path, model, params={"delta": 0.1})
    model2 = load_naive_bayes(path)

    assert model2.classes == model.classes
    assert np.array_equal(model2.log_py, model.log_py)
    assert model2.default_logp == model.default_logp
    assert model2.log_pxy == model.log_pxy       # exact dict equality
    assert model2.presence == model.presence

    p1 = (predict_naive_bayes(ds, model, id_col="id", text_col="text",
                              tokenizer=tok, concurrency=2)
          .to_pandas().sort_values("id"))
    p2 = (predict_naive_bayes(ds, model2, id_col="id", text_col="text",
                              tokenizer=tok, concurrency=2)
          .to_pandas().sort_values("id"))
    assert (p1["pred"].to_numpy() == p2["pred"].to_numpy()).all()


def test_lda_save_load_heldout_bitequal(ray_session, tmp_path):
    from ir_base_ray.pipelines.lda import (lda_heldout_perplexity,
                                           train_lda_gibbs)
    from ir_base_ray.state.models import load_lda_model, save_lda_model

    ds, F, _C = _vec_ds(n=60, f=12)
    out = train_lda_gibbs(ds, n_topics=3, vocab_size=F, n_iters=12, seed=7)
    path = str(tmp_path / "lda_model")
    save_lda_model(path, out, params={"n_iters": 12, "seed": 7},
                   terms=[f"t{i}" for i in range(F)])
    loaded = load_lda_model(path)

    assert np.array_equal(loaded["topic_term"], out["topic_term"])
    assert np.array_equal(loaded["word_topic_sstat"], out["word_topic_sstat"])
    assert np.array_equal(loaded["m_sstat"], out["m_sstat"])
    assert loaded["terms"] == [f"t{i}" for i in range(F)]

    # frozen-table held-out inference served from the LOADED model is
    # bit-identical to serving from the in-memory training output
    r1 = lda_heldout_perplexity(ds, out, n_topics=3, n_iters=6, seed=91,
                                concurrency=1)
    r2 = lda_heldout_perplexity(ds, loaded, n_topics=3, n_iters=6, seed=91,
                                concurrency=1)
    assert r1["perplexity"] == r2["perplexity"]
    assert (r1["per_doc"]["loglik"].to_numpy()
            == r2["per_doc"]["loglik"].to_numpy()).all()


def test_user_weights_roundtrip(tmp_path):
    from ir_base_ray.state.models import load_user_weights, save_user_weights

    rng = np.random.default_rng(3)
    w = {f"u{i}": rng.normal(size=7) for i in range(25)}
    path = str(tmp_path / "uw")
    save_user_weights(path, w, params={"model": "colinadapt"})
    w2 = load_user_weights(path)
    assert set(w2) == set(w)
    for u in w:
        assert np.array_equal(w[u], w2[u])


def _user_vec_ds(n=60, f=10, seed=11):
    """Binary-labeled user-grouped sparse vectors for adaptation tests."""
    import pyarrow as pa
    import ray.data

    rng = np.random.default_rng(seed)
    rows = {"doc_id": [], "tids": [], "vals": [], "label": [], "user": []}
    for i in range(n):
        y = i % 2
        base = 0 if y else 5
        k = int(rng.integers(2, 5))
        f_ids = np.sort(rng.choice(np.arange(base, base + 5), size=k,
                                   replace=False))
        rows["doc_id"].append(i)
        rows["tids"].append(f_ids.tolist())
        rows["vals"].append(rng.integers(1, 4, size=k).astype(
            np.float64).tolist())
        rows["label"].append(y)
        rows["user"].append(f"u{i % 5}")
    tbl = pa.table({
        "doc_id": pa.array(rows["doc_id"], pa.int64()),
        "tids": pa.array(rows["tids"], pa.list_(pa.int64())),
        "vals": pa.array(rows["vals"], pa.list_(pa.float64())),
        "label": pa.array(rows["label"], pa.int64()),
        "user": pa.array(rows["user"], pa.string()),
    })
    return ray.data.from_arrow(tbl), f


def test_linadapt_transforms_save_load_predict_bitequal(ray_session,
                                                        tmp_path):
    """LinAdapt train → save transforms → load → predict is bit-equal to
    the in-memory distributed path (train_linadapt predictions)."""
    from ir_base_ray.pipelines.linadapt import (personalized_weights,
                                                train_linadapt,
                                                train_linadapt_transforms)
    from ir_base_ray.state.models import (load_user_transforms,
                                          save_user_transforms)

    ds, F = _user_vec_ds()
    rng = np.random.default_rng(2)
    g_w = rng.normal(size=F + 1)          # bias at [0], like the LR layout
    preds = train_linadapt(ds, g_w).to_pandas().sort_values("doc_id")

    tdf = train_linadapt_transforms(ds, g_w).to_pandas()
    users = tdf["user"].tolist()
    A = np.stack([np.asarray(t, dtype=np.float64) for t in tdf["transform"]])
    path = str(tmp_path / "linadapt_model")
    save_user_transforms(path, users, A, g_w, kind="linadapt",
                         params={"eta1": 0.5, "eta2": 0.5})
    transforms, g_w2 = load_user_transforms(path)

    assert np.array_equal(g_w, g_w2)
    assert set(transforms) == set(users)
    for u, row in zip(users, A):
        assert np.array_equal(transforms[u], row)       # bit-exact

    # serve predictions entirely from the LOADED transforms
    dim = g_w2.size
    pdf = ds.to_pandas()
    got = {}
    for r in pdf.itertuples():
        t = transforms[r.user]
        pw = personalized_weights(t[:dim], t[dim:], g_w2)
        tids = np.asarray(list(r.tids), dtype=np.int64)
        vals = np.asarray(list(r.vals), dtype=np.float64)
        f = pw[0] + float((pw[tids + 1] * vals).sum())
        got[int(r.doc_id)] = 1 if 1.0 / (1.0 + np.exp(-f)) > 0.5 else 0
    want = dict(zip(preds["doc_id"].astype(int), preds["pred"].astype(int)))
    assert got == want


def test_colinadapt_transforms_save_load_predict_bitequal(ray_session,
                                                          tmp_path):
    """CoLinAdapt train → save A-matrix → load → rebuild personalized
    weights is bit-equal to the in-memory result."""
    from ir_base_ray.pipelines.linadapt import (personalized_weights,
                                                train_colinadapt)
    from ir_base_ray.state.models import (load_user_transforms, read_meta,
                                          save_user_transforms)

    ds, F = _user_vec_ds(seed=17)
    rng = np.random.default_rng(4)
    g_w = rng.normal(size=F + 1)
    pdf = ds.to_pandas()
    user_docs = {}
    for r in pdf.itertuples():
        user_docs.setdefault(r.user, []).append(
            (np.asarray(list(r.tids), dtype=np.int64),
             np.asarray(list(r.vals), dtype=np.float64), int(r.label)))
    out = train_colinadapt(user_docs, g_w, topk=2)

    path = str(tmp_path / "colinadapt_model")
    save_user_transforms(path, out["users"], out["A"], g_w,
                         kind="colinadapt", params={"topk": 2})
    transforms, g_w2 = load_user_transforms(path)
    assert read_meta(path)["model_kind"] == "colinadapt"
    assert np.array_equal(g_w, g_w2)

    dim = g_w2.size
    for u, pw_mem in zip(out["users"], out["personalized"]):
        t = transforms[u]
        pw_loaded = personalized_weights(t[:dim], t[dim:], g_w2)
        assert np.array_equal(pw_mem, pw_loaded), u     # bit-exact


def test_top_words_table(tmp_path):
    import pyarrow.parquet as pq

    from ir_base_ray.state.models import save_top_words

    phi = np.array([[0.5, 0.3, 0.1, 0.1],
                    [0.1, 0.1, 0.2, 0.6]])
    terms = ["a", "b", "c", "d"]
    path = str(tmp_path / "tw")
    save_top_words(path, phi, terms, k=2)
    tbl = pq.read_table(f"{path}/top_words.parquet").to_pandas()
    t0 = tbl[tbl["topic"] == 0].sort_values("rank")["term"].tolist()
    t1 = tbl[tbl["topic"] == 1].sort_values("rank")["term"].tolist()
    assert t0 == ["a", "b"]
    assert t1 == ["d", "c"]
