"""Trained-model persistence — the reference's ``-sm``/``-lm`` save/load
surface rebuilt as parquet-plus-manifest model directories.

Reference behaviors transcribed:

- ``Classifier/BaseClassifier.java:162`` declares ``saveModel`` for every
  classifier; ``LogisticRegression.java saveModel`` writes one row per
  FEATURE: the feature term followed by its per-class β (the offset layout
  skips the bias).  :func:`save_linear_model` keeps that exact row shape
  (``term`` + one ``w_<class>`` column per class) but as parquet, and adds
  one ``<BIAS>`` sentinel row so the round-trip is lossless (the reference's
  text format silently drops the bias — documented divergence, a loaded
  model here predicts bit-identically to the in-memory one).
- ``modelAdaptation/ModelAdaptation.java:381`` (``saveModel``) writes ONE
  comma-joined text file PER USER of the personalized weights.  At crawl
  scale (10⁸ users) a file-per-user directory is a metadata storm;
  :func:`save_user_weights` writes the same information as a single
  ``(user_id, weights list<double>)`` parquet table instead — partitionable,
  resumable, and loadable back into the same ``dict[user] -> np.ndarray``.
- ``topicmodels/TopicModel.java:172`` (``printTopWords(k, path)``) is the
  reference's only topic-model output; it has no reload path at all.
  :func:`save_lda_model` persists the full estimated state (topic_term K×V,
  the frozen global Gibbs tables word_topic_sstat/m_sstat that the held-out
  inference harness consumes, and the training params) so a saved model can
  serve frozen-table inference (``infer_lda_heldout``) without retraining;
  :func:`save_top_words` emits the printTopWords table itself.
- ``NaiveBayes.java:113`` leaves ``saveModel`` EMPTY in the reference —
  :func:`save_naive_bayes` fills the gap with the same per-(class, term)
  log-probability table the model holds.

Every model directory is ``<path>/meta.json`` + one or more small parquet
files.  Models are driver-sized by construction (C×F, K×V, users×F); the
parquet writes here are deliberately local — only DATASET-sized artifacts
(per-doc topic mixtures, per-doc predictions) belong in ``ds.write_parquet``.
float64 round-trips bit-exactly through parquet DOUBLE, so save→load→predict
equals predict (pytest-pinned for LR, NB, LDA).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

_FORMAT_VERSION = 1
_BIAS_ROW = "<BIAS>"


def _write_meta(path: str, kind: str, extra: dict) -> None:
    os.makedirs(path, exist_ok=True)
    payload = {"format_version": _FORMAT_VERSION, "kind": kind}
    payload.update(extra)
    tmp = os.path.join(path, "meta.json.tmp")
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=1, sort_keys=True)
    os.replace(tmp, os.path.join(path, "meta.json"))


def read_meta(path: str) -> dict:
    with open(os.path.join(path, "meta.json")) as f:
        return json.load(f)


# ------------------------------------------------------------- linear (LR/SVM)

def save_linear_model(path: str, beta2d: np.ndarray, *, classes: list,
                      terms: list[str] | None = None, kind: str = "lr",
                      params: dict | None = None) -> None:
    """β of shape C×(F+1) (bias at column 0, the reference's dotProduct
    offset layout) → ``weights.parquet`` in the reference's saveModel row
    shape: one row per feature term with a ``w_<class>`` column per class,
    plus the ``<BIAS>`` sentinel row the text format drops."""
    beta2d = np.asarray(beta2d, dtype=np.float64)
    n_classes, fp1 = beta2d.shape
    if n_classes != len(classes):
        raise ValueError(f"beta rows {n_classes} != len(classes) {len(classes)}")
    n_features = fp1 - 1
    if terms is None:
        terms = [f"f{i}" for i in range(n_features)]
    if len(terms) != n_features:
        raise ValueError(f"len(terms) {len(terms)} != n_features {n_features}")
    cols: dict = {"term": pa.array([_BIAS_ROW] + list(terms), pa.string())}
    for ci, c in enumerate(classes):
        # column 0 is the bias, features follow in term order
        cols[f"w_{c}"] = pa.array(beta2d[ci, :], pa.float64())
    _write_meta(path, kind, {
        "classes": [str(c) for c in classes],
        "n_features": n_features,
        "params": params or {},
    })
    pq.write_table(pa.table(cols), os.path.join(path, "weights.parquet"))


def load_linear_model(path: str):
    """→ (β C×(F+1), classes, meta). Bit-exact inverse of
    :func:`save_linear_model`."""
    meta = read_meta(path)
    tbl = pq.read_table(os.path.join(path, "weights.parquet"))
    terms = tbl.column("term").to_pylist()
    if not terms or terms[0] != _BIAS_ROW:
        raise ValueError(f"{path}: weights table missing the {_BIAS_ROW} row")
    classes = meta["classes"]
    beta = np.empty((len(classes), len(terms)), dtype=np.float64)
    for ci, c in enumerate(classes):
        beta[ci, :] = tbl.column(f"w_{c}").to_numpy(zero_copy_only=False)
    return beta, classes, meta


# ------------------------------------------------------------------ NaiveBayes

def save_naive_bayes(path: str, model, *, params: dict | None = None) -> None:
    """``NaiveBayesModel`` (classes, log_py, log_pxy dict, default_logp,
    presence) → ``logpxy.parquet`` (label, term, logp) + meta. Fills the
    reference's empty ``NaiveBayes.saveModel`` (:113) with the table the
    model actually holds."""
    labels, terms, logps = [], [], []
    for c in model.classes:
        table = model.log_pxy[c]
        for t in sorted(table):
            labels.append(str(c))
            terms.append(t)
            logps.append(table[t])
    _write_meta(path, "naive_bayes", {
        "classes": [str(c) for c in model.classes],
        "log_py": [float(v) for v in model.log_py],
        "default_logp": {str(c): float(model.default_logp[c])
                         for c in model.classes},
        "presence": bool(model.presence),
        "params": params or {},
    })
    pq.write_table(pa.table({
        "label": pa.array(labels, pa.string()),
        "term": pa.array(terms, pa.string()),
        "logp": pa.array(logps, pa.float64()),
    }), os.path.join(path, "logpxy.parquet"))


def load_naive_bayes(path: str):
    """→ reconstructed ``NaiveBayesModel`` predicting bit-identically."""
    from ir_base_ray.pipelines.classify import NaiveBayesModel

    meta = read_meta(path)
    tbl = pq.read_table(os.path.join(path, "logpxy.parquet"))
    classes = meta["classes"]
    log_pxy: dict = {c: {} for c in classes}
    for lab, term, logp in zip(tbl.column("label").to_pylist(),
                               tbl.column("term").to_pylist(),
                               tbl.column("logp").to_pylist()):
        log_pxy[lab][term] = logp
    model = NaiveBayesModel(classes, np.array(meta["log_py"], dtype=np.float64),
                            log_pxy, meta["presence"])
    model.default_logp = {c: meta["default_logp"][c] for c in classes}
    return model


# ------------------------------------------------------------------------ LDA

def save_lda_model(path: str, model: dict, *, params: dict | None = None,
                   terms: list[str] | None = None) -> None:
    """``train_lda_gibbs`` result dict → model directory:

    - ``topic_term.parquet``: (topic, probs list<double> length V) — the
      accumulated, L1-normalized φ.
    - ``sstats.parquet``: (topic, wts list<double> length V, m_sstat) — the
      FROZEN global Gibbs count tables ``infer_lda_heldout`` consumes, so a
      loaded model serves held-out inference without retraining.
    - optional ``vocab.parquet`` (term_id, term) when ``terms`` given.

    ``doc_topics`` (dataset-sized) is deliberately NOT saved here — per-doc
    mixtures go through ``ds.write_parquet`` at the pipeline layer."""
    topic_term = np.asarray(model["topic_term"], dtype=np.float64)
    wts = np.asarray(model["word_topic_sstat"], dtype=np.float64)
    m_sstat = np.asarray(model["m_sstat"], dtype=np.float64)
    K, V = topic_term.shape
    _write_meta(path, "lda_gibbs", {
        "n_topics": K, "vocab_size": V, "params": params or {},
    })
    pq.write_table(pa.table({
        "topic": pa.array(np.arange(K), pa.int64()),
        "probs": pa.array(topic_term.tolist(), pa.list_(pa.float64())),
    }), os.path.join(path, "topic_term.parquet"))
    pq.write_table(pa.table({
        "topic": pa.array(np.arange(K), pa.int64()),
        "wts": pa.array(wts.tolist(), pa.list_(pa.float64())),
        "m_sstat": pa.array(m_sstat, pa.float64()),
    }), os.path.join(path, "sstats.parquet"))
    if terms is not None:
        if len(terms) != V:
            raise ValueError(f"len(terms) {len(terms)} != V {V}")
        pq.write_table(pa.table({
            "term_id": pa.array(np.arange(V), pa.int64()),
            "term": pa.array(list(terms), pa.string()),
        }), os.path.join(path, "vocab.parquet"))


def load_lda_model(path: str) -> dict:
    """→ {topic_term K×V, word_topic_sstat K×V, m_sstat K, meta[, terms]}."""
    meta = read_meta(path)
    tt = pq.read_table(os.path.join(path, "topic_term.parquet"))
    ss = pq.read_table(os.path.join(path, "sstats.parquet"))
    K, V = meta["n_topics"], meta["vocab_size"]
    topic_term = np.array(tt.column("probs").to_pylist(), dtype=np.float64)
    wts = np.array(ss.column("wts").to_pylist(), dtype=np.float64)
    m_sstat = ss.column("m_sstat").to_numpy(zero_copy_only=False).astype(np.float64)
    if topic_term.shape != (K, V) or wts.shape != (K, V):
        raise ValueError(f"{path}: shape mismatch vs meta ({K}×{V})")
    out = {"topic_term": topic_term, "word_topic_sstat": wts,
           "m_sstat": m_sstat, "meta": meta}
    vpath = os.path.join(path, "vocab.parquet")
    if os.path.exists(vpath):
        out["terms"] = pq.read_table(vpath).column("term").to_pylist()
    return out


def save_top_words(path: str, topic_term: np.ndarray, terms: list[str],
                   k: int = 10) -> None:
    """``printTopWords(k, path)`` (TopicModel.java:172): per-topic top-k
    terms by φ, descending, ties broken by term_id asc (stable argsort on
    negated probs) → ``top_words.parquet`` (topic, rank, term, prob)."""
    topic_term = np.asarray(topic_term, dtype=np.float64)
    K, V = topic_term.shape
    k = min(k, V)
    topics, ranks, words, probs = [], [], [], []
    order = np.argsort(-topic_term, axis=1, kind="stable")[:, :k]
    for z in range(K):
        for r, tid in enumerate(order[z]):
            topics.append(z)
            ranks.append(r)
            words.append(terms[tid])
            probs.append(topic_term[z, tid])
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.table({
        "topic": pa.array(topics, pa.int64()),
        "rank": pa.array(ranks, pa.int64()),
        "term": pa.array(words, pa.string()),
        "prob": pa.array(probs, pa.float64()),
    }), os.path.join(path, "top_words.parquet"))


# --------------------------------------------------------- per-user weights

def save_user_weights(path: str, weights: dict, *,
                      params: dict | None = None) -> None:
    """``ModelAdaptation.saveModel`` (:381) writes one comma-joined text file
    per user; at 10⁸ users that is a filesystem metadata storm. Same payload
    as ONE (user_id, weights list<double>) parquet table, user-sorted."""
    users = sorted(weights, key=str)
    _write_meta(path, "user_weights", {
        "n_users": len(users),
        "dim": int(len(np.atleast_1d(weights[users[0]]))) if users else 0,
        "params": params or {},
    })
    pq.write_table(pa.table({
        "user_id": pa.array([str(u) for u in users], pa.string()),
        "weights": pa.array(
            [np.asarray(weights[u], dtype=np.float64).tolist() for u in users],
            pa.list_(pa.float64())),
    }), os.path.join(path, "user_weights.parquet"))


def load_user_weights(path: str) -> dict:
    """→ dict[user_id(str)] -> np.ndarray(float64), bit-exact inverse."""
    tbl = pq.read_table(os.path.join(path, "user_weights.parquet"))
    return {u: np.array(w, dtype=np.float64)
            for u, w in zip(tbl.column("user_id").to_pylist(),
                            tbl.column("weights").to_pylist())}


# -------------------------------------------- per-user adaptation transforms

def save_user_transforms(path: str, users: list, A: np.ndarray,
                         g_w: np.ndarray, *, kind: str = "colinadapt",
                         params: dict | None = None) -> None:
    """Persist the LinAdapt/CoLinAdapt family's per-user TRANSFORMS
    (``_CoLinAdaptStruct`` sharedA rows: each user's ``a‖b`` with
    ``w_u = a∘w_g + b``) plus the global weight vector — richer than the
    reference's personalized-weights-only ``ModelAdaptation.saveModel``
    (:381): personalized weights are recomputable from (A, g_w), and a
    re-trained global model can be re-personalized without re-adapting.
    One user-sorted ``(user_id, transform list<double>)`` parquet plus a
    ``global_weights`` parquet (same scale rationale as
    :func:`save_user_weights`)."""
    A = np.asarray(A, dtype=np.float64)
    order = sorted(range(len(users)), key=lambda i: str(users[i]))
    _write_meta(path, "user_transforms", {
        "model_kind": kind,
        "n_users": len(users),
        "transform_dim": int(A.shape[1]) if len(users) else 0,
        "n_features": int(np.asarray(g_w).size),
        "params": params or {},
    })
    pq.write_table(pa.table({
        "user_id": pa.array([str(users[i]) for i in order], pa.string()),
        "transform": pa.array([A[i].tolist() for i in order],
                              pa.list_(pa.float64())),
    }), os.path.join(path, "user_transforms.parquet"))
    pq.write_table(pa.table({
        "g_w": pa.array(np.asarray(g_w, dtype=np.float64), pa.float64()),
    }), os.path.join(path, "global_weights.parquet"))


def load_user_transforms(path: str):
    """→ (dict[user_id(str)] -> transform np.ndarray(float64), g_w) —
    bit-exact inverse of :func:`save_user_transforms`."""
    tbl = pq.read_table(os.path.join(path, "user_transforms.parquet"))
    gw = pq.read_table(os.path.join(path, "global_weights.parquet"))
    transforms = {u: np.array(t, dtype=np.float64)
                  for u, t in zip(tbl.column("user_id").to_pylist(),
                                  tbl.column("transform").to_pylist())}
    return transforms, gw.column("g_w").to_numpy().astype(np.float64)
