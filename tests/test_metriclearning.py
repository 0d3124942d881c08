"""metricLearning variant pins (Classifier/metricLearning/
LinearSVMMetricLearning.java, L2RWithQueryClustering.java)."""

import numpy as np

from ir_base_ray.pipelines.metriclearning import (_tri_index,
                                                  build_metric_pairs,
                                                  l1_svm_select,
                                                  pair_feature_diff, project,
                                                  train_l2r_query_clustering,
                                                  train_linear_svm_metric)


def _planted_docs(n_per=20, seed=0):
    """Two classes on disjoint vocab halves (features 0-9 vs 10-19)."""
    rng = np.random.default_rng(seed)
    docs = []
    for label in (0, 1):
        base = 0 if label == 0 else 10
        for _ in range(n_per):
            tids = np.unique(rng.integers(base, base + 10, size=5))
            vals = rng.uniform(0.5, 1.5, size=len(tids))
            nrm = np.linalg.norm(vals)
            docs.append({"tids": tids.astype(np.int64), "vals": vals / nrm,
                         "label": label, "doc_len": len(tids)})
    return docs


def test_l1_select_produces_exact_zeros_and_finds_signal():
    docs = _planted_docs()
    X = [(d["tids"], d["vals"]) for d in docs]
    y = np.asarray([1.0 if d["label"] == 1 else -1.0 for d in docs])
    w, selected = l1_svm_select(X, y, 20, C=3.0)
    assert (w == 0.0).any()                      # ℓ1 prox gives exact zeros
    assert 0 < len(selected) <= 20
    # ISTA optimality: for non-zero coords |∂smooth| ≈ 1 (the ℓ1 subgradient)
    # — weaker structural check: selected features actually separate
    pos = {int(t) for d in docs if d["label"] == 1 for t in d["tids"]}
    neg = {int(t) for d in docs if d["label"] == 0 for t in d["tids"]}
    assert any(f in pos or f in neg for f in selected)


def test_triangle_indexing_and_diff_feature():
    """getIndex lower-triangle layout + the 2·di·dj / di² feature values."""
    assert _tri_index(0, 0) == 0
    assert _tri_index(1, 0) == 1
    assert _tri_index(1, 1) == 2
    assert _tri_index(2, 1) == _tri_index(1, 2) == 4
    p1 = (np.array([0, 2]), np.array([1.0, 2.0]))
    p2 = (np.array([0, 1]), np.array([0.5, 1.0]))
    out = pair_feature_diff(p1, p2, 3)
    d = np.array([0.5, -1.0, 2.0])
    want = np.zeros(6)
    for i in range(3):
        for j in range(i):
            want[_tri_index(i, j)] = 2 * d[i] * d[j]
        want[_tri_index(i, i)] = d[i] * d[i]
    assert np.allclose(out, want)


def test_pair_caps_transcribed():
    """The sequential PP/NN and mustLink/cannotLink caps must bound the
    generated pair set like the reference's running counters."""
    rng = np.random.default_rng(1)
    projected = [(np.array([0]), np.array([1.0]))] * 200
    labels = [1] * 100 + [0] * 100
    fvs, targets, _m = build_metric_pairs(projected, labels, bound=0)
    t = np.asarray(targets)
    must, cannot = int((t == 1).sum()), int((t == -1).sum())
    assert must <= cannot + 2001      # the running-imbalance cap held
    assert cannot > 0 and must > 0


def test_learned_metric_separates_classes(ray_session):
    docs = _planted_docs()
    out = train_linear_svm_metric(docs, n_features=20, bound=0)
    sim = out["similarity"]
    same = sim(docs[0], docs[1])
    cross = sim(docs[0], docs[-1])
    assert same > cross
    assert out["n_pairs"] > 0


def test_l2r_query_clustering_asymmetric(ray_session):
    docs = _planted_docs(n_per=15, seed=3)
    for i, d in enumerate(docs):
        d["cluster"] = 0 if i % 2 == 0 else 1
    out = train_l2r_query_clustering(docs, n_clusters=2, top_k=5)
    assert set(out["weights"]) == {0, 1}
    sim = out["similarity"]
    a, b = docs[0], docs[1]          # different clusters → different weights
    assert a["cluster"] != b["cluster"]
    if not np.allclose(out["weights"][0], out["weights"][1]):
        assert sim(a, b) != sim(b, a)    # asymmetry (reference's NOTE)
