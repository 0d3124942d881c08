"""GaussianFields random walk (R6 style=SEMI): propagation corrects a bad
classifier on a separable corpus; majority-vote variant; convergence."""

import numpy as np

from ir_base_ray.pipelines.gaussianfields import gaussian_fields_predict


def _docs(n, label, seed):
    rng = np.random.default_rng(seed)
    base = 0 if label == 0 else 6
    out = []
    for _ in range(n):
        tids = np.unique(rng.choice(range(base, base + 6), 4, replace=False))
        vals = np.ones(tids.size) / np.sqrt(tids.size)
        out.append({"tids": tids.astype(np.int64), "vals": vals,
                    "label": label, "doc_len": int(tids.size)})
    return out


def test_walk_corrects_noisy_classifier(ray_session):
    labeled = _docs(10, 0, 1) + _docs(10, 1, 2)
    unlabeled = _docs(8, 0, 3) + _docs(8, 1, 4)
    truth = np.array([d["label"] for d in unlabeled])
    rng = np.random.default_rng(9)
    clf = truth.copy().astype(float)
    flip = rng.choice(len(clf), 5, replace=False)   # 5/16 wrong
    clf[flip] = 1.0 - clf[flip]
    pred, hard = gaussian_fields_predict(unlabeled, labeled, clf,
                                         n_classes=2, k=5, k_prime=4,
                                         eta=0.9)
    acc = (hard == truth).mean()
    assert acc >= 0.9, (acc, hard, truth)


def test_majority_vote_variant(ray_session):
    labeled = _docs(8, 0, 5) + _docs(8, 1, 6)
    unlabeled = _docs(6, 0, 7) + _docs(6, 1, 8)
    truth = np.array([d["label"] for d in unlabeled])
    clf = truth.astype(float)
    pred, hard = gaussian_fields_predict(unlabeled, labeled, clf,
                                         n_classes=2, k=4, k_prime=3,
                                         weighted=False)
    assert (hard == truth).mean() == 1.0


def test_deterministic(ray_session):
    labeled = _docs(6, 0, 1) + _docs(6, 1, 2)
    unlabeled = _docs(5, 0, 3) + _docs(5, 1, 4)
    clf = np.array([d["label"] for d in unlabeled], dtype=float)
    a = gaussian_fields_predict(unlabeled, labeled, clf, n_classes=2)
    b = gaussian_fields_predict(unlabeled, labeled, clf, n_classes=2)
    assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


def test_exact_mode_is_walk_fixed_point(ray_session):
    """The matrix-solution mode must be the exact fixed point of the
    weighted-sum walk: (a) a tightly-converged random walk lands on it,
    (b) applying one more walk update to the exact solution leaves it
    unchanged to float tolerance."""
    from ir_base_ray.pipelines.gaussianfields import (
        build_knn_edges, exact_propagation, gaussian_fields_predict,
        gaussian_fields_predict_exact, random_walk)

    labeled = _docs(8, 0, 1) + _docs(8, 1, 2)
    unlabeled = _docs(6, 0, 3) + _docs(6, 1, 4)
    clf = np.full(len(unlabeled), 0.0)

    pred_rw, hard_rw = gaussian_fields_predict(
        unlabeled, labeled, clf, n_classes=2, k=4, k_prime=4,
        delta=1e-13)
    pred_ex, hard_ex = gaussian_fields_predict_exact(
        unlabeled, labeled, clf, n_classes=2, k=4, k_prime=4)
    assert np.allclose(pred_rw, pred_ex, atol=1e-6)
    assert (hard_rw == hard_ex).all()

    # determinism + equation re-derivation on the same edge table
    edges = build_knn_edges(unlabeled, labeled, k=4, k_prime=4)
    y_l = np.array([d["label"] for d in labeled])
    ex2, _ = exact_propagation(edges, y_l, clf, n_classes=2)
    assert np.allclose(ex2, pred_ex, atol=1e-12)
    # residual: substituting the exact solution into the walk's update
    # equation reproduces it (true fixed-point check, done inline so the
    # (1-eta) term uses the ORIGINAL classifier predictions)
    for i in range(len(unlabeled)):
        ln = np.asarray(list(edges["l_nbrs"][i]), dtype=np.int64)
        ls = np.asarray(list(edges["l_sims"][i]), dtype=np.float64)
        un = np.asarray(list(edges["u_nbrs"][i]), dtype=np.int64)
        us = np.asarray(list(edges["u_sims"][i]), dtype=np.float64)
        denom = 1.0 * ls.sum() + 0.1 * us.sum()
        f = (0.6 * (1.0 * (ls * y_l[ln]).sum()
                    + 0.1 * (us * pred_ex[un]).sum()) / denom
             + 0.4 * clf[i])
        assert abs(f - pred_ex[i]) < 1e-10
