"""Linear classifiers (R6): distributed-vs-serial gradient parity, L-BFGS
convergence, and end-to-end accuracy on a separable corpus."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ir_base_ray.pipelines.linear import (
    lbfgs_minimize, lr_block_fg, lr_serial_fg, predict_linear, svm_block_fg,
    train_linear_svm, train_logistic_regression,
)


def _toy_vectors(n_per_class=20, n_classes=3, n_features=12, seed=5):
    """Linearly separable sparse vectors: class c concentrates on features
    [4c, 4c+4)."""
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_classes):
        for i in range(n_per_class):
            k = rng.integers(2, 5)
            feats = rng.choice(range(4 * c, 4 * c + 4), size=k, replace=False)
            noise = rng.choice(n_features, size=1)
            tids = np.unique(np.concatenate([feats, noise]))
            vals = rng.integers(1, 4, size=tids.size).astype(float)
            rows.append({"doc_id": len(rows), "tids": tids.tolist(),
                         "vals": vals.tolist(), "label": c})
    return rows, n_classes, n_features


def _as_table(rows):
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "tids": pa.array([r["tids"] for r in rows], pa.list_(pa.int64())),
        "vals": pa.array([r["vals"] for r in rows], pa.list_(pa.float64())),
        "label": pa.array([r["label"] for r in rows], pa.int64()),
    })


def test_lbfgs_quadratic():
    A = np.diag([1.0, 4.0, 9.0, 0.5])
    b = np.array([1.0, -2.0, 3.0, 0.25])

    def fg(x):
        return 0.5 * float(x @ A @ x) - float(b @ x), A @ x - b

    x, f, it = lbfgs_minimize(fg, np.zeros(4), gtol=1e-10)
    assert np.allclose(x, np.linalg.solve(A, b), atol=1e-8)


def test_lr_block_vs_serial_gradient():
    rows, C, F = _toy_vectors()
    tbl = _as_table(rows)
    rng = np.random.default_rng(0)
    beta = rng.normal(size=C * (F + 1)) * 0.1
    lam = 0.7
    f_blk, g_blk = lr_block_fg(tbl, beta, C, F)
    # block fg excludes regularization; add it like _train_distributed does
    f_blk += lam * float(beta @ beta)
    g_blk = g_blk + 2.0 * lam * beta
    f_ser, g_ser = lr_serial_fg(
        [r["tids"] for r in rows], [r["vals"] for r in rows],
        [r["label"] for r in rows], [1.0] * len(rows), beta, C, F, lam)
    assert abs(f_blk - f_ser) <= 1e-10 * max(1.0, abs(f_ser))
    assert np.allclose(g_blk, g_ser, rtol=1e-10, atol=1e-12)


def test_lr_multiblock_deterministic(ray_session):
    rows, C, F = _toy_vectors()
    ds = ray.data.from_arrow(_as_table(rows)).repartition(4)
    b1, f1, _ = train_logistic_regression(ds, n_classes=C, n_features=F,
                                          lam=0.5, max_iter=40)
    b2, f2, _ = train_logistic_regression(ds, n_classes=C, n_features=F,
                                          lam=0.5, max_iter=40)
    assert f1 == f2 and np.array_equal(b1, b2)


def test_lr_end_to_end_accuracy(ray_session):
    rows, C, F = _toy_vectors(n_per_class=30)
    ds = ray.data.from_arrow(_as_table(rows))
    beta, f, it = train_logistic_regression(ds, n_classes=C, n_features=F,
                                            lam=0.1, max_iter=80)
    pred = predict_linear(beta, ds).to_pandas().sort_values("doc_id")
    labels = np.array([r["label"] for r in rows])
    acc = (pred["pred"].to_numpy() == labels).mean()
    assert acc >= 0.95, acc


def test_svm_gradient_numeric():
    """Squared-hinge block gradient vs central finite differences."""
    rows, C, F = _toy_vectors(n_per_class=6)
    tbl = _as_table(rows)
    rng = np.random.default_rng(1)
    W = rng.normal(size=C * (F + 1)) * 0.05
    f0, g = svm_block_fg(tbl, W, C, F, 1.3)
    eps = 1e-6
    for idx in rng.choice(W.size, size=10, replace=False):
        Wp = W.copy(); Wp[idx] += eps
        Wm = W.copy(); Wm[idx] -= eps
        fp, _ = svm_block_fg(tbl, Wp, C, F, 1.3)
        fm, _ = svm_block_fg(tbl, Wm, C, F, 1.3)
        num = (fp - fm) / (2 * eps)
        assert abs(num - g[idx]) <= 1e-4 * max(1.0, abs(num)), (idx, num, g[idx])


def test_svm_end_to_end_accuracy(ray_session):
    rows, C, F = _toy_vectors(n_per_class=30)
    ds = ray.data.from_arrow(_as_table(rows))
    W, f, it = train_linear_svm(ds, n_classes=C, n_features=F, C_reg=1.0,
                                max_iter=80)
    pred = predict_linear(W, ds).to_pandas().sort_values("doc_id")
    labels = np.array([r["label"] for r in rows])
    acc = (pred["pred"].to_numpy() == labels).mean()
    assert acc >= 0.95, acc
