"""NaiveBayes-EM (R6 semi-supervised): distributed-vs-serial parity, EM
convergence semantics, and unlabeled-data benefit on a toy corpus."""

import numpy as np
import pyarrow as pa

import ray.data

from ir_base_ray.pipelines.nbem import (
    nbem_serial_train, predict_naive_bayes_em, train_naive_bayes_em,
)
from tests.test_linear import _toy_vectors


def _semi_table(rows, labeled_every=4):
    """Hide labels on all but every ``labeled_every``-th doc (label=-1)."""
    labels = [r["label"] if i % labeled_every == 0 else -1
              for i, r in enumerate(rows)]
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "tids": pa.array([r["tids"] for r in rows], pa.list_(pa.int64())),
        "vals": pa.array([r["vals"] for r in rows], pa.list_(pa.float64())),
        "label": pa.array(labels, pa.int64()),
    }), labels


def test_distributed_matches_serial(ray_session):
    rows, C, F = _toy_vectors(n_per_class=10, seed=2)
    tbl, labels = _semi_table(rows)
    ds = ray.data.from_arrow(tbl).repartition(1)
    lpy_d, lpxy_d, lik_d, it_d = train_naive_bayes_em(
        ds, n_classes=C, n_features=F, max_iter=20)
    lpy_s, lpxy_s, lik_s, it_s = nbem_serial_train(
        [r["tids"] for r in rows], [r["vals"] for r in rows], labels,
        n_classes=C, n_features=F, max_iter=20)
    assert it_d == it_s
    assert abs(lik_d - lik_s) <= 1e-9 * max(1.0, abs(lik_s))
    assert np.allclose(lpy_d, lpy_s, rtol=1e-12, atol=1e-12)
    assert np.allclose(lpxy_d, lpxy_s, rtol=1e-10, atol=1e-12)


def test_multiblock_deterministic(ray_session):
    rows, C, F = _toy_vectors(n_per_class=12, seed=6)
    tbl, _ = _semi_table(rows)
    ds = ray.data.from_arrow(tbl).repartition(4)
    out1 = train_naive_bayes_em(ds, n_classes=C, n_features=F, max_iter=15)
    out2 = train_naive_bayes_em(ds, n_classes=C, n_features=F, max_iter=15)
    assert out1[3] == out2[3] and out1[2] == out2[2]
    assert np.array_equal(out1[0], out2[0])
    assert np.array_equal(out1[1], out2[1])


def test_em_monotone_likelihood(ray_session):
    # EM on NB is guaranteed non-decreasing in the observed-data likelihood;
    # the reference's loop stops when the relative change drops below 1e-5
    rows, C, F = _toy_vectors(n_per_class=10, seed=4)
    tbl, labels = _semi_table(rows, labeled_every=5)
    ds = ray.data.from_arrow(tbl).repartition(2)
    # run the serial twin capturing successive likelihoods via max_iter sweep
    liks = []
    for mi in (2, 3, 4, 5):
        _, _, lik, _ = nbem_serial_train(
            [r["tids"] for r in rows], [r["vals"] for r in rows], labels,
            n_classes=C, n_features=F, max_iter=mi)
        liks.append(lik)
    assert all(b >= a - 1e-8 for a, b in zip(liks, liks[1:]))
    # and the distributed run terminates within the cap with finite lik
    _, _, lik_d, it_d = train_naive_bayes_em(
        ds, n_classes=C, n_features=F, max_iter=50)
    assert np.isfinite(lik_d) and 2 <= it_d <= 50


def test_unlabeled_data_helps(ray_session):
    # with 1 labeled doc per class plus many unlabeled, EM should classify
    # the unlabeled docs far better than chance
    rows, C, F = _toy_vectors(n_per_class=20, seed=8)
    tbl, labels = _semi_table(rows, labeled_every=20)
    ds = ray.data.from_arrow(tbl).repartition(2)
    lpy, lpxy, _lik, _it = train_naive_bayes_em(
        ds, n_classes=C, n_features=F, max_iter=30)
    pred = (predict_naive_bayes_em(lpy, lpxy, ds)
            .to_pandas().sort_values("doc_id"))
    truth = np.array([r["label"] for r in rows])
    acc = float((pred["pred"].to_numpy() == truth).mean())
    assert acc >= 0.9


def test_presence_mode(ray_session):
    rows, C, F = _toy_vectors(n_per_class=8, seed=12)
    tbl, labels = _semi_table(rows)
    ds = ray.data.from_arrow(tbl).repartition(1)
    lpy_d, lpxy_d, lik_d, it_d = train_naive_bayes_em(
        ds, n_classes=C, n_features=F, presence=True, max_iter=10)
    lpy_s, lpxy_s, lik_s, it_s = nbem_serial_train(
        [r["tids"] for r in rows], [r["vals"] for r in rows], labels,
        n_classes=C, n_features=F, presence=True, max_iter=10)
    assert it_d == it_s
    assert np.allclose(lpxy_d, lpxy_s, rtol=1e-10, atol=1e-12)
