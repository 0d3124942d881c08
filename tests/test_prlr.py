"""PR-LR (R6): constraint-table parity with the reference's hardcoded C=5
tables, dual-solver KKT/directionality, block-vs-serial gradient parity,
determinism, and end-to-end accuracy."""

import numpy as np
import pyarrow as pa

import ray.data

from ir_base_ray.pipelines.linear import predict_linear
from ir_base_ray.pipelines.prlr import (
    pairwise_phi, pointwise_phi, prlr_block_fg, prlr_estep_block,
    prlr_serial_train, solve_pr_duals, train_pr_logistic_regression,
)
from tests.test_linear import _as_table, _toy_vectors


def test_pairwise_phi_matches_reference_table():
    # PairwisePR.java:17-88 — all five hardcoded label cases at C=5
    expect = {}
    for label in range(5):
        phi = np.zeros((5, 4))
        for j in range(4):
            if j < label:
                phi[j, j], phi[j + 1, j] = 1, -1
            else:
                phi[j, j], phi[j + 1, j] = -1, 1
        expect[label] = phi
    # spot-verify the transcription against the literal reference rows
    assert expect[0][0, 0] == -1 and expect[0][1, 0] == 1
    assert expect[2][0, 0] == 1 and expect[2][1, 0] == -1
    assert expect[2][2, 2] == -1 and expect[2][3, 2] == 1
    assert expect[4][3, 3] == 1 and expect[4][4, 3] == -1
    for label in range(5):
        assert np.array_equal(pairwise_phi(label, 5), expect[label])


def test_pointwise_phi():
    # PointwisePR.java:21-24: phi[i][0] = -(4 - |i-label|) at C=5
    phi = pointwise_phi(2, 5)
    assert phi.shape == (5, 1)
    assert np.array_equal(phi[:, 0], [-2.0, -3.0, -4.0, -3.0, -2.0])


def test_dual_pulls_mass_toward_label():
    # the pr_test.java fixture: p as given, true label 2
    p = np.array([[0.1531478099455653, 0.12905204209451868,
                   0.1350820938150242, 0.15593451022541338,
                   0.42678354391947854]])
    scaler = solve_pr_duals(p, np.array([2]))
    q = p * scaler
    q /= q.sum()
    # regularization must increase the true label's posterior and demote the
    # argmax-violating tail class
    assert q[0, 2] > p[0, 2]
    assert q[0, 4] < p[0, 4]
    # pinned optimum: the eps=0.1 quadratic penalty caps lambda so the
    # ordering constraints stay partially violated — this exact vector
    # matches an independent 200k-step projected-gradient reference solve
    # of the PosteriorConstraints dual to 6+ decimals
    assert np.allclose(
        q[0], [0.157982, 0.147641, 0.177443, 0.215433, 0.301501], atol=1e-5)


def test_dual_identity_when_constraints_satisfied():
    # a posterior already unimodal at the label: lambda should go ~0 and the
    # scaler ~1 (KKT: inactive constraints)
    p = np.array([[0.05, 0.15, 0.6, 0.15, 0.05]])
    scaler = solve_pr_duals(p, np.array([2]))
    q = p * scaler
    q /= q.sum()
    assert np.allclose(q, p, atol=0.06)
    assert int(np.argmax(q)) == 2


def test_estep_block_matches_perdoc():
    rows, C, F = _toy_vectors(n_per_class=6)
    tbl = _as_table(rows)
    rng = np.random.default_rng(3)
    beta = rng.normal(size=C * (F + 1)) * 0.2
    S = prlr_estep_block(tbl, beta, C, F)
    assert S.shape == (len(rows), C)
    # per-doc recompute
    beta2d = beta.reshape(C, F + 1)
    for d, r in enumerate(rows):
        jj = np.asarray(r["tids"], dtype=np.int64)
        vv = np.asarray(r["vals"], dtype=np.float64)
        s = beta2d[:, 0] + (beta2d[:, jj + 1] * vv).sum(axis=1)
        e = np.exp(s - s.max())
        p = (e / e.sum())[None, :]
        expect = solve_pr_duals(p, np.array([r["label"]]))
        assert np.allclose(S[d], expect[0], rtol=1e-12, atol=1e-12)


def test_block_fg_matches_serial_gradient():
    rows, C, F = _toy_vectors(n_per_class=8)
    tbl = _as_table(rows)
    rng = np.random.default_rng(11)
    beta = rng.normal(size=C * (F + 1)) * 0.1
    scaler = np.abs(rng.normal(size=(len(rows), C))) + 0.1
    f_blk, g_blk = prlr_block_fg(tbl, scaler, beta, C, F)
    # serial per-doc recompute of the unregularized data term
    beta2d = beta.reshape(C, F + 1)
    f_ser = 0.0
    g_ser = np.zeros_like(beta2d)
    for d, r in enumerate(rows):
        jj = np.asarray(r["tids"], dtype=np.int64)
        vv = np.asarray(r["vals"], dtype=np.float64)
        s = beta2d[:, 0] + (beta2d[:, jj + 1] * vv).sum(axis=1)
        e = np.exp(s - s.max())
        p = e / e.sum()
        q = p * scaler[d]
        q /= q.sum()
        f_ser -= np.log(q[r["label"]])
        gv = q.copy()
        gv[r["label"]] -= 1.0
        g_ser[:, 0] += gv
        g_ser[:, jj + 1] += gv[:, None] * vv[None, :]
    assert abs(f_blk - f_ser) <= 1e-10 * max(1.0, abs(f_ser))
    assert np.allclose(g_blk, g_ser.ravel(), rtol=1e-9, atol=1e-11)


def test_train_deterministic_and_accurate(ray_session):
    rows, C, F = _toy_vectors(n_per_class=15)
    ds = ray.data.from_arrow(_as_table(rows)).repartition(3)
    b1, f1, r1 = train_pr_logistic_regression(
        ds, n_classes=C, n_features=F, lam=0.5, max_iter=40)
    b2, f2, r2 = train_pr_logistic_regression(
        ds, n_classes=C, n_features=F, lam=0.5, max_iter=40)
    assert f1 == f2 and r1 == r2 and np.array_equal(b1, b2)
    pred = predict_linear(b1, ds).to_pandas().sort_values("doc_id")
    truth = [r["label"] for r in rows]
    acc = float(np.mean(pred["pred"].to_numpy() == truth))
    assert acc >= 0.95


def test_distributed_matches_serial(ray_session):
    rows, C, F = _toy_vectors(n_per_class=6, n_classes=3, seed=9)
    ds = ray.data.from_arrow(_as_table(rows)).repartition(1)
    b_d, f_d, r_d = train_pr_logistic_regression(
        ds, n_classes=C, n_features=F, lam=0.5, max_iter=30, em_rounds=3)
    b_s, f_s, r_s = prlr_serial_train(
        [r["tids"] for r in rows], [r["vals"] for r in rows],
        [r["label"] for r in rows], n_classes=C, n_features=F, lam=0.5,
        max_iter=30, em_rounds=3)
    assert r_d == r_s
    assert abs(f_d - f_s) <= 1e-6 * max(1.0, abs(f_s))
    assert np.allclose(b_d, b_s, rtol=1e-4, atol=1e-6)
