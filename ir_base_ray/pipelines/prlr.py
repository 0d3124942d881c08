"""Posterior-Regularized Logistic Regression (SURVEY.md §2.7 R6 — the last
named member of the reference's supervised family):
``Classifier/supervised/PRLogisticRegression.java`` with the per-document
dual constraint solvers from
``posteriorRegularization/logisticRegression/{PosteriorConstraints,
PairwisePR,PointwisePR}.java``.

Semantics transcribed exactly:

- Outer EM (``PRLogisticRegression.java:64-90``): at most 10 rounds of
  [E-step → full inner L-BFGS M-step], stopping when the relative objective
  change |(lastF − f)/lastF| ≤ 1e-3 (lastF initialised to 1).
- E-step (``:92-123``): for every doc, compute the plain LR softmax posterior
  p, then solve the tiny per-doc dual  min_{λ≥0} log Σ_c p_c·exp(−λ·φ_c)
  + ε‖λ‖² + b·λ  (ε=0.1, b=0, ``PosteriorConstraints.java:14,52-70``) by
  projected gradient descent with Armijo line search along the projection
  arc (the reference drives the public pr-toolkit optimizer with first step
  1.0, projected-gradient-norm stop 1e-5, ≤50 steps). The stored result is
  the UNNORMALIZED scaler  exp(−λ·φ_c)  (``getPosteriorScaler`` :40-47).
- Constraint features: PairwisePR's adjacent-class ordering table
  (``PairwisePR.java:17-88``): constraint j couples classes (j, j+1) with
  sign +1/−1 on (j, j+1) when j < label else −1/+1 — i.e. mass is pushed
  monotonically toward the true label from both sides. The reference
  hardcodes the C=5 review-star table; :func:`pairwise_phi` generalises the
  identical rule to any C (CONT_SIZE = C−1 = the reference's 4).
  PointwisePR (``PointwisePR.java:19-27``): single feature
  φ_c = −((C−1) − |c − label|).
- M-step (``calcFuncGradient`` :125-168``): identical to plain LR except the
  softmax posterior is multiplied by the doc's scaler and renormalised
  (``calcPosterior`` :36-52) before entering both f and g.
  Reference quirk NOT reproduced: on optimizer failure the reference zeroes
  the scaler row, which makes q = 0/0 (NaN) in the M-step; here a failed /
  degenerate row falls back to the unscaled posterior (scaler = 1).

Distributed execution (same T5 shape as ``pipelines/linear.py``): doc-vector
blocks are pinned in the object store once; the E-step is one remote task
per block (vectorised-over-docs dual solve) returning that block's scaler
matrix, which stays in the object store and is joined to its block in the
M-step partial tasks. Driver sums (f, g) partials in fixed block order, so
the path is deterministic and 1-block == serial bit-exact (pytest-pinned).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ir_base_ray.pipelines.linear import (
    _class_scores, _vec_block_arrays, lbfgs_minimize)


# ------------------------------------------------------- constraint tables

def pairwise_phi(label: int, n_classes: int) -> np.ndarray:
    """(C, C−1) adjacent-pair ordering constraints, ``PairwisePR.java:17-88``
    generalised: constraint j touches only classes j and j+1; sign pattern
    (+1, −1) while j < label, (−1, +1) from the label onward."""
    C = n_classes
    phi = np.zeros((C, C - 1), dtype=np.float64)
    for j in range(C - 1):
        if j < label:
            phi[j, j] = 1.0
            phi[j + 1, j] = -1.0
        else:
            phi[j, j] = -1.0
            phi[j + 1, j] = 1.0
    return phi


def pointwise_phi(label: int, n_classes: int) -> np.ndarray:
    """(C, 1) distance-to-label feature, ``PointwisePR.java:19-27``."""
    C = n_classes
    phi = np.empty((C, 1), dtype=np.float64)
    for i in range(C):
        phi[i, 0] = -((C - 1) - abs(i - label))
    return phi


# ------------------------------------------------------------- dual solver

def solve_pr_duals(P: np.ndarray, labels: np.ndarray, *, eps: float = 0.1,
                   gtol: float = 1e-5, max_step: int = 50,
                   pointwise: bool = False) -> np.ndarray:
    """Solve every doc's dual at once (vectorised over the batch) and return
    the (n, C) scaler matrix exp(−λ·φ). Projected gradient descent on
    λ ∈ [0, ∞)^K with per-doc Armijo backtracking along the projection arc
    (first trial step 1.0, σ=1e-4), stopping per doc when the projected
    gradient norm ≤ ``gtol`` (``pr_test.java:25-38`` protocol, ε and starting
    point per ``PosteriorConstraints.java:14`` / ``PairwisePR.java:9-11``)."""
    n, C = P.shape
    make = pointwise_phi if pointwise else pairwise_phi
    tables = np.stack([make(l, C) for l in range(C)])        # (C, C, K)
    Phi = tables[np.asarray(labels, dtype=np.int64)]          # (n, C, K)
    K = Phi.shape[2]
    lam = np.ones((n, K), dtype=np.float64)                   # legal start

    def f_of(lam_):
        # log Σ_c p_c exp(−λ·φ_c) + ε‖λ‖²  (b = 0)
        expo = -np.einsum("nck,nk->nc", Phi, lam_)
        mx = expo.max(axis=1)
        z = np.einsum("nc,nc->n", P, np.exp(expo - mx[:, None]))
        return np.log(z) + mx + eps * (lam_ * lam_).sum(axis=1)

    active = np.ones(n, dtype=bool)
    for _ in range(max_step):
        expo = -np.einsum("nck,nk->nc", Phi, lam)
        mx = expo.max(axis=1)
        q = P * np.exp(expo - mx[:, None])                    # scaled by e^-mx
        z = q.sum(axis=1)
        grad = 2.0 * eps * lam - np.einsum("nck,nc->nk", Phi, q / z[:, None])
        pg = lam - np.maximum(lam - grad, 0.0)                # projected grad
        active &= np.sqrt((pg * pg).sum(axis=1)) > gtol
        if not active.any():
            break
        f0 = np.log(z) + mx + eps * (lam * lam).sum(axis=1)
        step = np.where(active, 1.0, 0.0)
        lam_new = lam.copy()
        pending = active.copy()
        for _bt in range(40):
            trial = np.maximum(lam - step[:, None] * grad, 0.0)
            f1 = f_of(trial)
            dec = (grad * (trial - lam)).sum(axis=1)          # ≤ 0
            ok = pending & (f1 <= f0 + 1e-4 * dec)
            lam_new[ok] = trial[ok]
            pending &= ~ok
            if not pending.any():
                break
            step[pending] *= 0.5
        # docs whose line search exhausted keep their current λ and retire
        active &= ~pending
        lam = lam_new
    return np.exp(-np.einsum("nck,nk->nc", Phi, lam))


# ------------------------------------------------------------- block steps

def prlr_estep_block(tbl: pa.Table, beta: np.ndarray, n_classes: int,
                     n_features: int, pointwise: bool = False) -> np.ndarray:
    """One block's E-step: plain-LR softmax posterior → per-doc dual solve →
    (n, C) scaler matrix (``Estep``, ``PRLogisticRegression.java:92-123``)."""
    C, F = n_classes, n_features
    beta2d = beta.reshape(C, F + 1)
    j, v, lengths, y, _w = _vec_block_arrays(tbl)
    n = len(lengths)
    if n == 0:
        return np.zeros((0, C), dtype=np.float64)
    S = _class_scores(beta2d, j, v, lengths)
    mx = S.max(axis=1, keepdims=True)
    P = np.exp(S - mx)
    P /= P.sum(axis=1, keepdims=True)
    return solve_pr_duals(P, y, pointwise=pointwise)


def prlr_block_fg(tbl: pa.Table, scaler: np.ndarray, beta: np.ndarray,
                  n_classes: int, n_features: int):
    """Unregularized −Σ log q data partial + gradient for one block with the
    PR-scaled posterior q ∝ softmax(S)·scaler
    (``calcFuncGradient`` + ``calcPosterior``)."""
    C, F = n_classes, n_features
    beta2d = beta.reshape(C, F + 1)
    j, v, lengths, y, w = _vec_block_arrays(tbl)
    n = len(lengths)
    g = np.zeros_like(beta2d)
    if n == 0:
        return 0.0, g.ravel()
    S = _class_scores(beta2d, j, v, lengths)
    mx = S.max(axis=1, keepdims=True)
    P = np.exp(S - mx)
    P /= P.sum(axis=1, keepdims=True)
    Q = P * scaler
    zs = Q.sum(axis=1)
    bad = ~(zs > 0)                  # degenerate scaler row → unscaled p
    if bad.any():
        Q[bad] = P[bad]
        zs = Q.sum(axis=1)
    Q /= zs[:, None]
    idx = np.arange(n)
    f = -float((w * np.log(Q[idx, y])).sum())
    G = Q.copy()
    G[idx, y] -= 1.0
    G *= w[:, None]
    g[:, 0] = G.sum(axis=0)
    doc_idx = np.repeat(idx, lengths)
    Gp = G[doc_idx]
    for c in range(C):
        np.add.at(g[c, 1:], j, Gp[:, c] * v)
    return f, g.ravel()


_estep_remote = ray.remote(prlr_estep_block)
_fg_remote = ray.remote(prlr_block_fg)


# ---------------------------------------------------------------- training

def train_pr_logistic_regression(vec_ds, *, n_classes: int, n_features: int,
                                 lam: float = 1.0, gtol: float = 1e-4,
                                 max_iter: int = 200, em_rounds: int = 10,
                                 em_tol: float = 1e-3,
                                 pointwise: bool = False):
    """→ (β as C×(F+1), final f, EM rounds run). Mirror of
    ``PRLogisticRegression.train`` (``:64-90``): per round one distributed
    E-step (remote task per pinned block → scaler refs) then a full L-BFGS
    minimisation whose (f, g) partials join each block to its scaler."""
    blocks = [ray.put(b) for b in vec_ds.iter_batches(batch_format="pyarrow",
                                                      batch_size=None)]
    dim = n_classes * (n_features + 1)
    beta = np.zeros(dim, dtype=np.float64)
    last_f, f = 1.0, 0.0
    rounds = 0
    for rounds in range(1, em_rounds + 1):
        beta_ref = ray.put(beta)
        scaler_refs = [
            _estep_remote.remote(b, beta_ref, n_classes, n_features, pointwise)
            for b in blocks
        ]
        # keep scalers in the object store; M-step tasks read them directly
        scaler_refs = [ray.put(s) for s in ray.get(scaler_refs)]

        def value_grad(x):
            x_ref = ray.put(x)
            outs = ray.get([
                _fg_remote.remote(b, s, x_ref, n_classes, n_features)
                for b, s in zip(blocks, scaler_refs)
            ])
            fv = lam * float(x @ x)
            gv = 2.0 * lam * x
            for f_part, g_part in outs:   # fixed order: deterministic
                fv += f_part
                gv = gv + g_part
            return fv, gv

        beta, f, _it = lbfgs_minimize(value_grad, beta, gtol=gtol,
                                      max_iter=max_iter)
        converge = (last_f - f) / last_f if last_f != 0 else 0.0
        last_f = f
        if abs(converge) <= em_tol:
            break
    return beta.reshape(n_classes, n_features + 1), f, rounds


# ------------------------------------------------------------ serial twin

def prlr_serial_train(tids_list, vals_list, labels, *, n_classes: int,
                      n_features: int, lam: float = 1.0, gtol: float = 1e-4,
                      max_iter: int = 200, em_rounds: int = 10,
                      em_tol: float = 1e-3, pointwise: bool = False):
    """Per-doc serial transcription of the same EM loop — the parity oracle
    for the distributed path (shares only the constraint tables and the
    L-BFGS core)."""
    C, F = n_classes, n_features
    y = np.asarray(labels, dtype=np.int64)
    n = len(y)

    def posteriors(beta2d):
        P = np.empty((n, C), dtype=np.float64)
        for d in range(n):
            jj = np.asarray(tids_list[d], dtype=np.int64)
            vv = np.asarray(vals_list[d], dtype=np.float64)
            s = beta2d[:, 0] + (beta2d[:, jj + 1] * vv).sum(axis=1)
            e = np.exp(s - s.max())
            P[d] = e / e.sum()
        return P

    beta = np.zeros(C * (F + 1), dtype=np.float64)
    last_f, f = 1.0, 0.0
    rounds = 0
    for rounds in range(1, em_rounds + 1):
        P = posteriors(beta.reshape(C, F + 1))
        scaler = np.vstack([
            solve_pr_duals(P[d:d + 1], y[d:d + 1], pointwise=pointwise)
            for d in range(n)
        ]) if n else np.zeros((0, C))

        def value_grad(x):
            beta2d = x.reshape(C, F + 1)
            g = 2.0 * lam * beta2d.copy()
            fv = lam * float(x @ x)
            for d in range(n):
                jj = np.asarray(tids_list[d], dtype=np.int64)
                vv = np.asarray(vals_list[d], dtype=np.float64)
                s = beta2d[:, 0] + (beta2d[:, jj + 1] * vv).sum(axis=1)
                e = np.exp(s - s.max())
                p = e / e.sum()
                q = p * scaler[d]
                zq = q.sum()
                q = q / zq if zq > 0 else p
                fv -= np.log(q[y[d]])
                gv = q.copy()
                gv[y[d]] -= 1.0
                g[:, 0] += gv
                g[:, jj + 1] += gv[:, None] * vv[None, :]
            return fv, g.ravel()

        beta, f, _ = lbfgs_minimize(value_grad, beta, gtol=gtol,
                                    max_iter=max_iter)
        converge = (last_f - f) / last_f if last_f != 0 else 0.0
        last_f = f
        if abs(converge) <= em_tol:
            break
    return beta.reshape(C, F + 1), f, rounds
