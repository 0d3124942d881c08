"""Linear classifiers (SURVEY.md §2.7 R6): multi-class Logistic Regression
and linear SVM — the reference's style=SUP mainline
(``mains/Execution.java:88-113``).

- LogisticRegression: exact objective/gradient transcription of
  ``Classifier/supervised/LogisticRegression.java:95-136``:
  β has shape C×(F+1) (bias at offset 0 per class, dotProduct offset layout),
  f(β) = λ‖β‖² − Σ_i w_i·log P(y_i|x_i) with softmax posterior
  (``calcPosterior`` :82-93), g = 2λβ + Σ_i w_i(P_ij − 1{y_i=j})·x̃_i.
  Optimized with L-BFGS exactly like the reference's ``train`` loop
  (``:64-78``, m=6, gradient tolerance 1e-4) — the reference vendors a Java
  translation of Nocedal's public L-BFGS; :func:`lbfgs_minimize` is a numpy
  implementation of the same public algorithm (two-loop recursion +
  strong-Wolfe backtracking).
- SVM: the reference wraps liblinear (``SVM.java:104-121``). The rebuild
  substitutes the primal L2-regularized SQUARED-hinge linear SVM, one-vs-rest
  (liblinear's L2R_L2LOSS_SVC family — same model class, smooth so it shares
  the L-BFGS path): per class c with y∈{±1},
  f(w) = 0.5·wᵀw + C·Σ_i max(0, 1 − y_i·wᵀx̃_i)², bias unregularized.

Distributed execution (T5 pattern, same shape as pLSA/LambdaRank): document
vector blocks are pinned in the object store ONCE (``ray.put`` per block);
each L-BFGS iteration broadcasts β and runs one ``@ray.remote`` partial task
per block returning (f_part, ∇_part); the driver sums partials in fixed block
order (deterministic) and adds the regularization term. With a single block
the distributed f/g is bit-identical to the serial loop (pytest-pinned).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray


# ---------------------------------------------------------------- L-BFGS

def lbfgs_minimize(value_grad, x0: np.ndarray, *, m: int = 6,
                   gtol: float = 1e-4, max_iter: int = 200):
    """Minimize f via L-BFGS (Nocedal's public algorithm: two-loop recursion,
    backtracking line search with Armijo + curvature acceptance). Returns
    (x, f, n_iters). ``value_grad(x) -> (f, g)``; deterministic."""
    x = x0.astype(np.float64).copy()
    f, g = value_grad(x)
    s_hist: list[np.ndarray] = []
    y_hist: list[np.ndarray] = []
    rho_hist: list[float] = []
    for it in range(max_iter):
        gnorm = float(np.linalg.norm(g))
        if gnorm <= gtol * max(1.0, float(np.linalg.norm(x))):
            return x, f, it
        # two-loop recursion
        q = g.copy()
        alphas = []
        for s, y, rho in zip(reversed(s_hist), reversed(y_hist), reversed(rho_hist)):
            a = rho * float(s @ q)
            alphas.append(a)
            q -= a * y
        if y_hist:
            ys = float(s_hist[-1] @ y_hist[-1])
            yy = float(y_hist[-1] @ y_hist[-1])
            q *= ys / yy if yy > 0 else 1.0
        for (s, y, rho), a in zip(zip(s_hist, y_hist, rho_hist), reversed(alphas)):
            b = rho * float(y @ q)
            q += (a - b) * s
        d = -q
        gd = float(g @ d)
        if gd >= 0:  # non-descent (numerical): restart from steepest descent
            d = -g
            gd = -float(g @ g)
            s_hist.clear(); y_hist.clear(); rho_hist.clear()
        # backtracking Armijo line search (c1=1e-4), curvature-checked
        step = 1.0 if y_hist else min(1.0, 1.0 / max(1e-12, gnorm))
        f_new, g_new, x_new = f, g, x
        for _ in range(40):
            x_new = x + step * d
            f_new, g_new = value_grad(x_new)
            if f_new <= f + 1e-4 * step * gd:
                break
            step *= 0.5
        else:  # line search failed: converged as far as float64 allows
            return x, f, it
        s = x_new - x
        y = g_new - g
        sy = float(s @ y)
        if sy > 1e-10:
            s_hist.append(s)
            y_hist.append(y)
            rho_hist.append(1.0 / sy)
            if len(s_hist) > m:
                s_hist.pop(0); y_hist.pop(0); rho_hist.pop(0)
        x, f, g = x_new, f_new, g_new
    return x, f, max_iter


# ------------------------------------------------- shared block machinery

def _vec_block_arrays(tbl: pa.Table):
    """(doc_id, tids:list<int64>, vals:list<double>[, label][, weight]) block
    → flat (j, v, lengths, labels, weights)."""
    tids = tbl.column("tids")
    vals = tbl.column("vals")
    tids = tids.combine_chunks() if isinstance(tids, pa.ChunkedArray) else tids
    vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
    lengths = np.asarray(pa.compute.list_value_length(tids), dtype=np.int64)
    j = tids.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    v = vals.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    labels = (tbl.column("label").to_numpy().astype(np.int64)
              if "label" in tbl.column_names else None)
    weights = (tbl.column("weight").to_numpy().astype(np.float64)
               if "weight" in tbl.column_names
               else np.ones(len(lengths), dtype=np.float64))
    return j, v, lengths, labels, weights


def _class_scores(beta2d: np.ndarray, j, v, lengths):
    """S[d,c] = β[c,0] + Σ_t β[c, j+1]·v — the reference's dotProduct offset
    layout (``Utils.dotProduct(beta, spXi, offset)``)."""
    n = len(lengths)
    C = beta2d.shape[0]
    doc_idx = np.repeat(np.arange(n), lengths)
    S = np.empty((n, C), dtype=np.float64)
    for c in range(C):
        # bincount accumulates sequentially in posting order (deterministic)
        # and gives empty docs an exact 0 — no reduceat edge cases
        S[:, c] = np.bincount(doc_idx, weights=beta2d[c, j + 1] * v,
                              minlength=n) + beta2d[c, 0]
    return S


def lr_block_fg(tbl: pa.Table, beta: np.ndarray, n_classes: int,
                n_features: int):
    """Unregularized −Σ w·logP partial + its gradient for one block
    (``calcFuncGradient`` data term, ``LogisticRegression.java:107-133``)."""
    C, F = n_classes, n_features
    beta2d = beta.reshape(C, F + 1)
    j, v, lengths, y, w = _vec_block_arrays(tbl)
    n = len(lengths)
    g = np.zeros_like(beta2d)
    if n == 0:
        return 0.0, g.ravel()
    S = _class_scores(beta2d, j, v, lengths)
    mx = S.max(axis=1, keepdims=True)
    lse = mx[:, 0] + np.log(np.exp(S - mx).sum(axis=1))
    P = np.exp(S - lse[:, None])
    f = -float((w * (S[np.arange(n), y] - lse)).sum())
    G = P.copy()                      # w·(P_dc − 1{y=c})
    G[np.arange(n), y] -= 1.0
    G *= w[:, None]
    g[:, 0] = G.sum(axis=0)
    doc_idx = np.repeat(np.arange(n), lengths)
    Gp = G[doc_idx]                   # (P, C)
    for c in range(C):
        np.add.at(g[c, 1:], j, Gp[:, c] * v)
    return f, g.ravel()


def svm_block_fg(tbl: pa.Table, W: np.ndarray, n_classes: int,
                 n_features: int, C_reg: float):
    """Squared-hinge data term partial, one-vs-rest: for each class c,
    Σ_i w_i·C·max(0, 1 − y_ic·s_ic)² with y_ic = +1 iff label==c."""
    C, F = n_classes, n_features
    W2d = W.reshape(C, F + 1)
    j, v, lengths, y, w = _vec_block_arrays(tbl)
    n = len(lengths)
    g = np.zeros_like(W2d)
    if n == 0:
        return 0.0, g.ravel()
    S = _class_scores(W2d, j, v, lengths)
    ysign = np.where(y[:, None] == np.arange(C)[None, :], 1.0, -1.0)
    margin = 1.0 - ysign * S
    active = margin > 0
    f = float(C_reg * (w[:, None] * np.where(active, margin, 0.0) ** 2).sum())
    # d/ds of C·max(0,1−ys)² = −2C·y·max(0,1−ys)
    G = np.where(active, -2.0 * C_reg * ysign * margin, 0.0) * w[:, None]
    g[:, 0] = G.sum(axis=0)
    doc_idx = np.repeat(np.arange(n), lengths)
    Gp = G[doc_idx]
    for c in range(C):
        np.add.at(g[c, 1:], j, Gp[:, c] * v)
    return f, g.ravel()


_lr_block_fg_remote = ray.remote(lr_block_fg)
_svm_block_fg_remote = ray.remote(svm_block_fg)


def _train_distributed(vec_ds, *, n_classes: int, n_features: int,
                       block_fg_remote, reg_fg, gtol: float = 1e-4,
                       max_iter: int = 200):
    """Pin blocks once; per L-BFGS iteration broadcast the parameter vector
    and sum per-block (f, g) partials in fixed block order."""
    blocks = [ray.put(b) for b in vec_ds.iter_batches(batch_format="pyarrow",
                                                      batch_size=None)]
    dim = n_classes * (n_features + 1)

    def value_grad(x):
        x_ref = ray.put(x)
        outs = ray.get([block_fg_remote.remote(b, x_ref, n_classes, n_features)
                        for b in blocks])
        f_reg, g = reg_fg(x)
        f = f_reg
        for f_part, g_part in outs:   # fixed order: deterministic float sum
            f += f_part
            g = g + g_part
        return f, g

    return lbfgs_minimize(value_grad, np.zeros(dim), gtol=gtol,
                          max_iter=max_iter)


def train_logistic_regression(vec_ds, *, n_classes: int, n_features: int,
                              lam: float = 1.0, gtol: float = 1e-4,
                              max_iter: int = 200):
    """→ (β as C×(F+1), final f, iters). λ‖β‖² regularization over ALL
    coefficients including bias, exactly like the reference (:103-108)."""

    def reg_fg(x):
        return lam * float(x @ x), 2.0 * lam * x

    beta, f, it = _train_distributed(
        vec_ds, n_classes=n_classes, n_features=n_features,
        block_fg_remote=_lr_block_fg_remote, reg_fg=reg_fg,
        gtol=gtol, max_iter=max_iter)
    return beta.reshape(n_classes, n_features + 1), f, it


def train_linear_svm(vec_ds, *, n_classes: int, n_features: int,
                     C_reg: float = 1.0, gtol: float = 1e-4,
                     max_iter: int = 200):
    """→ (W as C×(F+1), final f, iters). 0.5‖w‖² per class, bias
    unregularized (liblinear convention)."""

    def make_remote():
        @ray.remote
        def fg(tbl, W, C, F):
            return svm_block_fg(tbl, W, C, F, C_reg)
        return fg

    fg_remote = make_remote()

    def reg_fg(x):
        W2d = x.reshape(n_classes, n_features + 1)
        g = np.zeros_like(W2d)
        g[:, 1:] = W2d[:, 1:]
        return 0.5 * float((W2d[:, 1:] ** 2).sum()), g.ravel()

    W, f, it = _train_distributed(
        vec_ds, n_classes=n_classes, n_features=n_features,
        block_fg_remote=fg_remote, reg_fg=reg_fg, gtol=gtol,
        max_iter=max_iter)
    return W.reshape(n_classes, n_features + 1), f, it


# ------------------------------------------------------------- prediction

def predict_linear(model2d: np.ndarray, vec_ds, *, id_col: str = "doc_id"):
    """Broadcast-model map_batches prediction: argmax class score, FIRST max
    wins ties (``Utils.argmax`` semantics). → (id, pred) Dataset."""
    model_ref = ray.put(model2d)

    def pred(batch: pa.Table) -> pa.Table:
        m = ray.get(model_ref)
        j, v, lengths, _, _ = _vec_block_arrays(batch)
        S = _class_scores(m, j, v, lengths)
        preds = S.argmax(axis=1) if len(S) else np.empty(0, np.int64)
        return pa.table({
            id_col: batch.column(id_col),
            "pred": pa.array(preds.astype(np.int64), pa.int64()),
        })

    return vec_ds.map_batches(pred, batch_format="pyarrow")


# ------------------------------------------------------------ serial twins

def lr_serial_fg(tids_list, vals_list, labels, weights, beta, n_classes,
                 n_features, lam):
    """Serial per-doc transcription of ``calcFuncGradient`` (regularized):
    the parity oracle for the distributed path."""
    C, F = n_classes, n_features
    beta2d = beta.reshape(C, F + 1)
    g = 2.0 * lam * beta2d.copy()
    L2 = float((beta2d ** 2).sum())
    f_data = 0.0
    for jj, vv, y, w in zip(tids_list, vals_list, labels, weights):
        jj = np.asarray(jj, dtype=np.int64)
        vv = np.asarray(vv, dtype=np.float64)
        s = beta2d[:, 0] + (beta2d[:, jj + 1] * vv).sum(axis=1)
        mx = s.max()
        lse = mx + np.log(np.exp(s - mx).sum())
        P = np.exp(s - lse)
        f_data += w * (s[y] - lse)
        gv = P.copy()
        gv[y] -= 1.0
        gv *= w
        g[:, 0] += gv
        g[:, jj + 1] += gv[:, None] * vv[None, :]
    return lam * L2 - f_data, g.ravel()
