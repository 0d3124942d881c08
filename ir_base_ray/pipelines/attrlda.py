"""Attribute-aware LDA — ``topicmodels/multithreads/LDA/
AttributeAwareLDA_VarMultiThread.java`` + ``topicmodels/
posteriorRegularization/PairwiseAttributeConstraints.java``: variational
LDA whose topics come in attribute PAIRS (even/odd = the two attributes of
one aspect), with a per-word posterior-regularization projection that
discourages a word's topic when its PAIRED topic already holds the doc's
mass — driving the pair apart into distinct attributes.

Transcribed semantics (the non-segment path — the segment path needs the
aspect-annotated inputs of the reference's AspectAnalyzer and is N/A for
the driver tables; the reference itself only runs it when
``d.hasSegments()``):

- E-step per doc (``calculate_E_step`` :154-233): initEstPhi softmax
  (:76-93, incl. the constant ψ(0.1) term that cancels), running
  tAssignments; per word: remove-self, unregularized
  φ_n ∝ exp(v·logβ + ψ(γ)), then the PR projection, then re-add; after
  each sweep tAssignments are recomputed fresh and γ = α + tAssign;
- the PR dual (``PosteriorConstraints.getValue/getGradient`` :50-110 with
  the diagonal constraint features of ``PairwiseAttributeConstraints``:
  φ_ZX[i][i] = tAssign[pair(i)], pair = even↔odd (the ``reset`` :42-49
  cross-wiring), b = 0): minimize over λ ≥ 0
      log Σ_i p_i·e^{−s_i·λ_i} + ε‖λ‖²,  ε = 0.1,
  by projected gradient with Armijo line search (the reference's
  ProjectedGradientDescent, max 50 iterations, g-tol 1e-5); the
  regularized posterior q_i ∝ p_i·e^{−s_i·λ_i};
- the PR only activates after a warm-up round (``m_round>20`` :66 —
  parameterized here);
- topic count = aspects × attributeSize (ctor :243-249; attributeSize=2).

Execution shape: per-iteration pinned-block E-step tasks against the
broadcast logβ, K×V partial merge in fixed order (the same device as
pipelines/plsa.py); docs are independent given β. α is held fixed at its
init (the worker-based reference variant never re-estimates it either —
its calculate_M_step(0) path). Seeded β init replaces the unseeded
randomize (house policy).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ir_base_ray.functions.gammamath import digamma


def solve_pair_dual(p: np.ndarray, s: np.ndarray, *, eps: float = 0.1,
                    max_iter: int = 50, gtol: float = 1e-5):
    """min_{λ≥0} log Σ p_i e^{−s_i λ_i} + ε‖λ‖² (projected gradient with
    Armijo). Returns (λ*, q) with q the normalized regularized posterior."""
    K = p.size
    lam = np.zeros(K)

    def value(l_):
        w = p * np.exp(-s * l_)
        return np.log(max(w.sum(), 1e-300)) + eps * float(l_ @ l_), w

    f, w = value(lam)
    for _ in range(max_iter):
        q = w / max(w.sum(), 1e-300)
        grad = 2.0 * eps * lam - s * q
        # projected gradient norm (only descent directions that stay ≥0)
        pg = np.where((lam > 0) | (grad < 0), grad, 0.0)
        if float(np.abs(pg).max(initial=0.0)) <= gtol:
            break
        step = 1.0
        for _ls in range(30):
            cand = np.maximum(lam - step * grad, 0.0)
            f_new, w_new = value(cand)
            if f_new <= f - 1e-4 * float(grad @ (lam - cand)):
                break
            step *= 0.5
        else:
            break
        lam, f, w = cand, f_new, w_new
    q = w / max(w.sum(), 1e-300)
    return lam, q


def _pair_index(K: int) -> np.ndarray:
    """even↔odd pairing (attributeSize=2; the reset() cross-wiring)."""
    out = np.arange(K)
    out[0::2] += 1
    out[1::2] -= 1
    return out


def _estep_doc(tids, vals, log_beta, alpha, var_max_iter, pr_active,
               eps=0.1):
    K = log_beta.shape[0]
    pair = _pair_index(K)
    lb = log_beta[:, tids]                      # (K, n)
    n_w = tids.size
    # initEstPhi (ψ(0.1) constant cancels in the softmax, kept for parity)
    logphi = vals[None, :] * lb + digamma(0.1)
    logphi -= logphi.max(axis=0, keepdims=True)
    phi = np.exp(logphi)
    phi /= phi.sum(axis=0, keepdims=True)       # (K, n)
    t_assign = (phi * vals[None, :]).sum(axis=1)
    gamma = alpha + t_assign
    for _ in range(var_max_iter):
        for n in range(n_w):
            t_assign -= phi[:, n] * vals[n]
            lp = vals[n] * lb[:, n] + digamma(gamma)
            lp -= lp.max()
            p = np.exp(lp)
            p /= p.sum()
            if pr_active:
                s = t_assign[pair]
                _lam, p = solve_pair_dual(p, s, eps=eps)
            phi[:, n] = p
            t_assign += phi[:, n] * vals[n]
        t_assign = (phi * vals[None, :]).sum(axis=1)
        gamma = alpha + t_assign
    return phi, gamma


@ray.remote
def _attr_block_estep(tbl: pa.Table, log_beta, alpha, var_max_iter,
                      pr_active):
    """Per-block E-step: returns the K×V sufficient-statistic partial and
    the per-doc γ matrix."""
    tcol = tbl.column("tids")
    vcol = tbl.column("vals")
    tcol = tcol.combine_chunks() if isinstance(tcol, pa.ChunkedArray) else tcol
    vcol = vcol.combine_chunks() if isinstance(vcol, pa.ChunkedArray) else vcol
    K, V = log_beta.shape
    partial = np.zeros((K, V))
    gammas = []
    for jj, vv in zip(tcol.to_pylist(), vcol.to_pylist()):
        jj = np.asarray(jj, dtype=np.int64)
        vv = np.asarray(vv, dtype=np.float64)
        if jj.size == 0:
            gammas.append(alpha.copy())
            continue
        phi, gamma = _estep_doc(jj, vv, log_beta, alpha, var_max_iter,
                                pr_active)
        np.add.at(partial.T, jj, (phi * vv[None, :]).T)
        gammas.append(gamma)
    return partial, np.stack(gammas) if gammas else np.zeros((0, K))


def train_attr_lda(vec_ds, *, n_aspects: int, vocab_size: int,
                   attr_size: int = 2, n_iters: int = 8,
                   var_max_iter: int = 5, pr_start: int = 2,
                   alpha: float = 1.05, beta: float = 1.01,
                   seed: int = 59):
    """vectors Dataset (doc_id, tids, vals) → dict with the K×V
    ``topic_term`` (K = n_aspects·attr_size), per-block doc γs, and the PR
    activation round. PR projections run from round ``pr_start`` on (the
    reference gates at round 20 of its longer schedule)."""
    K = n_aspects * attr_size
    V = vocab_size
    blocks = [ray.put(b) for b in vec_ds.iter_batches(batch_format="pyarrow",
                                                      batch_size=None)]
    rng = np.random.default_rng(seed)
    sstat = rng.random((K, V)) + (beta - 1.0)
    log_beta = np.log(sstat / sstat.sum(axis=1, keepdims=True))
    alpha_vec = np.full(K, alpha)

    gammas = None
    for it in range(n_iters):
        pr_active = it >= pr_start
        lb_ref = ray.put(log_beta)
        outs = ray.get([
            _attr_block_estep.remote(b, lb_ref, alpha_vec, var_max_iter,
                                     pr_active)
            for b in blocks
        ])
        sstat = np.full((K, V), beta - 1.0)
        gammas = []
        for partial, g in outs:                # fixed order merge
            sstat += partial
            gammas.append(g)
        log_beta = np.log(sstat / sstat.sum(axis=1, keepdims=True))
    return {"topic_term": np.exp(log_beta), "doc_gammas": gammas,
            "pair_index": _pair_index(K), "pr_start": pr_start}
