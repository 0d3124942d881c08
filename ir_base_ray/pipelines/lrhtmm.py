"""LR-HTMM — HTMM with logistic-regression topic-transition modeling
(``topicmodels/markovmodel/LRHTMM.java`` +
``HMMs/LRFastRestrictedHMM.java``), SURVEY.md §2.7 R7 tail.

The global switch probability ε of HTMM becomes per-transition:
ε_t = logistic(ω₀ + ω·f_{t−1}) over the 4 sentence-transition features the
reference analyzer attaches to sentence t−1 (``_Doc.stn_fv_size = 4``,
``HTSMAnalyzer.setStnFvs`` :303-360):

  f[0] = cosine(stn_{t−1}, stn_t) tf vectors
  f[1] = (L1(stn_{t−1}) − L1(stn_t)) / max(·,·)
  f[2] = t / T (position)
  f[3] = sign(cos(stn_t, stn_{t+1}) − cos(stn_{t−1}, stn_t)); 0 for the last
         transition or ties

Forward/backward/Viterbi are the HTMM recursions of ``pipelines/htmm.py``
with ε indexed per step exactly like ``FastRestrictedHMM`` (forward at t
uses ε_t, backward at t uses ε_{t+1}, including the reference's
sum-seeded-with-logε backward quirk). E-step additionally stores the
per-transition posterior switch mass q_t = Σ_{i<K} p_dwzpsi[t][i]
(``LRHTMM.accEpsilonStat`` :57-64); M-step (iter>0) fits ω by minimising
λ/2·‖ω‖² + Σ_t CrossEntropy(q_t, logistic(ω·f)) with L-BFGS (m=4,
gradient-tolerance 1e-2 — ``estimateOmega``/``calcOmegaFuncGradient``
:72-120; ω starts at 0 and persists across EM rounds). The reference's
global ε M-step divides 0/0 (its lot/total stats are never accumulated) and
the resulting NaN is never read — the quirk is dropped, not reproduced.

Distributed shape: doc blocks pinned once; each EM round runs one remote
E-step task per block (returning φ partials, θ′, loglik and the block's
(features, q) transition table, which stays in the object store); the ω fit
then runs distributed (f, g) partials per block per L-BFGS iteration with
fixed-order driver sums (same pattern as ``pipelines/linear.py``), so no
corpus-sized gather ever reaches the driver.
"""

from __future__ import annotations

import numpy as np

import ray

from ir_base_ray.pipelines.htmm import _doc_emission, _logsumexp_rows
from ir_base_ray.pipelines.linear import lbfgs_minimize


def _sparse_cos(a, b) -> float:
    (ja, va), (jb, vb) = a, b
    na = float(np.sqrt((np.asarray(va) ** 2).sum())) if len(ja) else 0.0
    nb = float(np.sqrt((np.asarray(vb) ** 2).sum())) if len(jb) else 0.0
    if na == 0 or nb == 0:
        return 0.0
    da = {int(t): float(v) for t, v in zip(ja, va)}
    dot = sum(da.get(int(t), 0.0) * float(v) for t, v in zip(jb, vb))
    return dot / (na * nb)


def transit_features(sents) -> np.ndarray:
    """(T−1, 4) topical transition features; row t−1 gates the transition
    into sentence t (``setStnFvs``)."""
    T = len(sents)
    if T < 2:
        return np.zeros((0, 4))
    F = np.zeros((T - 1, 4))
    l1 = [float(np.asarray(v).sum()) for _j, v in sents]
    cos = [_sparse_cos(sents[i], sents[i + 1]) for i in range(T - 1)]
    for i in range(1, T):
        F[i - 1, 0] = cos[i - 1]
        m = max(l1[i - 1], l1[i])
        F[i - 1, 1] = (l1[i - 1] - l1[i]) / m if m > 0 else 0.0
        F[i - 1, 2] = i / T
        if i < T - 1:
            if cos[i] > cos[i - 1]:
                F[i - 1, 3] = 1.0
            elif cos[i] < cos[i - 1]:
                F[i - 1, 3] = -1.0
    return F


def _epsilons(F: np.ndarray, omega: np.ndarray) -> np.ndarray:
    """ε_t = logistic(ω₀ + F[t−1]·ω[1:]) for t = 1..T−1 (``initEpsilons``)."""
    return 1.0 / (1.0 + np.exp(-(omega[0] + F @ omega[1:])))


def doc_forward_backward_lr(emission: np.ndarray, theta_log: np.ndarray,
                            eps: np.ndarray):
    """HTMM restricted FB with per-transition ε (ε[t−1] gates step t);
    recursions and quirks identical to ``htmm.doc_forward_backward``."""
    T, K = emission.shape
    alpha = np.full((T, 2 * K), -np.inf)
    norms = np.empty(T)
    a0 = emission[0] + theta_log
    n0 = _logsumexp_rows(a0[None, :])[0]
    alpha[0, :K] = a0 - n0
    norms[0] = n0
    loglik = n0
    log_e = np.log(eps)
    log_1e = np.log(1.0 - eps)
    for t in range(1, T):
        fresh = log_e[t - 1] + theta_log + emission[t]
        kept = log_1e[t - 1] + np.logaddexp(alpha[t - 1, :K],
                                            alpha[t - 1, K:]) + emission[t]
        n = _logsumexp_rows(np.concatenate([fresh, kept])[None, :])[0]
        alpha[t, :K] = fresh - n
        alpha[t, K:] = kept - n
        norms[t] = n
        loglik += n
    beta = np.zeros((T, 2 * K))
    for t in range(T - 2, -1, -1):
        s = np.logaddexp(log_e[t], _logsumexp_rows(
            (theta_log + emission[t + 1] + beta[t + 1, :K])[None, :])[0])
        b = np.logaddexp(log_1e[t] + beta[t + 1, :K] + emission[t + 1], s) \
            - norms[t]
        beta[t, :K] = b
        beta[t, K:] = b
    ab = alpha + beta
    norm = _logsumexp_rows(ab)
    p = np.exp(ab - norm[:, None])
    return p, loglik


def viterbi_path_lr(emission: np.ndarray, theta_log: np.ndarray,
                    eps: np.ndarray) -> np.ndarray:
    """HTMM Viterbi with per-transition ε."""
    T, K = emission.shape
    alpha = np.full((T, 2 * K), -np.inf)
    back = np.zeros((T, 2 * K), dtype=np.int64)
    alpha[0, :K] = emission[0] + theta_log
    log_e = np.log(eps)
    log_1e = np.log(1.0 - eps)
    for t in range(1, T):
        prev_best = int(np.argmax(alpha[t - 1]))
        alpha[t, :K] = alpha[t - 1, prev_best] + theta_log + emission[t] \
            + log_e[t - 1]
        back[t, :K] = prev_best
        keep_prev = np.where(alpha[t - 1, :K] > alpha[t - 1, K:],
                             np.arange(K), np.arange(K) + K)
        alpha[t, K:] = alpha[t - 1][keep_prev] + log_1e[t - 1] + emission[t]
        back[t, K:] = keep_prev
    path = np.empty(T, dtype=np.int64)
    path[T - 1] = int(np.argmax(alpha[T - 1]))
    for t in range(T - 2, -1, -1):
        path[t] = back[t + 1, path[t + 1]]
    return path % K


@ray.remote
def _lrhtmm_block(doc_sents, feats, thetas, log_phi, omega, K, V, alpha):
    """E-step for one block → (φ partial, loglik, θ′, q per transition)."""
    phi_stat = np.zeros((K, V))
    ll = 0.0
    new_thetas = np.empty_like(thetas)
    qs = []
    for d, sents in enumerate(doc_sents):
        em = _doc_emission(sents, log_phi)
        F = feats[d]
        eps = _epsilons(F, omega) if len(F) else np.empty(0)
        if len(sents) == 1:
            # single-sentence doc: no transitions; posterior is the t=0 row
            a0 = em[0] + thetas[d]
            n0 = _logsumexp_rows(a0[None, :])[0]
            p = np.zeros((1, 2 * K))
            p[0, :K] = np.exp(a0 - n0)
            doc_ll = n0
        else:
            p, doc_ll = doc_forward_backward_lr(em, thetas[d], eps)
        ll += doc_ll
        if len(sents) > 1:
            qs.append(p[1:, :K].sum(axis=1))    # accEpsilonStat: q_t
        else:
            qs.append(np.empty(0))
        pz = p[:, :K] + p[:, K:]
        for t, (jj, vv) in enumerate(sents):
            if len(jj):
                phi_stat[:, jj] += pz[t][:, None] * vv[None, :]
        sstat = (alpha - 1.0) + p[:, :K].sum(axis=0)
        new_thetas[d] = np.log(sstat / sstat.sum())
    return phi_stat, ll, new_thetas, qs


@ray.remote
def _omega_fg_block(F_all: np.ndarray, q_all: np.ndarray, omega: np.ndarray):
    """Unregularized cross-entropy partial + gradient for one block's
    transition table (``calcOmegaFuncGradient`` data term)."""
    g = np.zeros_like(omega)
    if len(F_all) == 0:
        return 0.0, g
    p = _epsilons(F_all, omega)
    f = -float((q_all * np.log(p) + (1.0 - q_all) * np.log(1.0 - p)).sum())
    d = p - q_all
    g[0] = float(d.sum())
    g[1:] = d @ F_all
    return f, g


def train_lrhtmm(doc_sentence_vecs, *, n_topics: int, vocab_size: int,
                 n_iters: int = 15, alpha: float = 1.05, beta: float = 1.01,
                 lam: float = 0.9, seed: int = 37, n_blocks: int = 4):
    """Same contract as ``train_htmm``; returns ω and per-doc transition ε
    instead of the scalar ε. λ default 0.9 per ``TopicModelMain.java:74``."""
    K, V = n_topics, vocab_size
    rng = np.random.default_rng(seed)
    phi0 = rng.random((K, V)) + (beta - 1.0)
    log_phi = np.log(phi0 / phi0.sum(axis=1, keepdims=True))
    omega = np.zeros(5)                        # bias + 4 features, init 0

    n_blocks = max(1, min(n_blocks, len(doc_sentence_vecs)))
    blocks = [doc_sentence_vecs[i::n_blocks] for i in range(n_blocks)]
    feats = [[transit_features(sents) for sents in b] for b in blocks]
    block_refs = [ray.put(b) for b in blocks]
    feat_refs = [ray.put(f) for f in feats]
    # flattened per-block transition tables for the omega partials
    F_refs = [ray.put(np.vstack(f) if f and sum(len(x) for x in f)
                      else np.zeros((0, 4))) for f in feats]
    thetas = [np.full((len(b), K), -np.log(K)) for b in blocks]

    trace = []
    for it in range(n_iters):
        phi_ref = ray.put(log_phi)
        outs = ray.get([
            _lrhtmm_block.remote(ref, fref, thetas[i], phi_ref, omega, K, V,
                                 alpha)
            for i, (ref, fref) in enumerate(zip(block_refs, feat_refs))
        ])
        phi_stat = np.full((K, V), beta - 1.0)
        ll = 0.0
        q_refs = []
        for i, (p_part, ll_part, th, qs) in enumerate(outs):
            phi_stat += p_part
            ll += ll_part
            thetas[i] = th
            q_refs.append(ray.put(
                np.concatenate(qs) if qs else np.empty(0)))
        trace.append(ll)
        log_phi = np.log(phi_stat) - np.log(phi_stat.sum(axis=1,
                                                         keepdims=True))
        if it > 0:
            def value_grad(x):
                outs = ray.get([_omega_fg_block.remote(fr, qr, x)
                                for fr, qr in zip(F_refs, q_refs)])
                f = 0.5 * lam * float(x @ x)
                g = lam * x
                for f_p, g_p in outs:          # fixed order: deterministic
                    f += f_p
                    g = g + g_p
                return f, g

            omega, _f, _n = lbfgs_minimize(value_grad, omega, m=4,
                                           gtol=1e-2, max_iter=100)

    paths = []
    eps_out = []
    for b, f, th in zip(blocks, feats, thetas):
        doc_paths, doc_eps = [], []
        for d, sents in enumerate(b):
            em = _doc_emission(sents, log_phi)
            eps = _epsilons(f[d], omega) if len(f[d]) else np.empty(0)
            if len(sents) == 1:
                doc_paths.append(np.array([int(np.argmax(em[0] + th[d]))]))
            else:
                doc_paths.append(viterbi_path_lr(em, th[d], eps))
            doc_eps.append(eps)
        paths.append(doc_paths)
        eps_out.append(doc_eps)
    return {"log_topic_term": log_phi, "omega": omega, "thetas": thetas,
            "paths": paths, "epsilons": eps_out, "loglik_trace": trace,
            "block_split": n_blocks}
