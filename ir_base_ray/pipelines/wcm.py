"""Weighted Correspondence Model (WCM,
``topicmodels/correspondenceModels/weightedCorrespondenceModel.java``) —
the correspondence family's variational member: each parent (article)
thread owns a Dirichlet word-topic posterior λ (K×V, the DCM side) shared
with its comments; parent topic proportions γ and per-comment proportions π
are optimised in log space by L-BFGS, with a per-comment ζ coupling
E_q[γ·π]/(Σγ·Σπ).

Transcribed semantics (line refs into weightedCorrespondenceModel.java):

- init (:70-110 + ``_ParentDoc4DCM.setTopics4Variational``): φ rows are
  ``Utils.randomize``(α)-normalised; γ/π = α + Σφ·v; λ = β + parent AND
  child φ·v contributions.
- E-step per parent unit (:236-272, children return 0): per variational
  iteration [ηParent, γ, πChild, ζ, ηChild, λ]:
  - φ_parent ∝ exp(ψ(γ_k) + ψ(λ_kw) − ψ(Σλ_k)), floor 1e-20 below
    logsum−200 (:293-318);
  - γ: L-BFGS over log γ (m=4, eps 1e-2) on the transcribed
    ``gammaFuncGradientVal`` (:374-442) — including its constant-gradient
    bookkeeping exactly;
  - π per child: L-BFGS over log π on ``piFuncGradientVal`` (:563-628) —
    REFERENCE BUGS KEPT: the prior and token gradient terms use
    ``digamma`` where the ELBO's Hessian calls for ``trigamma``, and the
    token constant term mixes a v-weighted and an unweighted factor;
  - ζ = (γ·π)/(Σγ·Σπ) (:630-638);
  - φ_child ∝ exp(ψ(γ_k) + ψ(π_k) + ψ(λ_kw) − ψ(Σλ_k)) (:640-700);
  - λ = β + Σ_parent φv + Σ_children φv (:445-506).
- stats (:274-291): α-stat += ψ(γ)−ψ(Σγ), β-stat += ψ(λ)−ψ(Σλ),
  α_c-stat += ψ(π)−ψ(Σπ).
- M-step (:711-726): ONLY β updates, and only every 5th EM iteration
  (``iter%5!=4 return``); α/α_c updates are commented out in the
  reference. β Newton = ``updateParamViaNewtonMethod`` (:764-815) with its
  never-reset ``diff`` quirk (once any step exceeds the tolerance the loop
  runs to the iteration cap).
- EM loop (:127-172): fixed number of iterations; the optional
  likelihood-based stop (m_converge>0) is not used here (converge
  disabled), so the ~100-line ELBO is exercised through the update
  equations it derives rather than re-transcribed.

Distributed shape: a unit (parent + comments) owns all its variational
state — no corpus-level tables besides the tiny (α, α_c, β) — so units are
embarrassingly parallel per EM round; β-stat partials sum on the driver in
fixed block order. Deterministic (seeded φ inits per unit index).
"""

from __future__ import annotations

from math import lgamma

import numpy as np

import ray

from ir_base_ray.functions.gammamath import digamma, trigamma
from ir_base_ray.pipelines.linear import lbfgs_minimize


def _psi(a):
    return np.array([digamma(float(x)) for x in np.atleast_1d(a)])


def _randomize_rows(n, K, base, rng):
    v = base + rng.random((n, K))
    return v / v.sum(axis=1, keepdims=True)


def _init_unit(parent_vec, child_vecs, K, V, alpha, beta, rng):
    p_tids = np.asarray(parent_vec[0], dtype=np.int64)
    p_vals = np.asarray(parent_vec[1], dtype=np.float64)
    phi_p = _randomize_rows(len(p_tids), K, alpha, rng)
    gamma = np.full(K, alpha) + (phi_p * p_vals[:, None]).sum(axis=0)
    lam = beta.copy()
    np.add.at(lam.T, p_tids, p_vals[:, None] * phi_p)
    children = []
    for (c_tids, c_vals) in child_vecs:
        ct = np.asarray(c_tids, dtype=np.int64)
        cv = np.asarray(c_vals, dtype=np.float64)
        phi_c = _randomize_rows(len(ct), K, alpha, rng)
        pi = np.full(K, alpha) + (phi_c * cv[:, None]).sum(axis=0)
        np.add.at(lam.T, ct, cv[:, None] * phi_c)
        children.append([ct, cv, phi_c, pi, 1.0])
    return [p_tids, p_vals, phi_p, gamma, lam, children]


def _update_eta_parent(us, K):
    p_tids, p_vals, phi_p, gamma, lam, _ch = us
    lam_topic = lam.sum(axis=1)
    a = _psi(gamma)[None, :] + np.vectorize(digamma)(lam[:, p_tids].T) \
        - _psi(lam_topic)[None, :]
    mx = a.max(axis=1, keepdims=True)
    ls = mx[:, 0] + np.log(np.exp(a - mx).sum(axis=1))
    out = np.where(a - ls[:, None] < -200, 1e-20, np.exp(a - ls[:, None]))
    us[2] = out


def _gamma_fg(us, alpha, K):
    """Transcribed ``gammaFuncGradientVal`` → (f, g) over log γ."""
    p_tids, p_vals, phi_p, _gamma, lam, children = us
    sum_p = (phi_p * p_vals[:, None]).sum(axis=0)        # Σ_n φ_p v per k
    child_terms = []
    for (ct, cv, phi_c, pi, zeta) in children:
        sc = (phi_c * cv[:, None]).sum(axis=0)
        child_terms.append((sc, pi, zeta))

    def fg(g):
        eg = np.exp(g)
        S = float(eg.sum())
        psi_e = _psi(eg)
        psi_S = digamma(S)
        tri_e = np.array([trigamma(float(x)) for x in eg])
        tri_S = trigamma(S)
        f = -lgamma(S)
        f += float(((alpha - eg) * (psi_e - psi_S)).sum())
        f += float(sum(lgamma(float(x)) for x in eg))
        const = float(((alpha - eg) * tri_S).sum())
        grad = (alpha - eg) * tri_e
        f += float((sum_p * (psi_e - psi_S)).sum())
        grad = grad + sum_p * tri_e
        const += float(sum_p.sum()) * tri_S
        for (sc, pi, zeta) in child_terms:
            pi_sum = float(pi.sum())
            dot = float(pi @ eg)
            f += float((sc * (psi_e - psi_S)).sum())
            f -= float(sc.sum()) * dot / (pi_sum * S * zeta)
            grad = grad + sc * tri_e
            const += float(sc.sum()) * tri_S
            temp = pi * S - dot
            grad = grad - sc * temp / (pi_sum * S * S * zeta)
        g_out = -((grad - const) * eg)
        return -f, g_out

    return fg


def _pi_fg(us, child, alpha_c, K):
    """Transcribed ``piFuncGradientVal`` (digamma-for-trigamma bugs kept)."""
    gamma = us[3]
    gamma_sum = float(gamma.sum())
    (ct, cv, phi_c, _pi, zeta) = child
    sc = (phi_c * cv[:, None]).sum(axis=0)               # Σ φ_c v per k
    sc_unw = phi_c.sum(axis=0)                           # Σ φ_c (no v)

    def fg(p):
        ep = np.exp(p)
        S = float(ep.sum())
        psi_e = _psi(ep)
        psi_S = digamma(S)
        f = -lgamma(S)
        f += float(((alpha_c - 1.0) * (psi_e - psi_S)).sum())
        f -= float(((ep - 1.0) * (psi_e - psi_S)).sum())
        f += float(sum(lgamma(float(x)) for x in ep))
        # reference quirk: digamma where trigamma belongs
        const = float(((alpha_c - ep) * psi_S).sum())
        grad = (alpha_c - ep) * psi_e
        dot = float(ep @ gamma)
        f += float((sc * (psi_e - psi_S)).sum())
        f -= float(sc.sum()) * dot / (S * gamma_sum * zeta)
        # token constant term mixes v-weighted and unweighted (quirk)
        const += float((sc * psi_e).sum()) + float(sc_unw.sum()) * psi_S
        temp = gamma * S - dot
        grad = grad - sc * temp / (S * S * gamma_sum * zeta)
        g_out = -((grad - const) * ep)
        return -f, g_out

    return fg


def _update_lambda(us, beta):
    p_tids, p_vals, phi_p, _g, _lam, children = us
    lam = beta.copy()
    np.add.at(lam.T, p_tids, p_vals[:, None] * phi_p)
    for (ct, cv, phi_c, _pi, _z) in children:
        np.add.at(lam.T, ct, cv[:, None] * phi_c)
    us[4] = lam


@ray.remote
def _wcm_block(units, state, alpha, alpha_c, beta, K, V, var_max_iter,
               seed):
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[0, 0, 0, 0]))
    if state is None:
        state = [_init_unit(pv, cvs, K, V, float(alpha[0]), beta, rng)
                 for (pv, cvs) in units]
    else:
        state = [[u[0], u[1], u[2].copy(), u[3].copy(), u[4].copy(),
                  [[c[0], c[1], c[2].copy(), c[3].copy(), c[4]]
                   for c in u[5]]] for u in state]
    a_stat = np.zeros(K)
    ac_stat = np.zeros(K)
    b_stat = np.zeros((K, V))
    # L-BFGS line searches probe arbitrary exp(log-param) points, which can
    # transiently hit the digamma recurrence poles — the Armijo check
    # rejects the resulting NaN f-values, so only the warnings need muting
    np.seterr(divide="ignore", invalid="ignore")
    for us in state:
        for _ in range(var_max_iter):
            _update_eta_parent(us, K)
            fg = _gamma_fg(us, alpha, K)
            g_new, _f, _n = lbfgs_minimize(fg, np.log(us[3]), m=4,
                                           gtol=1e-2, max_iter=50)
            us[3] = np.exp(g_new)
            for child in us[5]:
                fg_c = _pi_fg(us, child, alpha_c, K)
                p_new, _f, _n = lbfgs_minimize(fg_c, np.log(child[3]),
                                               m=4, gtol=1e-2, max_iter=50)
                child[3] = np.exp(p_new)
            g_sum = float(us[3].sum())
            for child in us[5]:
                child[4] = float(us[3] @ child[3]) \
                    / (g_sum * float(child[3].sum()))
            lam_topic = us[4].sum(axis=1)
            psi_g = _psi(us[3])
            psi_lt = _psi(lam_topic)
            for child in us[5]:
                ct = child[0]
                a = psi_g[None, :] + _psi(child[3])[None, :] \
                    + np.vectorize(digamma)(us[4][:, ct].T) \
                    - psi_lt[None, :]
                mx = a.max(axis=1, keepdims=True)
                ls = mx[:, 0] + np.log(np.exp(a - mx).sum(axis=1))
                child[2] = np.where(a - ls[:, None] < -200, 1e-20,
                                    np.exp(a - ls[:, None]))
            _update_lambda(us, beta)
        # collectStats (:274-291)
        g = us[3]
        a_stat += _psi(g) - digamma(float(g.sum()))
        lam = us[4]
        lam_sum = lam.sum(axis=1)
        for k in range(K):
            b_stat[k] += np.vectorize(digamma)(lam[k]) \
                - digamma(float(lam_sum[k]))
        for child in us[5]:
            pi = child[3]
            ac_stat += _psi(pi) - digamma(float(pi.sum()))
    return state, a_stat, ac_stat, b_stat, len(units)


def _newton_param(param, multiplier, constant, *, var_converge=1e-6,
                  max_iter=30):
    """``updateParamViaNewtonMethod`` (:764-815), never-reset diff kept."""
    param = param.copy()
    diff = 0.0
    for _ in range(max_iter):
        S = float(param.sum())
        grad = multiplier * (digamma(S) - _psi(param)) + constant
        diag = -multiplier * np.array([trigamma(float(x)) for x in param])
        hess_c = multiplier * trigamma(S)
        inv_sum = float((1.0 / diag).sum())
        gd_sum = float((grad / diag).sum())
        c = gd_sum / (1.0 / hess_c + inv_sum)
        upd = (grad - c) / diag
        diff = max(diff, float(np.abs(upd).max()))
        param = param - upd
        if diff < var_converge:
            break
    return param


def train_wcm(units, *, n_topics: int, vocab_size: int, n_em_iters: int = 10,
              var_max_iter: int = 5, d_alpha: float = 1.01,
              d_beta: float = 1.01, seed: int = 59, n_blocks: int = 4):
    """units: list of (parent_vec, [child_vec...]). → dict with β, per-unit
    parent γ (topic proportions) and per-child π."""
    K, V = n_topics, vocab_size
    alpha = np.full(K, d_alpha)
    alpha_c = np.full(K, d_alpha)
    beta = np.full((K, V), d_beta)
    n_blocks = max(1, min(n_blocks, len(units)))
    splits = [units[i::n_blocks] for i in range(n_blocks)]
    refs = [ray.put(s) for s in splits]
    states = [None] * n_blocks
    n_parents = len(units)

    for it in range(n_em_iters):
        outs = ray.get([
            _wcm_block.remote(r, states[i], alpha, alpha_c, beta, K, V,
                              var_max_iter, seed + i)
            for i, r in enumerate(refs)
        ])
        b_stat = np.zeros((K, V))
        for i, (st, _a, _ac, bs, _n) in enumerate(outs):
            states[i] = st
            b_stat += bs
        if it % 5 == 4:                     # calculate_M_step gate (:713)
            for k in range(K):
                beta[k] = _newton_param(beta[k], n_parents, b_stat[k])

    gammas = [None] * len(units)
    pis = [None] * len(units)
    for b in range(n_blocks):
        for d, us in enumerate(states[b]):
            gi = b + d * n_blocks
            g = us[3]
            gammas[gi] = g / g.sum()
            pis[gi] = [c[3] / c[3].sum() for c in us[5]]
    return {"beta": beta, "parent_gamma": gammas, "child_pi": pis,
            "block_split": n_blocks}
