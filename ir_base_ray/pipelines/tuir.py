"""TUIR / ETBIR — topic-based user & item representation learning
(``topicmodels/embeddingModel/TUIR.java``, run via ``mains/TUIRMain.java``;
the ETBIR model: explainable recommendation with topic embeddings), the last
member of the SURVEY.md §2.7 R7 enumeration.

Tripartite variational model over reviews d = (user u, item i, text):
θ_d ~ N(P_u·γ̃_i, ρ⁻¹I) (CTM-style doc posterior N(μ_d, diag Σ_d), ζ_d),
item topic profile γ_i ~ Dir(α) (variational Dirichlet η_i, γ̃ = η/η₀),
user projection rows P_u[k] ~ N(λe_k, σ⁻¹I) (variational N(ν_P[k], Σ_P) —
one covariance shared by all K rows, ``update_SigmaP`` :392-415).

Transcribed update semantics (line refs into TUIR.java):

- doc loop (``varInference4Doc`` :237-265): [φ, ζ, μ, ζ, Σθ, ζ] with
  per-doc likelihood convergence. φ/ζ are the CTM closed forms; μ and
  √Σθ are ADAGRAD ascents (stepsize 1e-4, H starts at 1, Gauss-Seidel
  within the k loop for μ, ≤30/≤20 inner iterations, relative-f 1e-6 stop,
  NaN/Inf warning abort) — :300-390 transcribed exactly, including the
  f-value mixing partially-updated μ entries.
- user (``update_SigmaP``/``update_nu``): Σ_P = (σI + ρ·Σ_{i∈I_u}
  (diag η + ηηᵀ)/(η₀(η₀+1)))⁻¹; ν_P[k] = Σ_P·(ρ·Σ_{i∈I_u} μ_{d(u,i),k}·γ̃_i
  + σλ·e_k) (diagonal-λ default). REFERENCE BUG FIXED (documented): the
  shipped ``update_nu`` :417-425 and ``update_eta`` :466-468 call
  ``m_mapByUser.get(idx)`` / ``m_mapByItem.get(itemIdx)`` WITHOUT assigning
  the result, so their neighbour lists stay empty and the user/item
  components never receive data. The assignment is restored here (matching
  the correctly-written ``update_SigmaP`` :396-398 and the published model);
  everything else is as-shipped.
- item (``update_eta`` :459-550): ADAGRAD in log-η space with the exact
  4-term gradient and snapshot-then-update-all-k ordering.
- per-entity ELBO terms (:556-634): transcribed literally, including the
  per-doc term using the UNIQUE-term count (``getDocLength``) against logζ
  while the μ update's moment uses the total token count.
- stats + M-step (:636-700 + ``LDA_Variational.calculate_M_step``): word
  sstat → logβ; α Newton over the ITEM ηs with corpus size = #items
  (``getCorpusSize`` :551-554, reusing ``lda_variational._alpha_newton``);
  λ/ρ/σ updates are disabled in the reference defaults (fix-λ flag true,
  ρ/σ lines commented out) — same here.
- inits (``_Doc4ETBIR``/``_User4ETBIR``/``_Product4ETBIR``
  ``setTopics4Variational``): μ = 1+U, Σ = 1+0.5U, φ rows and ν_P rows and
  η are ``Utils.randomize`` (value+U, L1-normalised); seeded numpy for the
  reference's unseeded ``Math.random``.

Distributed execution: each outer E iteration runs three fan-out phases —
doc blocks (pinned once, persistent φ/μ/Σ/ζ state per block), user blocks,
item blocks — with the small parameter tables (η: I×K, ν_P: U×K×K, Σ_P:
U×K×K, logβ) broadcast per phase and partials summed in fixed block order.
Deterministic at any block count (per-entity math depends only on broadcast
tables, not block grouping).


The reference's threaded trainer (``topicmodels/multithreads/embeddingModel/TUIR_multithread.java`` + ``EmbedModel_worker.java``) maps to this pipeline's per-block remote partials.
"""

from __future__ import annotations

from math import lgamma

import numpy as np

import ray

from ir_base_ray.functions.gammamath import digamma, trigamma
from ir_base_ray.pipelines.lda_variational import _alpha_newton


def _randomize(base: float, n: int, rng) -> np.ndarray:
    v = base + rng.random(n)
    return v / v.sum()


def _logsumexp(a):
    mx = float(np.max(a))
    return mx + np.log(np.exp(a - mx).sum())


# ------------------------------------------------------------- doc updates

def _update_phi(jj, vv, mu, log_beta):
    a = log_beta[:, jj].T + mu[None, :]
    mx = a.max(axis=1, keepdims=True)
    phi = np.exp(a - mx)
    phi /= phi.sum(axis=1, keepdims=True)
    sstat = (vv[:, None] * phi).sum(axis=0)
    return phi, sstat


def _update_zeta(mu, Sigma):
    return _logsumexp(mu + 0.5 * Sigma)


def _update_mu(mu, Sigma, zeta, sstat, norm, rho, total_len, K):
    """ADAGRAD Gauss-Seidel ascent (:300-345): norm_k = η·ν_P[k]/η₀."""
    mu = mu.copy()
    muH = np.ones(K)
    f_val, last_f = 1.0, 1.0
    it = 0
    while True:
        last_f = f_val
        f_val = 0.0
        warning = False
        for k in range(K):
            moment = total_len * np.exp(mu[k] + 0.5 * Sigma[k] - zeta)
            g = -rho * (mu[k] - norm[k]) + sstat[k] - moment
            f_val += (-0.5 * rho * (mu[k] * mu[k] - 2 * mu[k] * norm[k])
                      + mu[k] * sstat[k] - moment)
            mu[k] += 1e-4 / np.sqrt(muH[k]) * g
            muH[k] += g * g
            if not np.isfinite(f_val):
                warning = True
                break
        diff = (last_f - f_val) / last_f
        it += 1
        if warning or not (it < 30 and abs(diff) > 1e-6):
            break
    return mu


def _update_sigma_theta(mu, Sigma, zeta, rho, total_len, K):
    """ADAGRAD over √Σ (:346-390)."""
    s = np.sqrt(Sigma)
    Sigma = Sigma.copy()
    H = np.ones(K)
    f_val, last_f = 1.0, 1.0
    it = 0
    while True:
        last_f = f_val
        f_val = 0.0
        warning = False
        for k in range(K):
            moment = np.exp(mu[k] + 0.5 * Sigma[k] - zeta)
            g = -rho * s[k] - total_len * s[k] * moment + 1.0 / s[k]
            f_val += (-0.5 * rho * Sigma[k] - total_len * moment
                      + 0.5 * np.log(Sigma[k]))
            s[k] += 1e-4 / np.sqrt(H[k]) * g
            Sigma[k] = s[k] * s[k]
            H[k] += g * g
            if not np.isfinite(f_val):
                warning = True
                break
        diff = (last_f - f_val) / last_f
        it += 1
        if warning or not (it < 20 and abs(diff) > 1e-6):
            break
    return Sigma


def _doc_likelihood(jj, vv, phi, mu, Sigma, zeta, eta, nuP, SigmaP, rho, K):
    """calc_log_likelihood_per_doc (:596-634), quirks included."""
    uniq_len = len(jj)
    ll = 0.5 * K * (np.log(rho) + 1.0) - uniq_len * zeta
    eta0 = float(eta.sum())
    term1 = float((Sigma + mu * mu).sum())
    term2 = float(np.einsum("k,jk,j->", eta, nuP, mu))
    # term3: for each k, eta_j eta_l (SigmaP[j][l] + nuP[k,j] nuP[k,l])
    #        + eta_j (SigmaP[j][j] + nuP[k,j]^2)   — literal transcription
    term3 = 0.0
    diagS = np.diag(SigmaP)
    for k in range(K):
        term3 += float(eta @ SigmaP @ eta) \
            + float((eta @ nuP[k]) ** 2)
        term3 += float((eta * (diagS + nuP[k] * nuP[k])).sum())
    term4 = float(np.log(Sigma).sum())
    ll += -rho * (0.5 * term1 - term2 / eta0
                  + term3 / (2 * eta0 * (eta0 + 1.0))) + 0.5 * term4
    with np.errstate(divide="ignore", invalid="ignore"):
        lp = np.where(phi > 0, np.log(phi), 0.0)
    # sum over words: v*phi*(mu - log phi + log beta) handled by caller
    return ll, lp


def _var_inference_doc(jj, vv, state, eta, nuP, SigmaP, log_beta, rho, K,
                       var_max_iter, var_converge):
    mu, Sigma, zeta, phi = state
    total_len = float(vv.sum())
    eta0 = float(eta.sum())
    norm = nuP @ eta / eta0               # norm_k = eta . nuP[k] / eta0
    cur, last, it = 0.0, 1.0, 0
    while True:
        phi, sstat = _update_phi(jj, vv, mu, log_beta)
        zeta = _update_zeta(mu, Sigma)
        mu = _update_mu(mu, Sigma, zeta, sstat, norm, rho, total_len, K)
        zeta = _update_zeta(mu, Sigma)
        Sigma = _update_sigma_theta(mu, Sigma, zeta, rho, total_len, K)
        zeta = _update_zeta(mu, Sigma)
        ll, lp = _doc_likelihood(jj, vv, phi, mu, Sigma, zeta, eta, nuP,
                                 SigmaP, rho, K)
        words = float((vv[:, None] * phi
                       * (mu[None, :] - lp + log_beta[:, jj].T)).sum())
        cur = ll + words
        warning = not np.isfinite(cur)
        conv = (last - cur) / last if it > 0 else 1.0
        last = cur
        it += 1
        if warning or not (it < var_max_iter and abs(conv) > var_converge):
            break
    return (mu, Sigma, zeta, phi), cur


# ----------------------------------------------------- user / item updates

def _update_user(etas_of_items, mus_of_docs, rho, sigma, lam, K):
    """update_SigmaP + (fixed) update_nu for one user; etas_of_items and
    mus_of_docs are aligned lists over the user's reviews."""
    A = sigma * np.eye(K)
    for eta in etas_of_items:
        eta0 = float(eta.sum())
        A += (np.diag(eta) + np.outer(eta, eta)) * (rho / (eta0 * (eta0 + 1.0)))
    SigmaP = np.linalg.inv(A)
    etaMu = np.zeros((K, K))
    for eta, mu in zip(etas_of_items, mus_of_docs):
        eta0 = float(eta.sum())
        etaMu += np.outer(mu, eta / eta0)
    etaMu *= rho
    # nuP[k] = SigmaP @ etaMu[k] + sigma*lam*SigmaP[:,k]  (diagonal lambda)
    nuP = etaMu @ SigmaP.T + sigma * lam * SigmaP.T
    return nuP, SigmaP


def _user_likelihood(nuP, SigmaP, sigma, lam, K):
    ll = 0.0
    _sign, logdet = np.linalg.slogdet(SigmaP)
    det_term = logdet
    for k in range(K):
        temp1 = float(np.diag(SigmaP).sum() + (nuP[k] * nuP[k]).sum())
        temp1 += lam * lam - 2.0 * lam * nuP[k, k]
        ll += -0.5 * (temp1 * sigma - K) \
            + 0.5 * (K * np.log(sigma) + det_term)
    return ll


def _update_eta(eta, nuPs, SigmaPs, mus, alpha, rho, K):
    """(fixed) update_eta for one item: nuPs/SigmaPs/mus aligned over the
    item's reviews (one per reviewing user)."""
    pNuStats = np.zeros(K)
    pSumStats = np.zeros((K, K))
    for nuP, SigmaP, mu in zip(nuPs, SigmaPs, mus):
        pNuStats += nuP.T @ mu
        # sum_j SigmaP[l][k] (shared across j → K times) + nuP[j,k] nuP[j,l]
        pSumStats += K * SigmaP.T + nuP.T @ nuP
    eta = eta.copy()
    eta_log = np.log(eta)
    H = np.ones(K)
    alpha0 = float(alpha.sum())
    f_val, last_f = 1.0, 1.0
    it = 0
    while True:
        eta0 = float(eta.sum())
        dig0 = digamma(eta0)
        trig0 = trigamma(eta0)
        last_f = f_val
        f_val = -lgamma(eta0)
        G = np.zeros(K)
        warning = False
        for k in range(K):
            gT2 = float(pNuStats @ eta)
            gT3 = pSumStats[k, k] + 2.0 * float(pSumStats[:, k] @ eta)
            gT4 = float(eta @ pSumStats @ eta) \
                + float((eta * np.diag(pSumStats)).sum())
            term3 = pSumStats[k, k] + float(eta @ pSumStats[:, k])
            G[k] = (trigamma(eta[k]) * eta[k] * (alpha[k] - eta[k])
                    - trig0 * eta[k] * (alpha0 - eta0)
                    + rho * eta[k] * pNuStats[k] / eta0
                    - rho * eta[k] * gT2 / (eta0 * eta0)
                    - rho * eta[k] * gT3 / (2.0 * eta0 * (eta0 + 1.0))
                    + rho * (2.0 * eta0 + 1.0) * eta[k] * gT4
                    / (2.0 * eta0 * eta0 * (eta0 + 1.0) * (eta0 + 1.0)))
            f_val += ((alpha[k] - eta[k]) * (digamma(eta[k]) - dig0)
                      + lgamma(eta[k])
                      + rho * eta[k] * pNuStats[k] / eta0
                      - rho * eta[k] * term3 / (2.0 * eta0 * (eta0 + 1.0)))
            if not np.isfinite(f_val):
                warning = True
                break
        if not warning:
            eta_log += 1e-4 / np.sqrt(H) * G
            eta = np.exp(eta_log)
            H += G * G
        diff = (last_f - f_val) / last_f
        it += 1
        if warning or not (it < 20 and abs(diff) > 1e-6):
            break
    return eta


def _item_likelihood(eta, alpha, K):
    eta0 = float(eta.sum())
    dig0 = digamma(eta0)
    ll = lgamma(float(alpha.sum())) - lgamma(eta0)
    for k in range(K):
        ll += (alpha[k] - eta[k]) * (digamma(eta[k]) - dig0)
        ll -= lgamma(alpha[k]) - lgamma(eta[k])
    return ll


# --------------------------------------------------------- remote phases

@ray.remote
def _doc_phase(docs, states, eta_tbl, nuP_tbl, SigmaP_tbl, log_beta, rho, K,
               var_max_iter, var_converge):
    """docs: list of (jj, vv, u_idx, i_idx). → (states', mus, lik)."""
    lik = 0.0
    new_states = []
    mus = np.empty((len(docs), K))
    for n, (jj, vv, u, i) in enumerate(docs):
        st, ll = _var_inference_doc(jj, vv, states[n], eta_tbl[i],
                                    nuP_tbl[u], SigmaP_tbl[u], log_beta,
                                    rho, K, var_max_iter, var_converge)
        new_states.append(st)
        mus[n] = st[0]
        lik += ll
    return new_states, mus, lik


@ray.remote
def _user_phase(user_rows, eta_tbl, mu_tbl, rho, sigma, lam, K):
    """user_rows: list of (u_idx, [item_idx...], [doc_idx...])."""
    out = []
    lik = 0.0
    for (u, items, docs) in user_rows:
        nuP, SigmaP = _update_user([eta_tbl[i] for i in items],
                                   [mu_tbl[d] for d in docs], rho, sigma,
                                   lam, K)
        lik += _user_likelihood(nuP, SigmaP, sigma, lam, K)
        out.append((u, nuP, SigmaP))
    return out, lik


@ray.remote
def _item_phase(item_rows, nuP_tbl, SigmaP_tbl, mu_tbl, alpha, eta_tbl,
                rho, K):
    """item_rows: list of (i_idx, [user_idx...], [doc_idx...])."""
    out = []
    lik = 0.0
    for (i, users, docs) in item_rows:
        eta = _update_eta(eta_tbl[i], [nuP_tbl[u] for u in users],
                          [SigmaP_tbl[u] for u in users],
                          [mu_tbl[d] for d in docs], alpha, rho, K)
        lik += _item_likelihood(eta, alpha, K)
        out.append((i, eta))
    return out, lik


@ray.remote
def _doc_stats_phase(docs, states, eta_tbl, nuP_tbl, SigmaP_tbl, V, K):
    """updateStats4Doc partials for one block."""
    wts = np.zeros((K, V))
    theta_stats = 0.0
    eta_mean = 0.0
    eta_p = 0.0
    for n, (jj, vv, u, i) in enumerate(docs):
        mu, Sigma, _z, phi = states[n]
        np.add.at(wts.T, jj, vv[:, None] * phi)
        theta_stats += float((Sigma + mu * mu).sum())
        eta = eta_tbl[i]
        nuP = nuP_tbl[u]
        SigmaP = SigmaP_tbl[u]
        eta0 = float(eta.sum())
        eta_mean += float(np.einsum("l,kl,k->", eta, nuP, mu)) / eta0
        t = float(eta @ (K * SigmaP + nuP.T @ nuP) @ eta) \
            + float((eta * np.diag(K * SigmaP + nuP.T @ nuP)).sum())
        eta_p += t / (eta0 * (eta0 + 1.0))
    return wts, theta_stats, eta_mean, eta_p


# ---------------------------------------------------------------- training

def train_tuir(reviews, *, n_topics: int, vocab_size: int,
               em_max_iter: int = 10, em_converge: float = 1e-8,
               var_max_iter: int = 10, var_converge: float = 1e-6,
               alpha0: float = 1.01, beta: float = 1.01, rho: float = 1.0,
               sigma: float = 1.0, lam: float = 0.9, seed: int = 53,
               n_blocks: int = 4):
    """reviews: list of (tids, vals, user_id, item_id). → dict with logβ, α,
    per-item η (topic profiles), per-user ν_P/Σ_P (projection posteriors),
    per-review μ, likelihood trace."""
    K, V = n_topics, vocab_size
    rng = np.random.default_rng(seed)
    users = sorted({r[2] for r in reviews})
    items = sorted({r[3] for r in reviews})
    u_index = {u: n for n, u in enumerate(users)}
    i_index = {i: n for n, i in enumerate(items)}
    U, I = len(users), len(items)

    docs = [(np.asarray(r[0], dtype=np.int64),
             np.asarray(r[1], dtype=np.float64),
             u_index[r[2]], i_index[r[3]]) for r in reviews]
    by_user: dict[int, list] = {}
    by_item: dict[int, list] = {}
    for d, (_jj, _vv, u, i) in enumerate(docs):
        by_user.setdefault(u, []).append((i, d))
        by_item.setdefault(i, []).append((u, d))
    user_rows = [(u, [i for i, _ in v], [d for _, d in v])
                 for u, v in sorted(by_user.items())]
    item_rows = [(i, [u for u, _ in v], [d for _, d in v])
                 for i, v in sorted(by_item.items())]

    # inits (setTopics4Variational trio), seeded
    alpha = np.full(K, alpha0)
    eta_tbl = np.stack([_randomize(alpha0, K, rng) for _ in range(I)])
    nuP_tbl = np.stack([
        np.stack([_randomize(1.0, K, rng) for _ in range(K)])
        for _ in range(U)])
    SigmaP_tbl = np.stack([np.eye(K) for _ in range(U)])
    states = []
    for (jj, vv, _u, _i) in docs:
        mu = 1.0 + rng.random(K)
        Sigma = 1.0 + rng.random(K) * 0.5
        phi = np.stack([_randomize(alpha0, K, rng) for _ in range(len(jj))]) \
            if len(jj) else np.zeros((0, K))
        states.append((mu, Sigma, _update_zeta(mu, Sigma), phi))
    log_beta = np.log(np.stack([_randomize(beta, V, rng)
                                for _ in range(K)]))

    n_blocks = max(1, min(n_blocks, len(docs)))
    doc_splits = [list(range(b, len(docs), n_blocks))
                  for b in range(n_blocks)]
    doc_block_refs = [ray.put([docs[d] for d in idxs])
                      for idxs in doc_splits]
    user_splits = [user_rows[b::n_blocks] for b in range(n_blocks)]
    item_splits = [item_rows[b::n_blocks] for b in range(n_blocks)]
    block_states = [[states[d] for d in idxs] for idxs in doc_splits]

    mu_tbl = np.stack([st[0] for st in states])
    trace = []
    em_last = -1.0
    em_it = 0
    while True:
        # ---- E-step: outer variational loop over the tripartite graph
        inner_last, inner_it = -1.0, 0
        while True:
            lik = 0.0
            outs = ray.get([
                _doc_phase.remote(doc_block_refs[b], block_states[b],
                                  eta_tbl, nuP_tbl, SigmaP_tbl, log_beta,
                                  rho, K, var_max_iter, var_converge)
                for b in range(n_blocks)
            ])
            for b, (st, mus, l_p) in enumerate(outs):
                block_states[b] = st
                mu_tbl[doc_splits[b]] = mus
                lik += l_p
            u_outs = ray.get([
                _user_phase.remote(user_splits[b], eta_tbl, mu_tbl, rho,
                                   sigma, lam, K)
                for b in range(n_blocks)
            ])
            for rows, l_p in u_outs:
                lik += l_p
                for (u, nuP, SigmaP) in rows:
                    nuP_tbl[u] = nuP
                    SigmaP_tbl[u] = SigmaP
            i_outs = ray.get([
                _item_phase.remote(item_splits[b], nuP_tbl, SigmaP_tbl,
                                   mu_tbl, alpha, eta_tbl, rho, K)
                for b in range(n_blocks)
            ])
            for rows, l_p in i_outs:
                lik += l_p
                for (i, eta) in rows:
                    eta_tbl[i] = eta
            warning = not np.isfinite(lik)
            conv = abs((lik - inner_last) / inner_last) if inner_it > 0 \
                else 1.0
            inner_last = lik
            inner_it += 1
            if warning or not (inner_it < var_max_iter
                               and conv > var_converge):
                break
        trace.append(inner_last)
        # ---- stats + M-step
        s_outs = ray.get([
            _doc_stats_phase.remote(doc_block_refs[b], block_states[b],
                                    eta_tbl, nuP_tbl, SigmaP_tbl, V, K)
            for b in range(n_blocks)
        ])
        wts = np.full((K, V), beta - 1.0)
        for w_p, _t, _em, _ep in s_outs:
            wts += w_p
        alpha_stat = np.zeros(K)
        for i in sorted(by_item):
            e = eta_tbl[i]
            alpha_stat += np.array([digamma(x) for x in e]) \
                - digamma(float(e.sum()))
        log_beta = np.log(wts / wts.sum(axis=1, keepdims=True))
        alpha = _alpha_newton(alpha, alpha_stat, len(by_item), K,
                              var_max_iter, var_converge)
        em_conv = abs((inner_last - em_last) / em_last) if em_it > 0 else 1.0
        em_last = inner_last
        em_it += 1
        if not (em_it < em_max_iter and em_conv > em_converge):
            break

    return {"log_topic_term": log_beta, "alpha": alpha,
            "item_etas": eta_tbl, "item_ids": items,
            "user_nuP": nuP_tbl, "user_SigmaP": SigmaP_tbl,
            "user_ids": users, "doc_mus": mu_tbl,
            "loglik_trace": trace, "block_split": n_blocks}
