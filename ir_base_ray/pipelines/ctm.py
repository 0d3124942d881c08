"""CTM — Correlated Topic Model (Blei & Lafferty 2007) as the reference
implements it (``topicmodels/CTM/CTM.java``, run by ``mains/TUIRMain.java``):
variational EM with a logistic-normal topic prior over K−1 free dimensions
(the K-th log-topic weight is pinned to 0).

Transcribed semantics (line refs into CTM.java):

- init (``initModel`` :42-126): μ = 0, Σ = I (inverse/det via dense linalg);
  logβ = log-normalised (U[0,1)+0.01) rows (seeded numpy for the unseeded
  ``Random``); per-doc λ = 0 (last pinned 0), ν² = 10 (last 0), ζ = 10,
  φ = 1/K (``initDoc`` :143-166 — run ONCE, params persist across EM iters).
- variational loop per doc (``varInference`` :182-221): [ζ, λ, ζ, ν, ζ, φ]
  per iteration, stopping on |Δ ELBO / ELBO| ≤ varConverge or varMaxIter.
- ζ (:303-312): ζ = 1 + Σ_{i<K−1} exp(λ_i + ν²_i/2)  (the pinned K-th
  dimension contributes the 1).
- φ (:314-334): φ_n ∝ exp(logβ_{·,w} + λ) over all K, log-space normalised.
- λ (:337-430): L-BFGS (m=4, eps 1e-3, ≤15 restarts) minimising −(φ-count
  alignment − ½(λ−μ)ᵀΣ⁻¹(λ−μ) − N_d·Σexp(λ+ν²/2)/ζ), N_d = total tokens.
- ν (:432-496): L-BFGS over log ν² (eps 1e-6); REFERENCE QUIRK kept: the
  objective's second term multiplies by the doc's UNIQUE-term count
  (``getDocLength``) while its gradient uses the TOTAL token count
  (``getTotalDocLength``) — transcribed faithfully.
- ELBO (``calLikelihood`` :224-272): −½log|Σ| + ½(K−1) − ½tr(Σ⁻¹ diag ν²)
  − ½(λ−μ)ᵀΣ⁻¹(λ−μ) + ½Σlog ν² − N_d·((Σexp(λ+ν²/2)+1)/ζ − 1 + log ζ)
  + Σ_n v·φ_n·(λ + logβ_{·,w} − log φ_n).
- sufficient stats (``updateStats`` :275-301, reset each EM iter with the
  1e-2 word smoothing of ``initStats``): muStat += λ, covStat += λλᵀ + diag
  ν², sstat += v·φ.
- M-step (:497-521): μ = muStat/n; Σ = (covStat + n·μμᵀ − μ muStatᵀ −
  (muStat μᵀ)ᵀ)/n; logβ = row-log-normalised sstat.
- EM (:524-559): converge = |Δ/old| from iter 1; NaN likelihood aborts.

Distributed execution: per-doc variational inference is independent given
(μ, Σ⁻¹, logβ), so blocks of docs are pinned once and each EM round is one
remote task per block carrying that block's persistent per-doc variational
state and returning (ELBO, muStat, covStat, word sstat) partials, summed by
the driver in fixed block order — deterministic; 1-block == serial
(single-task) by construction.
"""

from __future__ import annotations

import numpy as np

import ray

from ir_base_ray.pipelines.linear import lbfgs_minimize


def _doc_arrays(doc):
    jj = np.asarray(doc[0], dtype=np.int64)
    vv = np.asarray(doc[1], dtype=np.float64)
    return jj, vv


def _opt_zeta(lam, nu2, K2):
    return 1.0 + float(np.exp(lam[:K2] + 0.5 * nu2[:K2]).sum())


def _opt_phi(jj, log_beta, lam):
    a = log_beta[:, jj].T + lam[None, :]          # (n, K)
    mx = a.max(axis=1, keepdims=True)
    e = np.exp(a - mx)
    return e / e.sum(axis=1, keepdims=True)


def _opt_lambda(jj, vv, phi, lam, nu2, zeta, mu, inv_cov, total_len, K2):
    sum_phi = (vv[:, None] * phi[:, :K2]).sum(axis=0)

    def fg(x):
        d = x - mu
        t1 = float(x @ sum_phi)
        t2 = -0.5 * float(d @ inv_cov @ d)
        ex = np.exp(x + 0.5 * nu2[:K2])
        t3 = -total_len * float(ex.sum()) / zeta
        g = -(sum_phi - inv_cov @ d - total_len * ex / zeta)
        return -(t1 + t2 + t3), g

    x, _f, _n = lbfgs_minimize(fg, lam[:K2].copy(), m=4, gtol=1e-3,
                               max_iter=100)
    out = np.zeros(K2 + 1)
    out[:K2] = x
    return out


def _opt_nu(lam, nu2, zeta, inv_cov_diag, uniq_len, total_len, K2):
    def fg(x):
        ex = np.exp(x)
        t1 = -0.5 * float((ex * inv_cov_diag).sum())
        e2 = np.exp(lam[:K2] + ex / 2.0)
        # reference quirk: value uses the unique-term count, gradient the
        # total token count (CTM.java:469-476)
        t2 = -uniq_len * float(e2.sum()) / zeta
        t3 = 0.5 * float(x.sum())
        g = -(-0.5 * ex * inv_cov_diag
              - 0.5 * ex * e2 * total_len / zeta + 0.5)
        return -(t1 + t2 + t3), g

    x, _f, _n = lbfgs_minimize(fg, np.log(nu2[:K2]), m=4, gtol=1e-6,
                               max_iter=100)
    out = np.zeros(K2 + 1)
    out[:K2] = np.exp(x)
    return out


def _likelihood(jj, vv, phi, lam, nu2, zeta, mu, inv_cov, log_det_cov,
                log_beta, total_len, K2):
    ll = -0.5 * log_det_cov + 0.5 * K2
    ll += -0.5 * float((nu2[:K2] * np.diag(inv_cov)).sum())
    d = lam[:K2] - mu
    ll += -0.5 * float(d @ inv_cov @ d)
    ll += 0.5 * float(np.log(nu2[:K2]).sum())
    sum_exp = float(np.exp(lam + 0.5 * nu2).sum())   # all K (last = exp(0))
    ll += -total_len * (sum_exp / zeta - 1.0 + np.log(zeta))
    a = lam[None, :] + log_beta[:, jj].T
    with np.errstate(divide="ignore", invalid="ignore"):
        term = phi * (a - np.log(phi))
    ll += float((vv[:, None] * np.where(phi > 0, term, 0.0)).sum())
    return ll


def _var_inference(jj, vv, state, mu, inv_cov, log_det_cov, log_beta,
                   K2, var_max_iter, var_converge):
    lam, nu2, zeta, phi = state
    total_len = float(vv.sum())
    uniq_len = len(jj)
    old = _likelihood(jj, vv, phi, lam, nu2, zeta, mu, inv_cov,
                      log_det_cov, log_beta, total_len, K2) \
        if var_converge > 0 else 0.0
    cur, conv, it = 0.0, 0.0, 0
    while True:
        it += 1
        zeta = _opt_zeta(lam, nu2, K2)
        lam = _opt_lambda(jj, vv, phi, lam, nu2, zeta, mu, inv_cov,
                          total_len, K2)
        zeta = _opt_zeta(lam, nu2, K2)
        nu2 = _opt_nu(lam, nu2, zeta, np.diag(inv_cov), uniq_len,
                      total_len, K2)
        zeta = _opt_zeta(lam, nu2, K2)
        phi = _opt_phi(jj, log_beta, lam)
        if var_converge > 0:
            cur = _likelihood(jj, vv, phi, lam, nu2, zeta, mu, inv_cov,
                              log_det_cov, log_beta, total_len, K2)
            conv = (old - cur) / old if old != 0 else 0.0
            old = cur
        if not (it < var_max_iter and abs(conv) > var_converge):
            break
    return (lam, nu2, zeta, phi), cur


@ray.remote
def _ctm_block(docs, states, mu, inv_cov, log_det_cov, log_beta, K, K2,
               var_max_iter, var_converge):
    """One EM round for one block → (lik, muStat, covStat, sstat, states')."""
    V = log_beta.shape[1]
    mu_stat = np.zeros(K2)
    cov_stat = np.zeros((K2, K2))
    sstat = np.zeros((K, V))
    lik = 0.0
    new_states = []
    for doc, st in zip(docs, states):
        jj, vv = _doc_arrays(doc)
        st, doc_lik = _var_inference(jj, vv, st, mu, inv_cov, log_det_cov,
                                     log_beta, K2, var_max_iter,
                                     var_converge)
        lam, nu2, _zeta, phi = st
        lik += doc_lik
        mu_stat += lam[:K2]
        cov_stat += np.outer(lam[:K2], lam[:K2]) + np.diag(nu2[:K2])
        np.add.at(sstat.T, jj, vv[:, None] * phi)
        new_states.append(st)
    return lik, mu_stat, cov_stat, sstat, new_states


def train_ctm(doc_vecs, *, n_topics: int, vocab_size: int,
              em_max_iter: int = 20, em_converge: float = 1e-10,
              var_max_iter: int = 20, var_converge: float = 1e-6,
              seed: int = 41, n_blocks: int = 4):
    """doc_vecs: list of (tids, vals). → dict with logβ, μ, Σ, per-doc λ
    (the logistic-normal doc-topic params), ELBO trace."""
    K = n_topics
    K2 = K - 1
    V = vocab_size
    rng = np.random.default_rng(seed)
    mu = np.zeros(K2)
    cov = np.eye(K2)
    inv_cov = np.linalg.inv(cov)
    log_det_cov = float(np.log(np.linalg.det(cov)))
    b0 = rng.random((K, V)) + 0.01
    log_beta = np.log(b0) - np.log(b0.sum(axis=1, keepdims=True))

    n_blocks = max(1, min(n_blocks, len(doc_vecs)))
    blocks = [doc_vecs[i::n_blocks] for i in range(n_blocks)]
    block_refs = [ray.put(b) for b in blocks]
    states = []
    for b in blocks:
        st = []
        for doc in b:
            jj, _vv = _doc_arrays(doc)
            lam = np.zeros(K)
            nu2 = np.full(K, 10.0)
            nu2[K2] = 0.0
            phi = np.full((len(jj), K), 1.0 / K)
            st.append((lam, nu2, 10.0, phi))
        states.append(st)

    n_docs = len(doc_vecs)
    trace = []
    old_total, converge = 0.0, 1.0
    it = 0
    while True:
        outs = ray.get([
            _ctm_block.remote(ref, states[i], mu, inv_cov, log_det_cov,
                              log_beta, K, K2, var_max_iter, var_converge)
            for i, ref in enumerate(block_refs)
        ])
        cur_total = 0.0
        mu_stat = np.zeros(K2)
        cov_stat = np.zeros((K2, K2))
        sstat = np.full((K, V), 1e-2)          # initStats word smoothing
        for i, (lik, ms, cs, ws, st) in enumerate(outs):
            cur_total += lik
            mu_stat += ms
            cov_stat += cs
            sstat += ws
            states[i] = st
        trace.append(cur_total)
        if np.isnan(cur_total):                # reference NaN abort
            break
        converge = abs((old_total - cur_total) / old_total) if it > 0 else 1.0
        # M-step (:497-521)
        mu = mu_stat / n_docs
        cov = (cov_stat + n_docs * np.outer(mu, mu)
               - np.outer(mu, mu_stat) - np.outer(mu_stat, mu)) / n_docs
        inv_cov = np.linalg.inv(cov)
        log_det_cov = float(np.log(np.linalg.det(cov)))
        log_beta = np.log(sstat) - np.log(sstat.sum(axis=1, keepdims=True))
        old_total = cur_total
        it += 1
        if not (it < em_max_iter and converge > em_converge):
            break

    lambdas = [None] * n_docs
    for b in range(n_blocks):
        for d, st in enumerate(states[b]):
            lambdas[b + d * n_blocks] = st[0]
    return {"log_topic_term": log_beta, "mu": mu, "cov": cov,
            "doc_lambdas": lambdas, "loglik_trace": trace,
            "block_split": n_blocks}
