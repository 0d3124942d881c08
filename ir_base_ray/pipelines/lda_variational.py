"""LDA via mean-field variational EM — the reference's second LDA trainer
(``topicmodels/LDA/LDA_Variational.java``, Blei/Ng/Jordan). Semantics
transcribed exactly:

- doc init (``_Doc.setTopics4Variational`` :234-248): φ rows = (α +
  uniform)/sum (seeded here; the reference's ``Math.random`` is unseeded —
  SURVEY §7 determinism policy), γ = α + Σ v·φ;
- E-step per doc (:108-156): repeat ``var_max_iter`` times (or until the
  per-doc ELBO moves < ``var_converge`` relatively):
  φ_ni ∝ exp(logβ_i,w + ψ(γ_i)) (log-sum-exp normalized), then
  γ = α + Σ_n v_n·φ_n;
- sufficient stats (``collectStats`` :86-101): word-topic sstat (init
  β−1 each EM round, :75-82) += v·φ; α-stat += ψ(γ_i) − ψ(Σγ);
- M-step (:158-195): logβ = log(sstat/rowsum); α by the constrained Newton
  update with the reference's 0.001 step-size quirk, iterated while the
  mean squared Newton delta > var_converge;
- doc θ (``estThetaInDoc`` :235-255): normalize Σ v·φ (log space);
- per-doc ELBO (``calculate_log_likelihood`` :210-231) transcribed
  term-for-term.

Distributed shape: identical to pLSA (A7/T5) — blocks pinned once; each EM
round broadcasts (logβ, α) and runs one ``@ray.remote`` E-step task per
block returning (K×V sstat partial, α-stat partial, Σ ELBO, γ/φ state);
driver sums partials in fixed block order and runs the M-step. One block ⇒
bit-identical to the serial twin (pytest-pinned).

The reference's thread-pool E-step (``topicmodels/multithreads/LDA/LDA_Variational_multithread.java``) is this pipeline's map_batches fan-out — Ray blocks play the worker role.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from ir_base_ray.functions.gammamath import digamma, trigamma
from math import lgamma


def _block_arrays(tbl: pa.Table):
    tids = tbl.column("tids")
    vals = tbl.column("vals")
    tids = tids.combine_chunks() if isinstance(tids, pa.ChunkedArray) else tids
    vals = vals.combine_chunks() if isinstance(vals, pa.ChunkedArray) else vals
    lengths = np.asarray(pa.compute.list_value_length(tids), dtype=np.int64)
    j = tids.flatten().to_numpy(zero_copy_only=False).astype(np.int64)
    v = vals.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return j, v, lengths


_digamma_vec = np.vectorize(digamma, otypes=[np.float64])
_lgamma_vec = np.vectorize(lgamma, otypes=[np.float64])


def _doc_elbo(phi_d, gamma_d, jj, vv, log_beta, alpha):
    dig = _digamma_vec(gamma_d) - digamma(float(gamma_d.sum()))
    ll = lgamma(float(alpha.sum())) - lgamma(float(gamma_d.sum()))
    ll += float((_lgamma_vec(gamma_d) - _lgamma_vec(alpha)
                 + (alpha - gamma_d) * dig).sum())
    with np.errstate(divide="ignore", invalid="ignore"):
        logphi = np.where(phi_d > 0, np.log(phi_d), 0.0)
    ll += float((phi_d * (dig[None, :] + vv[:, None] * log_beta[:, jj].T
                          - logphi)).sum())
    return ll


def _estep_block(j, v, lengths, phi, gamma, log_beta, alpha, K,
                 var_max_iter, var_converge):
    """In-place E-step over one block; returns (sstat K×V partial wo/ the
    β−1 base, alpha_stat K partial, Σ per-doc ELBO)."""
    V = log_beta.shape[1]
    starts = np.concatenate(([0], np.cumsum(lengths)))
    sstat = np.zeros((K, V))
    alpha_stat = np.zeros(K)
    total_ll = 0.0
    for d in range(len(lengths)):
        s, e = starts[d], starts[d + 1]
        jj, vv = j[s:e], v[s:e]
        phi_d = phi[s:e]
        gamma_d = gamma[d]
        last = _doc_elbo(phi_d, gamma_d, jj, vv, log_beta, alpha) \
            if var_converge > 0 else 1.0
        current = last
        for _ in range(var_max_iter):
            lp = log_beta[:, jj].T + _digamma_vec(gamma_d)[None, :]
            mx = lp.max(axis=1, keepdims=True)
            lse = mx[:, 0] + np.log(np.exp(lp - mx).sum(axis=1))
            phi_d = np.exp(lp - lse[:, None])
            gamma_d = alpha + (phi_d * vv[:, None]).sum(axis=0)
            if var_converge > 0:
                current = _doc_elbo(phi_d, gamma_d, jj, vv, log_beta, alpha)
                conv = abs((current - last) / last) if last else 0.0
                last = current
                if conv < var_converge:
                    break
        phi[s:e] = phi_d
        gamma[d] = gamma_d
        sstat[:, jj] += (phi_d * vv[:, None]).T
        alpha_stat += _digamma_vec(gamma_d) - digamma(float(gamma_d.sum()))
        total_ll += current if var_converge > 0 else \
            _doc_elbo(phi_d, gamma_d, jj, vv, log_beta, alpha)
    return sstat, alpha_stat, total_ll


@ray.remote
def _estep_remote(tbl: pa.Table, state, log_beta, alpha, K, beta_pseudo,
                  var_max_iter, var_converge, seed):
    j, v, lengths = _block_arrays(tbl)
    if state is None:  # setTopics4Variational, seeded
        rng = np.random.Generator(np.random.Philox(key=seed))
        phi = float(alpha[0]) + rng.random((j.size, K))
        phi = phi / phi.sum(axis=1, keepdims=True)
        starts = np.concatenate(([0], np.cumsum(lengths)))
        gamma = np.empty((len(lengths), K))
        for d in range(len(lengths)):
            s, e = starts[d], starts[d + 1]
            gamma[d] = alpha + (phi[s:e] * v[s:e, None]).sum(axis=0)
    else:
        phi, gamma = state
        phi = phi.copy()
        gamma = gamma.copy()
    sstat, astat, ll = _estep_block(j, v, lengths, phi, gamma, log_beta,
                                    alpha, K, var_max_iter, var_converge)
    return (phi, gamma), sstat, astat, ll


def _alpha_newton(alpha, alpha_stat, doc_size, K, var_max_iter, var_converge):
    """The reference's constrained Newton with 0.001 step (:168-192)."""
    alpha = alpha.copy()
    for _ in range(var_max_iter):
        alpha_sum = float(alpha.sum())
        di_sum = digamma(alpha_sum)
        z = doc_size * trigamma(alpha_sum)
        g = doc_size * (di_sum - _digamma_vec(alpha)) + alpha_stat
        h = -doc_size * np.vectorize(trigamma)(alpha)
        c = (g / h).sum() / (1.0 / z + (1.0 / h).sum())
        delta = (g - c) / h
        alpha = alpha - 0.001 * delta
        if float((delta ** 2).mean()) <= var_converge:
            break
    return alpha


def train_lda_variational(vec_ds, *, n_topics: int, vocab_size: int,
                          n_iters: int = 10, alpha: float = 1.05,
                          beta: float = 1.01, var_max_iter: int = 10,
                          var_converge: float = 1e-5, seed: int = 31):
    K, V = n_topics, vocab_size
    blocks = [ray.put(b) for b in vec_ds.iter_batches(batch_format="pyarrow",
                                                      batch_size=None)]
    alpha_vec = np.full(K, alpha)
    # initialize_probability: init φ/γ, collect stats, one M-step (:61-72)
    log_beta = np.full((K, V), -np.log(V))
    states = [None] * len(blocks)
    n_docs = 0
    for b in blocks:
        n_docs += len(ray.get(b))

    trace = []
    for it in range(n_iters + 1):
        # iteration 0 runs with var_max_iter=0 (pure init + collect)
        vmi = 0 if it == 0 else var_max_iter
        outs = ray.get([
            _estep_remote.remote(b, states[i], log_beta, alpha_vec, K,
                                 beta - 1.0, vmi, var_converge, seed + i)
            for i, b in enumerate(blocks)
        ])
        sstat = np.full((K, V), beta - 1.0)      # init() smoothing base
        alpha_stat = np.zeros(K)
        ll = 0.0
        for i, (state, s_part, a_part, l_part) in enumerate(outs):
            states[i] = state
            sstat += s_part
            alpha_stat += a_part
            ll += l_part
        trace.append(ll)
        # M-step: logβ + α Newton
        log_beta = np.log(sstat / sstat.sum(axis=1, keepdims=True))
        alpha_vec = _alpha_newton(alpha_vec, alpha_stat, n_docs, K,
                                  var_max_iter if it else 1, var_converge)

    # estThetaInDoc (log space in the reference; we return probabilities)
    doc_topics = []
    for i, b in enumerate(blocks):
        j, v, lengths = _block_arrays(ray.get(b))
        phi, _gamma = states[i]
        starts = np.concatenate(([0], np.cumsum(lengths)))
        th = np.empty((len(lengths), K))
        for d in range(len(lengths)):
            s, e = starts[d], starts[d + 1]
            t = (phi[s:e] * v[s:e, None]).sum(axis=0)
            tot = t.sum()
            th[d] = t / tot if tot else t
        doc_topics.append(th)
    return {"log_topic_term": log_beta, "alpha": alpha_vec,
            "doc_topics": doc_topics, "elbo_trace": trace}
