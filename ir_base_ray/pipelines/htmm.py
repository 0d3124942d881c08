"""Hidden Topic Markov Model (Gruber/Weiss/Rosen-Zvi, AISTATS 2007) —
``topicmodels/markovmodel/HTMM.java`` + ``HMMs/FastRestrictedHMM.java``,
SURVEY.md §2.7 R7 tail. Sentences are the Markov chain: each sentence either
keeps the previous sentence's topic (ψ=0, prob 1−ε) or draws a fresh topic
from θ_d (ψ=1, prob ε).

Transcribed semantics (all log-space like the reference):
- emission[t][k] = Σ_w v·logφ_k,w per sentence (``ComputeEmissionProbsForDoc``);
- restricted forward (``FastRestrictedHMM:57-100``): 2K states
  ([fresh topics | kept topics]); α_0 = θ + emission (fresh only);
  α_t[fresh k] = logε + θ_k + em; α_t[kept k] = log(1−ε) +
  logsum(α_{t-1}[k], α_{t-1}[k+K]) + em; per-level normalization, loglik =
  Σ norms;
- backward (:103-121): β symmetric in the two ψ-branches, normalized by the
  forward norm factors;
- expectations (:124-133): p(z,ψ|d,t) ∝ exp(α+β);
- sufficient stats (``HTMM:124-156``): ε-stat lot += Σ_fresh p over t≥1,
  total += 1; φ-stat += v·(p_fresh + p_kept); θ-stat += p_fresh only;
- M-step (:159-171): ε = lot/total (after iter 0), logφ = log(sstat) −
  log(rowsum) with the per-iteration (β−1) reset (pLSA init);
  θ_d = log-normalized ((α−1) + θ-stat) (pLSA estThetaInDoc, logSpace);
- Viterbi MAP sentence-topic path (:136-182) for the summary output.

Determinism: the reference's unseeded ``Math.random`` ε-init and φ-init are
seeded numpy (SURVEY §7). Distributed shape (A7/T5): sentence-vector blocks
pinned once; per EM round one ``@ray.remote`` task per block returns (K×V φ
partial, lot, total, loglik, θ'_block); driver merges in fixed block order.
"""

from __future__ import annotations

import numpy as np


import ray


def _logsumexp_rows(a: np.ndarray) -> np.ndarray:
    mx = a.max(axis=-1, keepdims=True)
    return (mx[..., 0] + np.log(np.exp(a - mx).sum(axis=-1)))


def doc_forward_backward(emission: np.ndarray, theta_log: np.ndarray,
                         epsilon: float):
    """One doc's restricted FB. emission (T,K) log; → (p (T,2K) real-space
    posteriors, loglik)."""
    T, K = emission.shape
    alpha = np.full((T, 2 * K), -np.inf)
    norms = np.empty(T)
    a0 = emission[0] + theta_log
    n0 = _logsumexp_rows(a0[None, :])[0]
    alpha[0, :K] = a0 - n0
    norms[0] = n0
    loglik = n0
    log_eps = np.log(epsilon)
    log_1me = np.log(1.0 - epsilon)
    for t in range(1, T):
        fresh = log_eps + theta_log + emission[t]
        kept = log_1me + np.logaddexp(alpha[t - 1, :K], alpha[t - 1, K:]) \
            + emission[t]
        n = _logsumexp_rows(np.concatenate([fresh, kept])[None, :])[0]
        alpha[t, :K] = fresh - n
        alpha[t, K:] = kept - n
        norms[t] = n
        loglik += n
    beta = np.zeros((T, 2 * K))
    for t in range(T - 2, -1, -1):
        # reference backward (:103-121), transcribed exactly: sum is seeded
        # with logε itself and the fresh-half betas fold in on top
        s = np.logaddexp(log_eps, _logsumexp_rows(
            (theta_log + emission[t + 1] + beta[t + 1, :K])[None, :])[0])
        b = np.logaddexp(log_1me + beta[t + 1, :K] + emission[t + 1], s) \
            - norms[t]
        beta[t, :K] = b
        beta[t, K:] = b
    ab = alpha + beta
    norm = _logsumexp_rows(ab)
    p = np.exp(ab - norm[:, None])
    return p, loglik


def viterbi_path(emission: np.ndarray, theta_log: np.ndarray,
                 epsilon: float) -> np.ndarray:
    """MAP sentence-topic path (``computeViterbiAlphas``/``BackTrackBestPath``)."""
    T, K = emission.shape
    alpha = np.full((T, 2 * K), -np.inf)
    back = np.zeros((T, 2 * K), dtype=np.int64)
    alpha[0, :K] = emission[0] + theta_log
    log_eps = np.log(epsilon)
    log_1me = np.log(1.0 - epsilon)
    for t in range(1, T):
        prev_best = int(np.argmax(alpha[t - 1]))
        alpha[t, :K] = alpha[t - 1, prev_best] + theta_log + emission[t] + log_eps
        back[t, :K] = prev_best
        keep_prev = np.where(alpha[t - 1, :K] > alpha[t - 1, K:],
                             np.arange(K), np.arange(K) + K)
        alpha[t, K:] = alpha[t - 1][keep_prev] + log_1me + emission[t]
        back[t, K:] = keep_prev
    path = np.empty(T, dtype=np.int64)
    path[T - 1] = int(np.argmax(alpha[T - 1]))
    for t in range(T - 2, -1, -1):
        path[t] = back[t + 1, path[t + 1]]
    return path % K


def _doc_emission(stn_vecs, log_phi):
    """[(tids, vals)] per sentence → (T,K) emission."""
    T = len(stn_vecs)
    K = log_phi.shape[0]
    em = np.zeros((T, K))
    for t, (jj, vv) in enumerate(stn_vecs):
        if len(jj):
            em[t] = (log_phi[:, jj] * vv[None, :]).sum(axis=1)
    return em


@ray.remote
def _htmm_block(doc_sents, thetas, log_phi, epsilon, K, V, alpha):
    """One block's E-step: doc_sents = list of [(tids, vals)...] per doc."""
    phi_stat = np.zeros((K, V))
    lot = 0.0
    total = 0
    ll = 0.0
    new_thetas = np.empty_like(thetas)
    for d, sents in enumerate(doc_sents):
        em = _doc_emission(sents, log_phi)
        p, doc_ll = doc_forward_backward(em, thetas[d], epsilon)
        ll += doc_ll
        # epsilon stats (t>=1, fresh half)
        if len(sents) > 1:
            lot += float(p[1:, :K].sum())
            total += len(sents) - 1
        # phi stats: fresh + kept mass per sentence
        pz = p[:, :K] + p[:, K:]
        for t, (jj, vv) in enumerate(sents):
            if len(jj):
                phi_stat[:, jj] += pz[t][:, None] * vv[None, :]
        # theta: fresh mass only, (α−1) base, log-normalized
        sstat = (alpha - 1.0) + p[:, :K].sum(axis=0)
        new_thetas[d] = np.log(sstat / sstat.sum())
    return phi_stat, lot, total, ll, new_thetas


def train_htmm(doc_sentence_vecs, *, n_topics: int, vocab_size: int,
               n_iters: int = 15, alpha: float = 1.05, beta: float = 1.01,
               seed: int = 37, n_blocks: int = 4):
    """doc_sentence_vecs: list (per doc) of lists of (tids, vals) sentence
    vectors. Returns dict with log φ, ε, per-doc log θ, MAP sentence paths
    and the loglik trace."""
    K, V = n_topics, vocab_size
    rng = np.random.default_rng(seed)
    epsilon = float(rng.random())            # seeded analog of Math.random()
    phi0 = rng.random((K, V)) + (beta - 1.0)
    log_phi = np.log(phi0 / phi0.sum(axis=1, keepdims=True))

    n_blocks = max(1, min(n_blocks, len(doc_sentence_vecs)))
    blocks = [doc_sentence_vecs[i::n_blocks] for i in range(n_blocks)]
    block_refs = [ray.put(b) for b in blocks]
    thetas = [np.full((len(b), K), -np.log(K)) for b in blocks]

    trace = []
    for it in range(n_iters):
        phi_ref = ray.put(log_phi)
        outs = ray.get([
            _htmm_block.remote(ref, thetas[i], phi_ref, epsilon, K, V, alpha)
            for i, ref in enumerate(block_refs)
        ])
        phi_stat = np.full((K, V), beta - 1.0)   # per-iteration reset
        lot = 0.0
        total = 0
        ll = 0.0
        for i, (p_part, l_part, t_part, ll_part, th) in enumerate(outs):
            phi_stat += p_part
            lot += l_part
            total += t_part
            ll += ll_part
            thetas[i] = th
        trace.append(ll)
        if it > 0 and total:
            epsilon = lot / total                # M-step ε (:161-164)
        log_phi = np.log(phi_stat) - np.log(phi_stat.sum(axis=1, keepdims=True))

    # MAP paths per doc (Viterbi)
    paths = []
    bi = 0
    for b, th in zip(blocks, thetas):
        doc_paths = []
        for d, sents in enumerate(b):
            em = _doc_emission(sents, log_phi)
            doc_paths.append(viterbi_path(em, th[d], epsilon))
        paths.append(doc_paths)
        bi += 1
    return {"log_topic_term": log_phi, "epsilon": epsilon,
            "thetas": thetas, "paths": paths, "loglik_trace": trace,
            "block_split": n_blocks}
