"""Hidden Topic Sentiment Model (Rahman & Wang, WWW 2016) —
``topicmodels/markovmodel/HTSM.java`` +
``HMMs/FastRestrictedHMM_sentiment.java``, SURVEY.md §2.7 R7 tail.

HTSM extends HTMM (``pipelines/htmm.py``) from 2K to 3K latent states over an
EVEN topic count K whose first half carries positive and second half negative
sentiment. State i maps to topic t(i)=i%K, sentiment s(i)=t(i)//(K/2), aspect
a(i)=t(i)%(K/2) (``FastRestrictedHMM_sentiment.java:38-58``). Blocks:

  block 0 (i<K)    : sentiment AND aspect switch   — log σ + log ε + θ_t(j)
  block 1 (K≤i<2K) : same sentiment, aspect switch — log(1−σ) + log ε + θ_t(j)
  block 2 (i≥2K)   : both stay                     — log(1−σ) + log(1−ε)

with each transition ROW-NORMALISED in log space over its admissible targets
(``generateTransitionMatrix`` :71-117 — unlike plain HTMM, which uses the
unnormalised products). Forward/backward (:143-283): α₀ lives in block 0
(θ + emission); per-level normalisation accumulates the log-likelihood;
β is computed per topic and shared by all three blocks. Sentences carrying a
sentiment label (the reference's newEgg docs, sourceType==2) restrict the
reachable blocks per step — label flip → block 0 only, label repeat →
blocks 1-2 — and the FIRST labelled sentence masks the opposite sentiment
half of its emission row to −inf (``HTSM.ComputeEmissionProbsForDoc``
:44-70). Unlabelled sentences (label −1) take the general 3K path.

Sufficient statistics (``HTMM.java:124-156`` at constant=3 +
``HTSM.accSigmaStat`` :83-89): ε-stat sums blocks 0-1 for t≥1 (any topic
switch), σ-stat sums block 0 only (sentiment switch), both over the shared
``total`` counter; φ-stat sums all blocks; θ-stat blocks 0-1. M-step
(:92-99): ε = lot/total and σ = σ_lot/total after iter 0; log φ row
normalised with the (β−1) prior reset; θ_d = log-normalised (α−1)+θ-stat.
Viterbi (:288-384): the reference's FindBestInLevel picks the best
predecessor by α alone (ignoring the row-normalised transition weight) —
transcribed as-is, quirk included.

Determinism: the unseeded ``Math.random()`` ε/σ inits are seeded numpy.
Distributed shape identical to ``train_htmm``: blocks of docs pinned once,
one remote E-step task per block per EM round, driver merges partials in
fixed block order.
"""

from __future__ import annotations

import numpy as np

import ray

from ir_base_ray.pipelines.htmm import _doc_emission, _logsumexp_rows


def state_maps(K: int):
    """(topic, sentiment, aspect) index arrays over the 3K states."""
    k = np.arange(3 * K)
    tk = k % K
    sk = tk // (K // 2)
    ak = tk % (K // 2)
    return tk, sk, ak


def transition_matrix(theta_log: np.ndarray, epsilon: float, sigma: float,
                      K: int) -> np.ndarray:
    """Row-normalised (3K, 3K) log transition matrix
    (``generateTransitionMatrix``). Constant across t, so built once/doc."""
    tk, sk, ak = state_maps(K)
    si, ai = sk[:, None], ak[:, None]
    sj, aj, tj = sk[None, :], ak[None, :], tk[None, :]
    col = np.arange(3 * K)[None, :]
    M = np.full((3 * K, 3 * K), -np.inf)
    ls, l1ms = np.log(sigma), np.log(1.0 - sigma)
    le, l1me = np.log(epsilon), np.log(1.0 - epsilon)
    m0 = (col < K) & (si != sj) & (ai != aj)
    m1 = (col >= K) & (col < 2 * K) & (si == sj) & (ai != aj)
    m2 = (col >= 2 * K) & (si == sj) & (ai == aj)
    th = theta_log[tj].repeat(3 * K, axis=0)
    M[m0] = (ls + le + th)[m0]
    M[m1] = (l1ms + le + th)[m1]
    M[m2] = l1ms + l1me
    M -= _logsumexp_rows(M)[:, None]
    return M


def _mask_first_emission(em: np.ndarray, label: int, K: int):
    """First labelled sentence: opposite sentiment half → −inf
    (``HTSM.ComputeEmissionProbsForDoc``)."""
    if label == 0:
        em[0, K // 2:] = -np.inf
    elif label == 1:
        em[0, :K // 2] = -np.inf


def doc_forward_backward_htsm(emission: np.ndarray, theta_log: np.ndarray,
                              epsilon: float, sigma: float,
                              senti_labels: np.ndarray | None = None,
                              trans_stack: np.ndarray | None = None):
    """One doc's 3K-state restricted FB → (p (T,3K) real-space posteriors,
    loglik). ``senti_labels``: per-sentence labels, −1 = unannotated.
    ``trans_stack``: optional per-step matrices (T−1, 3K, 3K) — the LR-HTSM
    path, where ε/σ vary by sentence; step t uses trans_stack[t−1]."""
    T, K = emission.shape
    S3 = 3 * K
    tk, _sk, _ak = state_maps(K)
    lab = (np.full(T, -1, dtype=np.int64) if senti_labels is None
           else np.asarray(senti_labels, dtype=np.int64))
    if trans_stack is None:
        M = transition_matrix(theta_log, epsilon, sigma, K)
    alpha = np.full((T, S3), -np.inf)
    norms = np.empty(T)
    a0 = emission[0] + theta_log                       # block 0 only
    n0 = _logsumexp_rows(a0[None, :])[0]
    alpha[0, :K] = a0 - n0
    norms[0] = n0
    loglik = n0
    em_state = emission[:, tk]                          # (T, 3K) topic-mapped
    for t in range(1, T):
        if trans_stack is not None:
            M = trans_stack[t - 1]
        trans = alpha[t - 1][:, None] + M               # (3K, 3K)
        mx = trans.max(axis=0)
        with np.errstate(invalid="ignore"):
            a = np.where(np.isfinite(mx),
                         mx + np.log(np.exp(trans - mx[None, :]).sum(axis=0)),
                         -np.inf) + em_state[t]
        if lab[t] != -1 and lab[t - 1] != -1:
            if lab[t] != lab[t - 1]:
                a[K:] = -np.inf                         # block 0 only
            else:
                a[:K] = -np.inf                         # blocks 1-2 only
        n = _logsumexp_rows(a[None, :])[0]
        alpha[t] = a - n
        norms[t] = n
        loglik += n
    beta = np.zeros((T, S3))
    for t in range(T - 2, -1, -1):
        if trans_stack is not None:
            M = trans_stack[t]          # reference indexes matrix at t+1
        # rows of M for the three blocks sharing a topic are identical, so
        # beta is computed per topic on the block-0 rows and broadcast
        B = M[:K] + (em_state[t + 1] + beta[t + 1])[None, :]   # (K, 3K)
        if lab[t] != -1 and lab[t + 1] != -1:
            if lab[t] != lab[t + 1]:
                B[:, K:] = -np.inf
            else:
                B[:, :K] = -np.inf
        b = _logsumexp_rows(B) - norms[t]
        beta[t] = np.concatenate([b, b, b])
    ab = alpha + beta
    norm = _logsumexp_rows(ab)
    p = np.exp(ab - norm[:, None])
    return p, loglik


def viterbi_path_htsm(emission: np.ndarray, theta_log: np.ndarray,
                      epsilon: float, sigma: float,
                      senti_labels: np.ndarray | None = None,
                      trans_stack: np.ndarray | None = None) -> np.ndarray:
    """MAP state path with the reference's exact quirk: the predecessor is
    chosen by α[t−1] alone among the target block's admissible sources
    (``FindBestInLevel(t, i)`` :311-357), THEN the normalised transition
    weight of that predecessor is added. Returns the raw 3K-state path."""
    T, K = emission.shape
    S3 = 3 * K
    tk, sk, ak = state_maps(K)
    M = (transition_matrix(theta_log, epsilon, sigma, K)
         if trans_stack is None else trans_stack[0])
    admissible = np.isfinite(M)                         # (src, dst) mask
    alpha = np.full((T, S3), -np.inf)
    back = np.zeros((T, S3), dtype=np.int64)
    alpha[0, :K] = emission[0] + theta_log
    em_state = emission[:, tk]
    for t in range(1, T):
        if trans_stack is not None:
            M = trans_stack[t - 1]
        for i in range(S3):
            srcs = np.where(admissible[:, i])[0]
            prev = srcs[int(np.argmax(alpha[t - 1][srcs]))]
            alpha[t, i] = alpha[t - 1, prev] + M[prev, i] + em_state[t, i]
            back[t, i] = prev
    path = np.empty(T, dtype=np.int64)
    path[T - 1] = int(np.argmax(alpha[T - 1]))
    for t in range(T - 2, -1, -1):
        path[t] = back[t + 1, path[t + 1]]
    return path


@ray.remote
def _htsm_block(doc_sents, doc_labels, thetas, log_phi, epsilon, sigma,
                K, V, alpha):
    """One block's E-step: (φ partial, ε lot, σ lot, total, loglik, θ')."""
    phi_stat = np.zeros((K, V))
    eps_lot = 0.0
    sig_lot = 0.0
    total = 0
    ll = 0.0
    new_thetas = np.empty_like(thetas)
    for d, sents in enumerate(doc_sents):
        em = _doc_emission(sents, log_phi)
        labels = doc_labels[d] if doc_labels is not None else None
        if labels is not None and len(labels) and labels[0] != -1:
            _mask_first_emission(em, int(labels[0]), K)
        p, doc_ll = doc_forward_backward_htsm(em, thetas[d], epsilon, sigma,
                                              labels)
        ll += doc_ll
        if len(sents) > 1:
            eps_lot += float(p[1:, :2 * K].sum())       # blocks 0-1
            sig_lot += float(p[1:, :K].sum())           # block 0
            total += len(sents) - 1
        pz = p[:, :K] + p[:, K:2 * K] + p[:, 2 * K:]    # all blocks, per topic
        for t, (jj, vv) in enumerate(sents):
            if len(jj):
                phi_stat[:, jj] += pz[t][:, None] * vv[None, :]
        sstat = (alpha - 1.0) + p[:, :2 * K].reshape(len(sents), 2, K) \
            .sum(axis=1).sum(axis=0)                    # ψ=1 blocks 0-1
        new_thetas[d] = np.log(sstat / sstat.sum())
    return phi_stat, eps_lot, sig_lot, total, ll, new_thetas


def train_htsm(doc_sentence_vecs, *, n_topics: int, vocab_size: int,
               doc_senti_labels=None, n_iters: int = 15, alpha: float = 1.05,
               beta: float = 1.01, seed: int = 37, n_blocks: int = 4):
    """doc_sentence_vecs: per doc, list of (tids, vals) sentence vectors;
    doc_senti_labels: optional per doc int array (−1 = unannotated sentence).
    Returns dict with log φ, ε, σ, per-doc log θ, MAP sentence (topic,
    sentiment) paths and the loglik trace. ``n_topics`` must be even."""
    K, V = n_topics, vocab_size
    if K % 2 != 0 or K < 4:
        raise ValueError("HTSM needs an even number_of_topics >= 4 "
                         "(HTSM.java:27-30)")
    rng = np.random.default_rng(seed)
    epsilon = float(rng.random())
    sigma = float(rng.random())                # HTSM.java:33 Math.random()
    phi0 = rng.random((K, V)) + (beta - 1.0)
    log_phi = np.log(phi0 / phi0.sum(axis=1, keepdims=True))

    n_blocks = max(1, min(n_blocks, len(doc_sentence_vecs)))
    blocks = [doc_sentence_vecs[i::n_blocks] for i in range(n_blocks)]
    label_blocks = (
        [doc_senti_labels[i::n_blocks] for i in range(n_blocks)]
        if doc_senti_labels is not None else [None] * n_blocks)
    block_refs = [ray.put(b) for b in blocks]
    label_refs = [ray.put(b) for b in label_blocks]
    thetas = [np.full((len(b), K), -np.log(K)) for b in blocks]

    trace = []
    for it in range(n_iters):
        phi_ref = ray.put(log_phi)
        outs = ray.get([
            _htsm_block.remote(ref, lref, thetas[i], phi_ref, epsilon, sigma,
                               K, V, alpha)
            for i, (ref, lref) in enumerate(zip(block_refs, label_refs))
        ])
        phi_stat = np.full((K, V), beta - 1.0)
        eps_lot = sig_lot = 0.0
        total = 0
        ll = 0.0
        for i, (p_part, el, sl, t_part, ll_part, th) in enumerate(outs):
            phi_stat += p_part
            eps_lot += el
            sig_lot += sl
            total += t_part
            ll += ll_part
            thetas[i] = th
        trace.append(ll)
        if it > 0 and total:
            epsilon = eps_lot / total           # HTMM M-step
            sigma = sig_lot / total             # HTSM.calculate_M_step:92-99
        log_phi = np.log(phi_stat) - np.log(phi_stat.sum(axis=1,
                                                         keepdims=True))

    paths = []
    sentis = []
    for b, lb, th in zip(blocks, label_blocks, thetas):
        doc_paths, doc_sentis = [], []
        for d, sents in enumerate(b):
            em = _doc_emission(sents, log_phi)
            labels = lb[d] if lb is not None else None
            if labels is not None and len(labels) and labels[0] != -1:
                _mask_first_emission(em, int(labels[0]), K)
            raw = viterbi_path_htsm(em, th[d], epsilon, sigma, labels)
            doc_paths.append(raw % K)                       # topic
            doc_sentis.append((raw % K) // (K // 2))        # sentimentMapper
        paths.append(doc_paths)
        sentis.append(doc_sentis)
    return {"log_topic_term": log_phi, "epsilon": epsilon, "sigma": sigma,
            "thetas": thetas, "paths": paths, "senti_paths": sentis,
            "loglik_trace": trace, "block_split": n_blocks}
