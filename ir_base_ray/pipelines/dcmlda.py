"""DCM-LDA — Dirichlet Compound Multinomial LDA
(``topicmodels/DCM/DCMLDA.java``, SURVEY.md §2.7 R7 tail). Each document
draws its OWN word-topic multinomials from shared per-topic Dirichlet priors
β_k; Gibbs sampling is therefore doc-local:

  p(z_i = k) ∝ (n_dk + α_k) · (n_dkw + β_kw) / (n_dk + Σ_v β_kv)
  (``topicInDocProb``/``wordTopicProb`` :274-284 — ALL counts doc-local)

and the corpus-level learning happens in the prior updates:
- moment-matching re-init (``initialAlphaBeta`` :329-371):
  α_k = mean_d(n_dk/len_d) + d_alpha, β_kv = mean_d(n_dkv/n_dk) + d_beta;
- Minka fixed-point for α (``updateAlpha`` :374-411):
  α_k ← α_k · Σ_d[ψ(α_k+n_dk) − ψ(α_k)] / Σ_d[ψ(len_d+Σα) − ψ(Σα)];
- per-topic fixed-point for β (``updateBeta`` :413-450):
  β_kv ← β_kv · Σ_d[ψ(β_kv+n_dkv) − ψ(β_kv)] /
               Σ_d[ψ(Σβ_k+n_dk) − ψ(Σβ_k)] + d_beta (the reference adds
  d_beta every iteration — transcribed as-is), with its zero-count and
  empty-topic guards.

Distributed shape: doc-local sampling makes blocks embarrassingly parallel —
one ``@ray.remote`` task per block runs the full inner Gibbs loop per doc
(seeded Philox per block/round) and returns (a) the moment-matching partial
sums and (b) COUNT HISTOGRAMS (doc lengths, n_dk per topic, and sparse
(k,v,n_dkv) counts), from which the driver evaluates every Σ_d ψ(·) term of
the fixed points EXACTLY for any α/β — no extra cluster rounds per Newton
iteration. The reference's unseeded ``m_rand``/``permutation`` are seeded /
fixed-order (SURVEY §7).

Thread-pool variant ``topicmodels/multithreads/DCMLDA/DCMLDA_multithread.java`` = the pinned-block Ray fan-out here.
"""

from __future__ import annotations

from collections import Counter

import numpy as np


import ray

from ir_base_ray.functions.gammamath import digamma


def _expand_docs(block):
    """block = list of (tids, vals) → per-doc word arrays (tf-expanded)."""
    docs = []
    for jj, vv in block:
        docs.append(np.repeat(np.asarray(jj, dtype=np.int64),
                              np.asarray(vv, dtype=np.int64)))
    return docs


def _gibbs_doc(words, z, n_dk, n_dkw, alpha, beta_k, total_beta, rng):
    """One in-place sweep over one doc (reference :230-270 order).

    Uniforms pre-drawn in one ``rng.random(n)`` call (identical Philox
    stream); the walk runs in the compile-once C kernel
    (functions/ckernels.dcm_kernel) with the identical IEEE op order — the
    Python loop below is the compiler-less fallback and parity oracle."""
    from ir_base_ray.functions.ckernels import dcm_kernel

    K = alpha.size
    if words.size == 0:
        return z
    us = rng.random(words.size)
    lib = dcm_kernel()
    if lib is not None:
        import ctypes

        P = ctypes.POINTER
        cache = np.empty(K, dtype=np.float64)
        words_c = np.ascontiguousarray(words, dtype=np.int64)
        alpha_c = np.ascontiguousarray(alpha, dtype=np.float64)
        beta_c = np.ascontiguousarray(beta_k, dtype=np.float64)
        tb_c = np.ascontiguousarray(total_beta, dtype=np.float64)
        assert z.flags.c_contiguous and n_dk.flags.c_contiguous \
            and n_dkw.flags.c_contiguous
        lib.dcm_sweep(
            words_c.ctypes.data_as(P(ctypes.c_int64)), words.size,
            z.ctypes.data_as(P(ctypes.c_int64)),
            n_dk.ctypes.data_as(P(ctypes.c_double)),
            n_dkw.ctypes.data_as(P(ctypes.c_double)),
            alpha_c.ctypes.data_as(P(ctypes.c_double)),
            beta_c.ctypes.data_as(P(ctypes.c_double)),
            tb_c.ctypes.data_as(P(ctypes.c_double)),
            us.ctypes.data_as(P(ctypes.c_double)),
            cache.ctypes.data_as(P(ctypes.c_double)),
            K, n_dkw.shape[1])
        return z
    for i in range(words.size):
        wid = words[i]
        t = z[i]
        n_dk[t] -= 1
        n_dkw[t, wid] -= 1
        cache = (n_dk + alpha) * (n_dkw[:, wid] + beta_k[:, wid]) \
            / (n_dk + total_beta)
        cum = np.cumsum(cache)
        u = cum[-1] * us[i]
        # reference walk (:254-259): tid starts at 0, subtract-first
        t = int(np.searchsorted(cum, u, side="right"))
        if t >= K:
            t = K - 1
        z[i] = t
        n_dk[t] += 1
        n_dkw[t, wid] += 1
    return z


@ray.remote
def _dcm_block(block, state, alpha, beta, total_beta, K, V, inner_iters,
               seed, rnd):
    docs = _expand_docs(block)
    rng = np.random.Generator(np.random.Philox(key=seed, counter=[rnd, 0, 0, 0]))
    if state is None:
        state = []
        for w in docs:
            z = rng.integers(0, K, size=w.size)
            n_dk = np.bincount(z, minlength=K).astype(np.float64)
            n_dkw = np.zeros((K, V))
            np.add.at(n_dkw, (z, w), 1.0)
            state.append((z, n_dk, n_dkw))
    else:
        state = [(z.copy(), n_dk.copy(), n_dkw.copy()) for z, n_dk, n_dkw in state]
    for _ in range(inner_iters):
        for w, (z, n_dk, n_dkw) in zip(docs, state):
            _gibbs_doc(w, z, n_dk, n_dkw, alpha, beta, total_beta, rng)

    # ---- M-step partials ----
    mm_theta = np.zeros(K)           # Σ_d n_dk/len_d
    mm_theta2 = np.zeros(K)
    mm_phi = np.zeros((K, V))        # Σ_d n_dkv/n_dk
    len_hist: Counter = Counter()    # doc length → #docs
    ndk_hist = [Counter() for _ in range(K)]   # per topic: n_dk → #docs
    ndkv_hist: Counter = Counter()   # (k, v, n_dkv>0) → #docs
    for w, (z, n_dk, n_dkw) in zip(docs, state):
        L = max(1, w.size)
        p = n_dk / L
        mm_theta += p
        mm_theta2 += p * p
        nz = n_dk > 0
        mm_phi[nz] += n_dkw[nz] / n_dk[nz][:, None]
        len_hist[int(w.size)] += 1
        for k in range(K):
            ndk_hist[k][int(n_dk[k])] += 1
        ks, vs = np.nonzero(n_dkw)
        for k, v in zip(ks.tolist(), vs.tolist()):
            ndkv_hist[(k, v, int(n_dkw[k, v]))] += 1
    return state, mm_theta, mm_theta2, mm_phi, len(docs), len_hist, \
        ndk_hist, ndkv_hist


def _fixed_point_alpha(alpha, len_hist, ndk_hists, n_docs, *, newton_iter,
                       newton_converge):
    alpha = alpha.copy()
    K = alpha.size
    for _ in range(newton_iter):
        total = float(alpha.sum())
        dig = digamma(total)
        denom = sum(c * (digamma(l + total) - dig) for l, c in len_hist.items())
        diff = 0.0
        for k in range(K):
            num = sum(c * (digamma(alpha[k] + n) - digamma(alpha[k]))
                      for n, c in ndk_hists[k].items())
            new = alpha[k] * (num / denom) if denom else alpha[k]
            diff = max(diff, abs(alpha[k] - new))
            alpha[k] = new
        if diff <= newton_converge:
            break
    return alpha


def _fixed_point_beta(beta, ndk_hists, ndkv_hist, d_beta, *, newton_iter,
                      newton_converge):
    """Per-topic Minka fixed point over the sparse count histograms
    (zero-count entries contribute ψ(β)−ψ(β)=0 to the numerator, matching
    the reference's deltaBeta=0 guard)."""
    beta = beta.copy()
    K, V = beta.shape
    by_topic: dict[int, dict] = {k: {} for k in range(K)}
    for (k, v, n), c in ndkv_hist.items():
        by_topic[k].setdefault(v, []).append((n, c))
    for k in range(K):
        for _ in range(newton_iter):
            total = float(beta[k].sum())
            dig = digamma(total)
            denom = sum(c * (digamma(total + n) - dig)
                        for n, c in ndk_hists[k].items() if n > 0)
            diff = 0.0
            if denom == 0:
                break
            for v, pairs in by_topic[k].items():
                num = sum(c * (digamma(beta[k, v] + n) - digamma(beta[k, v]))
                          for n, c in pairs)
                new = beta[k, v] * (num / denom) + d_beta
                diff = max(diff, abs(beta[k, v] - new))
                beta[k, v] = new
            if diff <= newton_converge:
                break
    return beta


def train_dcmlda(doc_vecs, *, n_topics: int, vocab_size: int,
                 n_em_iters: int = 5, inner_iters: int = 5,
                 d_alpha: float = 1.05, d_beta: float = 1.01,
                 newton_iter: int = 30, newton_converge: float = 1e-3,
                 seed: int = 41, n_blocks: int = 4):
    """doc_vecs: list of (tids, vals). Returns dict with the learned priors
    (α, per-topic β), the normalized corpus topic-word estimate and per-doc
    topic proportions."""
    K, V = n_topics, vocab_size
    n_blocks = max(1, min(n_blocks, len(doc_vecs)))
    blocks = [doc_vecs[i::n_blocks] for i in range(n_blocks)]
    block_refs = [ray.put(b) for b in blocks]
    states = [None] * len(blocks)
    alpha = np.full(K, d_alpha)
    beta = np.full((K, V), d_beta)

    for rnd in range(n_em_iters):
        total_beta = beta.sum(axis=1)
        outs = ray.get([
            _dcm_block.remote(ref, states[i], alpha, beta, total_beta, K, V,
                              inner_iters, seed + i, rnd)
            for i, ref in enumerate(block_refs)
        ])
        mm_theta = np.zeros(K)
        mm_theta2 = np.zeros(K)
        mm_phi = np.zeros((K, V))
        n_docs = 0
        len_hist: Counter = Counter()
        ndk_hists = [Counter() for _ in range(K)]
        ndkv_hist: Counter = Counter()
        for i, (st, t1, t2, ph, nd, lh, nh, nvh) in enumerate(outs):
            states[i] = st
            mm_theta += t1
            mm_theta2 += t2
            mm_phi += ph
            n_docs += nd
            len_hist.update(lh)
            for k in range(K):
                ndk_hists[k].update(nh[k])
            ndkv_hist.update(nvh)
        # initialAlphaBeta moment matching (:329-371)
        alpha = mm_theta / n_docs + d_alpha
        beta = mm_phi / n_docs + d_beta
        # fixed points (:374-450)
        alpha = _fixed_point_alpha(alpha, len_hist, ndk_hists, n_docs,
                                   newton_iter=newton_iter,
                                   newton_converge=newton_converge)
        beta = _fixed_point_beta(beta, ndk_hists, ndkv_hist, d_beta,
                                 newton_iter=newton_iter,
                                 newton_converge=newton_converge)

    # final estimates: normalized priors + per-doc topic proportions
    phi = beta / beta.sum(axis=1, keepdims=True)
    doc_topics = []
    for st in states:
        th = np.array([(n_dk + alpha) / (n_dk + alpha).sum()
                       for _z, n_dk, _w in st])
        doc_topics.append(th)
    return {"alpha": alpha, "beta": beta, "topic_term": phi,
            "doc_topics": doc_topics, "block_split": n_blocks}
