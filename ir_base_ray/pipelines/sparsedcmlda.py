"""sparseDCMLDA + sparseClusterDCMLDA — the word-sparsity DCM variants
(``topicmodels/DCM/sparseDCMLDA.java``, ``sparseClusterDCMLDA.java``,
``structures/_Doc4SparseDCMLDA.java``; SURVEY.md §2.8 R7 / DCM family).

Semantics transcribed:

- per-doc topic on/off indicators x_k (``m_topicIndicator``), Beta(s,t)-prior
  switch: init x_k ~ nextBoolean (:_Doc4SparseDCMLDA.setTopics4Gibbs), token
  init rejection-samples a topic until its indicator is on (the reference
  would spin forever when ALL indicators draw off — 2^-K per doc; we redraw
  the indicator vector in that case, documented deviation);
- ``sampleTopicAssignment`` (sparseDCMLDA.java:131-178): probabilities only
  over on-topics, p_k = (n_dk+α_k)/(αDoc+Σn_dk) · (n_dkw+μβ)/(n_dk+μΣβ);
  the draw walk is the reference's off-by-one subtract loop (:160-165):
  ``tid=0; while(p>0 && tid<K-1){p-=cache[tid]; tid++}`` — the chosen topic
  is searchsorted_left(cum,u)+1 capped at K-1, i.e. TOPIC 0 IS NEVER
  RE-SAMPLED and the +1 can land on an off topic (whose indicator is then
  forced back on by the n_dk>0 rule). Quirk transcribed, pinned by test.
  The cluster variant uses the corrected increment-first walk
  (sparseClusterDCMLDA.java:306-317) = plain searchsorted-left, also
  transcribed;
- ``sampleOnOffIndicator`` (:180-214): per topic ascending, forced on when
  n_dk>0, else off with prob 1/(Q+1) where Q = (s+n_on)/(t+K-1-n_on) ·
  Π_{i<L}(αDoc'+i)/(αDoc'+α_k+i) (sequential product, Java order);
- M-step (``updateParameter`` → overridden ``initialAlphaBeta``): α/β are
  RE-RANDOMIZED uniform+prior every M-step (sparseDCMLDA.java:96-115 — the
  override replaces DCMLDA's moment matching), then the indicator-masked α
  fixed point (:251-312: only docs with x_k on contribute; ψ(L+αDoc)−ψ(αDoc)
  denominators held fixed through the Newton loop exactly as the reference
  leaves m_alphaDoc stale) and the DCMLDA β fixed point (histogram form);
- cluster variant: a corpus-level cluster indicator per doc with
  CRP-ish log-space sampling (``sampleClusterIndex`` :100-186: remove doc
  from its cluster tables, score log P(words|cluster) via the ascending
  log-gamma-ratio sums + log(γ+clusterStats), max-subtracted exp walk) and
  cluster-owned (C,K,V) word tables replacing the per-doc DCM tables in the
  word factor (:331-335). β's fixed point sums the reference's harmonic
  loops Σ 1/(i+x), written here as ψ(x+n)−ψ(x) (identical closed form).

Distribution: the sparse variant is embarrassingly parallel per doc given
(α, β) — same pinned-block shape as DCM-LDA. The cluster variant couples
docs through the shared cluster tables → AD-style block-local copies with
fixed-order delta merge per round (same device as lda.py's AD-LDA).
Determinism: per-block seeded Philox streams, fixed doc order (the
reference's unseeded ``m_rand`` + ``permutation()`` replaced, same policy as
DCM-LDA); the per-M-step α/β re-randomization draws from a seeded driver
stream.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

import ray

from ir_base_ray.functions.gammamath import digamma
from ir_base_ray.pipelines.dcmlda import _fixed_point_beta


def _expand(tids, vals):
    j = np.asarray(tids, dtype=np.int64)
    v = np.asarray(vals, dtype=np.int64)
    return np.repeat(j, v)


def _init_doc(words, K, V, alpha, rng):
    """_Doc4SparseDCMLDA.setTopics4Gibbs(k, alpha, V)."""
    while True:
        x = rng.integers(0, 2, size=K).astype(bool)
        if x.any():
            break  # all-off would spin the reference's rejection loop forever
    z = np.empty(words.size, dtype=np.int64)
    for i in range(words.size):
        while True:
            t = int(rng.integers(0, K))
            if x[t]:
                break
        z[i] = t
    n_dk = np.zeros(K)
    np.add.at(n_dk, z, 1.0)
    n_dkw = np.zeros((K, V))
    np.add.at(n_dkw, (z, words), 1.0)
    return {"words": words, "z": z, "n_dk": n_dk, "n_dkw": n_dkw, "x": x,
            "alpha_doc": float(alpha[x].sum()), "n_on": int(x.sum())}


def _sample_topics(doc, alpha, beta, total_beta, rng, *, mu=1.0,
                   cluster_wt=None, cluster_ts=None):
    """sampleTopicAssignment — sparse walk (off-by-one) when cluster_wt is
    None, cluster walk (increment-first) otherwise.

    Pre-drawn uniforms + compile-once C kernel
    (functions/ckernels.sparsedcm_kernel), bit-exact with the Python
    fallback below (tests/test_ckernels_acctm.py)."""
    from ir_base_ray.functions.ckernels import sparsedcm_kernel

    K = alpha.size
    words, z, n_dk, n_dkw, x = (doc["words"], doc["z"], doc["n_dk"],
                                doc["n_dkw"], doc["x"])
    xf = x.astype(np.float64)
    if words.size == 0:
        return
    us = rng.random(words.size)
    lib = sparsedcm_kernel()
    if lib is not None:
        import ctypes

        P = ctypes.POINTER
        f64, i64 = ctypes.c_double, ctypes.c_int64

        def dp(a):
            return None if a is None else a.ctypes.data_as(P(f64))

        def ip(a):
            return a.ctypes.data_as(P(i64))

        cache = np.empty(K, dtype=np.float64)
        beta_c = np.ascontiguousarray(beta)
        tb_c = np.ascontiguousarray(total_beta)
        al_c = np.ascontiguousarray(alpha)
        lib.sparse_topics(ip(words), words.size, ip(z), dp(n_dk), dp(n_dkw),
                          dp(cluster_wt), dp(cluster_ts), dp(beta_c),
                          dp(tb_c), dp(al_c), dp(xf),
                          float(doc["alpha_doc"]), float(mu), K,
                          n_dkw.shape[1], 0 if cluster_wt is None else 1,
                          dp(us), dp(cache))
        return
    pos = 0
    for i in range(words.size):
        wid = words[i]
        t = z[i]
        n_dk[t] -= 1.0
        n_dkw[t, wid] -= 1.0
        if cluster_wt is not None:
            cluster_wt[t, wid] -= 1.0
            cluster_ts[t] -= 1.0
        denominator = doc["alpha_doc"] + float(n_dk.sum())
        if cluster_wt is None:
            word_f = (n_dkw[:, wid] + mu * beta[:, wid]) \
                / (n_dk + mu * total_beta)
        else:
            word_f = (cluster_wt[:, wid] + mu * beta[:, wid]) \
                / (cluster_ts + mu * total_beta)
        cache = xf * ((n_dk + alpha) / denominator * word_f)
        cum = np.cumsum(cache)
        u = cum[-1] * us[pos]
        pos += 1
        j = int(np.searchsorted(cum, u, side="left"))
        if cluster_wt is None:
            t = min(j + 1, K - 1)        # the sparse off-by-one walk
        else:
            t = min(j, K - 1)            # cluster variant: corrected walk
        z[i] = t
        n_dk[t] += 1.0
        n_dkw[t, wid] += 1.0
        if cluster_wt is not None:
            cluster_wt[t, wid] += 1.0
            cluster_ts[t] += 1.0


def _sample_indicators(doc, alpha, K, s_param, t_param, rng):
    """sampleOnOffIndicator (:180-214). A uniform is drawn only at topics
    with n_dk[k]==0; n_dk is read-only here, so the draw count is known up
    front — pre-draw exactly that many (identical Philox stream) and run
    the C kernel when available (bit-exact, tests/test_ckernels_acctm.py)."""
    from ir_base_ray.functions.ckernels import sparsedcm_kernel

    x, n_dk = doc["x"], doc["n_dk"]
    L = doc["words"].size
    us = rng.random(int(np.count_nonzero(n_dk <= 0.0)))
    lib = sparsedcm_kernel()
    if lib is not None:
        import ctypes

        P = ctypes.POINTER
        f64, i64 = ctypes.c_double, ctypes.c_int64
        xu = np.ascontiguousarray(x.view(np.uint8))
        ad = np.array([doc["alpha_doc"]], dtype=np.float64)
        no = np.array([doc["n_on"]], dtype=np.int64)
        lib.sparse_indicators(
            xu.ctypes.data_as(P(ctypes.c_uint8)),
            n_dk.ctypes.data_as(P(f64)),
            np.ascontiguousarray(alpha).ctypes.data_as(P(f64)),
            K, L, float(s_param), float(t_param),
            ad.ctypes.data_as(P(f64)), no.ctypes.data_as(P(i64)),
            us.ctypes.data_as(P(f64)))
        x[:] = xu.view(bool)
        doc["alpha_doc"] = float(ad[0])
        doc["n_on"] = int(no[0])
        return
    pos = 0
    for k in range(K):
        if x[k]:
            doc["n_on"] -= 1
            doc["alpha_doc"] -= alpha[k]
        if n_dk[k] > 0:
            xk = True
        else:
            term1 = doc["alpha_doc"]
            term2 = alpha[k]
            q = (s_param + doc["n_on"]) / (t_param + K - 1 - doc["n_on"])
            if L:
                i_arr = np.arange(L, dtype=np.float64)
                for r in ((term1 + i_arr) / (term1 + term2 + i_arr)).tolist():
                    q *= r               # sequential, Java order
            xk = not ((q + 1.0) * us[pos] < 1.0)
            pos += 1
        x[k] = xk
        if xk:
            doc["n_on"] += 1
            doc["alpha_doc"] += alpha[k]


@ray.remote
def _sparse_block(block, state, alpha, beta, K, V, inner_iters, s_param,
                  t_param, seed, rnd):
    """inner_iters E-step sweeps for one pinned block; returns doc states +
    the α-fixed-point partials (indicator-masked) + β histograms."""
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[rnd, 0, 0, 0]))
    total_beta = beta.sum(axis=1)
    if state is None:
        docs = [_expand(t, v) for t, v in block]
        state = [_init_doc(w, K, V, alpha, rng) for w in docs]
    else:
        state = [{**d, "z": d["z"].copy(), "n_dk": d["n_dk"].copy(),
                  "n_dkw": d["n_dkw"].copy(), "x": d["x"].copy()}
                 for d in state]
    for _ in range(inner_iters):
        for d in state:
            _sample_topics(d, alpha, beta, total_beta, rng)
            _sample_indicators(d, alpha, K, s_param, t_param, rng)
    # ---- M-step partials ----
    wordnum = np.zeros(K)                 # Σ_{x_k} n_dk
    denom = np.zeros(K)                   # Σ_{x_k} ψ(L+αDoc)−ψ(αDoc)
    ndk_on_hists = [Counter() for _ in range(K)]   # n_dk | x_k on
    ndk_hists = [Counter() for _ in range(K)]      # all docs (β update)
    ndkv_hist: Counter = Counter()
    wts_part = np.zeros((K, V))
    for d in state:
        L = d["words"].size
        wts_part += d["n_dkw"]
        for k in range(K):
            ndk_hists[k][int(d["n_dk"][k])] += 1
            if d["x"][k]:
                wordnum[k] += d["n_dk"][k]
                denom[k] += digamma(L + d["alpha_doc"]) \
                    - digamma(d["alpha_doc"])
                ndk_on_hists[k][int(d["n_dk"][k])] += 1
        ks, vs = np.nonzero(d["n_dkw"])
        for k, v in zip(ks.tolist(), vs.tolist()):
            ndkv_hist[(k, v, int(d["n_dkw"][k, v]))] += 1
    return state, wordnum, denom, ndk_on_hists, ndk_hists, ndkv_hist, wts_part


def _sparse_alpha_fixed_point(alpha, wordnum, denom, ndk_on_hists, d_alpha,
                              *, newton_iter, newton_converge):
    """sparseDCMLDA.updateAlpha (:251-312): indicator-masked Minka step with
    the stale-αDoc denominators (held constant through the loop)."""
    alpha = alpha.copy()
    K = alpha.size
    for _ in range(newton_iter + 1):
        diff = 0.0
        for k in range(K):
            if wordnum[k] == 0:
                delta = 0.0
            else:
                num = sum(c * (digamma(alpha[k] + n) - digamma(alpha[k]))
                          for n, c in ndk_on_hists[k].items())
                delta = num / denom[k] if denom[k] else 0.0
            new = alpha[k] * delta + d_alpha
            diff = max(diff, abs(alpha[k] - new))
            alpha[k] = new
        if diff <= newton_converge:
            break
    return alpha


def train_sparse_dcmlda(doc_vecs, *, n_topics: int, vocab_size: int,
                        n_em_iters: int = 3, inner_iters: int = 4,
                        d_alpha: float = 1.05, d_beta: float = 1.01,
                        s_param: float = 1.0, t_param: float = 1.0,
                        newton_iter: int = 30, newton_converge: float = 1e-3,
                        seed: int = 43, n_blocks: int = 4):
    """Returns the learned priors, the normalized corpus topic-word estimate
    (word_topic_sstat + μβ, collectStats :393-400) and per-doc indicator
    vectors / topic proportions."""
    K, V = n_topics, vocab_size
    n_blocks = max(1, min(n_blocks, len(doc_vecs)))
    blocks = [doc_vecs[i::n_blocks] for i in range(n_blocks)]
    block_refs = [ray.put(b) for b in blocks]
    states = [None] * len(blocks)
    init_rng = np.random.Generator(np.random.Philox(key=seed * 7 + 1,
                                                    counter=[0, 0, 0, 0]))
    alpha = init_rng.random(K) + d_alpha           # initialAlphaBeta :96-115
    beta = init_rng.random((K, V)) + d_beta
    wts_total = np.zeros((K, V))

    for rnd in range(n_em_iters):
        outs = ray.get([
            _sparse_block.remote(ref, states[i], alpha, beta, K, V,
                                 inner_iters, s_param, t_param, seed + i, rnd)
            for i, ref in enumerate(block_refs)
        ])
        wordnum = np.zeros(K)
        denom = np.zeros(K)
        ndk_on_hists = [Counter() for _ in range(K)]
        ndk_hists = [Counter() for _ in range(K)]
        ndkv_hist: Counter = Counter()
        wts_total = np.zeros((K, V))
        for i, (st, wn, dn, noh, nh, nvh, wp) in enumerate(outs):
            states[i] = st
            wordnum += wn
            denom += dn
            wts_total += wp
            for k in range(K):
                ndk_on_hists[k].update(noh[k])
                ndk_hists[k].update(nh[k])
            ndkv_hist.update(nvh)
        # updateParameter: RE-RANDOMIZED α/β (the overridden initialAlphaBeta)
        mrng = np.random.Generator(np.random.Philox(key=seed * 7 + 1,
                                                    counter=[rnd + 1, 0, 0, 0]))
        alpha = mrng.random(K) + d_alpha
        beta = mrng.random((K, V)) + d_beta
        alpha = _sparse_alpha_fixed_point(alpha, wordnum, denom, ndk_on_hists,
                                          d_alpha, newton_iter=newton_iter,
                                          newton_converge=newton_converge)
        beta = _fixed_point_beta(beta, ndk_hists, ndkv_hist, d_beta,
                                 newton_iter=newton_iter,
                                 newton_converge=newton_converge)

    # collectStats: topic_term = Σ_docs n_dkw + μβ, L1-normalized
    tt = wts_total + beta
    phi = tt / tt.sum(axis=1, keepdims=True)
    doc_topics, doc_indicators = [], []
    for st in states:
        th, xs = [], []
        for d in st:
            masked = np.where(d["x"], d["n_dk"] + alpha, 0.0)
            ssum = masked.sum()
            th.append(masked / ssum if ssum else masked)
            xs.append(d["x"].copy())
        doc_topics.append(np.array(th))
        doc_indicators.append(np.array(xs))
    return {"alpha": alpha, "beta": beta, "topic_term": phi,
            "doc_topics": doc_topics, "doc_indicators": doc_indicators,
            "block_split": n_blocks}


# ------------------------------------------------------------ cluster variant

def _log_gamma_ratio(start: float, count: int) -> float:
    """sparseClusterDCMLDA.logGammaRatio: Σ_{i=0}^{count-1} log(start+i),
    summed in the reference's order."""
    if count <= 0:
        return 0.0
    return float(sum(np.log(start + np.arange(count, dtype=np.float64))
                     .tolist()))


def _sample_cluster(doc, cid, cl_stats, cl_ts, cl_wt, beta, total_beta,
                    gamma, rng):
    """sampleClusterIndex (:100-186): remove doc, log-score each cluster,
    max-subtracted exp walk (searchsorted-left)."""
    C = cl_stats.size
    n_dk, n_dkw = doc["n_dk"], doc["n_dkw"]
    cl_stats[cid] -= 1.0
    cl_ts[cid] -= n_dk
    cl_wt[cid] -= n_dkw
    scores = np.empty(C)
    ks, vs = np.nonzero(n_dkw)
    for c in range(C):
        wcp = 0.0
        for k in range(n_dk.size):
            prod = 0.0
            for v in vs[ks == k].tolist():
                prod += _log_gamma_ratio(beta[k, v] + cl_wt[c, k, v],
                                         int(n_dkw[k, v]))
            if n_dk[k] == 0:
                continue
            wcp += prod - _log_gamma_ratio(total_beta[k] + cl_ts[c, k],
                                           int(n_dk[k]))
        scores[c] = wcp + np.log(gamma + cl_stats[c])
    e = np.exp(scores - scores.max())
    e[e < np.finfo(np.float64).tiny] = 0.0    # the Double.MIN_VALUE clamp
    cum = np.cumsum(e)
    u = cum[-1] * rng.random()
    cid = min(int(np.searchsorted(cum, u, side="left")), C - 1)
    cl_stats[cid] += 1.0
    cl_ts[cid] += n_dk
    cl_wt[cid] += n_dkw
    return cid


@ray.remote
def _cluster_block(block, state, alpha, beta, cl_stats, cl_ts, cl_wt, K, V,
                   inner_iters, s_param, t_param, gamma, seed, rnd):
    """AD-style epoch for the cluster variant: block-local copies of the
    shared cluster tables, inner_iters sweeps (topics → indicators →
    cluster), delta-merged by the driver in fixed block order."""
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[rnd, 0, 0, 0]))
    total_beta = beta.sum(axis=1)
    cl_stats = cl_stats.copy()
    cl_ts = cl_ts.copy()
    cl_wt = cl_wt.copy()
    C = cl_stats.size
    if state is None:
        docs = [_expand(t, v) for t, v in block]
        state = []
        for w in docs:
            d = _init_doc(w, K, V, alpha, rng)
            d["cid"] = int(rng.integers(0, C))    # setTopics4GibbsCluster
            cl_stats[d["cid"]] += 1.0
            cl_ts[d["cid"]] += d["n_dk"]
            cl_wt[d["cid"]] += d["n_dkw"]
            state.append(d)
    else:
        state = [{**d, "z": d["z"].copy(), "n_dk": d["n_dk"].copy(),
                  "n_dkw": d["n_dkw"].copy(), "x": d["x"].copy()}
                 for d in state]
        for _ in range(inner_iters):
            for d in state:
                _sample_topics(d, alpha, beta, total_beta, rng,
                               cluster_wt=cl_wt[d["cid"]],
                               cluster_ts=cl_ts[d["cid"]])
                _sample_indicators(d, alpha, K, s_param, t_param, rng)
                d["cid"] = _sample_cluster(d, d["cid"], cl_stats, cl_ts,
                                           cl_wt, beta, total_beta, gamma,
                                           rng)
    # α partials (inherited sparse updateAlpha) — same as _sparse_block
    wordnum = np.zeros(K)
    denom = np.zeros(K)
    ndk_on_hists = [Counter() for _ in range(K)]
    wts_part = np.zeros((K, V))
    for d in state:
        L = d["words"].size
        wts_part += d["n_dkw"]
        for k in range(K):
            if d["x"][k]:
                wordnum[k] += d["n_dk"][k]
                denom[k] += digamma(L + d["alpha_doc"]) \
                    - digamma(d["alpha_doc"])
                ndk_on_hists[k][int(d["n_dk"][k])] += 1
    return state, cl_stats, cl_ts, cl_wt, wordnum, denom, ndk_on_hists, \
        wts_part


def _cluster_beta_fixed_point(beta, cl_ts, cl_wt, d_beta, *, newton_iter,
                              newton_converge):
    """sparseClusterDCMLDA.updateBeta (:336-392): harmonic sums over the
    merged cluster tables (ψ closed form), per topic."""
    beta = beta.copy()
    K, V = beta.shape
    for k in range(K):
        for _ in range(newton_iter):
            total = float(beta[k].sum())
            denom = 0.0
            for c in range(cl_ts.shape[0]):
                n = int(cl_ts[c, k])
                if n > 0:
                    denom += digamma(total + n) - digamma(total)
            wn = cl_wt[:, k, :].sum()
            if wn == 0 or denom == 0:
                break
            diff = 0.0
            wn_v = cl_wt[:, k, :].sum(axis=0)
            for v in range(V):
                if wn_v[v] == 0:
                    delta = 0.0
                else:
                    num = 0.0
                    for c in range(cl_wt.shape[0]):
                        n = int(cl_wt[c, k, v])
                        if n > 0:
                            num += digamma(beta[k, v] + n) \
                                - digamma(beta[k, v])
                    delta = num / denom
                new = beta[k, v] * delta + d_beta
                diff = max(diff, abs(beta[k, v] - new))
                beta[k, v] = new
            if diff <= newton_converge:
                break
    return beta


def train_sparse_cluster_dcmlda(doc_vecs, *, n_topics: int, vocab_size: int,
                                n_clusters: int = 3, gamma: float = 1.0,
                                n_em_iters: int = 3, inner_iters: int = 4,
                                d_alpha: float = 1.05, d_beta: float = 1.01,
                                s_param: float = 1.0, t_param: float = 1.0,
                                newton_iter: int = 10,
                                newton_converge: float = 1e-3,
                                seed: int = 53, n_blocks: int = 4):
    K, V, C = n_topics, vocab_size, n_clusters
    n_blocks = max(1, min(n_blocks, len(doc_vecs)))
    blocks = [doc_vecs[i::n_blocks] for i in range(n_blocks)]
    block_refs = [ray.put(b) for b in blocks]
    states = [None] * len(blocks)
    init_rng = np.random.Generator(np.random.Philox(key=seed * 7 + 1,
                                                    counter=[0, 0, 0, 0]))
    alpha = init_rng.random(K) + d_alpha
    beta = init_rng.random((K, V)) + d_beta
    cl_stats = np.zeros(C)
    cl_ts = np.zeros((C, K))
    cl_wt = np.zeros((C, K, V))
    wts_total = np.zeros((K, V))

    for rnd in range(n_em_iters + 1):       # round 0 = init epoch
        outs = ray.get([
            _cluster_block.remote(ref, states[i], alpha, beta, cl_stats,
                                  cl_ts, cl_wt, K, V, inner_iters, s_param,
                                  t_param, gamma, seed + i, rnd)
            for i, ref in enumerate(block_refs)
        ])
        new_stats, new_ts, new_wt = cl_stats.copy(), cl_ts.copy(), cl_wt.copy()
        wordnum = np.zeros(K)
        denom = np.zeros(K)
        ndk_on_hists = [Counter() for _ in range(K)]
        wts_total = np.zeros((K, V))
        for i, (st, cs, ct, cw, wn, dn, noh, wp) in enumerate(outs):
            states[i] = st
            new_stats += cs - cl_stats    # fixed-order delta merge
            new_ts += ct - cl_ts
            new_wt += cw - cl_wt
            wordnum += wn
            denom += dn
            wts_total += wp
            for k in range(K):
                ndk_on_hists[k].update(noh[k])
        cl_stats, cl_ts, cl_wt = new_stats, new_ts, new_wt
        if rnd == 0:
            continue                      # no M-step after the init epoch
        mrng = np.random.Generator(np.random.Philox(key=seed * 7 + 1,
                                                    counter=[rnd, 0, 0, 0]))
        alpha = mrng.random(K) + d_alpha
        beta = mrng.random((K, V)) + d_beta
        alpha = _sparse_alpha_fixed_point(alpha, wordnum, denom, ndk_on_hists,
                                          d_alpha, newton_iter=newton_iter,
                                          newton_converge=newton_converge)
        beta = _cluster_beta_fixed_point(beta, cl_ts, cl_wt, d_beta,
                                         newton_iter=newton_iter,
                                         newton_converge=newton_converge)

    tt = wts_total + beta                 # collectStats (word_topic_sstat+μβ)
    phi = tt / tt.sum(axis=1, keepdims=True)
    cluster_of_doc = []
    for st in states:
        cluster_of_doc.append(np.array([d["cid"] for d in st],
                                       dtype=np.int64))
    cp = cl_stats + gamma
    return {"alpha": alpha, "beta": beta, "topic_term": phi,
            "cluster_prob": cp / cp.sum(), "doc_clusters": cluster_of_doc,
            "block_split": n_blocks}
