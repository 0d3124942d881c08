"""DCM-CorrLDA (``topicmodels/correspondenceModels/DCMCorrLDA.java``
extending ``DCMLDA4AC.java``) — the DCM × correspondence hybrid: every
parent (article) owns its OWN K×V word-topic multinomials (the DCM side,
as in ``pipelines/dcmlda.py``), and its child comments draw topics from a
parent-coupled Dirichlet (the corrLDA side).

Transcribed semantics (line refs into DCMCorrLDA.java):

- init (:40-78): parent + child tokens all count into the PARENT's
  ``m_wordTopic_stat``/``m_topic_stat``; μ is computed as cosine then
  OVERWRITTEN with 0.5 (``computeMu4Doc`` :81-86 — reference quirk, kept).
- parent token resample (:107-146): (wordTopic+β[t][w])/(topic_stat+Σβ_t) ·
  (npar_t+α_t)/(|p|+Σα) · Π_children gammaRatio(nchild_t, μ/|p|_tok,
  α+npar_t·μ/|p|_tok)/…  (the doc-prob denominator uses the UNIQUE-term
  count ``getDocInferLength``, the influence μ/|p| the total token count —
  both quirks kept).
- child token resample (:148-186): same parent-owned word prob ·
  (α_c_t + μDp·npar_t + nchild_t)/(Σα_c + μDp·Σnpar + Σnchild) with
  μDp = μ/Σnpar.
- M-step (``updateParameter`` :254-268): data-driven re-init of α, α_c, β
  (``initialAlphaBeta`` :270-329: α = mean parent topic proportion, α_c =
  mean child proportion, β[k][v] = mean parent word-topic proportion + d_β,
  parents with npar_k = 0 skip the word term), then Minka-style fixed
  points — updateAlpha (:331-382, parent lengths/counts; evaluated from
  count HISTOGRAMS on the driver, no per-Newton-iteration cluster rounds —
  the ``pipelines/dcmlda.py`` pattern), updateAlphaC (:384-437, per
  (parent, child) pair with the continuous μDp·npar_k shift — evaluated
  from gathered per-pair shift/count arrays, K floats per child),
  updateBeta (:439-498 over the parent-owned tables via (count → #parents)
  histograms; zero-count words reset to d_β, an all-zero topic is left
  untouched).
- stat collection (:510-527): parent m_topics += sstat+α, child m_topics +=
  sstat+α_c+μDp·npar (μDp = μ/|p| total tokens); accumulated every round,
  L1-normalised at the end.

Distributed shape: there is NO shared corpus-level count table — each
unit's tables are parent-owned — so units are embarrassingly parallel given
(α, α_c, β): blocks of units pinned once, ``inner_iters`` Gibbs sweeps per
round per block, then small hyperparameter partials (histograms + pair
arrays) merge on the driver. Deterministic per-block Philox streams.


The multi-threaded E-step variants (``correspondenceModels/DCMCorrLDA_multi.java`` / ``DCMCorrLDA_multi_E.java``) distribute exactly as this pipeline's per-parent blocks.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

import ray

from ir_base_ray.functions.gammamath import digamma
from ir_base_ray.pipelines.acctm import _expand, _gamma_func_ratio


def _init_unit(parent_vec, child_vecs, K, V, rng):
    """Parent-owned tables; all tokens random-topic (:40-78); μ = 0.5."""
    p_tids, p_vals = parent_vec
    p_words = _expand(p_tids, p_vals)
    p_z = rng.integers(0, K, size=p_words.size)
    npar = np.zeros(K)
    np.add.at(npar, p_z, 1.0)
    word_topic = np.zeros((K, V))
    topic_stat = np.zeros(K)
    np.add.at(word_topic, (p_z, p_words), 1.0)
    np.add.at(topic_stat, p_z, 1.0)
    n_uniq = len(np.asarray(p_tids))
    children = []
    for (c_tids, c_vals) in child_vecs:
        c_words = _expand(c_tids, c_vals)
        c_z = rng.integers(0, K, size=c_words.size)
        nch = np.zeros(K)
        np.add.at(nch, c_z, 1.0)
        np.add.at(word_topic, (c_z, c_words), 1.0)
        np.add.at(topic_stat, c_z, 1.0)
        children.append([c_words, c_z, nch, 0.5])   # mu forced 0.5 (:81-86)
    return [p_words, p_z, npar, word_topic, topic_stat, n_uniq, children]


def _sample_unit(us, alpha, alpha_c, beta, total_beta, K, rng):
    """One sweep (parent then children). Uniforms are pre-drawn in ONE
    ``rng.random(total)`` call (identical Philox stream to per-token draws)
    and the sweep runs in the compile-once C kernel
    (functions/ckernels.dcmcorr_kernel) with the identical IEEE op
    sequence — kernel == python bit-exact (tests/test_ckernels_acctm.py);
    the loop below is the compiler-less fallback and parity oracle."""
    from ir_base_ray.functions.ckernels import dcmcorr_kernel

    p_words, p_z, npar, wt, ts, n_uniq, children = us
    total_alpha = float(alpha.sum())
    total_alpha_c = float(alpha_c.sum())
    p_len = float(p_words.size)
    total = p_words.size + sum(c[0].size for c in children)
    if total == 0:
        return
    uarr = rng.random(total)
    lib = dcmcorr_kernel()
    if lib is not None:
        _sample_unit_kernel(lib, us, alpha, alpha_c, beta, total_beta, K,
                            total_alpha, total_alpha_c, p_len, uarr)
        return
    pos = 0
    # ---- parent (:107-146)
    for i in range(p_words.size):
        wid = p_words[i]
        t = p_z[i]
        npar[t] -= 1.0
        ts[t] -= 1.0
        wt[t, wid] -= 1.0
        infl = np.ones(K)
        for ch in children:
            nch, mu = ch[2], ch[3]
            mu_dp = mu / p_len
            denom = _gamma_func_ratio(int(nch[0]), mu_dp,
                                      alpha[0] + npar[0] * mu_dp)
            for k in range(1, K):
                infl[k] *= _gamma_func_ratio(
                    int(nch[k]), mu_dp, alpha[k] + npar[k] * mu_dp) / denom
        cache = (wt[:, wid] + beta[:, wid]) / (ts + total_beta) \
            * (npar + alpha) / (n_uniq + total_alpha) * infl
        cum = np.cumsum(cache)
        u = cum[-1] * uarr[pos]
        pos += 1
        t = int(np.searchsorted(cum, u, side="left"))
        if t >= K:
            t = K - 1
        p_z[i] = t
        npar[t] += 1.0
        ts[t] += 1.0
        wt[t, wid] += 1.0
    # ---- children (:148-186)
    for ch in children:
        c_words, c_z, nch, mu = ch
        for i in range(c_words.size):
            wid = c_words[i]
            t = c_z[i]
            wt[t, wid] -= 1.0
            ts[t] -= 1.0
            nch[t] -= 1.0
            p_sum = npar.sum()
            c_sum = nch.sum()
            mu_dp = mu / p_sum
            cache = (wt[:, wid] + beta[:, wid]) / (ts + total_beta) \
                * (alpha_c + mu_dp * npar + nch) \
                / (total_alpha_c + mu_dp * p_sum + c_sum)
            cum = np.cumsum(cache)
            u = cum[-1] * uarr[pos]
            pos += 1
            t = int(np.searchsorted(cum, u, side="left"))
            if t >= K:
                t = K - 1
            c_z[i] = t
            nch[t] += 1.0
            ts[t] += 1.0
            wt[t, wid] += 1.0


def _sample_unit_kernel(lib, us, alpha, alpha_c, beta, total_beta, K,
                        total_alpha, total_alpha_c, p_len, uarr):
    """C-kernel twin of _sample_unit's loop (same mutation contract)."""
    import ctypes

    P = ctypes.POINTER
    f64, i64 = ctypes.c_double, ctypes.c_int64

    def dp(a):
        return a.ctypes.data_as(P(f64))

    def ip(a):
        return a.ctypes.data_as(P(i64))

    p_words, p_z, npar, wt, ts, n_uniq, children = us
    V = wt.shape[1]
    nc = len(children)
    beta = np.ascontiguousarray(beta)
    total_beta = np.ascontiguousarray(total_beta)
    alpha = np.ascontiguousarray(alpha)
    alpha_c = np.ascontiguousarray(alpha_c)
    cache = np.empty(K, dtype=np.float64)
    infl = np.empty(K, dtype=np.float64)
    if p_words.size:
        ccounts = (np.ascontiguousarray(
            np.stack([c[2] for c in children]), dtype=np.float64)
            if nc else np.zeros((1, K)))
        mus = np.array([c[3] for c in children], dtype=np.float64) \
            if nc else np.zeros(1)
        lib.dcmcorr_parent(ip(p_words), p_words.size, ip(p_z), dp(npar),
                           dp(wt), dp(ts), dp(beta), dp(total_beta),
                           dp(alpha), n_uniq + total_alpha, K, V, nc,
                           dp(ccounts), dp(mus), p_len,
                           dp(uarr[:p_words.size]), dp(cache), dp(infl))
    pos = p_words.size
    for (c_words, c_z, nch, mu) in children:
        if c_words.size:
            lib.dcmcorr_child(ip(c_words), c_words.size, ip(c_z), dp(nch),
                              dp(wt), dp(ts), dp(beta), dp(total_beta),
                              dp(alpha_c), total_alpha_c, dp(npar),
                              float(mu), K, V,
                              dp(uarr[pos:pos + c_words.size]), dp(cache))
        pos += c_words.size


@ray.remote
def _dcmcorr_block(units, state, alpha, alpha_c, beta, K, V, inner_iters,
                   seed, rnd, collect):
    """Gibbs sweeps + hyperparameter partials for one block of units."""
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[rnd, 0, 0, 0]))
    if state is None:
        unit_states = [_init_unit(pv, cvs, K, V, rng) for (pv, cvs) in units]
        acc = [(np.zeros(K), [np.zeros(K) for _ in us[6]])
               for us in unit_states]
    else:
        unit_states, acc = state
        unit_states = [[u[0], u[1].copy(), u[2].copy(), u[3].copy(),
                        u[4].copy(), u[5],
                        [[c[0], c[1].copy(), c[2].copy(), c[3]]
                         for c in u[6]]] for u in unit_states]
        acc = [(p.copy(), [c.copy() for c in cs]) for (p, cs) in acc]
        total_beta = beta.sum(axis=1)
        for us in unit_states:
            for _ in range(inner_iters):
                _sample_unit(us, alpha, alpha_c, beta, total_beta, K, rng)
    # ---- partials
    mm_alpha = np.zeros(K)
    mm_alpha_c = np.zeros(K)
    mm_phi_num = np.zeros((K, V))
    n_parents = 0
    n_children = 0
    len_hist: Counter = Counter()
    ndk_hists = [Counter() for _ in range(K)]
    ts_hists = [Counter() for _ in range(K)]
    wt_hist: Counter = Counter()
    pairs = []                           # (shift (K,), nch (K,), c_len)
    for ui, us in enumerate(unit_states):
        p_words, p_z, npar, wt, ts, n_uniq, children = us
        p_len = float(p_words.size)
        mm_alpha += npar / p_len
        for k in range(K):
            if npar[k] != 0:
                mm_phi_num[k] += wt[k] / ts[k]
            ndk_hists[k][int(npar[k])] += 1
            ts_hists[k][int(ts[k])] += 1
            nz = np.nonzero(wt[k])[0]
            for v in nz:
                wt_hist[(k, int(v), int(wt[k, v]))] += 1
        len_hist[int(p_len)] += 1
        n_parents += 1
        for ch in children:
            c_words, _cz, nch, mu = ch
            c_len = float(c_words.size)
            if c_len > 0:
                mm_alpha_c += nch / c_len
            n_children += 1
            pairs.append((mu / p_len * npar.copy(), nch.copy(), c_len, mu))
        if collect:
            p_acc, c_accs = acc[ui]
            p_acc += npar + alpha
            mu_dp_len = 1.0 / p_len
            for ci, ch in enumerate(children):
                c_accs[ci] += ch[2] + alpha_c + ch[3] * mu_dp_len * npar
    return (unit_states, acc), mm_alpha, mm_alpha_c, mm_phi_num, \
        n_parents, n_children, len_hist, ndk_hists, ts_hists, wt_hist, pairs


def _update_alpha(alpha, len_hist, ndk_hists, *, newton_iter,
                  newton_converge):
    """updateAlpha (:331-382) from parent histograms."""
    alpha = alpha.copy()
    K = alpha.size
    for _ in range(newton_iter):
        total = float(alpha.sum())
        dig = digamma(total)
        denom = sum(c * (digamma(l + total) - dig)
                    for l, c in len_hist.items())
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


def _update_alpha_c(alpha_c, pairs, *, newton_iter, newton_converge):
    """updateAlphaC (:384-437) from gathered per-(parent, child) arrays."""
    alpha_c = alpha_c.copy()
    K = alpha_c.size
    for _ in range(newton_iter):
        total = float(alpha_c.sum())
        denom = 0.0
        num = np.zeros(K)
        for (shift, nch, c_len, mu) in pairs:
            t_total = total + mu
            denom += digamma(c_len + t_total) - digamma(t_total)
            for k in range(K):
                num[k] += digamma(alpha_c[k] + shift[k] + nch[k]) \
                    - digamma(alpha_c[k] + shift[k])
        diff = 0.0
        for k in range(K):
            new = alpha_c[k] * (num[k] / denom) if denom else alpha_c[k]
            diff = max(diff, abs(alpha_c[k] - new))
            alpha_c[k] = new
        if diff <= newton_converge:
            break
    return alpha_c


def _update_beta(beta, ts_hists, wt_hist, d_beta, *, newton_iter,
                 newton_converge):
    """updateBeta (:439-498) from parent-owned table histograms: zero-count
    words reset to d_β; an entirely empty topic is left untouched."""
    beta = beta.copy()
    K, V = beta.shape
    by_topic: dict[int, dict] = {k: {} for k in range(K)}
    for (k, v, n), c in wt_hist.items():
        by_topic[k].setdefault(v, []).append((n, c))
    for k in range(K):
        any_words = any(n > 0 for n, _c in
                        (p for ps in by_topic[k].values() for p in ps))
        for _ in range(newton_iter):
            if not any_words:
                break
            total = float(beta[k].sum())
            dig = digamma(total)
            denom = sum(c * (digamma(total + n) - dig)
                        for n, c in ts_hists[k].items())
            diff = 0.0
            nonzero = by_topic[k]
            for v in range(V):
                pairs = nonzero.get(v)
                if pairs is None:
                    delta = 0.0
                else:
                    num = sum(c * (digamma(beta[k, v] + n)
                                   - digamma(beta[k, v])) for n, c in pairs)
                    delta = num / denom if denom else 0.0
                new = beta[k, v] * delta + d_beta
                diff = max(diff, abs(beta[k, v] - new))
                beta[k, v] = new
            if diff <= newton_converge:
                break
    return beta


def train_dcmcorrlda(units, *, n_topics: int, vocab_size: int,
                     n_em_iters: int = 5, inner_iters: int = 5,
                     d_beta: float = 0.01, newton_iter: int = 30,
                     newton_converge: float = 1e-3, seed: int = 47,
                     n_blocks: int = 4):
    """units: list of (parent_vec, [child_vec...]). → dict with α, α_c,
    β (K×V), accumulated parent/child topic proportions."""
    K, V = n_topics, vocab_size
    n_blocks = max(1, min(n_blocks, len(units)))
    splits = [units[i::n_blocks] for i in range(n_blocks)]
    refs = [ray.put(s) for s in splits]
    states = [None] * n_blocks
    alpha = np.full(K, 1.0 / K)
    alpha_c = np.full(K, 1.0 / K)
    beta = np.full((K, V), d_beta)

    for rnd in range(n_em_iters + 1):        # round 0 = init only
        collect = rnd > 0
        outs = ray.get([
            _dcmcorr_block.remote(r, states[i], alpha, alpha_c, beta, K, V,
                                  inner_iters, seed + i, rnd, collect)
            for i, r in enumerate(refs)
        ])
        mm_a = np.zeros(K)
        mm_ac = np.zeros(K)
        mm_phi = np.zeros((K, V))
        n_p = n_c = 0
        len_hist: Counter = Counter()
        ndk_hists = [Counter() for _ in range(K)]
        ts_hists = [Counter() for _ in range(K)]
        wt_hist: Counter = Counter()
        pairs = []
        for i, (st, ma, mac, mp, np_, nc_, lh, nh, th, wh, pr) in \
                enumerate(outs):
            states[i] = st
            mm_a += ma
            mm_ac += mac
            mm_phi += mp
            n_p += np_
            n_c += nc_
            len_hist.update(lh)
            for k in range(K):
                ndk_hists[k].update(nh[k])
                ts_hists[k].update(th[k])
            wt_hist.update(wh)
            pairs.extend(pr)
        # initialAlphaBeta (:270-329); tiny floor guards digamma(0) for a
        # topic no parent ever used (protective deviation, documented)
        alpha = np.maximum(mm_a / n_p, 1e-10)
        alpha_c = np.maximum(mm_ac / n_c if n_c else mm_ac, 1e-10)
        beta = mm_phi / (n_p + n_c) + d_beta
        alpha = _update_alpha(alpha, len_hist, ndk_hists,
                              newton_iter=newton_iter,
                              newton_converge=newton_converge)
        alpha_c = _update_alpha_c(alpha_c, pairs, newton_iter=newton_iter,
                                  newton_converge=newton_converge)
        beta = _update_beta(beta, ts_hists, wt_hist, d_beta,
                            newton_iter=newton_iter,
                            newton_converge=newton_converge)

    def l1(a):
        s = a.sum()
        return a / s if s > 0 else a

    n_units = len(units)
    parent_topics = [None] * n_units
    child_topics = [None] * n_units
    for b in range(n_blocks):
        unit_states, acc = states[b]
        for d, (p_acc, c_accs) in enumerate(acc):
            gi = b + d * n_blocks
            parent_topics[gi] = l1(p_acc)
            child_topics[gi] = [l1(c) for c in c_accs]
    return {"alpha": alpha, "alpha_c": alpha_c, "beta": beta,
            "parent_topics": parent_topics, "child_topics": child_topics,
            "block_split": n_blocks}
