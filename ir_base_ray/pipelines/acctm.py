"""ACCTM — Article-Comment Correspondence Topic Model (the correspondence
family's trainable mainline, ``topicmodels/correspondenceModels/ACCTM.java``
extending ``corrLDA_Gibbs.java`` / ``LDAGibbs4AC.java``; run by
``mains/TopicModelMain.java``). Collapsed Gibbs over parent (article) docs
and their child (comment) docs sharing one K×V count table.

Transcribed semantics (``ACCTM.java``):

- init (:40-67): word_topic_sstat = β, m_sstat = β·V; random topic per token
  (doc sstats are RAW counts, the α prior enters in the samplers); every
  child's μ = cosine(parent tf vector, child tf vector) (``computeMu4Doc``
  :69-73, mirroring ``Utils.cosine``).
- parent token resample (:83-125): p_k ∝ (wts[k][w]/m[k]) · (α + npar[k]) ·
  parentChildInfluenceProb(k), where for k>0 the influence is
  Π_children gammaFuncRatio(nchild_c[k], μ_c/Σnpar, α + npar[k]·μ_c/Σnpar)
                / gammaFuncRatio(nchild_c[0], μ_c/Σnpar, α + npar[0]·μ_c/Σnpar)
  with gammaFuncRatio(nc, m, A) = Π_{n=1..nc} (1 + m/(A+n−1))  (:127-152).
- child token resample (:154-208): p_k ∝ (wts[k][w]/m[k]) ·
  (α + μ·npar[k]/Σnpar + nchild[k]) / (Kα + μ + Σnchild).
- the draw walks the prob cache subtracting until ≤ 0 → first k with
  cum[k] ≥ u (searchsorted left).
- sample accumulation after burn-in every ``lag`` iterations
  (``LDA_Gibbs:171`` protocol): parent m_topics += sstat + α
  (``corrLDA_Gibbs.collectParentStats``), child m_topics += sstat + α +
  μ·npar[k]/Σnpar (``ACCTM.collectChildStats`` :210-218); corpus
  topic_term += word_topic_sstat; all L1-normalized at the end.

Determinism policy as ``pipelines/lda.py``: the reference's unseeded
``Random`` and per-E-step ``d.permutation()`` are a per-block seeded Philox
stream and fixed token order.

Distributed execution: a UNIT is one parent plus all its children —
units never split across blocks (the parent/child sstats are sampled
together), so only the K×V table is shared; blocks are pinned once and each
iteration is one remote epoch per block against a local copy of the global
counts, AD-LDA delta-merged in fixed block order (Newman et al., JMLR 2009).
1-block == serial bit-exact (pytest-pinned).
"""

from __future__ import annotations

import numpy as np

import ray


def cosine_mu(p_tids, p_vals, c_tids, c_vals) -> float:
    """``Utils.cosine`` over sparse tf vectors (0 when either norm is 0)."""
    pi = {int(t): float(v) for t, v in zip(p_tids, p_vals)}
    dot = sum(pi.get(int(t), 0.0) * float(v) for t, v in zip(c_tids, c_vals))
    np_ = np.sqrt(sum(v * v for v in pi.values()))
    nc = np.sqrt(sum(float(v) ** 2 for v in c_vals))
    if np_ == 0 or nc == 0:
        return 0.0
    return dot / (np_ * nc)


def _expand(tids, vals):
    """tf-expand a sparse vector into Gibbs tokens."""
    j = np.asarray(tids, dtype=np.int64)
    v = np.asarray(vals, dtype=np.int64)
    return np.repeat(j, v)


def _gamma_func_ratio(nc: int, mu_dp: float, alpha_mu_np: float) -> float:
    if nc == 0:
        return 1.0
    n = np.arange(1, nc + 1, dtype=np.float64)
    return float(np.prod(1.0 + mu_dp / (alpha_mu_np + n - 1.0)))


def _sample_unit(unit_state, wts, m_sstat, K, alpha, rng,
                 variant: str = "acctm"):
    """One Gibbs sweep over a unit (parent tokens then each child's tokens,
    reference E-step order). Mutates unit_state/wts/m_sstat in place.
    ``variant='corr'`` = the base ``corrLDA_Gibbs.java`` semantics: parent
    influence is the s=1e-20 ratio (``influenceRatio`` :145-159), the child
    topic prob the pure parent proportion (``childTopicInDocProb``
    :234-241), and the draw uses the strict < 0 walk (searchsorted right)
    vs ACCTM's ≤ 0. The shipped corrLDA's influence list is the never-
    populated ``m_childDocs4Dynamic``; like the ACCTM fix, the children
    list is used here.

    Uniforms are pre-drawn in ONE ``rng.random(total)`` call (identical
    Philox stream to per-token draws) and the sweep runs in the
    compile-once C kernel (functions/ckernels.acctm_kernel) with the
    identical IEEE op sequence — kernel == python bit-exact
    (tests/test_ckernels_acctm.py); the loop below is the compiler-less
    fallback and parity oracle."""
    from ir_base_ray.functions.ckernels import acctm_kernel

    (p_words, p_z, p_sstat, children) = unit_state
    total = p_words.size + sum(c[0].size for c in children)
    if total == 0:
        return
    us = rng.random(total)
    lib = acctm_kernel()
    if lib is not None:
        _sample_unit_kernel(lib, unit_state, wts, m_sstat, K, alpha, us,
                            variant)
        return
    pos = 0
    k_alpha = alpha * K
    s20 = 1e-20
    side = "right" if variant == "corr" else "left"
    # ---- parent (ACCTM.sampleInParentDoc / corrLDA_Gibbs.sampleInParentDoc)
    for i in range(p_words.size):
        wid = p_words[i]
        t = p_z[i]
        p_sstat[t] -= 1.0
        wts[t, wid] -= 1.0
        m_sstat[t] -= 1.0
        topic_sum = p_sstat.sum()
        p_word = wts[:, wid] / m_sstat
        p_doc = alpha + p_sstat
        infl = np.ones(K)
        for (_cw, _cz, c_sstat, mu) in children:
            if variant == "corr":
                with np.errstate(over="ignore"):   # Java-double inf parity
                    for k in range(1, K):
                        infl[k] *= _influence_ratio_cz(
                            int(c_sstat[k]), p_sstat[k], int(c_sstat[0]),
                            p_sstat[0])
            else:
                mu_dp = mu / topic_sum
                denom = _gamma_func_ratio(int(c_sstat[0]), mu_dp,
                                          alpha + p_sstat[0] * mu_dp)
                for k in range(1, K):
                    infl[k] *= _gamma_func_ratio(
                        int(c_sstat[k]), mu_dp,
                        alpha + p_sstat[k] * mu_dp) / denom
        cache = p_word * p_doc * infl
        cum = np.cumsum(cache)
        u = cum[-1] * us[pos]
        pos += 1
        t = int(np.searchsorted(cum, u, side=side))
        if t >= K:
            t = K - 1
        p_z[i] = t
        p_sstat[t] += 1.0
        wts[t, wid] += 1.0
        m_sstat[t] += 1.0
    # ---- children (ACCTM.sampleInChildDoc / corrLDA_Gibbs.sampleInChildDoc)
    p_sum = p_sstat.sum()
    for (c_words, c_z, c_sstat, mu) in children:
        for i in range(c_words.size):
            wid = c_words[i]
            t = c_z[i]
            c_sstat[t] -= 1.0
            wts[t, wid] -= 1.0
            m_sstat[t] -= 1.0
            c_sum = c_sstat.sum()
            if variant == "corr":
                cache = (wts[:, wid] / m_sstat) \
                    * (p_sstat + s20) / (p_sum + s20 * K)
            else:
                cache = (wts[:, wid] / m_sstat) \
                    * (alpha + mu * p_sstat / p_sum + c_sstat) \
                    / (k_alpha + mu + c_sum)
            cum = np.cumsum(cache)
            u = cum[-1] * us[pos]
            pos += 1
            t = int(np.searchsorted(cum, u, side=side))
            if t >= K:
                t = K - 1
            c_z[i] = t
            c_sstat[t] += 1.0
            wts[t, wid] += 1.0
            m_sstat[t] += 1.0


def _sample_unit_kernel(lib, unit_state, wts, m_sstat, K, alpha, us,
                        variant):
    """C-kernel twin of _sample_unit's loop (same mutation contract)."""
    import ctypes

    P = ctypes.POINTER
    f64, i64 = ctypes.c_double, ctypes.c_int64

    def dp(a):
        return a.ctypes.data_as(P(f64))

    def ip(a):
        return a.ctypes.data_as(P(i64))

    (p_words, p_z, p_sstat, children) = unit_state
    V = wts.shape[1]
    nc = len(children)
    imode = 1 if variant == "corr" else 0
    side = 1 if variant == "corr" else 0
    cache = np.empty(K + 1, dtype=np.float64)
    infl = np.empty(K, dtype=np.float64)
    if p_words.size:
        # parent sweep only READS child counts — stack a snapshot
        ccounts = (np.ascontiguousarray(
            np.stack([c[2] for c in children]), dtype=np.float64)
            if nc else np.zeros((1, K)))
        mus = np.array([c[3] for c in children], dtype=np.float64) \
            if nc else np.zeros(1)
        lib.acctm_parent(ip(p_words), p_words.size, ip(p_z), dp(p_sstat),
                         dp(wts), dp(m_sstat), K, V, nc, dp(ccounts),
                         dp(mus), alpha, -1.0, imode, side,
                         dp(us[:p_words.size]), dp(cache), dp(infl))
    pos = p_words.size
    p_sum = float(p_sstat.sum())
    k_alpha = alpha * K
    cmode = 1 if variant == "corr" else 0
    for (c_words, c_z, c_sstat, mu) in children:
        if c_words.size:
            lib.acctm_child(ip(c_words), c_words.size, ip(c_z), None,
                            dp(wts), dp(m_sstat), K, V, alpha, k_alpha,
                            dp(p_sstat), p_sum, float(mu), dp(c_sstat),
                            None, None, None, 0.0, 0.0, None, None, None,
                            dp(us[pos:pos + c_words.size]), dp(cache),
                            cmode)
        pos += c_words.size


def _init_unit(parent_vec, child_vecs, K, rng):
    """setTopics4Gibbs(·, 0): random topics, raw-count sstats; μ per child."""
    p_tids, p_vals = parent_vec
    p_words = _expand(p_tids, p_vals)
    p_z = rng.integers(0, K, size=p_words.size)
    p_sstat = np.zeros(K, dtype=np.float64)
    np.add.at(p_sstat, p_z, 1.0)
    children = []
    for (c_tids, c_vals) in child_vecs:
        c_words = _expand(c_tids, c_vals)
        c_z = rng.integers(0, K, size=c_words.size)
        c_sstat = np.zeros(K, dtype=np.float64)
        np.add.at(c_sstat, c_z, 1.0)
        mu = cosine_mu(p_tids, p_vals, c_tids, c_vals)
        children.append([c_words, c_z, c_sstat, mu])
    return [p_words, p_z, p_sstat, children]


@ray.remote
def _acctm_block_epoch(units, state, global_wts, global_m, K, V, alpha,
                       seed, it, collect, variant: str = "acctm"):
    """One AD-LDA epoch over a block of units. state carries (unit_states,
    parent_acc, child_acc)."""
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[it, 0, 0, 0]))
    wts = global_wts.copy()
    m_sstat = global_m.copy()
    if state is None:
        unit_states = []
        for (pv, cvs) in units:
            us = _init_unit(pv, cvs, K, rng)
            np.add.at(wts, (us[1], us[0]), 1.0)
            np.add.at(m_sstat, us[1], 1.0)
            for (cw, cz, _cs, _mu) in us[3]:
                np.add.at(wts, (cz, cw), 1.0)
                np.add.at(m_sstat, cz, 1.0)
            unit_states.append(us)
        p_acc = [np.zeros(K) for _ in units]
        c_acc = [[np.zeros(K) for _ in u[3]] for u in unit_states]
        return (unit_states, p_acc, c_acc), wts, m_sstat
    unit_states, p_acc, c_acc = state
    unit_states = [[u[0], u[1].copy(), u[2].copy(),
                    [[c[0], c[1].copy(), c[2].copy(), c[3]] for c in u[3]]]
                   for u in unit_states]
    p_acc = [a.copy() for a in p_acc]
    c_acc = [[a.copy() for a in ua] for ua in c_acc]
    for ui, us in enumerate(unit_states):
        _sample_unit(us, wts, m_sstat, K, alpha, rng, variant)
        if collect:
            p_sstat = us[2]
            p_acc[ui] += p_sstat + alpha      # corrLDA collectParentStats
            p_sum = p_sstat.sum()
            for ci, (_cw, _cz, c_sstat, mu) in enumerate(us[3]):
                if variant == "corr":
                    # corrLDA_Gibbs.collectChildStats: raw counts, no prior
                    c_acc[ui][ci] += c_sstat
                else:
                    c_acc[ui][ci] += c_sstat + alpha + mu * p_sstat / p_sum
    return (unit_states, p_acc, c_acc), wts, m_sstat


def train_acctm(units, *, n_topics: int, vocab_size: int, n_iters: int = 30,
                alpha: float = 1.01, beta: float = 1.001,
                burn_in: float = 0.4, lag: int = 2, seed: int = 19,
                n_blocks: int = 4, variant: str = "acctm"):
    """units: list of (parent_vec, [child_vec, ...]) with vec = (tids, vals).
    → dict with L1-normalized topic_term (K×V), per-unit parent_topics and
    child_topics, μ values. α/β follow the reference mains (alpha−1 quirk:
    TopicModelMain passes ``alpha-1`` to the Gibbs correspondence models)."""
    K, V = n_topics, vocab_size
    n_blocks = max(1, min(n_blocks, len(units)))
    splits = [units[i::n_blocks] for i in range(n_blocks)]
    refs = [ray.put(s) for s in splits]
    n_burn = int(burn_in * n_iters)

    wts = np.full((K, V), beta, dtype=np.float64)
    m_sstat = np.full(K, beta * V, dtype=np.float64)
    states = [None] * n_blocks

    outs = ray.get([
        _acctm_block_epoch.remote(r, None, wts, m_sstat, K, V, alpha,
                                  seed + i, 0, False, variant)
        for i, r in enumerate(refs)
    ])
    new_wts, new_m = wts.copy(), m_sstat.copy()
    for i, (st, lw, lm) in enumerate(outs):
        states[i] = st
        new_wts += lw - wts
        new_m += lm - m_sstat
    wts, m_sstat = new_wts, new_m

    topic_term_acc = np.zeros((K, V))
    for it in range(1, n_iters + 1):
        collect = it > n_burn and it % lag == 0
        outs = ray.get([
            _acctm_block_epoch.remote(r, states[i], wts, m_sstat, K, V,
                                      alpha, seed + i, it, collect,
                                      variant)
            for i, r in enumerate(refs)
        ])
        new_wts, new_m = wts.copy(), m_sstat.copy()
        for i, (st, lw, lm) in enumerate(outs):
            states[i] = st
            new_wts += lw - wts          # AD-LDA merge, fixed block order
            new_m += lm - m_sstat
        wts, m_sstat = new_wts, new_m
        if collect:
            topic_term_acc += wts

    def l1(a):
        s = a.sum()
        return a / s if s > 0 else a

    parent_topics = [None] * len(units)
    child_topics = [None] * len(units)
    mus = [None] * len(units)
    for b in range(n_blocks):
        unit_states, p_acc, c_acc = states[b]
        for d in range(len(p_acc)):
            gi = b + d * n_blocks
            parent_topics[gi] = l1(p_acc[d])
            child_topics[gi] = [l1(a) for a in c_acc[d]]
            mus[gi] = [c[3] for c in unit_states[d][3]]
    norm = topic_term_acc.sum(axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return {"topic_term": topic_term_acc / norm,
            "parent_topics": parent_topics, "child_topics": child_topics,
            "mus": mus, "block_split": n_blocks}


def acctm_serial(units, *, n_topics: int, vocab_size: int, n_iters: int = 30,
                 alpha: float = 1.01, beta: float = 1.001,
                 burn_in: float = 0.4, lag: int = 2, seed: int = 19):
    """Serial transcription (single Philox stream, same sweep order as a
    1-block distributed run) — the parity oracle."""
    K, V = n_topics, vocab_size
    n_burn = int(burn_in * n_iters)
    wts = np.full((K, V), beta, dtype=np.float64)
    m_sstat = np.full(K, beta * V, dtype=np.float64)
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[0, 0, 0, 0]))
    unit_states = []
    for (pv, cvs) in units:
        us = _init_unit(pv, cvs, K, rng)
        np.add.at(wts, (us[1], us[0]), 1.0)
        np.add.at(m_sstat, us[1], 1.0)
        for (cw, cz, _cs, _mu) in us[3]:
            np.add.at(wts, (cz, cw), 1.0)
            np.add.at(m_sstat, cz, 1.0)
        unit_states.append(us)
    p_acc = [np.zeros(K) for _ in units]
    c_acc = [[np.zeros(K) for _ in u[3]] for u in unit_states]
    topic_term_acc = np.zeros((K, V))
    for it in range(1, n_iters + 1):
        rng = np.random.Generator(np.random.Philox(key=seed,
                                                   counter=[it, 0, 0, 0]))
        collect = it > n_burn and it % lag == 0
        for ui, us in enumerate(unit_states):
            _sample_unit(us, wts, m_sstat, K, alpha, rng)
            if collect:
                p_sstat = us[2]
                p_acc[ui] += p_sstat + alpha
                p_sum = p_sstat.sum()
                for ci, (_cw, _cz, c_sstat, mu) in enumerate(us[3]):
                    c_acc[ui][ci] += c_sstat + alpha + mu * p_sstat / p_sum
        if collect:
            topic_term_acc += wts

    def l1(a):
        s = a.sum()
        return a / s if s > 0 else a

    norm = topic_term_acc.sum(axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return {"topic_term": topic_term_acc / norm,
            "parent_topics": [l1(a) for a in p_acc],
            "child_topics": [[l1(a) for a in ua] for ua in c_acc]}


# ------------------------------------------------------------- ACCTM_C

def _word_x_features(c_tids, c_vals, p_tids, p_vals, c_words):
    """ACCTM_CZLR per-word x-features (``ACCTM_CZLR.setFeatures4Word``:
    ``w.setFeatures(sf.getValues())`` — the per-SEGMENT values of the word's
    sparse feature, ``_SparseFeature.m_values`` filled by the segmented
    ``Utils.createSpVct(ArrayList<HashMap>)`` :473-505).

    PINNED SUBSTITUTION: in the shipped loader path
    (``ParentChildAnalyzer.loadChildDoc`` → ``AnalyzeDoc`` →
    ``createSpVct(HashMap)``) ``m_values`` is never populated (null), the
    intended ``_ChildDoc4ProbitModel``/``_ChildDoc4LogisticRegression`` doc
    classes are deleted from the tree, and ``_ParentDoc.initFeatureWeight``
    is never called — so ACCTM_CZLR as shipped NPEs at the first
    ``xProb4Word``. We pin the segment definition the model plainly wants
    (a fixed-dim per-word TF profile separating parent-shared from
    child-local mass): segment 0 = the child body, segment 1 = the parent
    article, i.e. f(w) = [tf_child(w), tf_parent(w)] — the learned-soft
    generalization of ACCTM_CHard's hard in-parent rule.

    Returns an (n_tokens, 2) float64 matrix aligned with ``c_words``."""
    tf_c = dict(zip(np.asarray(c_tids, dtype=np.int64).tolist(),
                    np.asarray(c_vals, dtype=np.float64).tolist()))
    tf_p = dict(zip(np.asarray(p_tids, dtype=np.int64).tolist(),
                    np.asarray(p_vals, dtype=np.float64).tolist()))
    F = np.empty((c_words.size, 2), dtype=np.float64)
    for i, wid in enumerate(c_words.tolist()):
        F[i, 0] = tf_c.get(wid, 0.0)
        F[i, 1] = tf_p.get(wid, 0.0)
    return F


def _fit_x_lr(children):
    """ACCTM_CZLR M-step per-parent liblinear fit
    (``ACCTM_CZLR.updateFeatureWeight`` :158-214): gather every child word's
    (features, x) in child order, train L2R_LR (C=1) from w=0, copy the
    decision coefficients into the parent's feature weights.

    Transcribed quirks:
    - liblinear orders labels by FIRST OCCURRENCE (``Linear.groupClasses``
      :112-160; the −1/+1 swap does not fire for {0,1}), so the positive
      class of the trained w is the x value of the FIRST child word — while
      ``xProb4Word`` :298-309 always reads w as the x=1 direction. When the
      first word has x=0 the logistic factors are inverted; transcribed
      as-is (y=+1 ⟺ x == x_first).
    - ``problem.bias`` is left at the Java field default 0.0 but no bias
      feature node is ever appended, and ``getNrFeature`` subtracts the
      phantom bias column back out of n = featureLen+1 — net effect: a
      plain no-intercept logistic on the featureLen coefficients.
    - liblinear's eps=0.01 TRON stop is replaced by an exact dim-2 Newton
      solve (gradient → 0); pytest pins the optimality condition.

    Objective: min_w ½‖w‖² + Σ_i log(1+exp(−y_i·w·f_i)).  Returns (2,) w."""
    Xs, ys = [], []
    for ch in children:
        if ch[0].size:
            Xs.append(ch[8])
            ys.append(ch[2])
    if not Xs:
        return np.zeros(2)
    X = np.concatenate(Xs, axis=0)
    x_lab = np.concatenate(ys)
    y = np.where(x_lab == x_lab[0], 1.0, -1.0)
    w = np.zeros(2)
    for _ in range(100):
        m = y * (X @ w)
        s = 1.0 / (1.0 + np.exp(m))          # σ(−y·Xw)
        g = w - X.T @ (y * s)
        if np.abs(g).max() < 1e-12:
            break
        d = s * (1.0 - s)
        H = np.eye(2) + (X * d[:, None]).T @ X
        w = w - np.linalg.solve(H, g)
    return w


def _init_unit_c(parent_vec, child_vecs, K, V, beta_local, rng,
                 variant: str = "c"):
    """ACCTM_C unit init (``_ChildDoc4BaseWithPhi.createXSpace`` +
    ``setTopics4Gibbs``): each child token draws x ∈ {0,1}; x=0 tokens get a
    global topic, x=1 tokens feed the child-local word distribution
    (smoothed with β·0.001). Child state: [words, z, x, xt0 (K,),
    local (V,), xs (2,), local_total, mu].
    ``variant='chard'`` (``_ChildDoc4BaseWithPhi_Hard.setTopics4Gibbs``):
    child tokens whose word appears in the parent are FORCED x=0.
    ``variant='czlr'`` (``ACCTM_CZLR.initialize_probability`` :38-42): the
    CZ init plus per-word x-features (child slot 8) and the parent's
    logistic weight vector w=0 (unit slot 4)."""
    p_tids, p_vals = parent_vec
    p_words = _expand(p_tids, p_vals)
    p_z = rng.integers(0, K, size=p_words.size)
    p_sstat = np.zeros(K, dtype=np.float64)
    np.add.at(p_sstat, p_z, 1.0)
    children = []
    for (c_tids, c_vals) in child_vecs:
        c_words = _expand(c_tids, c_vals)
        if variant == "chard":
            in_par = np.isin(c_words, np.asarray(p_tids, dtype=np.int64))
            c_x = np.empty(c_words.size, dtype=np.int64)
            for i in range(c_words.size):   # conditional draw order per ref
                c_x[i] = 0 if in_par[i] else rng.integers(0, 2)
        else:
            c_x = rng.integers(0, 2, size=c_words.size)
        c_z = np.empty(c_words.size, dtype=np.int64)
        xt0 = np.zeros(K, dtype=np.float64)
        local = np.full(V, beta_local, dtype=np.float64)
        xs = np.zeros(2, dtype=np.float64)
        local_total = beta_local * V
        for i in range(c_words.size):
            if c_x[i] == 0:
                c_z[i] = rng.integers(0, K)
                xt0[c_z[i]] += 1.0
                xs[0] += 1.0
            else:
                c_z[i] = K
                local[c_words[i]] += 1.0
                xs[1] += 1.0
                local_total += 1.0
        mu = cosine_mu(p_tids, p_vals, c_tids, c_vals)
        ch = [c_words, c_z, c_x, xt0, local, xs, local_total, mu]
        if variant == "czlr":
            ch.append(_word_x_features(c_tids, c_vals, p_tids, p_vals,
                                       c_words))
        children.append(ch)
    unit = [p_words, p_z, p_sstat, children]
    if variant == "czlr":
        unit.append(np.zeros(2))   # m_featureWeight, zero-initialized
    return unit


def _influence_ratio_cz(njc: int, njp: float, n1c: int, n1p: float) -> float:
    """``ACCTM_CZ.influenceRatio`` (= ``corrLDA_Gibbs.influenceRatio`` with
    s = 1e-20): Π (n1p+s)/(n1p+1+s) over n1c · Π (njp+1+s)/(njp+s) over njc.
    With njp≈0 the second factor is ~1e20^njc and overflows to inf exactly
    as the reference's Java double silently does (the draw walk handles
    Infinity: that topic wins) — the numpy overflow warning is suppressed
    as expected behavior, not masked error."""
    s = 1e-20
    with np.errstate(over="ignore"):
        r = ((n1p + s) / (n1p + 1.0 + s)) ** n1c
        r *= ((njp + 1.0 + s) / (njp + s)) ** njc
    return float(r)


def _sample_unit_c(unit_state, wts, m_sstat, K, alpha, gamma, rng,
                   variant: str = "c"):
    """One ACCTM_C Gibbs sweep (``ACCTM_C.java:78-171``). Parent influence
    uses the child's x=0 topic counts with μ/|parent tokens| (the reference
    switches from Σsstat to ``getDocInferLength`` here); child tokens choose
    among K global topics (×(γ₀+xs₀)) or the local distribution (×(γ₁+xs₁)).
    ``variant='cz'`` (``ACCTM_CZ.java``): the parent influence becomes the
    corrLDA ratio (no μ), and the child x=0 topic prob is the pure parent
    proportion (npar[t]+s)/(Σnpar+sK), s = 1e-20.
    ``variant='czlr'`` (``ACCTM_CZLR.sampleInChildDoc`` :217-296): the CZ
    sampler with the count-based x factors (γ₀+n₀)/(γ₁+n₁) replaced by the
    per-word logistic pλ₀ = σ(−w·f), pλ₁ = σ(w·f) (``xProb4Word``
    :298-309) against the parent's fitted weight vector.

    Same pre-drawn-uniform + C-kernel dispatch as _sample_unit (bit-exact
    twin pinned by tests/test_ckernels_acctm.py)."""
    from ir_base_ray.functions.ckernels import acctm_kernel

    (p_words, p_z, p_sstat, children) = unit_state[:4]
    x_w = unit_state[4] if variant == "czlr" else None
    total = p_words.size + sum(ch[0].size for ch in children)
    if total == 0:
        return
    us = rng.random(total)
    lib = acctm_kernel()
    if lib is not None:
        _sample_unit_c_kernel(lib, unit_state, wts, m_sstat, K, alpha,
                              gamma, us, variant)
        return
    pos = 0
    k_alpha = alpha * K
    n_parent_tokens = float(p_words.size)
    s20 = 1e-20
    # ---- parent
    for i in range(p_words.size):
        wid = p_words[i]
        t = p_z[i]
        p_sstat[t] -= 1.0
        wts[t, wid] -= 1.0
        m_sstat[t] -= 1.0
        p_word = wts[:, wid] / m_sstat
        p_doc = alpha + p_sstat
        infl = np.ones(K)
        for ch in children:
            xt0, mu = ch[3], ch[7]
            if variant in ("cz", "czlr"):
                with np.errstate(over="ignore"):   # Java-double inf parity
                    for k in range(1, K):
                        infl[k] *= _influence_ratio_cz(
                            int(xt0[k]), p_sstat[k], int(xt0[0]), p_sstat[0])
            else:
                mu_dp = mu / n_parent_tokens
                denom = _gamma_func_ratio(int(xt0[0]), mu_dp,
                                          alpha + p_sstat[0] * mu_dp)
                for k in range(1, K):
                    infl[k] *= _gamma_func_ratio(
                        int(xt0[k]), mu_dp,
                        alpha + p_sstat[k] * mu_dp) / denom
        cache = p_word * p_doc * infl
        cum = np.cumsum(cache)
        u = cum[-1] * us[pos]
        pos += 1
        t = int(np.searchsorted(cum, u, side="left"))
        if t >= K:
            t = K - 1
        p_z[i] = t
        p_sstat[t] += 1.0
        wts[t, wid] += 1.0
        m_sstat[t] += 1.0
    # ---- children
    p_sum = p_sstat.sum()
    for ch in children:
        c_words, c_z, c_x, xt0, local, xs, local_total, mu = ch[:8]
        feats = ch[8] if variant == "czlr" else None
        in_par = (np.isin(c_words, p_words) if variant == "chard" else None)
        for i in range(c_words.size):
            wid = c_words[i]
            t = c_z[i]
            x = c_x[i]
            if x == 0:
                xt0[t] -= 1.0
                xs[0] -= 1.0
                wts[t, wid] -= 1.0
                m_sstat[t] -= 1.0
            else:
                local[wid] -= 1.0
                xs[1] -= 1.0
                local_total -= 1.0
            if variant == "chard" and in_par[i]:
                # hard differentiate: parent-shared word stays global, no
                # x-switch factors (ACCTM_CHard.sampleInChildDoc:102-137)
                cache = (wts[:, wid] / m_sstat) \
                    * (alpha + mu * p_sstat / p_sum + xt0) \
                    / (k_alpha + mu + xs[0])
                cum = np.cumsum(cache)
                u = cum[-1] * us[pos]
                pos += 1
                t = int(np.searchsorted(cum, u, side="left"))
                if t >= K:
                    t = K - 1
                c_x[i] = 0
                c_z[i] = t
                xt0[t] += 1.0
                xs[0] += 1.0
                wts[t, wid] += 1.0
                m_sstat[t] += 1.0
                continue
            if variant == "czlr":
                dot = feats[i, 0] * x_w[0] + feats[i, 1] * x_w[1]
                pl0 = 1.0 / (1.0 + np.exp(dot))     # xProb4Word(0,·)
                pl1 = 1.0 / (1.0 + np.exp(-dot))    # xProb4Word(1,·)
            else:
                pl0 = gamma[0] + xs[0]
                pl1 = gamma[1] + xs[1]
            cache = np.empty(K + 1)
            if variant in ("cz", "czlr"):
                cache[:K] = (wts[:, wid] / m_sstat) \
                    * (p_sstat + s20) / (p_sum + s20 * K) * pl0
            else:
                cache[:K] = (wts[:, wid] / m_sstat) \
                    * (alpha + mu * p_sstat / p_sum + xt0) \
                    / (k_alpha + mu + xs[0]) * pl0
            cache[K] = local[wid] / local_total * pl1
            cum = np.cumsum(cache)
            u = cum[-1] * us[pos]
            pos += 1
            t = int(np.searchsorted(cum, u, side="left"))
            if t >= K + 1:
                t = K
            if t < K:
                c_x[i] = 0
                c_z[i] = t
                xt0[t] += 1.0
                xs[0] += 1.0
                wts[t, wid] += 1.0
                m_sstat[t] += 1.0
            else:
                c_x[i] = 1
                c_z[i] = K
                local[wid] += 1.0
                xs[1] += 1.0
                local_total += 1.0
        ch[6] = local_total


def _sample_unit_c_kernel(lib, unit_state, wts, m_sstat, K, alpha, gamma,
                          us, variant):
    """C-kernel twin of _sample_unit_c's loop (same mutation contract)."""
    import ctypes

    P = ctypes.POINTER
    f64, i64 = ctypes.c_double, ctypes.c_int64

    def dp(a):
        return a.ctypes.data_as(P(f64))

    def ip(a):
        return a.ctypes.data_as(P(i64))

    (p_words, p_z, p_sstat, children) = unit_state[:4]
    x_w = unit_state[4] if variant == "czlr" else None
    V = wts.shape[1]
    nc = len(children)
    imode = 1 if variant in ("cz", "czlr") else 0
    cache = np.empty(K + 1, dtype=np.float64)
    infl = np.empty(K, dtype=np.float64)
    if p_words.size:
        ccounts = (np.ascontiguousarray(
            np.stack([ch[3] for ch in children]), dtype=np.float64)
            if nc else np.zeros((1, K)))
        mus = np.array([ch[7] for ch in children], dtype=np.float64) \
            if nc else np.zeros(1)
        lib.acctm_parent(ip(p_words), p_words.size, ip(p_z), dp(p_sstat),
                         dp(wts), dp(m_sstat), K, V, nc, dp(ccounts),
                         dp(mus), alpha, float(p_words.size), imode, 0,
                         dp(us[:p_words.size]), dp(cache), dp(infl))
    pos = p_words.size
    p_sum = float(p_sstat.sum())
    k_alpha = alpha * K
    cmode = {"c": 2, "chard": 2, "cz": 3, "czlr": 4}[variant]
    u8 = ctypes.c_uint8
    for ch in children:
        c_words, c_z, c_x, xt0, local, xs, local_total, mu = ch[:8]
        n = c_words.size
        if n:
            in_par = (np.isin(c_words, p_words).astype(np.uint8)
                      if variant == "chard" else None)
            feats = (np.ascontiguousarray(ch[8], dtype=np.float64)
                     if variant == "czlr" else None)
            lt = np.array([local_total], dtype=np.float64)
            lib.acctm_child(
                ip(c_words), n, ip(c_z), ip(c_x), dp(wts), dp(m_sstat),
                K, V, alpha, k_alpha, dp(p_sstat), p_sum, float(mu),
                dp(xt0), dp(local), dp(xs), dp(lt), float(gamma[0]),
                float(gamma[1]),
                None if feats is None else dp(feats),
                None if x_w is None else dp(x_w),
                None if in_par is None
                else in_par.ctypes.data_as(P(u8)),
                dp(us[pos:pos + n]), dp(cache), cmode)
            ch[6] = float(lt[0])
        pos += n


@ray.remote
def _acctm_c_block_epoch(units, state, global_wts, global_m, K, V, alpha,
                         gamma, beta_local, seed, it, collect,
                         variant: str = "c", fit_lr: bool = False):
    """One AD-LDA epoch over a block of ACCTM_C / ACCTM_CZ / ACCTM_CZLR
    units. ``fit_lr`` (czlr only) runs the per-parent liblinear M-step
    after the sweep — parents and their children are block-local, so the
    fit needs no cross-block communication."""
    rng = np.random.Generator(np.random.Philox(key=seed,
                                               counter=[it, 0, 0, 0]))
    wts = global_wts.copy()
    m_sstat = global_m.copy()
    if state is None:
        unit_states = []
        for (pv, cvs) in units:
            us = _init_unit_c(pv, cvs, K, V, beta_local, rng, variant)
            np.add.at(wts, (us[1], us[0]), 1.0)
            np.add.at(m_sstat, us[1], 1.0)
            for ch in us[3]:
                g0 = ch[2] == 0          # only x=0 tokens enter the corpus
                np.add.at(wts, (ch[1][g0], ch[0][g0]), 1.0)
                np.add.at(m_sstat, ch[1][g0], 1.0)
            unit_states.append(us)
        p_acc = [np.zeros(K) for _ in units]
        c_acc = [[(np.zeros(K), np.zeros(2), np.zeros(V)) for _ in u[3]]
                 for u in unit_states]
        return (unit_states, p_acc, c_acc), wts, m_sstat
    unit_states, p_acc, c_acc = state
    unit_states = [[u[0], u[1].copy(), u[2].copy(),
                    [[c[0], c[1].copy(), c[2].copy(), c[3].copy(),
                      c[4].copy(), c[5].copy(), c[6], c[7]] + list(c[8:])
                     for c in u[3]]]
                   + ([u[4].copy()] if len(u) > 4 else [])
                   for u in unit_states]
    p_acc = [a.copy() for a in p_acc]
    c_acc = [[(t.copy(), x.copy(), lw.copy()) for (t, x, lw) in ua]
             for ua in c_acc]
    for ui, us in enumerate(unit_states):
        _sample_unit_c(us, wts, m_sstat, K, alpha, gamma, rng, variant)
        if collect:
            p_sstat = us[2]
            p_acc[ui] += p_sstat + alpha
            p_sum = p_sstat.sum()
            for ci, ch in enumerate(us[3]):
                t_acc, x_acc, lw_acc = c_acc[ui][ci]
                if variant in ("cz", "czlr"):
                    # ACCTM_CZ.collectChildStats: raw x=0 counts, no prior
                    # (CZLR inherits CZ's collectors unchanged)
                    t_acc += ch[3]
                else:
                    # collectChildStats (ACCTM_C.java:192-211)
                    t_acc += ch[3] + alpha + ch[7] * p_sstat / p_sum
                x_acc += np.asarray(gamma) + ch[5]
                lw_acc += ch[4]
    if fit_lr:
        for us in unit_states:
            us[4] = _fit_x_lr(us[3])
    return (unit_states, p_acc, c_acc), wts, m_sstat


def train_acctm_c(units, *, n_topics: int, vocab_size: int,
                  n_iters: int = 30, alpha: float = 1.01,
                  beta: float = 1.001, gamma=(0.5, 0.5),
                  burn_in: float = 0.4, lag: int = 2, seed: int = 19,
                  n_blocks: int = 4, variant: str = "c"):
    """ACCTM_C (``ACCTM_C.java``): ACCTM plus a per-child x-switch — child
    tokens either take a global topic (x=0, the ACCTM child distribution ×
    (γ₀+n₀)) or draw from a child-local word distribution (x=1, smoothed by
    β·0.001 — ``createXSpace:20``). Same AD-LDA shape as :func:`train_acctm`
    (units never split; only the K×V table merges). Returns additionally the
    per-child x-proportions and local word distributions.

    ``variant='cz'`` = ACCTM_CZ (``ACCTM_CZ.java``): the parent influence
    becomes the corrLDA s=1e-20 ratio over x=0 counts, the child x=0 topic
    prob the pure parent proportion, and child stat collection drops the
    α/μ prior add."""
    K, V = n_topics, vocab_size
    gamma = tuple(gamma)
    beta_local = beta * 0.001
    n_blocks = max(1, min(n_blocks, len(units)))
    splits = [units[i::n_blocks] for i in range(n_blocks)]
    refs = [ray.put(s) for s in splits]
    n_burn = int(burn_in * n_iters)

    wts = np.full((K, V), beta, dtype=np.float64)
    m_sstat = np.full(K, beta * V, dtype=np.float64)
    states = [None] * n_blocks

    outs = ray.get([
        _acctm_c_block_epoch.remote(r, None, wts, m_sstat, K, V, alpha,
                                    gamma, beta_local, seed + i, 0, False,
                                    variant)
        for i, r in enumerate(refs)
    ])
    new_wts, new_m = wts.copy(), m_sstat.copy()
    for i, (st, lw, lm) in enumerate(outs):
        states[i] = st
        new_wts += lw - wts
        new_m += lm - m_sstat
    wts, m_sstat = new_wts, new_m

    topic_term_acc = np.zeros((K, V))
    for it in range(1, n_iters + 1):
        collect = it > n_burn and it % lag == 0
        outs = ray.get([
            _acctm_c_block_epoch.remote(r, states[i], wts, m_sstat, K, V,
                                        alpha, gamma, beta_local, seed + i,
                                        it, collect, variant)
            for i, r in enumerate(refs)
        ])
        new_wts, new_m = wts.copy(), m_sstat.copy()
        for i, (st, lw, lm) in enumerate(outs):
            states[i] = st
            new_wts += lw - wts
            new_m += lm - m_sstat
        wts, m_sstat = new_wts, new_m
        if collect:
            topic_term_acc += wts

    def l1(a):
        s = a.sum()
        return a / s if s > 0 else a

    n_units = len(units)
    parent_topics = [None] * n_units
    child_topics = [None] * n_units
    child_xprop = [None] * n_units
    child_local = [None] * n_units
    for b in range(n_blocks):
        unit_states, p_acc, c_acc = states[b]
        for d in range(len(p_acc)):
            gi = b + d * n_blocks
            parent_topics[gi] = l1(p_acc[d])
            child_topics[gi] = [l1(t) for (t, _x, _lw) in c_acc[d]]
            child_xprop[gi] = [l1(x) for (_t, x, _lw) in c_acc[d]]
            child_local[gi] = [l1(lw) for (_t, _x, lw) in c_acc[d]]
    norm = topic_term_acc.sum(axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return {"topic_term": topic_term_acc / norm,
            "parent_topics": parent_topics, "child_topics": child_topics,
            "child_xprop": child_xprop, "child_local": child_local,
            "block_split": n_blocks}


def train_acctm_czlr(units, *, n_topics: int, vocab_size: int,
                     n_outer: int = 5, n_inner: int = 5,
                     alpha: float = 1.01, beta: float = 1.001,
                     gamma=(0.5, 0.5), seed: int = 19, n_blocks: int = 4):
    """ACCTM_CZLR (``topicmodels/correspondenceModels/ACCTM_CZLR.java``):
    ACCTM_CZ whose child x-switch is a per-word logistic regression —
    pλ(x|w) = σ(±w_parent·f_word) (``xProb4Word`` :298-309) — with each
    parent's weight vector refit by liblinear L2R_LR (C=1) on its children's
    (word-feature, x) pairs every M-step (``updateFeatureWeight`` :158-214).

    EM shape transcribed from the overridden ``EM()`` :59-121: each outer
    iteration runs ``n_inner`` full Gibbs sweeps, then the M-step — which
    accumulates topic_term += word_topic_sstat and the CZ parent/child
    collectors EVERY outer iteration (no burn-in/lag gating, unlike the base
    ``calculate_M_step``) and refits every parent's w.  Word features and
    the zero init of w follow the pinned substitution documented at
    :func:`_word_x_features` (the shipped feature path is a null-pointer
    crash).  Gibbs sweeps AD-LDA-merge the K×V table per sweep exactly like
    :func:`train_acctm_c`; the LR fits are per-parent and block-local, so
    the M-step adds no extra cluster round-trips.

    Returns the :func:`train_acctm_c` dict plus ``x_weights`` — the final
    per-parent logistic weight vectors."""
    K, V = n_topics, vocab_size
    gamma = tuple(gamma)
    beta_local = beta * 0.001
    n_blocks = max(1, min(n_blocks, len(units)))
    splits = [units[i::n_blocks] for i in range(n_blocks)]
    refs = [ray.put(s) for s in splits]

    wts = np.full((K, V), beta, dtype=np.float64)
    m_sstat = np.full(K, beta * V, dtype=np.float64)
    states = [None] * n_blocks

    outs = ray.get([
        _acctm_c_block_epoch.remote(r, None, wts, m_sstat, K, V, alpha,
                                    gamma, beta_local, seed + i, 0, False,
                                    "czlr")
        for i, r in enumerate(refs)
    ])
    new_wts, new_m = wts.copy(), m_sstat.copy()
    for i, (st, lw, lm) in enumerate(outs):
        states[i] = st
        new_wts += lw - wts
        new_m += lm - m_sstat
    wts, m_sstat = new_wts, new_m

    topic_term_acc = np.zeros((K, V))
    it = 0
    for _outer in range(n_outer):
        for inner in range(n_inner):
            it += 1
            last = inner == n_inner - 1
            outs = ray.get([
                _acctm_c_block_epoch.remote(r, states[i], wts, m_sstat, K,
                                            V, alpha, gamma, beta_local,
                                            seed + i, it, last, "czlr",
                                            last)
                for i, r in enumerate(refs)
            ])
            new_wts, new_m = wts.copy(), m_sstat.copy()
            for i, (st, lw, lm) in enumerate(outs):
                states[i] = st
                new_wts += lw - wts
                new_m += lm - m_sstat
            wts, m_sstat = new_wts, new_m
        topic_term_acc += wts

    def l1(a):
        s = a.sum()
        return a / s if s > 0 else a

    n_units = len(units)
    parent_topics = [None] * n_units
    child_topics = [None] * n_units
    child_xprop = [None] * n_units
    child_local = [None] * n_units
    x_weights = [None] * n_units
    for b in range(n_blocks):
        unit_states, p_acc, c_acc = states[b]
        for d in range(len(p_acc)):
            gi = b + d * n_blocks
            parent_topics[gi] = l1(p_acc[d])
            child_topics[gi] = [l1(t) for (t, _x, _lw) in c_acc[d]]
            child_xprop[gi] = [l1(x) for (_t, x, _lw) in c_acc[d]]
            child_local[gi] = [l1(lw) for (_t, _x, lw) in c_acc[d]]
            x_weights[gi] = unit_states[d][4]
    norm = topic_term_acc.sum(axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    return {"topic_term": topic_term_acc / norm,
            "parent_topics": parent_topics, "child_topics": child_topics,
            "child_xprop": child_xprop, "child_local": child_local,
            "x_weights": x_weights, "block_split": n_blocks}
