"""LR-HTSM — HTSM with logistic-regression topic AND sentiment transition
modeling (``topicmodels/markovmodel/LRHTSM.java`` +
``HMMs/LRFastRestrictedHMM_sentiment.java``), SURVEY.md §2.7 R7 tail.

Per transition t: ε_t = logistic(ω·[1, topicFv_{t−1}]) (the 4 LR-HTMM
features, ``pipelines/lrhtmm.transit_features``) and σ_t =
logistic(δ·[1, sentiFv_{t−1}]) over the 6 sentiment-transition features
(``_Doc.stn_senti_fv_size = 6``, ``HTSMAnalyzer.setStnFvs`` :303-378):

  s[0] = cosine(stn_{t−1}, stn_t)
  s[1] = sentiment-score flip: 0 if either score is the no-score sentinel,
         +1 if scores have opposite signs, −1 otherwise
  s[2] = pos/neg-count class change: +1 if the (pos>neg / neg>pos / tie)
         class differs between the sentences, −1 if equal
  s[3] = sign(cos(stn_t, stn_{t+1}) − cos(stn_{t−1}, stn_t)); 0 last/tie
  s[4] = sign(KL(tag_t, tag_{t+1}) − KL(tag_{t−1}, tag_t)) over L1-normalised
         [noun, adj, verb, adverb] POS-tag vectors with the reference's
         skip-zero klDivergence (``Utils.klDivergence``); 0 last/tie
  s[5] = negation-presence flip: +1 if exactly one of the two sentences
         contains a negation word, −1 otherwise

Substitution policy (SURVEY §7.0, same as M12/M13): sentiment scores come
from the pinned built-in polarity lexicon (``functions/postag.senti_score``;
its 0.0-on-miss means the reference's ≤−2 sentinel branch in s[1] is
unreachable — kept for spec parity), pos/neg counts from the lexicon's sign,
POS tags from the rule tagger (which never emits verbs, so tag index 2 is
always 0), and the negation list is the built-in ``NEGATION_WORDS`` set —
the reference loads all four from external files absent here
(``HTSMAnalyzer.loadPriorPosNegWords`` :73-100).

Transition matrices now vary per step: the HTSM forward/backward/Viterbi of
``pipelines/htsm.py`` take a (T−1, 3K, 3K) ``trans_stack`` built with
(ε_t, σ_t). E-step stores per-transition q_eps (blocks 0-1 mass — any topic
switch, ``LRHTSM.accEpsilonStat``) and q_sig (block 0 mass — sentiment
switch, ``accSigmaStat``); the M-step (iter>0) fits ω and δ independently by
λ/2·‖·‖² + cross-entropy L-BFGS (m=4, tol 1e-2, ``estimateOmega`` /
``estimateDelta`` :104-205), both via distributed (f, g) partials per block.
The reference's never-read NaN global ε/σ update is dropped (quirk noted in
``pipelines/lrhtmm.py``).


Thread-pool variant ``topicmodels/multithreads/HTSM/LRHTSM_multithread.java`` = the per-doc Ray fan-out here.
"""

from __future__ import annotations

import numpy as np

import ray

from ir_base_ray.functions.postag import SENTI_LEXICON, rule_pos_tag, senti_score
from ir_base_ray.pipelines.htmm import _doc_emission, _logsumexp_rows
from ir_base_ray.pipelines.htsm import (
    doc_forward_backward_htsm, state_maps, transition_matrix,
    viterbi_path_htsm)
from ir_base_ray.pipelines.linear import lbfgs_minimize
from ir_base_ray.pipelines.lrhtmm import (
    _epsilons, _omega_fg_block, _sparse_cos, transit_features)

# pinned substitution for the reference's negation seed-word file
NEGATION_WORDS = frozenset({
    "not", "no", "never", "none", "nothing", "nobody", "neither", "nor",
    "cannot", "cant", "dont", "wont", "isnt", "wasnt", "didnt", "doesnt",
    "hardly", "scarcely", "barely", "without",
})


def _kl_skip_zero(p: np.ndarray, q: np.ndarray) -> float:
    """``Utils.klDivergence``: terms where either side is 0 are skipped."""
    m = (p != 0) & (q != 0)
    if not m.any():
        return 0.0
    return float((p[m] * np.log(p[m] / q[m])).sum())


def _tag_vector(tokens) -> np.ndarray:
    """L1-normalised [noun, adj, verb, adverb] counts via the rule tagger
    (``calculatePOStagVector``; the rule tagger emits no verbs)."""
    v = np.zeros(4)
    for t in tokens:
        tag = rule_pos_tag(t)
        if tag == "NN":
            v[0] += 1
        elif tag == "JJ":
            v[1] += 1
        elif tag == "RB":
            v[3] += 1
    s = v.sum()
    return v / s if s > 0 else v


def _pos_neg_class(tokens) -> int:
    """``posNegCount``: 1 pos-dominant, 2 neg-dominant, 0 tie/no match."""
    pos = sum(1 for t in tokens if SENTI_LEXICON.get(t, 0.0) > 0)
    neg = sum(1 for t in tokens if SENTI_LEXICON.get(t, 0.0) < 0)
    if pos > neg:
        return 1
    if neg > pos:
        return 2
    return 0


def senti_transit_features(sents, token_lists) -> np.ndarray:
    """(T−1, 6) sentiment transition features; row t−1 gates step t
    (``setStnFvs`` sentiment half)."""
    T = len(sents)
    if T < 2:
        return np.zeros((0, 6))
    S = np.zeros((T - 1, 6))
    cos = [_sparse_cos(sents[i], sents[i + 1]) for i in range(T - 1)]
    scores = [senti_score(toks) for toks in token_lists]
    pn = [_pos_neg_class(toks) for toks in token_lists]
    negs = [any(t in NEGATION_WORDS for t in toks) for toks in token_lists]
    tags = [_tag_vector(toks) for toks in token_lists]
    kl = [_kl_skip_zero(tags[i], tags[i + 1]) for i in range(T - 1)]
    for i in range(1, T):
        S[i - 1, 0] = cos[i - 1]
        cs, ps = scores[i], scores[i - 1]
        if cs <= -2 or ps <= -2:      # unreachable under the substitution
            S[i - 1, 1] = 0.0
        elif cs * ps < 0:
            S[i - 1, 1] = 1.0
        else:
            S[i - 1, 1] = -1.0
        S[i - 1, 2] = -1.0 if pn[i] == pn[i - 1] else 1.0
        if i < T - 1:
            if cos[i] > cos[i - 1]:
                S[i - 1, 3] = 1.0
            elif cos[i] < cos[i - 1]:
                S[i - 1, 3] = -1.0
            if kl[i] > kl[i - 1]:
                S[i - 1, 4] = 1.0
            elif kl[i] < kl[i - 1]:
                S[i - 1, 4] = -1.0
        S[i - 1, 5] = 1.0 if (negs[i - 1] != negs[i]) else -1.0
    return S


def _trans_stack(theta_log, eps_vec, sig_vec, K):
    """(T−1, 3K, 3K) per-step row-normalised matrices."""
    return np.stack([
        transition_matrix(theta_log, float(e), float(s), K)
        for e, s in zip(eps_vec, sig_vec)
    ]) if len(eps_vec) else np.zeros((0, 3 * K, 3 * K))


@ray.remote
def _lrhtsm_block(doc_sents, topic_feats, senti_feats, doc_labels, thetas,
                  log_phi, omega, delta, K, V, alpha):
    """E-step for one block → (φ partial, loglik, θ′, q_eps, q_sig)."""
    phi_stat = np.zeros((K, V))
    ll = 0.0
    new_thetas = np.empty_like(thetas)
    q_eps_all, q_sig_all = [], []
    for d, sents in enumerate(doc_sents):
        em = _doc_emission(sents, log_phi)
        labels = doc_labels[d] if doc_labels is not None else None
        eps = _epsilons(topic_feats[d], omega)
        sig = 1.0 / (1.0 + np.exp(-(delta[0] + senti_feats[d] @ delta[1:])))
        stack = _trans_stack(thetas[d], eps, sig, K)
        p, doc_ll = doc_forward_backward_htsm(
            em, thetas[d], 0.5, 0.5, labels, trans_stack=stack)
        ll += doc_ll
        if len(sents) > 1:
            q_eps_all.append(p[1:, :2 * K].sum(axis=1))
            q_sig_all.append(p[1:, :K].sum(axis=1))
        else:
            q_eps_all.append(np.empty(0))
            q_sig_all.append(np.empty(0))
        pz = p[:, :K] + p[:, K:2 * K] + p[:, 2 * K:]
        for t, (jj, vv) in enumerate(sents):
            if len(jj):
                phi_stat[:, jj] += pz[t][:, None] * vv[None, :]
        sstat = (alpha - 1.0) + p[:, :2 * K].reshape(len(sents), 2, K) \
            .sum(axis=1).sum(axis=0)
        new_thetas[d] = np.log(sstat / sstat.sum())
    return phi_stat, ll, new_thetas, q_eps_all, q_sig_all


def train_lrhtsm(doc_sentence_vecs, doc_token_lists, *, n_topics: int,
                 vocab_size: int, doc_senti_labels=None, n_iters: int = 15,
                 alpha: float = 1.05, beta: float = 1.01, lam: float = 0.9,
                 seed: int = 37, n_blocks: int = 4):
    """Same contract as ``train_htsm`` plus per-sentence token lists for the
    sentiment features. Returns ω, δ and per-doc (ε_t, σ_t) vectors."""
    K, V = n_topics, vocab_size
    if K % 2 != 0 or K < 4:
        raise ValueError("LR-HTSM needs an even number_of_topics >= 4")
    rng = np.random.default_rng(seed)
    # HTSM draws its epsilon/sigma inits before phi (seeded analog); the LR
    # variant replaces them by the omega/delta logistics but the draws stay
    # so phi matches train_htsm at equal seed
    _ = rng.random(), rng.random()
    phi0 = rng.random((K, V)) + (beta - 1.0)
    log_phi = np.log(phi0 / phi0.sum(axis=1, keepdims=True))
    omega = np.zeros(5)
    delta = np.zeros(7)

    n_blocks = max(1, min(n_blocks, len(doc_sentence_vecs)))
    blocks = [doc_sentence_vecs[i::n_blocks] for i in range(n_blocks)]
    token_blocks = [doc_token_lists[i::n_blocks] for i in range(n_blocks)]
    label_blocks = (
        [doc_senti_labels[i::n_blocks] for i in range(n_blocks)]
        if doc_senti_labels is not None else [None] * n_blocks)
    tfeats = [[transit_features(s) for s in b] for b in blocks]
    sfeats = [[senti_transit_features(s, tk) for s, tk in zip(b, tb)]
              for b, tb in zip(blocks, token_blocks)]
    block_refs = [ray.put(b) for b in blocks]
    tf_refs = [ray.put(f) for f in tfeats]
    sf_refs = [ray.put(f) for f in sfeats]
    label_refs = [ray.put(b) for b in label_blocks]
    TF_refs = [ray.put(np.vstack(f) if f else np.zeros((0, 4)))
               for f in tfeats]
    SF_refs = [ray.put(np.vstack(f) if f else np.zeros((0, 6)))
               for f in sfeats]
    thetas = [np.full((len(b), K), -np.log(K)) for b in blocks]

    trace = []
    for it in range(n_iters):
        phi_ref = ray.put(log_phi)
        outs = ray.get([
            _lrhtsm_block.remote(ref, tf, sf, lref, thetas[i], phi_ref,
                                 omega, delta, K, V, alpha)
            for i, (ref, tf, sf, lref) in enumerate(
                zip(block_refs, tf_refs, sf_refs, label_refs))
        ])
        phi_stat = np.full((K, V), beta - 1.0)
        ll = 0.0
        qe_refs, qs_refs = [], []
        for i, (p_part, ll_part, th, qe, qs) in enumerate(outs):
            phi_stat += p_part
            ll += ll_part
            thetas[i] = th
            qe_refs.append(ray.put(np.concatenate(qe) if qe else np.empty(0)))
            qs_refs.append(ray.put(np.concatenate(qs) if qs else np.empty(0)))
        trace.append(ll)
        log_phi = np.log(phi_stat) - np.log(phi_stat.sum(axis=1,
                                                         keepdims=True))
        if it > 0:
            def fit(F_refs, q_refs, x0):
                def value_grad(x):
                    outs = ray.get([_omega_fg_block.remote(fr, qr, x)
                                    for fr, qr in zip(F_refs, q_refs)])
                    f = 0.5 * lam * float(x @ x)
                    g = lam * x
                    for f_p, g_p in outs:
                        f += f_p
                        g = g + g_p
                    return f, g
                x, _f, _n = lbfgs_minimize(value_grad, x0, m=4, gtol=1e-2,
                                           max_iter=100)
                return x

            omega = fit(TF_refs, qe_refs, omega)
            delta = fit(SF_refs, qs_refs, delta)

    paths, sentis = [], []
    for b, tf, sf, lb, th in zip(blocks, tfeats, sfeats, label_blocks,
                                 thetas):
        doc_paths, doc_sentis = [], []
        for d, sents in enumerate(b):
            em = _doc_emission(sents, log_phi)
            labels = lb[d] if lb is not None else None
            eps = _epsilons(tf[d], omega)
            sig = 1.0 / (1.0 + np.exp(-(delta[0] + sf[d] @ delta[1:])))
            stack = _trans_stack(th[d], eps, sig, K)
            if len(sents) == 1:
                raw = np.array([int(np.argmax(em[0] + th[d]))])
            else:
                raw = viterbi_path_htsm(em, th[d], 0.5, 0.5, labels,
                                        trans_stack=stack)
            doc_paths.append(raw % K)
            doc_sentis.append((raw % K) // (K // 2))
        paths.append(doc_paths)
        sentis.append(doc_sentis)
    return {"log_topic_term": log_phi, "omega": omega, "delta": delta,
            "thetas": thetas, "paths": paths, "senti_paths": sentis,
            "loglik_trace": trace, "block_split": n_blocks}
