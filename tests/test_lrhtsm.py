"""LR-HTSM (R7 tail): sentiment transition features, per-step-matrix FB
parity with HTSM at constant logistic(0)=0.5, training determinism and
annotated recovery."""

import numpy as np

from ir_base_ray.pipelines.htsm import doc_forward_backward_htsm
from ir_base_ray.pipelines.lrhtsm import (
    _kl_skip_zero, _pos_neg_class, _trans_stack, senti_transit_features,
    train_lrhtsm,
)
from tests.test_htsm import _senti_docs


def test_kl_skip_zero():
    p = np.array([0.5, 0.5, 0.0, 0.0])
    q = np.array([0.25, 0.25, 0.5, 0.0])
    # only indices 0,1 contribute (reference Utils.klDivergence skip rule)
    want = 0.5 * np.log(2.0) + 0.5 * np.log(2.0)
    assert abs(_kl_skip_zero(p, q) - want) < 1e-12
    assert _kl_skip_zero(np.zeros(4), q) == 0.0


def test_pos_neg_class():
    assert _pos_neg_class(["good", "great", "bad"]) == 1
    assert _pos_neg_class(["bad", "awful", "good"]) == 2
    assert _pos_neg_class(["good", "bad"]) == 0
    assert _pos_neg_class(["table", "chair"]) == 0


def test_senti_features_shapes_and_signs():
    sents = [(np.array([0]), np.array([1.0])),
             (np.array([0, 1]), np.array([1.0, 1.0])),
             (np.array([1]), np.array([1.0]))]
    toks = [["good", "day"], ["bad", "awful", "day"], ["not", "table"]]
    S = senti_transit_features(sents, toks)
    assert S.shape == (2, 6)
    # transition 1: senti scores good(+) vs bad(-): flip => +1
    assert S[0, 1] == 1.0
    # pos/neg class changes 1 -> 2 => +1
    assert S[0, 2] == 1.0
    # negation appears only in sentence 2 => transition 2 flips
    assert S[1, 5] == 1.0
    assert S[0, 5] == -1.0
    # single sentence: no features
    assert senti_transit_features(sents[:1], toks[:1]).shape == (0, 6)


def test_fb_stack_matches_constant_htsm():
    rng = np.random.default_rng(6)
    K, T = 4, 4
    em = np.log(rng.random((T, K)) + 0.1)
    theta = np.log(rng.dirichlet(np.ones(K)))
    stack = _trans_stack(theta, np.full(T - 1, 0.5), np.full(T - 1, 0.5), K)
    p_s, ll_s = doc_forward_backward_htsm(em, theta, 0.5, 0.5,
                                          trans_stack=stack)
    p_c, ll_c = doc_forward_backward_htsm(em, theta, 0.5, 0.5)
    assert abs(ll_s - ll_c) < 1e-12
    assert np.allclose(p_s, p_c, atol=1e-12)
    # and a genuinely per-step stack changes the result
    stack2 = _trans_stack(theta, np.array([0.9, 0.1, 0.5]),
                          np.array([0.2, 0.8, 0.5]), K)
    p_2, ll_2 = doc_forward_backward_htsm(em, theta, 0.5, 0.5,
                                          trans_stack=stack2)
    assert abs(ll_2 - ll_c) > 1e-9


def _tokens_for(docs):
    """Deterministic per-sentence token lists echoing the vocab quarter
    (positive words for the first half, negative for the second)."""
    out = []
    for sents in docs:
        toks = []
        for (jj, _vv) in sents:
            if jj.min() < 8:
                toks.append(["good", "nice", "item"])
            else:
                toks.append(["bad", "poor", "item", "not"])
        out.append(toks)
    return out


def test_train_deterministic_and_recovery(ray_session):
    docs, V = _senti_docs(n_docs=10)
    toks = _tokens_for(docs)
    labels = [np.array([0, 0, 0, 1, 1, 1]) for _ in docs]
    a = train_lrhtsm(docs, toks, n_topics=4, vocab_size=V,
                     doc_senti_labels=labels, n_iters=12, seed=37,
                     n_blocks=3)
    b = train_lrhtsm(docs, toks, n_topics=4, vocab_size=V,
                     doc_senti_labels=labels, n_iters=12, seed=37,
                     n_blocks=3)
    assert np.array_equal(a["log_topic_term"], b["log_topic_term"])
    assert np.array_equal(a["omega"], b["omega"])
    assert np.array_equal(a["delta"], b["delta"])
    phi = np.exp(a["log_topic_term"])
    conc = np.array([phi[:, q * 4:(q + 1) * 4].sum(axis=1).max()
                     for q in range(4)])
    assert (conc > 0.7).sum() >= 3, conc
    # omega/delta moved off zero (LR transitions actually fitted)
    assert np.linalg.norm(a["omega"]) > 1e-3
    assert np.linalg.norm(a["delta"]) > 1e-3
    # sentiment flips recovered on the MAP paths
    flat = [s for blk in a["senti_paths"] for s in blk]
    flips = sum(1 for s in flat
                if len(set(s[:3].tolist())) == 1
                and len(set(s[3:].tolist())) == 1 and s[0] != s[3])
    assert flips >= 0.6 * len(flat), (flips, len(flat))
