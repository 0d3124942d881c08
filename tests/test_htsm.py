"""HTSM (R7 tail): brute-force forward-backward parity (unannotated and
sentiment-annotated), transition-matrix structure, aspect/sentiment
recovery, determinism."""

import itertools

import numpy as np
import pytest

from ir_base_ray.pipelines.htsm import (
    _mask_first_emission, doc_forward_backward_htsm, state_maps,
    train_htsm, transition_matrix, viterbi_path_htsm,
)


def _brute_fb(emission, theta_log, epsilon, sigma, labels=None):
    """Enumerate all 3K-state sequences: joint = θ·em₀ (block 0 start) ×
    Π M[s,s']·em; returns (loglik, marginals (T, 3K))."""
    T, K = emission.shape
    S3 = 3 * K
    tk, sk, ak = state_maps(K)
    M = transition_matrix(theta_log, epsilon, sigma, K)
    lab = np.full(T, -1) if labels is None else np.asarray(labels)
    logps = []
    seqs = []
    for seq in itertools.product(range(S3), repeat=T):
        if seq[0] >= K:
            continue
        lp = theta_log[tk[seq[0]]] + emission[0, tk[seq[0]]]
        ok = True
        for t in range(1, T):
            if lab[t] != -1 and lab[t - 1] != -1:
                if lab[t] != lab[t - 1] and seq[t] >= K:
                    ok = False
                    break
                if lab[t] == lab[t - 1] and seq[t] < K:
                    ok = False
                    break
            lp += M[seq[t - 1], seq[t]] + emission[t, tk[seq[t]]]
            if lp == -np.inf:
                ok = False
                break
        if ok and np.isfinite(lp):
            logps.append(lp)
            seqs.append(seq)
    logps = np.array(logps)
    mx = logps.max()
    Z = mx + np.log(np.exp(logps - mx).sum())
    marg = np.zeros((T, S3))
    for lp, seq in zip(logps, seqs):
        w = np.exp(lp - Z)
        for t, s in enumerate(seq):
            marg[t, s] += w
    return Z, marg


def test_transition_rows_normalized():
    K = 4
    rng = np.random.default_rng(1)
    theta = np.log(rng.dirichlet(np.ones(K)))
    M = transition_matrix(theta, 0.3, 0.6, K)
    assert np.allclose(np.exp(M).sum(axis=1), 1.0, atol=1e-12)
    # block structure: a block-2 target is reachable only from its own topic
    tk, sk, ak = state_maps(K)
    for i in range(2 * K, 3 * K):
        srcs = np.where(np.isfinite(M[:, i]))[0]
        assert all(tk[s] == tk[i] for s in srcs)


def test_fb_matches_bruteforce_unannotated():
    rng = np.random.default_rng(7)
    K, T = 4, 3
    em = np.log(rng.random((T, K)) + 0.05)
    theta = np.log(rng.dirichlet(np.ones(K)))
    p, ll = doc_forward_backward_htsm(em, theta, 0.35, 0.55)
    Z, marg = _brute_fb(em, theta, 0.35, 0.55)
    assert abs(ll - Z) <= 1e-9 * max(1.0, abs(Z))
    assert np.allclose(p, marg, atol=1e-9)
    assert np.allclose(p.sum(axis=1), 1.0, atol=1e-9)


def test_fb_matches_bruteforce_annotated():
    rng = np.random.default_rng(11)
    K, T = 4, 3
    em = np.log(rng.random((T, K)) + 0.05)
    labels = np.array([0, 0, 1])
    _mask_first_emission(em, int(labels[0]), K)
    theta = np.log(rng.dirichlet(np.ones(K)))
    p, ll = doc_forward_backward_htsm(em, theta, 0.4, 0.5, labels)
    Z, marg = _brute_fb(em, theta, 0.4, 0.5, labels)
    assert abs(ll - Z) <= 1e-9 * max(1.0, abs(Z))
    assert np.allclose(p, marg, atol=1e-9)


def test_odd_topics_rejected():
    with pytest.raises(ValueError):
        train_htsm([[(np.array([0]), np.array([1.0]))]], n_topics=3,
                   vocab_size=4)


def _senti_docs(seed=5, n_docs=12, V=16):
    """Sentences drawn from 4 disjoint vocab quarters = (sentiment, aspect)
    cells; each doc: 3 sentences in one cell then 3 in the opposite
    sentiment's other aspect."""
    rng = np.random.default_rng(seed)
    docs = []
    for d in range(n_docs):
        cell_a = d % 2           # aspect within positive half
        quarter_a = cell_a * 4
        quarter_b = 8 + (1 - cell_a) * 4
        sents = []
        for _ in range(3):
            tids = np.arange(quarter_a, quarter_a + 4)
            sents.append((tids, rng.integers(1, 4, 4).astype(float)))
        for _ in range(3):
            tids = np.arange(quarter_b, quarter_b + 4)
            sents.append((tids, rng.integers(1, 4, 4).astype(float)))
        docs.append(sents)
    return docs, V


def test_recovery_and_sentiment_paths(ray_session):
    # annotated training (the reference's newEgg sourceType==2 docs): the
    # per-sentence labels constrain the transition blocks and the first
    # sentence's emission mask anchors positive topics to the first half —
    # without annotations this planted fixture has a symmetric merged-topic
    # local optimum (sigma -> 0), which EM legitimately falls into
    docs, V = _senti_docs()
    labels = [np.array([0, 0, 0, 1, 1, 1]) for _ in docs]
    out = train_htsm(docs, n_topics=4, vocab_size=V, n_iters=25,
                     doc_senti_labels=labels, seed=37, n_blocks=3)
    phi = np.exp(out["log_topic_term"])
    # each topic should concentrate on one vocab quarter
    conc = np.array([phi[:, q * 4:(q + 1) * 4].sum(axis=1).max()
                     for q in range(4)])
    assert (conc > 0.7).sum() >= 3, conc
    # one sentiment switch per doc's 5 transitions
    assert 0.1 <= out["sigma"] <= 0.35, out["sigma"]
    # MAP sentiment flips inside each doc (first 3 vs last 3 sentences)
    flat = [s for blk in out["senti_paths"] for s in blk]
    flips = sum(1 for s in flat
                if len(set(s[:3].tolist())) == 1
                and len(set(s[3:].tolist())) == 1 and s[0] != s[3])
    assert flips >= 0.6 * len(flat), (flips, len(flat))


def test_deterministic(ray_session):
    docs, V = _senti_docs(n_docs=6)
    a = train_htsm(docs, n_topics=4, vocab_size=V, n_iters=6, seed=37)
    b = train_htsm(docs, n_topics=4, vocab_size=V, n_iters=6, seed=37)
    assert np.array_equal(a["log_topic_term"], b["log_topic_term"])
    assert a["epsilon"] == b["epsilon"] and a["sigma"] == b["sigma"]


def test_viterbi_low_sigma_keeps_sentiment():
    """With σ→0 the MAP path never switches sentiment."""
    rng = np.random.default_rng(3)
    K, T = 4, 5
    em = np.log(rng.random((T, K)) + 0.5)
    theta = np.log(np.full(K, 0.25))
    path = viterbi_path_htsm(em, theta, epsilon=0.5, sigma=1e-9)
    _tk, sk, _ak = state_maps(K)
    assert len(set(sk[path].tolist())) == 1
