"""HTMM (R7 tail): FB posterior sanity, topic recovery with sentence
coherence, Viterbi path structure, determinism."""

import numpy as np

from ir_base_ray.pipelines.htmm import (doc_forward_backward, train_htmm,
                                        viterbi_path)


def _sent(base, rng, V_half=6):
    tids = np.arange(base, base + V_half)
    vals = rng.integers(1, 4, V_half).astype(float)
    return tids, vals


def _docs(seed=5, n_docs=16, V=12):
    """Each doc: 3 sentences of topic A then 3 of topic B (disjoint vocab)."""
    rng = np.random.default_rng(seed)
    docs = []
    for _ in range(n_docs):
        sents = [_sent(0, rng) for _ in range(3)] + [_sent(6, rng) for _ in range(3)]
        docs.append(sents)
    return docs, V


def test_fb_posteriors_are_distributions():
    rng = np.random.default_rng(0)
    K, T = 3, 5
    em = np.log(rng.random((T, K)) + 0.1)
    theta = np.log(np.full(K, 1.0 / K))
    p, ll = doc_forward_backward(em, theta, epsilon=0.4)
    assert p.shape == (T, 2 * K)
    assert np.allclose(p.sum(axis=1), 1.0, atol=1e-9)
    assert np.isfinite(ll)
    # first sentence must be a fresh draw (kept half = 0)
    assert np.allclose(p[0, K:], 0.0, atol=1e-12)


def test_topic_recovery_and_paths(ray_session):
    docs, V = _docs()
    out = train_htmm(docs, n_topics=2, vocab_size=V, n_iters=20,
                     alpha=1.05, beta=1.01, seed=37, n_blocks=3)
    phi = np.exp(out["log_topic_term"])
    mass_low = phi[:, :6].sum(axis=1)
    assert mass_low.max() > 0.8 and mass_low.min() < 0.2, mass_low
    # MAP paths: first 3 sentences one topic, last 3 the other
    flat = [p for blk in out["paths"] for p in blk]
    agree = sum(1 for p in flat
                if len(set(p[:3])) == 1 and len(set(p[3:])) == 1
                and p[0] != p[3])
    assert agree >= 0.8 * len(flat), (agree, len(flat))


def test_deterministic(ray_session):
    docs, V = _docs(n_docs=8)
    a = train_htmm(docs, n_topics=2, vocab_size=V, n_iters=8, seed=37)
    b = train_htmm(docs, n_topics=2, vocab_size=V, n_iters=8, seed=37)
    assert np.array_equal(a["log_topic_term"], b["log_topic_term"])
    assert a["epsilon"] == b["epsilon"]


def test_viterbi_respects_low_epsilon():
    """With tiny ε the MAP path avoids switching even under emission noise."""
    rng = np.random.default_rng(3)
    K, T = 2, 6
    em = np.log(rng.random((T, K)) + 0.5)
    theta = np.log(np.full(K, 0.5))
    path = viterbi_path(em, theta, epsilon=1e-6)
    assert len(set(path.tolist())) == 1
