"""DCM-LDA (R7 tail): determinism, prior learning on planted topics, and
fixed-point sanity (alpha/beta positive, histograms consistent)."""

import numpy as np

from ir_base_ray.pipelines.dcmlda import train_dcmlda


def _planted(seed=6, per=20, V=12):
    rng = np.random.default_rng(seed)
    docs = []
    for d in range(2 * per):
        base = 0 if d % 2 == 0 else 6
        tids = np.arange(base, base + 6)
        vals = rng.integers(2, 5, 6)
        docs.append((tids.tolist(), vals.tolist()))
    return docs, V


def test_deterministic(ray_session):
    docs, V = _planted(per=8)
    a = train_dcmlda(docs, n_topics=2, vocab_size=V, n_em_iters=3, seed=41)
    b = train_dcmlda(docs, n_topics=2, vocab_size=V, n_em_iters=3, seed=41)
    assert np.array_equal(a["alpha"], b["alpha"])
    assert np.array_equal(a["beta"], b["beta"])


def test_priors_positive_and_normalized(ray_session):
    docs, V = _planted(per=10)
    out = train_dcmlda(docs, n_topics=3, vocab_size=V, n_em_iters=4, seed=41)
    assert (out["alpha"] > 0).all()
    assert (out["beta"] > 0).all()
    assert np.allclose(out["topic_term"].sum(axis=1), 1.0)
    th = np.concatenate(out["doc_topics"])
    assert np.allclose(th.sum(axis=1), 1.0)


def test_beta_separates_planted_topics(ray_session):
    docs, V = _planted(per=25)
    out = train_dcmlda(docs, n_topics=2, vocab_size=V, n_em_iters=6,
                       inner_iters=8, seed=41, n_blocks=3)
    phi = out["topic_term"]
    mass_low = phi[:, :6].sum(axis=1)
    # the learned Dirichlet means concentrate on the planted halves
    assert mass_low.max() > 0.7 and mass_low.min() < 0.3, mass_low
